"""Text-analysis kernels for the training-data-pipeline operators:
token counting, quality scoring, language-ID heuristic, fingerprinting.

The quality heuristic mirrors the shape of the reference's OCR-confidence
heuristic (printable/word/stopword weighted mix,
reference: src/epstein_pipeline/processors/ocr.py:80-118) re-targeted at
transcript/document quality. All functions are vectorized over Arrow or
numpy and run inside ``map_batches``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = r"\s+"

# tiny per-language stopword profiles for the n-gram/stopword language
# heuristic; deliberately small — this is a heuristic stage, the real
# models are out-of-container (SURVEY.md §2.3 A3/A4 are stubbed).
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the a of to and in is it you that was for on are".split()),
    "es": frozenset("el la de que y a en un ser se no por con".split()),
    "fr": frozenset("le la de et les des en un du une que est pour".split()),
    "de": frozenset("der die das und in den von zu mit sich des ist".split()),
    "zh": frozenset(),  # no-space script: detected by CJK codepoint ratio
}


def token_count_array(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Whitespace token count per row, vectorized (0 for empty)."""
    trimmed = pc.utf8_trim_whitespace(texts)
    toks = pc.split_pattern_regex(trimmed, pattern=_WS)
    counts = pc.list_value_length(toks)
    empty = pc.equal(pc.utf8_length(trimmed), 0)
    return pc.if_else(empty, pa.scalar(0, pa.int32()), counts).cast(pa.int64())


def unique_token_ratio(texts: list[str]) -> np.ndarray:
    """distinct tokens / tokens — the repetition facet of quality scoring."""
    out = np.zeros(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        words = t.split()
        if words:
            out[i] = len(set(words)) / len(words)
    return out


def quality_scores(texts: list[str]) -> np.ndarray:
    """Heuristic quality in [0,1]: 0.4*length + 0.3*word-shape + 0.3*diversity.

    Weighted-mix shape follows the reference's heuristic confidence
    (ocr.py:80-118: printable*0.40 + word-length*0.30 + stopword*0.30).
    """
    out = np.zeros(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        words = t.split()
        if not words:
            continue
        length_score = min(1.0, len(t) / 500.0)
        avg_len = sum(len(w) for w in words) / len(words)
        word_score = 1.0 if 3.0 <= avg_len <= 8.0 else max(0.0, 1.0 - abs(avg_len - 5.5) / 10.0)
        diversity = len(set(words)) / len(words)
        out[i] = round(0.4 * length_score + 0.3 * word_score + 0.3 * diversity, 6)
    return out


_PRINTABLE = frozenset(
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~ \t\n\r\x0b\x0c"
)  # == set(string.printable)
_OCR_STOPWORDS = frozenset(
    ["the", "and", "of", "to", "in", "a", "is", "that", "for", "it"]
)
_PUNCT = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"  # == string.punctuation


def heuristic_confidence(texts: list[str]) -> np.ndarray:
    """The reference's OCR-confidence heuristic, exact semantics
    (src/epstein_pipeline/processors/ocr.py:80-118):

        0.40 * printable-char ratio
      + 0.30 * avg-word-length score (1.0 inside [2,12], ramped outside)
      + 0.30 * min(1, |distinct lower words stripped of punctuation ∩
                      10-word English stoplist| / 3)

    clamped to [0,1] and rounded to 4 places. Rounding uses SQL
    half-away-from-zero (the engine's oracle-comparison convention,
    functions/rounding.py) rather than Python banker's — they differ only
    on exact .00005 float ties, which the weighted float sum cannot
    produce exactly."""
    from epstein_pipeline_ray.functions.rounding import sql_round

    out = np.zeros(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        if not t or not t.strip():
            continue
        printable_ratio = sum(1 for c in t if c in _PRINTABLE) / len(t)
        words = t.split()
        if not words:
            continue
        avg_word_len = sum(len(w) for w in words) / len(words)
        word_len_score = 1.0
        if avg_word_len < 2.0:
            word_len_score = avg_word_len / 2.0
        elif avg_word_len > 12.0:
            word_len_score = max(0.3, 1.0 - (avg_word_len - 12.0) / 20.0)
        lower_words = {w.lower().strip(_PUNCT) for w in words}
        stop_score = min(1.0, len(_OCR_STOPWORDS & lower_words) / 3.0)
        conf = 0.40 * printable_ratio + 0.30 * word_len_score + 0.30 * stop_score
        out[i] = min(1.0, max(0.0, conf))
    return sql_round(out, 4)


def detect_lang(texts: list[str]) -> list[str]:
    """Stopword/script-profile language guess; 'und' when nothing matches."""
    out = []
    for t in texts:
        lowered = t.lower()
        words = set(lowered.split())
        if not words:
            out.append("und")
            continue
        cjk = sum(1 for c in t[:200] if "一" <= c <= "鿿")
        if cjk > len(t[:200]) * 0.2:
            out.append("zh")
            continue
        best, best_hits = "und", 0
        for lang, sw in _LANG_STOPWORDS.items():
            hits = len(words & sw)
            if hits > best_hits:
                best, best_hits = lang, hits
        out.append(best)
    return out


def fingerprint_md5(norm_texts: pa.Array) -> pa.Array:
    """Document fingerprint: md5 hex of normalized text (cheap exact-dup
    key; SQL-expressible so the DuckDB oracle can verify it)."""
    out = []
    for v in norm_texts:
        s = v.as_py()
        out.append(None if s is None else hashlib.md5(s.encode()).hexdigest())
    return pa.array(out, pa.string())


def rolling_fingerprints(text: str, window: int = 32, stride: int = 16) -> list[int]:
    """Winnowing-style rolling 64-bit fingerprints over normalized text —
    the document-fingerprint operator (kept Python-scalar; one call per doc)."""
    if len(text) < window:
        return [hash_bytes64(text.encode())]
    return [
        hash_bytes64(text[i : i + window].encode())
        for i in range(0, len(text) - window + 1, stride)
    ]


def hash_bytes64(b: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "little")


def winnow_fingerprints(normalized: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): rolling k-gram hashes → per-window
    minima (rightmost on ties), deduped in order of first selection.
    Guarantees any shared substring of length >= k + window - 1 between
    two documents yields at least one shared fingerprint."""
    import numpy as np

    from epstein_pipeline_ray.functions.minhash import shingle_hashes

    # shingle_hashes returns the UNIQUE set; winnowing needs the sequence —
    # recompute positional hashes with the same rolling polynomial
    from epstein_pipeline_ray.functions.minhash import _MAX_HASH32, _POLY_BASE, _mix64

    cps = np.frombuffer(normalized.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    n = cps.shape[0]
    if n < k:
        return [int(h) for h in shingle_hashes(normalized, k)]
    m = n - k + 1
    h = cps[0:m].copy()
    for j in range(1, k):
        h = h * _POLY_BASE + cps[j : j + m]
    seq = (_mix64(h) & _MAX_HASH32).astype(np.int64)
    if m <= window:
        return [int(seq.min())]
    # per-window minima, rightmost on ties: sliding argmin via stride trick
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(seq, window)  # (m-window+1, window)
    rev = wins[:, ::-1]
    arg = window - 1 - rev.argmin(axis=1)  # rightmost minimum
    pos = np.arange(wins.shape[0]) + arg
    vals = seq[pos]
    keep = np.concatenate([[True], pos[1:] != pos[:-1]])  # new selection only
    return [int(v) for v in vals[keep]]
