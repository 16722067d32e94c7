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


# Gopher stopword octet (Rae et al. 2021, "Scaling Language Models", §A.1.1
# quality-filter rules): a doc must contain ≥2 of these as tokens.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# line-edge trim set shared with the DuckDB oracle (ASCII only — keeps the
# SQL twin exact; Arrow's utf8_*trim_whitespace would trim unicode spaces)
_LINE_TRIM = " \t\r"


def gopher_signals(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Gopher-style document quality signals, fully vectorized.

    Implements the deterministic subset of the Gopher quality-filter rules
    (word count, mean word length, symbol-to-word ratio, bullet/ellipsis
    line ratios, alpha-word fraction, stopword hits) plus a duplicate-line
    fraction — the repetition facet — and the combined ``gopher_pass``
    verdict. Every signal is SQL-expressible so the whole stage has an
    exact DuckDB oracle (list_transform/list_filter twins).

    Thresholds (50 ≤ words ≤ 100k, 3 ≤ mean word len ≤ 10, symbol ratio
    ≤ 0.1, bullet lines ≤ 90%, ellipsis lines ≤ 30%, ≥80% alpha words,
    ≥2 stopwords) follow the published Gopher rules; the pass verdict is
    computed on the 6-digit-rounded ratios so engine and oracle agree
    bit-for-bit.
    """
    from epstein_pipeline_ray.functions.rounding import sql_round

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")

    n_words = np.asarray(token_count_array(texts), dtype=np.float64)
    has_words = n_words > 0
    safe_words = np.where(has_words, n_words, 1.0)

    # mean word length: non-whitespace chars / words ('\s' is RE2-ASCII on
    # both sides)
    total_len = np.asarray(pc.utf8_length(texts), dtype=np.float64)
    ws_chars = np.asarray(pc.count_substring_regex(texts, pattern=r"\s"), dtype=np.float64)
    mean_word_len = np.where(has_words, sql_round((total_len - ws_chars) / safe_words, 6), 0.0)

    # symbol-to-word ratio: '#', non-overlapping '...', and '…'
    symbols = (
        np.asarray(pc.count_substring(texts, pattern="#"), dtype=np.float64)
        + np.asarray(pc.count_substring(texts, pattern="..."), dtype=np.float64)
        + np.asarray(pc.count_substring(texts, pattern="…"), dtype=np.float64)
    )
    symbol_word_ratio = np.where(has_words, sql_round(symbols / safe_words, 6), 0.0)

    # per-line signals: one split, flat child + offset arithmetic
    lines = pc.split_pattern(texts, "\n")
    flat = lines.values
    offs = np.asarray(lines.offsets, dtype=np.int64)
    n_lines = np.diff(offs).astype(np.float64)  # ≥1 always (split('')==[''])
    lt = pc.utf8_ltrim(flat, characters=_LINE_TRIM)
    bullet = pc.or_(
        pc.or_(pc.starts_with(lt, pattern="-"), pc.starts_with(lt, pattern="*")),
        pc.starts_with(lt, pattern="•"),
    )
    rt = pc.utf8_rtrim(flat, characters=_LINE_TRIM)
    ell = pc.or_(pc.ends_with(rt, pattern="..."), pc.ends_with(rt, pattern="…"))
    bullet_n = np.add.reduceat(np.asarray(bullet.cast(pa.int64())), offs[:-1])
    ell_n = np.add.reduceat(np.asarray(ell.cast(pa.int64())), offs[:-1])
    bullet_ratio = sql_round(bullet_n / n_lines, 6)
    ellipsis_line_ratio = sql_round(ell_n / n_lines, 6)

    # duplicate-line fraction: 1 - distinct/total, hashed in pandas C code
    import pandas as pd

    doc_idx = np.repeat(np.arange(len(n_lines), dtype=np.int64), np.diff(offs))
    lf = pd.DataFrame({"d": doc_idx, "l": flat.to_pandas()})
    distinct = lf.drop_duplicates().groupby("d", sort=True).size().to_numpy(dtype=np.float64)
    dup_line_frac = sql_round(1.0 - distinct / n_lines, 6)

    # alpha-word fraction over the same \s+ token split as token_count_array
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), pattern=r"\s+")
    tflat = toks.values
    toffs = np.asarray(toks.offsets, dtype=np.int64)
    alpha = np.asarray(pc.match_substring_regex(tflat, pattern="[a-zA-Z]").cast(pa.int64()))
    alpha_n = np.add.reduceat(alpha, toffs[:-1]).astype(np.float64)
    frac_alpha_words = np.where(has_words, sql_round(alpha_n / safe_words, 6), 0.0)

    # duplicate word-2-gram fraction (the Gopher repetition-rule family):
    # adjacent token pairs within each doc, distinct-counted in pandas C
    # code; docs with <2 words score 0
    n_tok = np.diff(toffs)
    if len(tflat):
        tnp = tflat.to_pandas().to_numpy()
        tdoc = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        keep2 = tdoc[:-1] == tdoc[1:]  # successor in the same doc
        gf = pd.DataFrame({
            "d": tdoc[:-1][keep2],
            "a": tnp[:-1][keep2],
            "b": tnp[1:][keep2],
        })
        dist2 = gf.drop_duplicates().groupby("d", sort=True).size()
        dist2 = dist2.reindex(range(len(n_tok)), fill_value=0).to_numpy(np.float64)
    else:
        dist2 = np.zeros(len(n_tok), dtype=np.float64)
    n_2grams = np.where(has_words, np.maximum(n_words - 1, 0.0), 0.0)
    dup_2gram_frac = np.where(
        n_2grams > 0, sql_round(1.0 - dist2 / np.where(n_2grams > 0, n_2grams, 1.0), 6), 0.0
    )

    # stopword hits: token-boundary regex per stopword on lowered text
    low = pc.utf8_lower(texts)
    hits = np.zeros(len(n_words), dtype=np.int64)
    for w in GOPHER_STOPWORDS:
        hits += np.asarray(
            pc.match_substring_regex(low, pattern=rf"(^|\s){w}(\s|$)").cast(pa.int64())
        )

    gopher_pass = (
        (n_words >= 50) & (n_words <= 100_000)
        & (mean_word_len >= 3) & (mean_word_len <= 10)
        & (symbol_word_ratio <= 0.1)
        & (bullet_ratio <= 0.9)
        & (ellipsis_line_ratio <= 0.3)
        & (frac_alpha_words >= 0.8)
        & (hits >= 2)
    )
    return {
        "n_words": pa.array(n_words.astype(np.int64), pa.int64()),
        "mean_word_len": pa.array(mean_word_len, pa.float64()),
        "symbol_word_ratio": pa.array(symbol_word_ratio, pa.float64()),
        "bullet_ratio": pa.array(bullet_ratio, pa.float64()),
        "ellipsis_line_ratio": pa.array(ellipsis_line_ratio, pa.float64()),
        "dup_line_frac": pa.array(dup_line_frac, pa.float64()),
        "dup_2gram_frac": pa.array(dup_2gram_frac, pa.float64()),
        "frac_alpha_words": pa.array(frac_alpha_words, pa.float64()),
        "stop_word_hits": pa.array(hits, pa.int64()),
        "gopher_pass": pa.array(gopher_pass, pa.bool_()),
    }


def repetition_signals(
    texts: pa.Array | pa.ChunkedArray,
    top_n: int = 2,
    dup_n: int = 6,
) -> dict[str, np.ndarray]:
    """The two Gopher repetition signals gopher_signals omits (Rae 2021
    §A1.1, the DataTrove/NeMo-Curator replication semantics):

    * ``top_ngram_char_frac`` — characters attributable to the single
      most frequent word ``top_n``-gram: occurrences × gram char length
      over normalized-text length (single-space join of lower().split()
      tokens). Ties break to the lexicographically smallest gram; may
      exceed 1.0 for overlapping repeats (documented replication
      behavior, kept for twin parity).
    * ``dup_ngram_char_frac`` — fraction of normalized-text characters
      covered by ANY word ``dup_n``-gram occurring more than once,
      counting each character once (interval union over gram char
      spans — the "taking care not to count characters more than once"
      clause).

    Docs with fewer than ``top_n`` / ``dup_n`` words score 0.0 on the
    respective signal. Both fractions are 6-digit rounded (sql_round)
    so the DuckDB twin agrees bit-for-bit. Per-doc-bounded work: the
    inner loops are per-document numpy/Counter passes.
    """
    from collections import Counter

    from epstein_pipeline_ray.functions.rounding import sql_round

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    out_top = np.zeros(len(texts), dtype=np.float64)
    out_dup = np.zeros(len(texts), dtype=np.float64)
    for i, v in enumerate(texts):
        t = v.as_py()
        words = str(t or "").lower().split()
        if not words:
            continue
        nchars = sum(len(w) for w in words) + len(words) - 1
        if nchars <= 0:
            continue
        if len(words) >= top_n:
            grams = [" ".join(words[j: j + top_n])
                     for j in range(len(words) - top_n + 1)]
            cnt = Counter(grams)
            best_c, best_g = min(((-c, g) for g, c in cnt.items()))
            out_top[i] = (-best_c) * len(best_g) / nchars
        if len(words) >= dup_n:
            lens = np.fromiter((len(w) for w in words), dtype=np.int64,
                               count=len(words))
            starts_all = np.concatenate([[0], np.cumsum(lens[:-1] + 1)])
            grams = [" ".join(words[j: j + dup_n])
                     for j in range(len(words) - dup_n + 1)]
            cnt = Counter(grams)
            dup_idx = np.fromiter(
                (j for j, g in enumerate(grams) if cnt[g] > 1),
                dtype=np.int64)
            if dup_idx.size:
                s = starts_all[dup_idx]
                e = s + np.fromiter((len(grams[j]) for j in dup_idx),
                                    dtype=np.int64, count=dup_idx.size)
                # interval union: spans arrive start-sorted (one gram
                # per position), islands split where start > running max
                run_e = np.maximum.accumulate(e)
                new_isl = np.r_[True, s[1:] > run_e[:-1]]
                isl = np.cumsum(new_isl) - 1
                mn = s[new_isl]
                mx = np.maximum.reduceat(e, np.flatnonzero(new_isl))
                out_dup[i] = float((mx - mn).sum()) / nchars
    return {
        "top_ngram_char_frac": sql_round(out_top, 6),
        "dup_ngram_char_frac": sql_round(out_dup, 6),
    }
