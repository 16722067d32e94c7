"""Vectorized text-analysis stages over a documents Dataset.

All stages are stateless Arrow `map_batches`; heavier NLP stages in the
reference (spaCy/GLiNER NER, classifiers — SURVEY.md §2.3 A3-A6) have no
in-container models and are represented by the heuristic equivalents here
plus the actor-pool plumbing pattern in ``stages.multimodal``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from epstein_pipeline_ray.functions.rounding import sql_round

from epstein_pipeline_ray.functions.normalize import normalize_array
from epstein_pipeline_ray.functions.textstats import (
    detect_lang,
    fingerprint_md5,
    quality_scores,
    token_count_array,
    unique_token_ratio,
)


def with_token_counts(docs: Dataset, text_col: str = "text") -> Dataset:
    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column("n_tokens", token_count_array(batch[text_col]))

    return docs.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def with_quality(docs: Dataset, text_col: str = "text") -> Dataset:
    """quality score + unique-token ratio, rounded for oracle comparison."""

    def add(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        batch = batch.append_column(
            "uniq_ratio", pa.array(sql_round(unique_token_ratio(texts), 6), pa.float64())
        )
        return batch.append_column("quality", pa.array(quality_scores(texts), pa.float64()))

    return docs.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def with_ocr_confidence(docs: Dataset, text_col: str = "text") -> Dataset:
    """Reference M12: per-row heuristic OCR confidence
    (printable*0.40 + word-length*0.30 + stopword*0.30,
    src/epstein_pipeline/processors/ocr.py:80-118), exact formula in
    functions.textstats.heuristic_confidence."""
    from epstein_pipeline_ray.functions.textstats import heuristic_confidence

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "ocr_confidence",
            pa.array(heuristic_confidence(batch[text_col].to_pylist()), pa.float64()),
        )

    return docs.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def with_lang_guess(docs: Dataset, text_col: str = "text") -> Dataset:
    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "lang_guess", pa.array(detect_lang(batch[text_col].to_pylist()), pa.string())
        )

    return docs.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def with_fingerprint(docs: Dataset, text_col: str = "text") -> Dataset:
    """md5-of-normalized-text fingerprint (SQL-verifiable twin of the
    SHA-256 content hash; reference M2, utils/hashing.py:17-20)."""

    def add(batch: pa.Table) -> pa.Table:
        norm = normalize_array(batch[text_col])
        return batch.append_column("fingerprint", fingerprint_md5(norm))

    return docs.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def term_links(docs: Dataset, terms: list[str], id_col: str = "doc_id",
               text_col: str = "text") -> Dataset:
    """Broadcast substring semi-join: (doc, term) for every term contained
    in the doc text — the reference's person-linking pattern
    (src/epstein_pipeline/processors/person_linker.py:35-60) with the
    small side shipped once via ``ray.put`` and matched vectorized."""
    import pyarrow.compute as pc

    terms_ref = ray.put(sorted(terms))

    def link(batch: pa.Table) -> pa.Table:
        term_list = ray.get(terms_ref)
        ids, out_terms = [], []
        id_arr = batch[id_col]
        for term in term_list:
            mask = pc.match_substring(batch[text_col], term)
            hit_ids = id_arr.filter(mask).to_pylist()
            ids.extend(hit_ids)
            out_terms.extend([term] * len(hit_ids))
        return pa.table({id_col: pa.array(ids, id_arr.type), "term": pa.array(out_terms, pa.string())})

    return docs.map_batches(link, batch_format="pyarrow", zero_copy_batch=True)


def extract_entities(docs: Dataset, pattern: str, id_col: str = "doc_id",
                     text_col: str = "text") -> Dataset:
    """Regex entity extraction: one output row per (doc, match occurrence)
    — the reference's pattern-extractor family (src/epstein_pipeline/
    processors/entities.py:34-60 PHONE/EMAIL/BATES/... regexes). The
    pattern must contain no capture groups (use (?:...)) so occurrence
    multiplicity matches a plain scan."""
    import re

    compiled = re.compile(pattern)

    def extract(batch: pa.Table) -> pa.Table:
        ids, ents = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            for m in compiled.findall(t or ""):
                ids.append(i)
                ents.append(m)
        return pa.table({id_col: pa.array(ids, batch[id_col].type),
                         "entity": pa.array(ents, pa.string())})

    return docs.select_columns([id_col, text_col]).map_batches(
        extract, batch_format="pyarrow", zero_copy_batch=True
    )


# The reference's 8 typed extractors (src/epstein_pipeline/processors/
# entities.py:34-60 plus the Bates format used by its integrity checker,
# validators/integrity.py). Patterns are kept RE2-compatible (no
# backreferences, no lookaround, inline (?i) instead of re.IGNORECASE) so
# the SAME literal strings run in DuckDB's regexp_extract_all for the
# oracle; only non-capturing groups so findall == full-match scan.
ENTITY_PATTERNS: dict[str, str] = {
    "PHONE": r"\b(?:\+?1[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}\b",
    "EMAIL_ADDR": r"\b[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}\b",
    "ACCOUNT": r"(?i)\b(?:account|acct|a/c)[\s#:]*\d{4,}\b",
    "ADDRESS": (
        r"\b\d{1,5}\s+(?:[A-Z][a-z]+\s+){1,3}"
        r"(?:Street|St|Avenue|Ave|Road|Rd|Boulevard|Blvd|Drive|Dr|Lane|Ln|Court|Ct|Place|Pl)\b"
    ),
    "CASE_NUMBER": r"(?i)\b(?:Case|No\.|Docket|Cause)\s*(?:#|No\.?)?\s*\d[\d\-A-Z:/ ]{3,20}\b",
    "FLIGHT_ID": r"(?i)\b(?:N\d{1,5}[A-Z]{1,2}|(?:Flight|Flt)\s*#?\s*\d{1,6})\b",
    "FINANCIAL_AMOUNT": (
        r"(?i)\$\s?\d{1,3}(?:,\d{3})*(?:\.\d{2})?\b"
        r"|\b\d{1,3}(?:,\d{3})*(?:\.\d{2})?\s*(?:dollars?|USD)\b"
    ),
    "BATES": r"\b[A-Z]{2,8}\d{5,10}\b",
}


def extract_entities_typed(docs: Dataset, id_col: str = "doc_id",
                           text_col: str = "text",
                           patterns: dict[str, str] | None = None) -> Dataset:
    """The reference's full typed-extractor pass (entities.py:34-60
    REGEX_EXTRACTORS): each pattern scanned independently over every doc —
    a value matched by two types is emitted under both, exactly like the
    reference's per-pattern findall loop. One output row per
    (doc, entity_type, match occurrence), schema
    (id, entity_type:string, value:string).

    Stateless Arrow ``map_batches``; the per-row cost is the C regex scan
    (8 compiled patterns), no per-match Python beyond list appends — the
    same shape the reference runs per document, here batch-parallel."""
    import re

    pats = patterns or ENTITY_PATTERNS
    compiled = [(name, re.compile(p)) for name, p in sorted(pats.items())]

    def extract(batch: pa.Table) -> pa.Table:
        ids, types, values = [], [], []
        id_list = batch[id_col].to_pylist()
        for i, t in zip(id_list, batch[text_col].to_pylist()):
            if not t:
                continue
            for name, rx in compiled:
                for m in rx.findall(t):
                    ids.append(i)
                    types.append(name)
                    values.append(m)
        return pa.table({
            id_col: pa.array(ids, batch[id_col].type),
            "entity_type": pa.array(types, pa.string()),
            "value": pa.array(values, pa.string()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        extract, batch_format="pyarrow", zero_copy_batch=True
    )


def term_cooccur(docs: Dataset, terms: list[str], id_col: str = "doc_id",
                 text_col: str = "text") -> Dataset:
    """Knowledge-graph edge aggregation: for every unordered pair of terms
    co-occurring in one doc, weight = number of such docs (reference:
    src/epstein_pipeline/processors/knowledge_graph.py:102-123 Counter
    over (src,dst) pairs → here flat_map pair emission + groupby sum).
    The per-batch partial is a dense boolean doc×term matrix (terms are a
    small broadcast side), pair counts accumulated per batch so the final
    shuffle carries at most |terms|^2/2 rows per batch."""
    import itertools

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    term_list = sorted(terms)
    terms_ref = ray.put(term_list)

    def pairs_partial(batch: pa.Table) -> pa.Table:
        tl = ray.get(terms_ref)
        hits = np.column_stack(
            [pc.match_substring(batch[text_col], t).to_numpy(zero_copy_only=False)
             for t in tl]
        )
        out_a, out_b, out_w = [], [], []
        for ia, ib in itertools.combinations(range(len(tl)), 2):
            w = int(np.sum(hits[:, ia] & hits[:, ib]))
            if w:
                out_a.append(tl[ia])
                out_b.append(tl[ib])
                out_w.append(w)
        return pa.table({"term_a": pa.array(out_a, pa.string()),
                         "term_b": pa.array(out_b, pa.string()),
                         "partial_w": pa.array(out_w, pa.int64())})

    partials = docs.select_columns([id_col, text_col]).map_batches(
        pairs_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = partials.groupby(["term_a", "term_b"]).aggregate(
        Sum("partial_w", alias_name="weight")
    )

    def to_int(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("weight")
        return batch.set_column(i, "weight", pc.cast(batch["weight"], pa.int64()))

    return out.map_batches(to_int, batch_format="pyarrow", zero_copy_batch=True)


def with_winnow_fingerprints(docs: Dataset, k: int = 8, window: int = 4,
                             id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """Winnowing fingerprints per doc (list<int64>) — the compact sketch
    used for substring-level duplicate detection at collection scale."""
    from epstein_pipeline_ray.functions.textstats import winnow_fingerprints

    def add(batch: pa.Table) -> pa.Table:
        norm = normalize_array(batch[text_col])
        fps = [winnow_fingerprints(t, k, window) for t in norm.to_pylist()]
        return pa.table(
            {
                id_col: batch[id_col],
                "fingerprints": pa.array(fps, pa.list_(pa.int64())),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        add, batch_format="pyarrow", zero_copy_batch=True
    )


def with_gopher_signals(docs: Dataset, text_col: str = "text") -> Dataset:
    """Gopher-rule quality signals + pass verdict (functions.textstats.
    gopher_signals) — the deterministic quality-filter battery a training
    -data pipeline runs before dedup. One vectorized Arrow pass per batch."""
    from epstein_pipeline_ray.functions.textstats import gopher_signals

    def add(batch: pa.Table) -> pa.Table:
        for name, arr in gopher_signals(batch[text_col]).items():
            batch = batch.append_column(name, arr)
        return batch

    return docs.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


# PII masking pass: patterns applied in this fixed order, each counted on
# the text as it stands BEFORE that pattern's replacement (an email whose
# local part looks like a phone number is masked once, as [EMAIL])
PII_SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    ("EMAIL_ADDR", ENTITY_PATTERNS["EMAIL_ADDR"], "[EMAIL]"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("PHONE", ENTITY_PATTERNS["PHONE"], "[PHONE]"),
]


def scrub_pii(docs: Dataset, text_col: str = "text",
              out_col: str = "scrubbed", count_col: str = "n_masked") -> Dataset:
    """Mask emails / SSNs / phone numbers (the text-side analog of the
    reference's redaction analysis, processors/redaction.py — its PDF
    region scan is codec-bound, the masking semantics are not). Pure
    Arrow RE2 kernels per batch (replace + count per pattern), patterns
    shared with the typed entity extractor so the DuckDB twin is exact."""

    def scrub(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        total = np.zeros(len(txt), dtype=np.int64)
        for _name, pat, mask in PII_SCRUB_PATTERNS:
            total += np.asarray(pc.count_substring_regex(txt, pattern=pat))
            txt = pc.replace_substring_regex(txt, pattern=pat, replacement=mask)
        batch = batch.append_column(out_col, txt)
        return batch.append_column(count_col, pa.array(total, pa.int64()))

    return docs.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


def with_self_repetition(docs: Dataset, window: int = 30,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> Dataset:
    """Looped-generation / self-repetition signal: per doc, the fraction
    of its ``window``-char sliding windows that are repeats of an
    earlier window in the SAME doc — rep_ratio = 1 - distinct/total
    (the character-window analog of Gopher's duplicate-line fraction,
    Rae 2021 §A1.1; on conversation rollups it flags transcripts whose
    model looped or re-emitted tool output). Docs shorter than
    ``window`` are dropped (no windows to judge). Embarrassingly
    parallel map_batches — no exchange; exact string windows so the
    DuckDB substr/count-distinct twin is an exact oracle.

    Output: (id, rep_ratio:float64 rounded 6).
    """
    from epstein_pipeline_ray.functions.rounding import sql_round

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        texts = batch[text_col].to_pylist()
        keep_idx: list[int] = []
        ratios: list[float] = []
        for i, t in enumerate(texts):
            t = t or ""
            n_win = len(t) - window + 1
            if n_win < 1:
                continue
            distinct = len({t[j:j + window] for j in range(n_win)})
            keep_idx.append(i)
            ratios.append(1.0 - distinct / n_win)
        return pa.table({
            id_col: ids.take(pa.array(keep_idx, pa.int64())),
            "rep_ratio": pa.array(sql_round(np.asarray(ratios, np.float64), 6),
                                  pa.float64()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True)


# Fixed stand-in weights for the reference's ML quality classifier
# (SURVEY A5 — no models ship in this container): a deterministic logistic
# layer over the Gopher signal battery. The SQL twin is built from THIS
# dict (__ray_entry__), so engine and oracle can never drift.
QUALITY_LOGIT_WEIGHTS: dict[str, float] = {
    "frac_alpha_words": 2.5,
    "stop_word_hits": 0.5,
    "symbol_word_ratio": -6.0,
    "dup_line_frac": -2.0,
    "dup_2gram_frac": -1.5,
    "n_words_capped_milli": 2.0,   # 0.002 * min(n_words, 1000)
    "bias": -2.0,
}


def with_quality_logit(docs: Dataset, text_col: str = "text") -> Dataset:
    """Classifier-style quality score: sigmoid of a fixed linear layer
    over the (rounded) Gopher signals — the scoring machinery of a
    fasttext/logistic quality filter with deterministic weights
    (QUALITY_LOGIT_WEIGHTS). Computing on the ROUNDED signals keeps the
    engine and the SQL twin bit-aligned. Output: signals +
    quality_score:float64 rounded 6."""
    w = QUALITY_LOGIT_WEIGHTS

    def add(batch: pa.Table) -> pa.Table:
        g = {name: np.asarray(batch[name].to_numpy(zero_copy_only=False),
                              np.float64)
             for name in ("frac_alpha_words", "stop_word_hits",
                          "symbol_word_ratio", "dup_line_frac",
                          "dup_2gram_frac", "n_words")}
        logit = (w["frac_alpha_words"] * g["frac_alpha_words"]
                 + w["stop_word_hits"] * g["stop_word_hits"]
                 + w["symbol_word_ratio"] * g["symbol_word_ratio"]
                 + w["dup_line_frac"] * g["dup_line_frac"]
                 + w["dup_2gram_frac"] * g["dup_2gram_frac"]
                 + w["n_words_capped_milli"] / 1000.0
                   * np.minimum(g["n_words"], 1000.0)
                 + w["bias"])
        score = 1.0 / (1.0 + np.exp(-logit))
        return batch.append_column(
            "quality_score", pa.array(sql_round(score, 6), pa.float64()))

    return with_gopher_signals(docs, text_col=text_col).map_batches(
        add, batch_format="pyarrow", zero_copy_batch=True)


def with_char_entropy(docs: Dataset, id_col: str = "doc_id",
                      text_col: str = "text") -> Dataset:
    """Shannon entropy of each doc's character distribution (nats) — the
    classic garbled-text / binary-junk detector (low entropy = repeated
    filler, high ≈ ln(alphabet) = random bytes; a standard companion to
    the Gopher battery). Vectorized: one bincount over the UTF-8 bytes
    per doc (exact for the ASCII corpus; the SQL twin groups by
    character, identical on ASCII). Empty docs are dropped.

    Output: (id, char_entropy:float64 rounded 6).
    """
    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        texts = batch[text_col].to_pylist()
        keep: list[int] = []
        ent: list[float] = []
        for i, t in enumerate(texts):
            if not t:
                continue
            counts = np.bincount(np.frombuffer(t.encode("utf-8"), np.uint8))
            counts = counts[counts > 0].astype(np.float64)
            p = counts / counts.sum()
            keep.append(i)
            ent.append(float(-(p * np.log(p)).sum()))
        return pa.table({
            id_col: ids.take(pa.array(keep, pa.int64())),
            "char_entropy": pa.array(
                sql_round(np.asarray(ent, np.float64), 6), pa.float64()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True)


def head_tail_truncate(
    docs: Dataset,
    head_words: int = 40,
    tail_words: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    marker: str = " [...] ",
) -> Dataset:
    """Middle truncation for long documents: keep the first
    ``head_words`` and last ``tail_words`` words joined by ``marker``
    (the head+tail policy for fitting long documents into a context
    window while preserving both the opening and the conclusion —
    the long-doc alternative to hard truncation `text[:N]`). Documents
    at or under the combined budget pass through unchanged. Stateless
    vectorized-per-doc map; every rule is an array slice, so the
    DuckDB twin rebuilds it exactly.

    Output: (id, text, was_truncated:bool, n_words:int64)."""

    def apply(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        out_text: list[str] = []
        out_flag: list[bool] = []
        out_n: list[int] = []
        for t in batch[text_col].to_pylist():
            words = (t or "").split(" ") if (t or "") else []
            n = len(words)
            if n > head_words + tail_words:
                out_text.append(" ".join(words[:head_words]) + marker
                                + " ".join(words[n - tail_words:]))
                out_flag.append(True)
            else:
                out_text.append(t or "")
                out_flag.append(False)
            out_n.append(n)
        return pa.table({
            id_col: ids,
            "text": pa.array(out_text, pa.large_string()),
            "was_truncated": pa.array(out_flag, pa.bool_()),
            "n_words": pa.array(out_n, pa.int64()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        apply, batch_format="pyarrow", zero_copy_batch=True)


def vocab_growth(docs: Dataset, id_col: str = "doc_id",
                 text_col: str = "text", bucket: int = 100,
                 mode: str = "tokens",
                 num_partitions: int | None = None) -> Dataset:
    """Vocabulary growth curve (the Heaps'-law diagnostic): distinct
    token count among the first N docs, for N at every ``bucket``
    boundary — each token contributes at its FIRST doc (min id), so a
    token-keyed min exchange + a buckets-bounded cumulative sum give
    the whole curve without re-scanning prefixes. Tokens follow the
    ranking.py convention (`[a-zA-Z0-9]+`, lowercased after
    extraction). Output: (prefix_docs, vocab_size) with
    ``prefix_docs = (bucket_idx + 1) * bucket`` — 'vocab among docs
    with id < prefix_docs'. Twin: min(doc_id) per token + a window
    cumsum over bucket counts."""
    import pandas as pd

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.ranking import WORD_RE

    assert mode in ("tokens", "content")
    F = pa.schema([("t", pa.string()), ("fd", pa.int64())])

    def first_partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        if mode == "content":
            texts = normalize_array(
                batch[text_col].combine_chunks()
                if isinstance(batch[text_col], pa.ChunkedArray)
                else batch[text_col]).to_pylist()
        else:
            texts = batch[text_col].to_pylist()
        best: dict[str, int] = {}
        for i, tx in zip(ids, texts):
            units = ([tx or ""] if mode == "content"
                     else (m.lower() for m in WORD_RE.findall(tx or "")))
            for w in units:
                if w not in best or i < best[w]:
                    best[w] = i
        if not best:
            return F.empty_table()
        items = sorted(best.items())
        return pa.table({
            "t": pa.array([k for k, _ in items], pa.string()),
            "fd": pa.array([v for _, v in items], pa.int64()),
        }, schema=F)

    def min_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return F.empty_table()
        g = pa.TableGroupBy(block, ["t"]).aggregate([("fd", "min")])
        return pa.table({"t": g["t"], "fd": g["fd_min"]}, schema=F)

    firsts = map_key_blocks(
        docs.select_columns([id_col, text_col]).map_batches(
            first_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["t"], min_block, num_partitions, sort_blocks=False)

    B = pa.schema([("bucket", pa.int64()), ("c", pa.int64())])

    def bucket_rows(batch: pa.Table) -> pa.Table:
        fd = np.asarray(batch["fd"].to_numpy(zero_copy_only=False),
                        np.int64)
        u, c = np.unique(fd // bucket, return_counts=True)
        return pa.table({"bucket": pa.array(u, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())},
                        schema=B)

    import ray
    import ray.data as rd

    tabs = [t for t in ray.get(
        firsts.map_batches(bucket_rows, batch_format="pyarrow",
                           zero_copy_batch=True).to_arrow_refs())
        if t.num_rows]
    if tabs:
        df = (pa.concat_tables(tabs).to_pandas()
              .groupby("bucket", sort=True)["c"].sum().reset_index())
    else:
        df = pd.DataFrame({"bucket": [], "c": []})
    # buckets-bounded (corpus_size / bucket rows) driver cumsum
    return rd.from_arrow(pa.table({
        "prefix_docs": pa.array(
            ((df["bucket"].to_numpy(np.int64) + 1) * bucket)
            if len(df) else np.array([], np.int64), pa.int64()),
        "vocab_size": pa.array(
            df["c"].cumsum().to_numpy(np.int64)
            if len(df) else np.array([], np.int64), pa.int64()),
    }))


def with_compression_ratio(docs: Dataset, id_col: str = "doc_id",
                           text_col: str = "text",
                           round_digits: int = 6) -> Dataset:
    """Per-doc zlib compression ratio ``compressed_len / raw_len``
    (level 6, UTF-8 bytes) — the classic cheap repetition/boilerplate
    proxy (low ratio = highly repetitive; used as a quality signal in
    RefinedWeb/Dolma-style curation). Deterministic (zlib output is
    fixed for a given level) but NOT SQL-expressible — rows-only at the
    gate; behavior pinned by unit tests. Empty docs get ratio 0.
    Stateless Arrow map_batches; the per-row cost is C zlib."""
    import zlib

    from epstein_pipeline_ray.functions.rounding import sql_round

    def add(batch: pa.Table) -> pa.Table:
        ratios = []
        for tx in batch[text_col].to_pylist():
            raw = (tx or "").encode("utf-8")
            if not raw:
                ratios.append(0.0)
                continue
            ratios.append(len(zlib.compress(raw, 6)) / len(raw))
        return pa.table({
            id_col: batch[id_col],
            "n_bytes": pa.array(
                [len((t or "").encode("utf-8"))
                 for t in batch[text_col].to_pylist()], pa.int64()),
            "compression_ratio": pa.array(
                sql_round(np.asarray(ratios, np.float64), round_digits),
                pa.float64()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        add, batch_format="pyarrow", zero_copy_batch=True)


def tokenizer_fertility(docs: Dataset, group_col: str = "lang",
                        text_col: str = "text",
                        round_digits: int = 9) -> Dataset:
    """Tokenizer fertility per group: UTF-8 ``bytes_per_token`` (and the
    raw byte/token sums) — the per-language diagnostic that decides
    token budgets and flags scripts a whitespace-ish tokenizer serves
    badly (CJK shows up immediately). Decomposable (bytes, tokens)
    partials with the token_counts★ whitespace convention
    (functions.textstats.token_count_array); one keyed exchange.
    Output: (group_col, n_docs, n_bytes, n_tokens, bytes_per_token);
    groups with zero tokens emit NULL ratio."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    gtype = dict(zip(docs.schema().names, docs.schema().types))[group_col]
    PART = pa.schema([(group_col, gtype), ("d", pa.int64()),
                      ("b", pa.int64()), ("t", pa.int64())])
    OUT = pa.schema([(group_col, gtype), ("n_docs", pa.int64()),
                     ("n_bytes", pa.int64()), ("n_tokens", pa.int64()),
                     ("bytes_per_token", pa.float64())])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        toks = np.asarray(token_count_array(batch[text_col])
                          .to_numpy(zero_copy_only=False), np.int64)
        byts = np.asarray(
            [len((t or "").encode("utf-8"))
             for t in batch[text_col].to_pylist()], np.int64)
        df = pd.DataFrame({"g": batch[group_col].to_pandas(),
                           "b": byts, "t": toks})
        g = df.groupby("g", sort=False).agg(
            d=("b", "size"), b=("b", "sum"), t=("t", "sum")).reset_index()
        return pa.table({
            group_col: pa.array(g["g"], gtype, from_pandas=True),
            "d": pa.array(g["d"].to_numpy(np.int64), pa.int64()),
            "b": pa.array(g["b"].to_numpy(np.int64), pa.int64()),
            "t": pa.array(g["t"].to_numpy(np.int64), pa.int64()),
        }, schema=PART)

    def reduce_block(block: pa.Table) -> pa.Table:
        import pandas as pd

        if block.num_rows == 0:
            return OUT.empty_table()
        g = (block.to_pandas().groupby(group_col, sort=True,
                                       as_index=False)[["d", "b", "t"]]
             .sum())
        b = g["b"].to_numpy(np.float64)
        t = g["t"].to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(t > 0, b / t, np.nan)
        return pa.table({
            group_col: pa.array(g[group_col], gtype, from_pandas=True),
            "n_docs": pa.array(g["d"].to_numpy(np.int64), pa.int64()),
            "n_bytes": pa.array(g["b"].to_numpy(np.int64), pa.int64()),
            "n_tokens": pa.array(g["t"].to_numpy(np.int64), pa.int64()),
            "bytes_per_token": pa.array(sql_round(r, round_digits),
                                        pa.float64(), from_pandas=True),
        }, schema=OUT)

    return map_key_blocks(
        docs.select_columns([group_col, text_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        [group_col], reduce_block, None, sort_blocks=False)


def with_readability(docs: Dataset, id_col: str = "doc_id",
                     text_col: str = "text",
                     round_digits: int = 9) -> Dataset:
    """Flesch–Kincaid grade level per document (Kincaid 1975) — the
    classic curriculum / quality-mix signal a training-data pipeline
    bins its corpus by. Conventions (shared verbatim with the SQL
    twin so the gate is hash-exact):

      words     = whitespace tokens of trimmed text (token_counts★)
      sentences = maximal ``[.!?]+`` runs, clamped to >= 1
      syllables = maximal ``[aeiouy]+`` runs in lower(text) — the
                  standard vowel-group heuristic, counted corpus-wide
                  rather than clamped per word so both engines need
                  only one regex pass
      fk_grade  = round(0.39*(words/sentences)
                        + 11.8*(syllables/words) - 15.59, 9)

    Zero-word docs are dropped (the ratio is undefined). Stateless
    Arrow map — three vectorized regex kernels per batch, no shuffle;
    trivially map-parallel at any scale.
    """
    def per_batch(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        w = np.asarray(token_count_array(texts).to_numpy(zero_copy_only=False),
                       np.int64)
        s = np.asarray(
            pc.count_substring_regex(texts, pattern=r"[.!?]+")
            .cast(pa.int64()).to_numpy(zero_copy_only=False), np.int64)
        syl = np.asarray(
            pc.count_substring_regex(pc.utf8_lower(texts),
                                     pattern=r"[aeiouy]+")
            .cast(pa.int64()).to_numpy(zero_copy_only=False), np.int64)
        s = np.maximum(s, 1)
        keep = w > 0
        wf = w[keep].astype(np.float64)
        sf = s[keep].astype(np.float64)
        yf = syl[keep].astype(np.float64)
        grade = 0.39 * (wf / sf) + 11.8 * (yf / wf) - 15.59
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table({
            id_col: batch[id_col].take(idx),
            "n_words": pa.array(w[keep], pa.int64()),
            "n_sentences": pa.array(s[keep], pa.int64()),
            "n_syllables": pa.array(syl[keep], pa.int64()),
            "fk_grade": pa.array(sql_round(grade, round_digits),
                                 pa.float64()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True)


def zipf_slope(docs: Dataset, group_col: str = "source",
               text_col: str = "text", round_digits: int = 6,
               num_partitions: int | None = None) -> Dataset:
    """Zipf rank–frequency slope per group: OLS of ln(term count) on
    ln(rank) over the group's vocabulary — natural text tracks ~-1;
    boilerplate/generated text flattens or steepens it (a corpus-mix
    fingerprint). Token convention is tfidf's (``[a-zA-Z0-9]+``,
    lowered); rank = row_number by (count DESC, term ASC).

    Two keyed exchanges: (group, term) count partials (map-side
    collapsed), then a group-keyed exchange where ranks and the
    OLS closed form are vectorized per block. Counts are exact ints;
    the ln() moments are float but rounded at 6, far above the
    ~1e-13 accumulation-order noise (the geomean convention).
    Output: (group, vocab, zipf_slope)."""
    import re as _re

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    gtype = dict(zip(docs.schema().names, docs.schema().types))[group_col]
    CNT = pa.schema([(group_col, gtype), ("term", pa.string()),
                     ("c", pa.int64())])
    word_re = _re.compile(r"[a-zA-Z0-9]+")

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        groups: list = []
        terms: list[str] = []
        for g, t in zip(batch[group_col].to_pylist(),
                        batch[text_col].to_pylist()):
            for w in word_re.findall(t or ""):
                groups.append(g)
                terms.append(w.lower())
        df = (pd.DataFrame({"g": groups, "term": terms})
              .groupby(["g", "term"], sort=False).size().rename("c")
              .reset_index())
        return pa.table({
            group_col: pa.array(df["g"], gtype, from_pandas=True),
            "term": pa.array(df["term"], pa.string()),
            "c": pa.array(df["c"].to_numpy(np.int64), pa.int64()),
        }, schema=CNT)

    def sum_block(block: pa.Table) -> pa.Table:
        import pandas as pd

        if block.num_rows == 0:
            return CNT.empty_table()
        g = (block.to_pandas()
             .groupby([group_col, "term"], sort=False, as_index=False)["c"]
             .sum())
        return pa.table({
            group_col: pa.array(g[group_col], gtype, from_pandas=True),
            "term": pa.array(g["term"], pa.string()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }, schema=CNT)

    counts = map_key_blocks(
        docs.select_columns([group_col, text_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, "term"], sum_block, num_partitions, sort_blocks=False)

    OUT = pa.schema([(group_col, gtype), ("vocab", pa.int64()),
                     ("zipf_slope", pa.float64())])

    def fit_block(block: pa.Table) -> pa.Table:
        import pandas as pd

        if block.num_rows == 0:
            return OUT.empty_table()
        df = (block.to_pandas()
              .sort_values([group_col, "c", "term"],
                           ascending=[True, False, True], kind="mergesort")
              .reset_index(drop=True))
        kv = df[group_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]])
        ends = np.r_[starts[1:], len(df)]
        rank = np.arange(len(df), dtype=np.int64) \
            - np.repeat(starts, ends - starts) + 1
        x = np.log(rank.astype(np.float64))
        y = np.log(df["c"].to_numpy(np.float64))
        cx, cy = np.cumsum(x), np.cumsum(y)
        cxy, cxx = np.cumsum(x * y), np.cumsum(x * x)
        def seg(c):
            return c[ends - 1] - np.where(starts > 0, c[starts - 1], 0.0)
        n = (ends - starts).astype(np.float64)
        sx, sy, sxy, sxx = seg(cx), seg(cy), seg(cxy), seg(cxx)
        den = n * sxx - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(den != 0, (n * sxy - sx * sy) / den, np.nan)
        return pa.table({
            group_col: pa.array(df[group_col].iloc[starts], gtype,
                                from_pandas=True),
            "vocab": pa.array(n.astype(np.int64), pa.int64()),
            "zipf_slope": pa.array(sql_round(slope, round_digits),
                                   pa.float64(), from_pandas=True),
        }, schema=OUT)

    return map_key_blocks(counts, [group_col], fit_block, num_partitions,
                          sort_blocks=False)


def soundex_block_stats(ds: Dataset, name_col: str,
                        num_partitions: int | None = None) -> Dataset:
    """Phonetic blocking diagnostic (the ER blocking-key histogram):
    simplified Soundex of the FIRST word of ``name_col``, then per-code
    member + distinct-word counts in one keyed exchange of
    (code, word) -> count partials. The code is the blocking key a
    Splink-style linkage would group on; this reports block sizes (the
    n^2 cost driver) before anyone pays them. Output:
    (soundex, n_rows, n_words)."""
    import re as _re

    import pandas as pd

    from epstein_pipeline_ray.functions.fuzzy import soundex4
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    first_re = _re.compile(r"^[a-zA-Z]+")
    PART = pa.schema([("soundex", pa.string()), ("word", pa.string()),
                      ("c", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        codes: list[str] = []
        words: list[str] = []
        for nm in batch[name_col].to_pylist():
            m = first_re.match(nm or "")
            w = m.group(0).lower() if m else ""
            words.append(w)
            codes.append(soundex4(w))
        df = (pd.DataFrame({"soundex": codes, "word": words})
              .groupby(["soundex", "word"], sort=False).size().rename("c")
              .reset_index())
        return pa.table({
            "soundex": pa.array(df["soundex"], pa.string()),
            "word": pa.array(df["word"], pa.string()),
            "c": pa.array(df["c"].to_numpy(np.int64), pa.int64()),
        }, schema=PART)

    OUT = pa.schema([("soundex", pa.string()), ("n_rows", pa.int64()),
                     ("n_words", pa.int64())])

    def per_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        g = (block.to_pandas().groupby("soundex", sort=True)
             .agg(n_rows=("c", "sum"), n_words=("word", "nunique"))
             .reset_index())
        return pa.table({
            "soundex": pa.array(g["soundex"], pa.string()),
            "n_rows": pa.array(g["n_rows"].to_numpy(np.int64), pa.int64()),
            "n_words": pa.array(g["n_words"].to_numpy(np.int64),
                                pa.int64()),
        }, schema=OUT)

    partials = ds.select_columns([name_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return map_key_blocks(partials, ["soundex"], per_block, num_partitions,
                          sort_blocks=False)


def distinctive_terms(docs: Dataset, group_col: str = "source",
                      text_col: str = "text", min_count: int = 5,
                      k: int = 10, round_digits: int = 9,
                      num_partitions: int | None = None) -> Dataset:
    """Distinctive terms per group — the "what characterizes this
    source" curation report: PMI-style lift of each term's in-group
    rate over its corpus rate,

        score = ln( (c_gt / C_g) / (c_t / C) )

    over tfidf-convention tokens with ``c_gt >= min_count``, top-``k``
    per group by (rounded score DESC, term ASC). Exchanges: (group,
    term) count partials; a term-keyed exchange attaching each term's
    corpus count (all rows of a term co-locate); a size-switched
    attach of the group totals (groups are bounded); one scalar grand
    total; then the existing map-side-pruned topk_per_group. All counts
    are exact integers; the single ln expression is shared verbatim.
    Output: (group, term, n, score)."""
    import pandas as pd

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column
    from epstein_pipeline_ray.stages.relational import (
        grouped_stats,
        topk_per_group,
    )

    gtype = dict(zip(docs.schema().names, docs.schema().types))[group_col]
    # (group, term) counts — the zipf_slope partial conventions inline
    import re as _re
    word_re = _re.compile(r"[a-zA-Z0-9]+")
    CNT = pa.schema([(group_col, gtype), ("term", pa.string()),
                     ("c", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        groups: list = []
        terms: list[str] = []
        for g, t in zip(batch[group_col].to_pylist(),
                        batch[text_col].to_pylist()):
            for w in word_re.findall(t or ""):
                groups.append(g)
                terms.append(w.lower())
        df = (pd.DataFrame({"g": groups, "term": terms})
              .groupby(["g", "term"], sort=False).size().rename("c")
              .reset_index())
        return pa.table({
            group_col: pa.array(df["g"], gtype, from_pandas=True),
            "term": pa.array(df["term"], pa.string()),
            "c": pa.array(df["c"].to_numpy(np.int64), pa.int64()),
        }, schema=CNT)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return CNT.empty_table()
        g = (block.to_pandas()
             .groupby([group_col, "term"], sort=False, as_index=False)["c"]
             .sum())
        return pa.table({
            group_col: pa.array(g[group_col], gtype, from_pandas=True),
            "term": pa.array(g["term"], pa.string()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }, schema=CNT)

    gt = map_key_blocks(
        docs.select_columns([group_col, text_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, "term"], sum_block, num_partitions, sort_blocks=False)

    WITH_CT = pa.schema(list(CNT) + [("ct", pa.int64())])

    def attach_term_total(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return WITH_CT.empty_table()
        df = block.to_pandas()
        df["ct"] = df.groupby("term")["c"].transform("sum")
        return pa.table({
            group_col: pa.array(df[group_col], gtype, from_pandas=True),
            "term": pa.array(df["term"], pa.string()),
            "c": pa.array(df["c"].to_numpy(np.int64), pa.int64()),
            "ct": pa.array(df["ct"].to_numpy(np.int64), pa.int64()),
        }, schema=WITH_CT)

    with_ct = map_key_blocks(gt, ["term"], attach_term_total,
                             num_partitions, sort_blocks=False)
    # group totals (bounded) + grand total
    gtot = grouped_stats(gt, [group_col], sum_cols=["c"])
    grand = int(gt.sum("c") or 0)
    tagged = attach_column(with_ct, gtot, group_col, group_col,
                           "sum_c", "cg", num_partitions=num_partitions)

    OUT = pa.schema([(group_col, gtype), ("term", pa.string()),
                     ("n", pa.int64()), ("score", pa.float64())])

    def score_batch(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["c"].to_numpy(zero_copy_only=False), np.int64)
        keep = c >= min_count
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        c = c[keep].astype(np.float64)
        ct = np.asarray(batch["ct"].to_numpy(zero_copy_only=False),
                        np.int64)[keep].astype(np.float64)
        cg = np.asarray(batch["cg"].to_numpy(zero_copy_only=False),
                        np.float64)[keep]
        score = np.log((c / cg) / (ct / grand))
        return pa.table({
            group_col: batch[group_col].take(idx),
            "term": batch["term"].take(idx),
            "n": pa.array(c.astype(np.int64), pa.int64()),
            "score": pa.array(sql_round(score, round_digits),
                              pa.float64()),
        }, schema=OUT)

    scored = tagged.map_batches(score_batch, batch_format="pyarrow",
                                zero_copy_batch=True)
    return topk_per_group(scored, group_col, "score", k, "term",
                          num_partitions=num_partitions)


def kwic_snippets(docs: Dataset, term: str, width: int = 40,
                  id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """Keyword-in-context concordance: for each document containing
    ``term`` (case-sensitive, first occurrence), the 0-based match
    position and a ±``width``-character snippet — the human-review
    sampling view every curation report links to. Vectorized substring
    scan (pc.find_substring) picks the matching rows; only those rows
    pay the per-row slice. Character (code-point) positions on both
    engines, so CJK documents agree with SQL instr/substr."""
    import pyarrow.compute as pc

    def extract(batch: pa.Table) -> pa.Table:
        pos = pc.find_substring(batch[text_col], pattern=term)
        mask = pc.greater_equal(pos, 0)
        hit = batch.filter(mask)
        if hit.num_rows == 0:
            return pa.table({
                id_col: pa.array([], batch[id_col].type),
                "pos": pa.array([], pa.int64()),
                "snippet": pa.array([], pa.string()),
            })
        texts = hit[text_col].to_pylist()
        # find_substring reports BYTE offsets on utf8 arrays; recompute
        # code-point positions Python-side for the matched rows only so
        # the twin's instr()/substr() character arithmetic agrees
        out_pos, out_snip = [], []
        for t in texts:
            p = t.find(term)
            start = max(0, p - width)
            out_snip.append(t[start:p + len(term) + width])
            out_pos.append(p)
        return pa.table({
            id_col: hit[id_col],
            "pos": pa.array(out_pos, pa.int64()),
            "snippet": pa.array(out_snip, pa.string()),
        })

    return docs.map_batches(extract, batch_format="pyarrow",
                            zero_copy_batch=True)


def truncation_audit(docs: Dataset, group_col: str = "source",
                     text_col: str = "text",
                     round_digits: int = 6) -> Dataset:
    """Mid-sentence truncation screen per source: share of documents
    whose text does NOT end in terminal punctuation (the C4 line rule
    applied at document granularity) — a high share marks a source
    whose extractor clips documents. One count exchange; the RE2 tail
    pattern is shared verbatim with the twin. Output:
    (source, n, n_truncated, truncated_pct)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from epstein_pipeline_ray.functions.rounding import sql_round

    def partial(batch: pa.Table) -> pa.Table:
        ok = pc.match_substring_regex(batch[text_col],
                                      pattern=r'[.!?"]\s*$')
        trunc = pc.invert(pc.fill_null(ok, False))
        t = pa.table({group_col: batch[group_col],
                      "__t": trunc.cast(pa.int64())})
        g = pa.TableGroupBy(t, [group_col]).aggregate(
            [("__t", "sum"), ([], "count_all")])
        return pa.table({group_col: g[group_col],
                         "__t": g["__t_sum"], "__n": g["count_all"]})

    agg = docs.select_columns([group_col, text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(group_col).aggregate(
        Sum("__t", alias_name="n_truncated"), Sum("__n", alias_name="n"))

    def finalize(batch: pa.Table) -> pa.Table:
        tr = np.asarray(batch["n_truncated"].to_numpy(zero_copy_only=False),
                        np.float64)
        n = np.asarray(batch["n"].to_numpy(zero_copy_only=False), np.float64)
        return pa.table({
            group_col: batch[group_col], "n": batch["n"],
            "n_truncated": batch["n_truncated"],
            "truncated_pct": pa.array(sql_round(tr / n, round_digits),
                                      pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def bool_search(docs: Dataset, must: list[str], must_not: list[str],
                id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """Boolean retrieval (AND of ``must`` terms, NOT of ``must_not``)
    by raw substring containment — the filter form of the inverted
    index (phrase_positions is the ranked form). One vectorized
    match_substring pass per term, no exchange."""
    import pyarrow.compute as pc

    def filt(batch: pa.Table) -> pa.Table:
        mask = pa.array(np.ones(batch.num_rows, dtype=bool))
        for t in must:
            mask = pc.and_(mask, pc.fill_null(
                pc.match_substring(batch[text_col], pattern=t), False))
        for t in must_not:
            mask = pc.and_(mask, pc.invert(pc.fill_null(
                pc.match_substring(batch[text_col], pattern=t), False)))
        return batch.filter(mask).select([id_col])

    return docs.map_batches(filt, batch_format="pyarrow",
                            zero_copy_batch=True)
