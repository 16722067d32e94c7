"""Benchmark decontamination: flag training documents that share any
word n-gram with an evaluation/benchmark text set (the GPT-3 appendix-C /
Gopher A.3 procedure — the dedup engine's sibling op for keeping eval
data out of a 100-TB training corpus).

Ray shape: the benchmark n-gram hash set is the classic bounded
broadcast side — built INSIDE a Ray task from the benchmark dataset's
block refs (the driver only moves refs), shipped as one sorted uint64
array, probed per batch with vectorized ``np.searchsorted``. Each doc
batch computes its word n-gram hashes once; 64-bit hashing makes a
false flag ~(doc_ngrams x bench_ngrams)/2^64 — negligible, and the
DuckDB twin (string-equality join) agrees on real corpora.

Tokenization is the engine's normalize convention: lowercase,
whitespace runs collapsed, split on single spaces — identical to the
SQL twin's ``regexp_split_to_array(norm, ' ')``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from epstein_pipeline_ray.functions.normalize import normalize_array

DECONTAM_SCHEMA_FIELDS = [
    ("n_hits", pa.int64()),
    ("contaminated", pa.bool_()),
]


def _doc_ngram_hashes(norm_texts: list[str | None], n: int) -> list[np.ndarray]:
    """Per doc: uint64 hashes of its distinct word n-grams (joined with
    single spaces — the exact strings the SQL twin builds)."""
    out: list[np.ndarray] = []
    for t in norm_texts:
        if not t:
            out.append(np.empty(0, np.uint64))
            continue
        ws = t.split(" ")
        m = len(ws) - n + 1
        if m <= 0:
            out.append(np.empty(0, np.uint64))
            continue
        grams = np.array([" ".join(ws[i:i + n]) for i in range(m)], dtype=object)
        out.append(np.unique(pd.util.hash_array(grams, categorize=False)))
    return out


def decontaminate(
    docs: Dataset,
    bench: Dataset,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> Dataset:
    """→ one row per doc: (id_col, n_hits = count of DISTINCT shared
    n-grams, contaminated = n_hits > 0)."""
    refs = bench.select_columns([bench_text_col]).to_arrow_refs()

    @ray.remote
    def _build(*tables):
        live = [t for t in tables if t.num_rows]
        if not live:
            return np.empty(0, np.uint64)
        col = pa.concat_tables(live)[bench_text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        norm = normalize_array(col).to_pylist()
        hs = _doc_ngram_hashes(norm, n)
        allh = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        return np.unique(allh)

    bench_ref = _build.remote(*refs)

    def probe(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        norm = normalize_array(col).to_pylist()
        hs = _doc_ngram_hashes(norm, n)
        hits = np.zeros(len(hs), dtype=np.int64)
        if bset.size:
            for i, h in enumerate(hs):
                if h.size:
                    pos = np.searchsorted(bset, h)
                    pos = np.clip(pos, 0, bset.size - 1)
                    hits[i] = int(np.count_nonzero(bset[pos] == h))
        return pa.table({
            id_col: batch[id_col],
            "n_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array(hits > 0),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True)


def decontaminate_bloom(
    docs: Dataset,
    bench: Dataset,
    n: int = 8,
    fpr: float = 1e-6,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> Dataset:
    """Bloom-filter variant of :func:`decontaminate` for when even the
    deduplicated benchmark hash ARRAY is too big to broadcast: each
    benchmark block builds a fixed-size partial bloom in its own task,
    partials OR-merge (order-free), and docs probe the single bit
    array. GUARANTEE: no false negatives — every doc `decontaminate`
    flags is flagged here too (pytest-pinned containment). ``fpr`` is
    the PER-PROBE false-positive rate; a doc fires if ANY of its
    n-grams probes positive, so the doc-level false-flag rate is
    ~ fpr x n-grams-per-doc — the 1e-6 default keeps it ~1e-3 for
    kilotoken docs at ~29 bits/item of filter. Output:
    (id_col, contaminated_bloom:bool).
    """
    from epstein_pipeline_ray.functions.bloom import (
        bloom_build,
        bloom_merge,
        bloom_params,
        bloom_probe,
    )

    refs = bench.select_columns([bench_text_col]).to_arrow_refs()

    @ray.remote
    def _count(t) -> int:
        if not t.num_rows:
            return 0
        col = t[bench_text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        hs = _doc_ngram_hashes(normalize_array(col).to_pylist(), n)
        return int(sum(h.size for h in hs))

    n_items = sum(ray.get([_count.remote(r) for r in refs])) or 1
    m_bits, k = bloom_params(n_items, fpr)

    @ray.remote
    def _partial(t, m_bits: int, k: int):
        if not t.num_rows:
            return np.zeros(m_bits // 8, dtype=np.uint8)
        col = t[bench_text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        hs = _doc_ngram_hashes(normalize_array(col).to_pylist(), n)
        allh = (np.unique(np.concatenate(hs))
                if hs else np.empty(0, np.uint64))
        return bloom_build(allh, m_bits, k)

    parts = ray.get([_partial.remote(r, m_bits, k) for r in refs])
    bits_ref = ray.put(bloom_merge(parts) if parts
                       else np.zeros(m_bits // 8, dtype=np.uint8))

    def probe(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        hs = _doc_ngram_hashes(normalize_array(col).to_pylist(), n)
        flagged = np.zeros(len(hs), dtype=bool)
        for i, h in enumerate(hs):
            if h.size:
                flagged[i] = bool(bloom_probe(bits, h, k).any())
        return pa.table({
            id_col: batch[id_col],
            "contaminated_bloom": pa.array(flagged),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True)


def split_leakage(
    docs, n: int = 8, id_col: str = "doc_id", text_col: str = "text",
    val_pct: int = 20, round_digits: int = 9,
    num_partitions: int | None = None,
):
    """Train/val leakage audit: after the deterministic LCG split
    (relational.assign_split, test_pct=0), how many distinct word
    n-grams appear on BOTH sides — ``leakage = shared / val_grams`` is
    the fraction of validation n-grams the model has seen in train (the
    check every decontamination pass should END with). Map-side
    per-(gram, side) dedup -> one gram-keyed exchange with fixed-size
    per-block side-presence partials -> driver sum. Output: one row
    (n_train_grams, n_val_grams, n_shared, leakage)."""
    import numpy as np
    import pyarrow as pa

    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.ranking import WORD_RE
    from epstein_pipeline_ray.stages.relational import assign_split

    tagged = assign_split(docs.select_columns([id_col, text_col]),
                          id_col=id_col, val_pct=val_pct, test_pct=0)

    GS = pa.schema([("g", pa.string()), ("v", pa.int8())])

    def grams(batch: pa.Table) -> pa.Table:
        seen: set[tuple[str, int]] = set()
        for tx, sp in zip(batch[text_col].to_pylist(),
                          batch["split"].to_pylist()):
            toks = [m.lower() for m in WORD_RE.findall(tx or "")]
            side = 1 if sp == "val" else 0
            for i in range(len(toks) - n + 1):
                seen.add((" ".join(toks[i:i + n]), side))
        items = sorted(seen)
        return pa.table({
            "g": pa.array([k for k, _ in items], pa.string()),
            "v": pa.array([s for _, s in items], pa.int8()),
        }, schema=GS)

    PART = pa.schema([("t", pa.int64()), ("va", pa.int64()),
                      ("sh", pa.int64())])

    def side_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return PART.empty_table()
        df = block.to_pandas().drop_duplicates()
        g = df.groupby("g")["v"].agg(["min", "max"])
        has_t = (g["min"] == 0).to_numpy()
        has_v = (g["max"] == 1).to_numpy()
        return pa.table({
            "t": pa.array([int(has_t.sum())], pa.int64()),
            "va": pa.array([int(has_v.sum())], pa.int64()),
            "sh": pa.array([int((has_t & has_v).sum())], pa.int64()),
        }, schema=PART)

    import ray
    import ray.data as rd

    parts = map_key_blocks(
        tagged.map_batches(grams, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["g"], side_block, num_partitions, sort_blocks=False)
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    nt = sum(int(t["t"].to_pandas().sum()) for t in tabs)
    nv = sum(int(t["va"].to_pandas().sum()) for t in tabs)
    sh = sum(int(t["sh"].to_pandas().sum()) for t in tabs)
    leak = float(sql_round(np.array([sh / nv if nv else 0.0]),
                           round_digits)[0])
    return rd.from_arrow(pa.table({
        "n_train_grams": pa.array([nt], pa.int64()),
        "n_val_grams": pa.array([nv], pa.int64()),
        "n_shared": pa.array([sh], pa.int64()),
        "leakage": pa.array([leak], pa.float64()),
    }))
