"""Additional dedup operators: SimHash near-dup, word-set Jaccard near-dup,
and the reference's title-fuzzy + Bates-overlap passes.

These widen the dedup family beyond the flagship MinHash pipeline
(training-data-pipeline requirements): each follows the same dataflow
shape — vectorized feature map → groupby shuffle on a blocking key →
bounded per-group verification.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from epstein_pipeline_ray.functions.fuzzy import ratio
from epstein_pipeline_ray.functions.minhash import shingle_hashes
from epstein_pipeline_ray.functions.normalize import normalize_array
from epstein_pipeline_ray.functions.simhash import hamming64, simhash64

_EMPTY_PAIR_DF = pd.DataFrame(
    {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
     "hamming": pd.Series(dtype="int64")}
)


def with_simhash(docs: Dataset, text_col: str = "text", k: int = 5) -> Dataset:
    """Append a 64-bit SimHash column (stored int64 via bit-cast for Arrow/
    Parquet friendliness)."""

    def add(batch: pa.Table) -> pa.Table:
        norm = normalize_array(batch[text_col]).to_pylist()
        sh = np.array([simhash64(shingle_hashes(t, k)) for t in norm], dtype=np.uint64)
        return batch.append_column("simhash", pa.array(sh.view(np.int64), pa.int64()))

    return docs.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def simhash_pairs(
    docs: Dataset, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """SimHash near-dup pairs: band the 64-bit fingerprint into 4x16-bit
    blocks (pigeonhole: hamming <= 3 guarantees one identical block),
    groupby (block_idx, block_value) for candidates, verify exact hamming.
    Same shuffle shape as the MinHash LSH stage."""
    sh_docs = with_simhash(docs.select_columns([id_col, text_col]), text_col)

    def explode(batch: pa.Table) -> pa.Table:
        sh = np.asarray(batch["simhash"].to_pylist(), dtype=np.int64).view(np.uint64)
        n = sh.shape[0]
        blocks = np.empty((n, 4), dtype=np.uint64)
        for i in range(4):
            blocks[:, i] = (sh >> np.uint64(16 * i)) & np.uint64(0xFFFF)
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), 4))
        block_idx = np.tile(np.arange(4, dtype=np.int64), n)
        key = block_idx.astype(np.uint64) << np.uint64(16) | blocks.reshape(-1)
        return pa.table(
            {
                id_col: batch[id_col].take(rep),
                "simhash": batch["simhash"].take(rep),
                "block_key": pa.array(key.view(np.int64), pa.int64()),
            }
        )

    band_rows = sh_docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(g: pa.Table) -> pd.DataFrame:
        n = g.num_rows
        if n < 2:
            return _EMPTY_PAIR_DF
        ids = np.asarray(g[id_col].to_pylist())
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        sh = np.asarray(g["simhash"].to_pylist(), dtype=np.int64).view(np.uint64)[order]
        iu, ju = np.triu_indices(n, k=1)
        ham = hamming64(sh[iu], sh[ju])
        keep = (ham <= max_hamming) & (ids[iu] != ids[ju])
        return pd.DataFrame(
            {"id_a": ids[iu[keep]], "id_b": ids[ju[keep]], "hamming": ham[keep].astype(np.int64)}
        )

    raw = band_rows.groupby("block_key").map_groups(bucket_pairs, batch_format="pyarrow")
    return raw.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def wordset_jaccard_pairs(
    docs: Dataset,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = "lang",
) -> Dataset:
    """n-gram (word unigram set) Jaccard near-dup pairs within blocks.

    SQL-expressible (DuckDB list_intersect/list_distinct) so it carries a
    full value oracle. Blocking on ``block_col`` bounds the quadratic
    comparison to one block (the documents table's lang column here); the
    unblocked variant at scale is exactly the MinHash flagship.
    """
    cols = [id_col, text_col] + ([block_col] if block_col else [])
    pruned = docs.select_columns(cols)

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(zip(g[id_col], g[text_col]))
        sets = [(i, set(str(t).lower().split())) for i, t in rows]
        out_a, out_b, out_j = [], [], []
        for (ia, sa), (ib, sb) in itertools.combinations(sets, 2):
            if not sa and not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                out_a.append(ia)
                out_b.append(ib)
                out_j.append(round(j, 6))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard": out_j})

    if block_col:
        return pruned.groupby(block_col).map_groups(per_block, batch_format="pandas")
    return pruned.repartition(1).map_batches(per_block, batch_format="pandas")


def title_fuzzy_pairs(docs: Dataset, threshold: float = 0.90,
                      id_col: str = "id", title_col: str = "title") -> Dataset:
    """Title-similarity pass: block by the title's first word, pairwise
    normalized-indel ratio >= threshold within the block
    (reference: src/epstein_pipeline/processors/dedup.py:296-324; the
    reference's blocking-then-fuzzy shape G2)."""

    def add_key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lowered = pc.utf8_lower(batch[title_col])
        first = pc.list_element(pc.split_pattern_regex(pc.utf8_trim_whitespace(lowered), r"\s+"), 0)
        return batch.append_column("block_key", first)

    keyed = docs.select_columns([id_col, title_col]).map_batches(
        add_key, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(zip(g[id_col], g[title_col]))
        out_a, out_b, out_s = [], [], []
        for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
            r = ratio(str(ta).lower(), str(tb).lower())
            if r >= threshold:
                out_a.append(ia)
                out_b.append(ib)
                out_s.append(round(r, 4))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "score": out_s})

    return keyed.groupby("block_key").map_groups(per_block, batch_format="pandas")


def bates_overlap_pairs(docs: Dataset, id_col: str = "id",
                        bates_col: str = "bates_range") -> Dataset:
    """Bates-range overlap pairs: parse → groupby(prefix) → per-group
    interval sweep (reference dedup.py:276-294 J3/M5/M6; the reference's
    O(n^2) scan becomes a per-prefix sorted sweep)."""
    from epstein_pipeline_ray.functions.bates import parse_bates_range

    def parse(batch: pa.Table) -> pa.Table:
        ids, prefixes, los, his = [], [], [], []
        for i, b in zip(batch[id_col].to_pylist(), batch[bates_col].to_pylist()):
            if not b:
                continue
            p = parse_bates_range(b)
            if p is None:
                continue
            ids.append(i)
            prefixes.append(p[0])
            los.append(p[1])
            his.append(p[2])
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "prefix": pa.array(prefixes, pa.string()),
                "lo": pa.array(los, pa.int64()),
                "hi": pa.array(his, pa.int64()),
            }
        )

    parsed = docs.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lo", id_col], kind="mergesort")
        ids = g[id_col].tolist()
        lo = g["lo"].tolist()
        hi = g["hi"].tolist()
        out_a, out_b = [], []
        active: list[int] = []  # indices with hi >= current lo
        for i in range(len(ids)):
            active = [j for j in active if hi[j] >= lo[i]]
            for j in active:
                a, b = sorted((ids[i], ids[j]))
                out_a.append(a)
                out_b.append(b)
            active.append(i)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b,
                             "score": [0.95] * len(out_a)})

    return parsed.groupby("prefix").map_groups(sweep, batch_format="pandas")
