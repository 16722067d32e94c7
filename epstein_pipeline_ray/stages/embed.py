"""Embedding-column operators: brute-force cosine ANN top-k and
embedding-cosine near-dup pairs.

Maps the reference's semantic-dedup pass (all-pairs ``np.dot(E, E.T)``
with threshold 0.95 on the driver,
reference: src/epstein_pipeline/processors/dedup.py:443-462) onto Ray:
the comparison side is broadcast once via ``ray.put`` (it is the small /
bounded side), and every batch computes its rows against it with one
numpy matmul — no shuffle, no driver-side O(n^2) loop.

Scale paths documented per operator: for corpora whose embedding matrix
cannot be broadcast, bucket by a coarse quantizer (LSH hyperplane signs /
IVF centroid id) and run the same matmul per bucket via groupby — the
partitioning assumption is that near neighbors share a bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from epstein_pipeline_ray.functions.rounding import sql_round


def _stack_embeddings(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def ann_topk(
    vectors: Dataset,
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k of each query against the vector Dataset.

    Per-batch partial top-k (vectorized matmul against the broadcast query
    matrix) → small global merge on the driver: only ``batches × q × k``
    candidate rows ever leave the workers. Self-matches (same id) excluded.
    Deterministic tie-break: higher cosine, then smaller vec_id.
    """
    qn = _normalize_rows(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        emb = _normalize_rows(_stack_embeddings(batch, emb_col))
        sims = emb @ q.T  # (n, q)
        ids = np.asarray(batch[id_col].to_pylist())
        kk = min(k + 1, sims.shape[0])  # +1 headroom for self-match removal
        top = np.argpartition(-sims, kth=kk - 1, axis=0)[:kk]  # (kk, q)
        rows_q, rows_id, rows_sim = [], [], []
        for qi in range(sims.shape[1]):
            sel = top[:, qi]
            rows_q.extend([qi] * len(sel))
            rows_id.extend(ids[sel].tolist())
            rows_sim.extend(sims[sel, qi].tolist())
        return pa.table(
            {
                "q_index": pa.array(rows_q, pa.int32()),
                id_col: pa.array(rows_id, batch[id_col].type),
                "cos": pa.array(rows_sim, pa.float64()),
            }
        )

    cand = vectors.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out_rows = []
    for qi, qid in enumerate(query_ids):
        sub = cand[(cand.q_index == qi) & (cand[id_col] != qid)]
        sub = sub.sort_values(["cos", id_col], ascending=[False, True], kind="mergesort").head(k)
        for r in sub.itertuples():
            out_rows.append((qid, getattr(r, id_col), round(r.cos, 6)))
    return pd.DataFrame(out_rows, columns=["query_id", "neighbor_id", "cos"])


def cosine_neardup_pairs(
    vectors: Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """All-pairs cosine >= threshold (semantic dedup, dedup.py:443-462).

    The full normalized matrix is broadcast once (small side — embeddings
    tables are far narrower than text); each batch matmuls its rows against
    it and emits (id_a < id_b) pairs. O(n^2) compute spread across the
    pool, O(n*d) memory per worker.
    """
    mat_tbl = vectors.select_columns([id_col, emb_col]).to_pandas()
    all_ids = np.asarray(mat_tbl[id_col].to_numpy())
    all_emb = _normalize_rows(
        np.stack([np.asarray(v, dtype=np.float64) for v in mat_tbl[emb_col]])
    )
    ref = ray.put((all_ids, all_emb))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, emb_all = ray.get(ref)
        emb = _normalize_rows(_stack_embeddings(batch, emb_col))
        ids = np.asarray(batch[id_col].to_pylist())
        sims = emb @ emb_all.T  # (n, N)
        ii, jj = np.nonzero(sims >= threshold)
        a = ids[ii]
        b = ids_all[jj]
        keep = a < b  # canonical order + drops self-matches
        return pa.table(
            {
                "id_a": pa.array(a[keep]),
                "id_b": pa.array(b[keep]),
                "cos": pa.array(sql_round(sims[ii, jj][keep], 6), pa.float64()),
            }
        )

    return vectors.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)


def lsh_neardup_pairs(
    vectors: Dataset,
    threshold: float = 0.9,
    bits: int = 8,
    tables: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_partitions: int | None = None,
) -> Dataset:
    """LSH-bucketed cosine near-dup — the scale path for corpora whose
    pairwise matrix is intractable (``cosine_neardup_pairs`` is the exact
    baseline).

    Random-hyperplane LSH (Charikar, STOC'02): per table, ``bits`` sign
    bits of projections form the bucket key; vectors sharing a bucket in
    ANY table become candidates (the same banding shape as the MinHash
    pass). Candidates are confirmed exactly — emitted pairs all satisfy
    cos >= threshold; the approximation is recall only:
    P(candidate) = 1-(1-p^bits)^tables with p = 1 - angle/pi.

    Partitioning assumption: one (table, bucket) group fits a block;
    confirm reads the normalized matrix via one ``ray.put`` broadcast
    (plasma-shared per node). Beyond broadcast size, carry the vector on
    the band row — same trade as the MinHash sig path.
    """
    import pyarrow.compute as pc  # noqa: F401  (parity with sibling ops)

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    mat_tbl = vectors.select_columns([id_col, emb_col]).to_pandas()
    mat_tbl = mat_tbl.sort_values(id_col, kind="mergesort").reset_index(drop=True)
    all_ids = np.asarray(mat_tbl[id_col].to_numpy())
    all_emb = _normalize_rows(
        np.stack([np.asarray(v, dtype=np.float64) for v in mat_tbl[emb_col]])
    )
    dim = all_emb.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, tables * bits))
    ref = ray.put((all_ids, all_emb, planes))
    id_type = pa.array(all_ids[:1]).type if len(all_ids) else pa.int64()

    def band_rows(batch: pa.Table) -> pa.Table:
        ids_g, _, H = ray.get(ref)
        emb = _normalize_rows(_stack_embeddings(batch, emb_col))
        signs = (emb @ H) > 0  # (n, tables*bits)
        n = emb.shape[0]
        weights = (1 << np.arange(bits, dtype=np.uint64))
        keys = (
            signs.reshape(n, tables, bits).astype(np.uint64) * weights[None, None, :]
        ).sum(axis=2)  # (n, tables)
        table_ids = np.arange(tables, dtype=np.uint64)
        buckets = keys + (table_ids[None, :] + 1) * np.uint64(0x9E3779B97F4A7C15)
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), tables))
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().take(rep)
                if isinstance(batch[id_col], pa.ChunkedArray)
                else batch[id_col].take(rep),
                "bucket": pa.array(buckets.reshape(-1), pa.uint64()),
            }
        )

    bands = vectors.select_columns([id_col, emb_col]).map_batches(
        band_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    out_schema = pa.schema([("id_a", id_type), ("id_b", id_type), ("cos", pa.float64())])

    def bucket_confirm(block: pa.Table) -> pa.Table:
        if block.num_rows < 2:
            return out_schema.empty_table()
        ids_g, emb_g, _ = ray.get(ref)
        buckets = np.asarray(block["bucket"].to_numpy(zero_copy_only=False))
        ids = np.asarray(block[id_col].to_pylist())
        pos = np.searchsorted(ids_g, ids)
        starts = np.concatenate([[0], np.nonzero(buckets[1:] != buckets[:-1])[0] + 1])
        lens = np.diff(np.concatenate([starts, [block.num_rows]]))
        pair_i, pair_j = [], []
        for length in np.unique(lens[lens >= 2]):
            s_l = starts[lens == length]
            iu, ju = np.triu_indices(int(length), k=1)
            pair_i.append((s_l[:, None] + iu[None, :]).ravel())
            pair_j.append((s_l[:, None] + ju[None, :]).ravel())
        if not pair_i:
            return out_schema.empty_table()
        I = np.concatenate(pair_i)
        J = np.concatenate(pair_j)
        gi, gj = pos[I], pos[J]
        keep = gi != gj
        gi, gj = gi[keep], gj[keep]
        lo = np.minimum(gi, gj)
        hi = np.maximum(gi, gj)
        fused = lo * np.int64(len(ids_g)) + hi
        _, first = np.unique(fused, return_index=True)
        lo, hi = lo[first], hi[first]
        cos = (emb_g[lo] * emb_g[hi]).sum(axis=1)
        m = cos >= threshold
        return pa.table(
            {
                "id_a": pa.array(ids_g[lo[m]]),
                "id_b": pa.array(ids_g[hi[m]]),
                "cos": pa.array(sql_round(cos[m], 6), pa.float64()),
            },
            schema=out_schema,
        )

    raw = map_key_blocks(bands, ["bucket"], bucket_confirm, num_partitions)

    def distinct(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates(subset=["id_a", "id_b"])
        return pa.Table.from_pandas(df, preserve_index=False).cast(out_schema)

    return map_key_blocks(raw, ["id_a", "id_b"], distinct, num_partitions)
