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
                "cos": pa.array(np.round(sims[ii, jj][keep], 6), pa.float64()),
            }
        )

    return vectors.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
