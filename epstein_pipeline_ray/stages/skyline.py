"""Pareto-frontier (skyline) selection — the dominance query behind
budget/quality trade-off curation: "which documents are not strictly
beaten on BOTH quality and cost by some other document".

The skyline operator is distributable because dominance is closed
under union of local skylines: skyline(A ∪ B) ⊆ skyline(A) ∪
skyline(B). So the plan is map-side local skylines per batch (each
batch collapses to its own frontier — typically a tiny fraction) and
ONE final pass over the unioned partial frontiers. The final stage
runs in a single block; its input is partial-frontier-sized, which is
bounded by the number of distinct maximize-column values — the
documented assumption (same class as the bounded dimension tables in
joins.py).

Dominance convention (maximize ``x_col``, minimize ``y_col``): q
dominates p iff q.x >= p.x and q.y <= p.y and (q.x > p.x or
q.y < p.y). Duplicate (x, y) points are mutually non-dominating and
all survive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _local_skyline(batch: pa.Table, x_col: str, y_col: str) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    x = np.asarray(batch[x_col].to_numpy(zero_copy_only=False), np.float64)
    y = np.asarray(batch[y_col].to_numpy(zero_copy_only=False), np.float64)
    # sort by (x desc, y asc); within an equal-x run only the min-y
    # survives, and a run survives iff its min-y is STRICTLY below the
    # running min over strictly-greater x
    order = np.lexsort((y, -x))
    xs, ys = x[order], y[order]
    n = len(xs)
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = xs[1:] != xs[:-1]
    starts = np.nonzero(new_run)[0]
    run_id = np.cumsum(new_run) - 1
    run_min_y = ys[starts]  # y ascending within each run
    pmin_before = np.concatenate(
        [[np.inf], np.minimum.accumulate(run_min_y)[:-1]])
    run_keep = run_min_y < pmin_before
    keep_sorted = run_keep[run_id] & (ys == run_min_y[run_id])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return batch.filter(pa.array(keep))


def pareto_front(
    ds: Dataset,
    x_col: str,
    y_col: str,
) -> Dataset:
    """Skyline of ``ds`` maximizing ``x_col`` and minimizing ``y_col``,
    carrying all other columns through. Map-side local skylines →
    union → one single-block final skyline over the partial
    frontiers."""
    partial = ds.map_batches(
        lambda b: _local_skyline(b, x_col, y_col),
        batch_format="pyarrow", zero_copy_batch=True)
    return partial.repartition(1).map_batches(
        lambda b: _local_skyline(b, x_col, y_col),
        batch_size=None, batch_format="pyarrow", zero_copy_batch=True)
