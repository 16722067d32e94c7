"""Z-order (Morton-curve) layout planning — the multi-dimensional
clustering step behind lakehouse OPTIMIZE ZORDER BY.

A table range-partitioned on ONE key prunes reads on that key only. A
Z-order layout interleaves the bits of two bucketized dimensions so
that consecutive z-ranges ("files") are small rectangles in BOTH
dimensions — a file-level min/max index then prunes reads on either.
This stage computes the layout DIAGNOSTIC: per z-range file, the row
count and each dimension's min/max spread (tight spreads ⇒ effective
pruning). The whole computation is map-side bucket/interleave math
plus one file-keyed min/max/count exchange.

Bit convention (pinned, shared verbatim with the SQL twin): 8-bit
buckets; bit i of dim a lands at position 2i+1, bit i of dim b at
position 2i; the file id is ``z >> file_shift``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum


def interleave8(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Morton-interleave two 8-bit integer arrays (a odd bits, b even)."""
    z = np.zeros_like(a)
    for i in range(8):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def zorder_layout(
    ds: Dataset,
    col_a: str,
    col_b: str,
    file_shift: int = 10,
) -> Dataset:
    """Per-z-range layout stats over int64 bucket columns ``col_a`` /
    ``col_b`` (callers bucketize to 0..255 first). Output one row per
    file: (file_id, n, a_min, a_max, b_min, b_max)."""

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        a = np.asarray(batch[col_a].to_numpy(zero_copy_only=False), np.int64)
        b = np.asarray(batch[col_b].to_numpy(zero_copy_only=False), np.int64)
        z = interleave8(a, b)
        df = pd.DataFrame({"file_id": z >> file_shift, "a": a, "b": b})
        g = df.groupby("file_id", sort=False).agg(
            __n=("a", "size"),
            __amin=("a", "min"), __amax=("a", "max"),
            __bmin=("b", "min"), __bmax=("b", "max")).reset_index()
        return pa.table({
            "file_id": pa.array(g["file_id"].to_numpy(np.int64), pa.int64()),
            "__n": pa.array(g["__n"].to_numpy(np.int64), pa.int64()),
            "__amin": pa.array(g["__amin"].to_numpy(np.int64), pa.int64()),
            "__amax": pa.array(g["__amax"].to_numpy(np.int64), pa.int64()),
            "__bmin": pa.array(g["__bmin"].to_numpy(np.int64), pa.int64()),
            "__bmax": pa.array(g["__bmax"].to_numpy(np.int64), pa.int64()),
        })

    partials = ds.select_columns([col_a, col_b]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    out = partials.groupby("file_id").aggregate(
        Sum("__n", alias_name="n"),
        Min("__amin", alias_name="a_min"),
        Max("__amax", alias_name="a_max"),
        Min("__bmin", alias_name="b_min"),
        Max("__bmax", alias_name="b_max"),
    )
    return out
