"""Corpus integrity checks (reference: src/epstein_pipeline/validators/
integrity.py:20-70 — duplicate-id detection, field-consistency checks —
and validators/schema.py:29-50 row-level validation).

The reference walks the full `list[Document]` in driver memory; here each
check is a per-batch partial aggregate combined on the driver (constant
driver memory), except the duplicate-id check which needs one keyed
exchange on the id column.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset


def integrity_report(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str = "n_chars",
) -> pa.Table:
    """One-row summary: total rows, duplicated ids, rows whose recorded
    length disagrees with ``len(text)``, and empty-text rows."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        lens = pc.utf8_length(text)
        mismatch = pc.sum(pc.cast(pc.not_equal(lens, batch[len_col]), pa.int64())).as_py() or 0
        empty = pc.sum(
            pc.cast(pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(text)), 0), pa.int64())
        ).as_py() or 0
        return pa.table(
            {
                "n_rows": pa.array([batch.num_rows], pa.int64()),
                "n_len_mismatch": pa.array([mismatch], pa.int64()),
                "n_empty": pa.array([empty], pa.int64()),
            }
        )

    parts = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()

    # duplicate-id check: small aggregate result (one row per distinct id
    # would be big, but count>1 groups are rare) — pre-aggregate per batch
    # then a tiny groupby on the partial counts.
    grouped = docs.select_columns([id_col]).groupby(id_col).count()
    count_col = [c for c in grouped.schema().names if c != id_col][0]

    def dup_partial(batch: pa.Table) -> pa.Table:
        dups = pc.sum(pc.cast(pc.greater(batch[count_col], 1), pa.int64())).as_py() or 0
        return pa.table({"n_dup": pa.array([dups], pa.int64())})

    n_dup_ids = int(
        grouped.map_batches(dup_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()["n_dup"]
        .sum()
    )

    return pa.table(
        {
            "n_rows": pa.array([int(parts["n_rows"].sum())], pa.int64()),
            "n_dup_ids": pa.array([int(n_dup_ids)], pa.int64()),
            "n_len_mismatch": pa.array([int(parts["n_len_mismatch"].sum())], pa.int64()),
            "n_empty": pa.array([int(parts["n_empty"].sum())], pa.int64()),
        }
    )
