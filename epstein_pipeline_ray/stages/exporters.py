"""Sink stages (reference SURVEY.md §2.1: K1 JSON array export
exporters/json_export.py:23-60, K2 CSV with derived projection
exporters/csv_export.py:13-26, K4 NDJSON embeddings sink
processors/embeddings.py:307-326, K9 partitioned Parquet — absent in the
reference, primary here).

All sinks stream: each writer task serializes its own blocks; nothing is
collected on the driver. Partitioned Parquet (one directory per partition
key value) is the resumable-output layout — a re-run can skip directories
that already exist."""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset


def write_ndjson(ds: Dataset, path: str) -> None:
    """K1/K4: newline-delimited JSON, one object per row."""
    ds.write_json(path)


def write_csv_projection(
    ds: Dataset,
    path: str,
    columns: list[str],
    derived: dict[str, str] | None = None,
) -> None:
    """K2: fixed-column CSV export with derived length-of-list columns —
    the reference's ``person_count`` shape (csv_export.py:13-26):
    ``derived={"person_count": "person_ids"}`` emits the list length."""
    derived = derived or {}

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.select([c for c in columns if c in batch.column_names])
        for out_col, src_col in derived.items():
            t = t.append_column(out_col, pc.list_value_length(batch[src_col]))
        return t

    ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True).write_csv(path)


def write_partitioned_parquet(ds: Dataset, path: str, partition_cols: list[str]) -> None:
    """K9: hive-partitioned Parquet — one directory per key value, so a
    failed run resumes by skipping complete partitions."""
    ds.write_parquet(path, partition_cols=partition_cols)
