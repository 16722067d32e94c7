"""Bucketed (storage-partitioned) join — the no-shuffle join plan.

At 100 TB the winning equi-join plan is often NOT an exchange at query
time but co-partitioned STORAGE: both tables written once, bucketed by
the join key's hash, so the join becomes n_buckets independent map
tasks each reading one bucket directory from each side and hash-joining
locally (Hive/Iceberg/Spark bucketed-join semantics). No all-to-all
moves at read time; a failed task redoes one bucket.

``write_bucketed`` is the layout step (itself shuffle-free: every write
task splits its batches locally and appends atomically-published
parquet shards under ``bucket=<i>/``). ``bucketed_join`` zips the two
layouts bucket-by-bucket through ``pyarrow.Table.join`` (C++ hash
join). Bucket count is the parallelism knob: size it so one bucket of
the LARGER side fits a worker heap.

Key hashing is ``((k % B) + B) % B`` over an int64 key column — a
published, engine-independent convention both writers must share
(exactly the contract real lakehouse bucketing specs pin down).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd
from ray.data import Dataset


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    return ((keys % n_buckets) + n_buckets) % n_buckets


def write_bucketed(ds: Dataset, key: str, n_buckets: int, path: str) -> int:
    """Write ``ds`` under ``path`` bucketed by ``key`` (int64). Returns
    total rows written. Each task splits its batch by bucket and
    publishes one parquet shard per touched bucket via temp + rename,
    so concurrent writers and re-runs never expose partial files."""
    os.makedirs(path, exist_ok=True)
    for b in range(n_buckets):
        os.makedirs(os.path.join(path, f"bucket={b:05d}"), exist_ok=True)

    def write_shards(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key].to_numpy(zero_copy_only=False), np.int64)
        buckets = _bucket_of(k, n_buckets)
        for b in np.unique(buckets):
            part = batch.filter(pa.array(buckets == b))
            shard = os.path.join(
                path, f"bucket={int(b):05d}",
                f"part-{uuid.uuid4().hex}.parquet")
            tmp = f"{shard}.tmp.{os.getpid()}"
            pq.write_table(part, tmp)
            os.replace(tmp, shard)
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    counts = ds.map_batches(write_shards, batch_format="pyarrow",
                            zero_copy_batch=True)
    return int(sum(r["rows"] for r in counts.take_all()))


def bucketed_join(
    path_a: str,
    path_b: str,
    key_a: str,
    key_b: str,
    n_buckets: int,
    schema_a: pa.Schema,
    schema_b: pa.Schema,
) -> Dataset:
    """Inner-join two bucketed layouts written with the same
    ``n_buckets``: one map task per bucket, zero exchange. Output
    columns: all of A plus B's non-key columns."""
    b_value_cols = [n for n in schema_b.names if n != key_b]
    out_schema = pa.schema(
        [(n, schema_a.field(n).type) for n in schema_a.names]
        + [(n, schema_b.field(n).type) for n in b_value_cols])

    def _read_bucket(path: str, b: int, schema: pa.Schema) -> pa.Table:
        d = os.path.join(path, f"bucket={b:05d}")
        files = (sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
                 if os.path.isdir(d) else [])
        if not files:
            return schema.empty_table()
        return pa.concat_tables(
            [pq.read_table(os.path.join(d, f)) for f in files])

    def join_bucket(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch["bucket"].to_pylist():
            ta = _read_bucket(path_a, b, schema_a)
            tb = _read_bucket(path_b, b, schema_b)
            if ta.num_rows == 0 or tb.num_rows == 0:
                continue
            j = ta.join(tb, keys=[key_a], right_keys=[key_b],
                        join_type="inner")
            out.append(j.select(out_schema.names).cast(out_schema))
        return (pa.concat_tables(out) if out else out_schema.empty_table())

    ids = rd.from_arrow(pa.table({
        "bucket": pa.array(np.arange(n_buckets, dtype=np.int64), pa.int64())
    })).repartition(n_buckets)
    return ids.map_batches(join_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
