"""Arrow IPC (Feather v2) shard sink + source — the zero-parse
interchange format between pipeline stages and external Arrow-native
consumers (reference K-family exporters, re-expressed columnar).

IPC shards are the cheapest possible checkpoint: write is a buffer
dump, read is mmap-speed, schema rides the file. Shards publish
atomically (temp + os.replace, the same discipline as the gz/parquet
writers) and the reader only lists ``*.arrow``, so a listing racing a
writer never sees a partial file.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.ipc as pipc
import ray.data as rd
from ray.data import Dataset


def write_ipc(ds: Dataset, path: str) -> int:
    """Write one IPC file per batch under ``path``; returns rows written."""
    os.makedirs(path, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        shard = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        tmp = f"{shard}.tmp.{os.getpid()}"
        with pipc.new_file(tmp, batch.schema) as w:
            w.write_table(batch)
        os.replace(tmp, shard)
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    counts = ds.map_batches(write_shard, batch_format="pyarrow",
                            zero_copy_batch=True)
    return int(sum(r["rows"] for r in counts.take_all()))


def read_ipc(path: str) -> Dataset:
    """Read an IPC shard directory back as a Dataset — one read task per
    shard file (file-parallel, no driver materialization)."""
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".arrow"))

    def load(batch: pa.Table) -> pa.Table:
        tables = []
        for f in batch["path"].to_pylist():
            with pipc.open_file(f) as r:
                tables.append(r.read_all())
        return pa.concat_tables(tables) if tables else pa.table({})

    paths = rd.from_arrow(pa.table({"path": pa.array(files, pa.string())}))
    return paths.repartition(max(1, len(files))).map_batches(
        load, batch_format="pyarrow", zero_copy_batch=True)
