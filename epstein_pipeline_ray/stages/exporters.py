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


def pack_f32(vecs) -> list[bytes]:
    """K5: F32 blob packing — ``struct.pack(f'{n}f', *vec)`` equivalent
    (reference processors/embeddings.py:445-450), vectorized per row."""
    import numpy as np

    return [np.asarray(v, dtype=np.float32).tobytes() for v in vecs]


def explode_document_persons(
    docs: Dataset,
    id_col: str = "doc_id",
    persons_col: str = "person_ids",
) -> Dataset:
    """J7: many-to-many join-table explode (reference
    exporters/sqlite_export.py:58-63, 221 ``document_persons``): one
    (document_id, person_id) row per list element, built entirely from
    Arrow list offsets (``list_parent_indices`` + ``list_flatten``) — no
    per-row Python. Null/empty lists contribute no rows."""
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        lst = batch[persons_col]
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        parents = pc.list_parent_indices(lst)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            "document_id": ids.take(parents),
            "person_id": pc.list_flatten(lst),
        })

    return docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def write_sqlite(ds: Dataset, path: str, table: str, *,
                 blob_cols: list[str] | None = None,
                 fts_cols: list[str] | None = None) -> int:
    """K3/K5: stream a Dataset into one SQLite table (reference
    exporters/sqlite_export.py:29-414 documents/forensics tables and the
    F32-blob embedding sink, embeddings.py:328-364).

    SQLite is single-writer, so blocks stream through the driver
    connection — constant memory, one executemany per block. At cluster
    scale the equivalent sink is one DB shard per partition (the
    partitioned-Parquet layout above) or a writer actor serializing a
    remote DB; this mirrors the reference's local-file deployment.
    ``blob_cols`` are ``list<float>`` columns stored as packed F32 blobs.
    ``fts_cols`` builds an external-content FTS5 full-text index over
    those columns (reference sqlite_export.py:136-160 documents_fts:
    virtual table + rowid-linked insert + 'optimize').
    Returns rows written."""
    import sqlite3

    import ray

    blob_cols = blob_cols or []
    conn = sqlite3.connect(path)
    total = 0
    try:
        first = True
        for ref in ds.to_arrow_refs():
            tbl = ray.get(ref)
            if tbl.num_rows == 0:
                continue
            cols = tbl.column_names
            if first:
                defs = ", ".join(
                    f'"{c}" BLOB' if c in blob_cols else f'"{c}"' for c in cols
                )
                conn.execute(f'DROP TABLE IF EXISTS "{table}"')
                conn.execute(f'CREATE TABLE "{table}" ({defs})')
                first = False
            data = {c: tbl[c].to_pylist() for c in cols}
            for c in blob_cols:
                data[c] = pack_f32(data[c])
            rows = list(zip(*(data[c] for c in cols)))
            ph = ", ".join("?" for _ in cols)
            conn.executemany(f'INSERT INTO "{table}" VALUES ({ph})', rows)
            total += len(rows)
        if fts_cols and total:
            fts = f"{table}_fts"
            col_list = ", ".join(f'"{c}"' for c in fts_cols)
            conn.execute(f'DROP TABLE IF EXISTS "{fts}"')
            conn.execute(
                f'CREATE VIRTUAL TABLE "{fts}" USING fts5('
                f'{col_list}, content="{table}", content_rowid="rowid")')
            conn.execute(
                f'INSERT INTO "{fts}"(rowid, {col_list}) '
                f'SELECT rowid, {col_list} FROM "{table}"')
            conn.execute(f'INSERT INTO "{fts}"("{fts}") VALUES (\'optimize\')')
        conn.commit()
    finally:
        conn.close()
    return total


def write_ndjson_gz(ds: Dataset, path: str) -> list[str]:
    """K1/K4 compressed sibling: gzip NDJSON shards, one ``.jsonl.gz``
    per batch written inside the map task (the idempotent-writer
    pattern — shard name from content+pid, so a re-run overwrites
    rather than duplicates). The 100-TB default: compressed text shards
    keep storage bandwidth, not CPU, the bottleneck. Returns shard
    paths."""
    import gzip
    import hashlib
    import json as _json
    import os

    os.makedirs(path, exist_ok=True)

    def write_batch(batch) -> "pa.Table":
        import pyarrow as pa

        rows = batch.to_pylist()
        payload = "\n".join(_json.dumps(r, default=str) for r in rows)
        tag = hashlib.sha1(payload.encode()).hexdigest()[:16]
        shard = os.path.join(path, f"part-{tag}.jsonl.gz")
        # ATOMIC publish: gzip.open("wt") on the final name truncates
        # first, so any concurrent reader (or a task re-execution racing
        # a reader) could observe an empty/partial shard with NO error —
        # write to a pid-private temp name and os.replace (atomic on
        # POSIX), so a complete file is visible at every instant
        tmp = f"{shard}.tmp.{os.getpid()}"
        with gzip.open(tmp, "wt", encoding="utf-8") as f:
            f.write(payload + ("\n" if payload else ""))
        os.replace(tmp, shard)
        return pa.table({"shard": pa.array([shard], pa.string()),
                         "rows": pa.array([len(rows)], pa.int64())})

    import ray

    manifests = [t for t in ray.get(
        ds.map_batches(write_batch, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs())
        if t.num_rows]
    out: list[str] = []
    total = 0
    for t in manifests:
        out.extend(t["shard"].to_pylist())
        total += int(t["rows"].to_pandas().sum())
    # distinct shard files must jointly hold every input row — identical
    # batch payloads (same content hash) would silently fold
    n_distinct = len(set(out))
    assert n_distinct == len(out), (
        f"duplicate shard content hash: {len(out)} batches -> "
        f"{n_distinct} shards")
    return sorted(out)
