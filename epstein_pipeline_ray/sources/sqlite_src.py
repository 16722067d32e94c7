"""SQLite source (reference S5: importers/sea_doughnut.py streams a
1.38M-doc corpus out of SQLite DBs).

The driver reads in bounded chunks and yields Arrow tables into a
Dataset — the sandbox twin of ``ray.data.read_sql`` with a connection
factory per task; for a server DB each task would open its own
connection and read one key-range partition."""

from __future__ import annotations

import sqlite3

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset


def read_sqlite_partitioned(
    path: str,
    table: str,
    key_col: str,
    num_partitions: int = 16,
    columns: list[str] | None = None,
) -> Dataset:
    """Partitioned SQLite table reader (VERDICT r1 item 10): the driver
    runs ONE metadata query (min/max of the integer key), splits the key
    span into contiguous half-open ranges, and each Ray task opens its own
    connection and reads one range — no driver cursor ever streams data
    rows. This is the shape ``ray.data.read_sql`` uses for server DBs;
    sqlite files are readable concurrently so the same plan applies.
    """
    import numpy as np

    conn = sqlite3.connect(path)
    try:
        lo, hi = conn.execute(
            f"SELECT min({key_col}), max({key_col}) FROM {table}"
        ).fetchone()
        if lo is None:
            return rd.from_items([])
        # one probe row pins the Arrow schema so empty partitions emit
        # typed empty tables instead of schema-less blocks
        cols_sql = ", ".join(columns) if columns else "*"
        cur = conn.execute(f"SELECT {cols_sql} FROM {table} LIMIT 1")
        names = [d[0] for d in cur.description]
        probe = cur.fetchone()
        schema = pa.table({n: pa.array([v]) for n, v in zip(names, probe)}).schema
    finally:
        conn.close()

    edges = np.unique(np.linspace(lo, hi + 1, num_partitions + 1).astype(np.int64))
    specs = [{"lo": int(a), "hi": int(b)} for a, b in zip(edges[:-1], edges[1:])]

    def read_range(batch: pa.Table) -> pa.Table:
        out = []
        for plo, phi in zip(batch["lo"].to_pylist(), batch["hi"].to_pylist()):
            c = sqlite3.connect(path)
            try:
                rows = c.execute(
                    f"SELECT {cols_sql} FROM {table} "
                    f"WHERE {key_col} >= ? AND {key_col} < ?",
                    (plo, phi),
                ).fetchall()
            finally:
                c.close()
            if not rows:
                continue
            cols = list(zip(*rows))
            out.append(pa.table(
                {n: pa.array(c_, type=schema.field(n).type)
                 for n, c_ in zip(names, cols)}))
        if not out:
            return schema.empty_table()
        return pa.concat_tables(out)

    return (
        rd.from_items(specs, override_num_blocks=len(specs))
        .map_batches(read_range, batch_format="pyarrow", batch_size=None)
    )


def read_sqlite(path: str, query: str, chunk_rows: int = 65536) -> Dataset:
    conn = sqlite3.connect(path)
    try:
        cur = conn.execute(query)
        names = [d[0] for d in cur.description]
        tables = []
        while True:
            rows = cur.fetchmany(chunk_rows)
            if not rows:
                break
            cols = list(zip(*rows))
            tables.append(pa.table({n: pa.array(c) for n, c in zip(names, cols)}))
        if not tables:
            return rd.from_items([])
        return rd.from_arrow(tables)
    finally:
        conn.close()
