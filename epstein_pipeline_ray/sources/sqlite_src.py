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
