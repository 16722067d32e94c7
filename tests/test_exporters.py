"""Sink round-trips (SURVEY.md §2.1 K1/K2/K4/K9)."""

import json
import os

import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "title": ["a", "b", "c"],
            "person_ids": [["p1", "p2"], [], ["p3"]],
            "source": ["s1", "s1", "s2"],
        }
    )
    return rd.from_arrow(t)


def test_write_ndjson_roundtrip(docs_ds, tmp_path):
    from epstein_pipeline_ray.stages.exporters import write_ndjson

    out = str(tmp_path / "nd")
    write_ndjson(docs_ds, out)
    rows = []
    for f in sorted(os.listdir(out)):
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3]


def test_write_csv_projection_derived(docs_ds, tmp_path):
    from epstein_pipeline_ray.stages.exporters import write_csv_projection

    out = str(tmp_path / "csv")
    write_csv_projection(
        docs_ds, out, ["doc_id", "title"], derived={"person_count": "person_ids"}
    )
    frames = [pd.read_csv(os.path.join(out, f)) for f in sorted(os.listdir(out))]
    df = pd.concat(frames).sort_values("doc_id").reset_index(drop=True)
    assert list(df.columns) == ["doc_id", "title", "person_count"]
    assert df["person_count"].tolist() == [2, 0, 1]


def test_write_partitioned_parquet(docs_ds, tmp_path):
    import ray.data as rd

    from epstein_pipeline_ray.stages.exporters import write_partitioned_parquet

    out = str(tmp_path / "pq")
    write_partitioned_parquet(docs_ds, out, ["source"])
    subdirs = sorted(d for d in os.listdir(out))
    assert any("s1" in d for d in subdirs) and any("s2" in d for d in subdirs)
    back = rd.read_parquet(out).to_pandas()
    assert sorted(back["doc_id"]) == [1, 2, 3]


def test_sqlite_sink_and_source_roundtrip(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.sources.sqlite_src import read_sqlite
    from epstein_pipeline_ray.stages.exporters import write_sqlite

    emb = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    t = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array(emb, pa.list_(pa.float64())),
        }
    )
    db = str(tmp_path / "out.db")
    n = write_sqlite(rd.from_arrow(t), db, "vectors", blob_cols=["embedding"])
    assert n == 3

    back = read_sqlite(db, "SELECT vec_id, embedding FROM vectors ORDER BY vec_id")
    df = back.to_pandas()
    assert df["vec_id"].tolist() == [1, 2, 3]
    # F32 blob round-trip (reference embeddings.py:445-450 packing)
    vecs = [np.frombuffer(b, dtype=np.float32).tolist() for b in df["embedding"]]
    assert vecs == emb


def test_sqlite_partitioned_source(ray_session, tmp_path):
    import sqlite3

    from epstein_pipeline_ray.sources.sqlite_src import read_sqlite_partitioned

    db = str(tmp_path / "part.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE docs (doc_id INTEGER, name TEXT, score REAL)")
    conn.executemany(
        "INSERT INTO docs VALUES (?, ?, ?)",
        [(i, f"n{i}", i * 0.5) for i in range(100)],
    )
    conn.commit()
    conn.close()

    ds = read_sqlite_partitioned(db, "docs", "doc_id", num_partitions=7)
    assert ds.materialize().num_blocks() > 1  # partitioned, not one cursor
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df.doc_id.tolist() == list(range(100))
    assert df.name.tolist() == [f"n{i}" for i in range(100)]
    assert df.score.tolist() == [i * 0.5 for i in range(100)]

    # column pruning + a key span much wider than the row count (empty
    # partitions must come back as typed empty tables, not crash)
    conn = sqlite3.connect(db)
    conn.execute("INSERT INTO docs VALUES (1000000, 'far', 1.0)")
    conn.commit()
    conn.close()
    ds2 = read_sqlite_partitioned(db, "docs", "doc_id", num_partitions=8,
                                  columns=["doc_id", "name"])
    df2 = ds2.to_pandas()
    assert set(df2.columns) == {"doc_id", "name"}
    assert len(df2) == 101 and df2.doc_id.max() == 1000000


def test_file_hashes_and_dedup(ray_session, tmp_path):
    import hashlib

    from epstein_pipeline_ray.sources.files import dedup_files_by_hash, file_hashes

    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.bin").write_bytes(b"hello world" * 100)
    (d / "b.bin").write_bytes(b"hello world" * 100)   # dup of a
    (d / "c.bin").write_bytes(b"something else")

    df = file_hashes(str(d)).to_pandas()
    assert len(df) == 3
    want = hashlib.sha256(b"hello world" * 100).hexdigest()
    by_path = dict(zip([p.split("/")[-1] for p in df.path], df.sha256))
    assert by_path["a.bin"] == want == by_path["b.bin"]
    assert by_path["c.bin"] != want
    assert df[df.path.str.endswith("a.bin")].n_bytes.iloc[0] == 1100

    reps = dedup_files_by_hash(str(d)).to_pandas().sort_values("path")
    assert len(reps) == 2
    dup_row = reps[reps.sha256 == want].iloc[0]
    assert dup_row.path.endswith("a.bin") and dup_row.n_copies == 2


def test_explode_document_persons(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.exporters import explode_document_persons

    t = pa.table({
        "doc_id": pa.array(["d1", "d2", "d3", "d4"]),
        "person_ids": pa.array([["p1", "p2"], [], None, ["p3"]],
                               pa.list_(pa.string())),
    })
    df = explode_document_persons(rd.from_arrow(t)).to_pandas()
    got = sorted(zip(df.document_id, df.person_id))
    assert got == [("d1", "p1"), ("d1", "p2"), ("d4", "p3")]


def test_sqlite_fts5(ray_session, tmp_path):
    import sqlite3

    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.exporters import write_sqlite

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "title": pa.array(["alpha report", "beta memo", "gamma notes"]),
        "body": pa.array(["the quick fox", "lazy dogs sleep", "fox and dog"]),
    })
    db = str(tmp_path / "fts.db")
    n = write_sqlite(rd.from_arrow(t), db, "docs", fts_cols=["title", "body"])
    assert n == 3
    conn = sqlite3.connect(db)
    hits = conn.execute(
        "SELECT d.doc_id FROM docs_fts f JOIN docs d ON d.rowid = f.rowid "
        "WHERE docs_fts MATCH 'fox' ORDER BY d.doc_id").fetchall()
    assert [h[0] for h in hits] == [1, 3]
    conn.close()
