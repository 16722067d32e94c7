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
