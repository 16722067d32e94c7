"""NDJSON / result-dir source: malformed-row policies and envelope unwrap
(S1 — reference cli.py:595-616 skips bad files silently; 'error' and
'null' generalize that contract)."""

import json

import pyarrow as pa
import pytest

from epstein_pipeline_ray.sources.jsonsrc import (
    MalformedJSONError,
    parse_ndjson_lines,
    read_ndjson,
    read_result_dir,
)

SCHEMA = pa.schema([("id", pa.int64()), ("title", pa.string())])

GOOD = [json.dumps({"id": i, "title": f"t{i}"}) for i in range(4)]
BAD = ['{"broken": , }', "[1, 2]", '{"title": "no id"}', "", "garbage"]


def test_clean_fast_path():
    tbl = parse_ndjson_lines(GOOD, SCHEMA, "skip", ("id",))
    assert tbl.num_rows == 4
    assert tbl["id"].to_pylist() == [0, 1, 2, 3]


def test_skip_drops_malformed():
    tbl = parse_ndjson_lines(GOOD + BAD, SCHEMA, "skip", ("id",))
    assert tbl.num_rows == 4
    assert tbl["title"].to_pylist() == ["t0", "t1", "t2", "t3"]


def test_error_raises():
    with pytest.raises(MalformedJSONError):
        parse_ndjson_lines(GOOD + BAD, SCHEMA, "error", ("id",))


def test_null_keeps_audit_rows():
    # blank line is not a row under any policy; the other 4 become nulls
    tbl = parse_ndjson_lines(GOOD + BAD, SCHEMA, "null", ("id",))
    assert tbl.num_rows == 8
    assert tbl["id"].to_pylist().count(None) == 4


def test_extra_fields_ignored():
    lines = [json.dumps({"id": 1, "title": "a", "unexpected": [1, 2]})]
    tbl = parse_ndjson_lines(lines, SCHEMA, "skip", ("id",))
    assert tbl.num_rows == 1 and tbl.column_names == ["id", "title"]


def test_read_ndjson_dataset(ray_session, tmp_path):
    p = tmp_path / "shard.json"
    p.write_text("\n".join(GOOD + BAD) + "\n", encoding="utf-8")
    out = read_ndjson(str(p), SCHEMA, policy="skip", required=("id",))
    df = out.to_pandas().sort_values("id").reset_index(drop=True)
    assert df["id"].tolist() == [0, 1, 2, 3]


def test_result_dir_envelope_and_skip(ray_session, tmp_path):
    (tmp_path / "a.json").write_text(
        json.dumps({"document": {"id": 10, "title": "enveloped"}}))
    (tmp_path / "b.json").write_text(json.dumps({"id": 11, "title": "bare"}))
    (tmp_path / "c.json").write_text("{{{{not json")
    (tmp_path / "d.json").write_text(json.dumps({"title": "missing id"}))
    (tmp_path / "ignored.txt").write_text("not a json file")
    out = read_result_dir(str(tmp_path), SCHEMA, policy="skip",
                          required=("id", "title"))
    df = out.to_pandas().sort_values("id").reset_index(drop=True)
    assert df["id"].tolist() == [10, 11]
    assert df["title"].tolist() == ["enveloped", "bare"]


def test_gz_roundtrip_idempotent_writer(ray_session, tmp_path):
    import gzip
    import os

    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.sources.jsonsrc import read_ndjson_gz
    from epstein_pipeline_ray.stages.exporters import write_ndjson_gz

    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(["a", "b", "c"], pa.string())})
    out = str(tmp_path / "gz")
    shards = write_ndjson_gz(rd.from_arrow(tbl), out)
    assert shards and all(s.endswith(".jsonl.gz") for s in shards)
    # idempotent: re-writing the same data adds NO new shards
    shards2 = write_ndjson_gz(rd.from_arrow(tbl), out)
    assert set(shards2) <= set(os.listdir(out) and
                               {os.path.join(out, f)
                                for f in os.listdir(out)})
    assert len(os.listdir(out)) == len(set(shards))

    with gzip.open(os.path.join(out, "zz_bad.jsonl.gz"), "wt") as f:
        f.write("nope\n")
    got = (read_ndjson_gz(out, schema, policy="skip",
                          required=("doc_id",))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.doc_id.tolist() == [1, 2, 3]
    assert got.text.tolist() == ["a", "b", "c"]
