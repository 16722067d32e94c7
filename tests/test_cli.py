"""CLI surface smoke tests (reference cli.py command shapes) — run in
subprocesses: the CLI owns its own Ray session."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

ENV = dict(os.environ, RAY_ADDRESS="local")


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "epstein_pipeline_ray.cli", *args],
        capture_output=True, text=True, env=ENV,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


@pytest.fixture(scope="module")
def turns_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    t = pa.table(
        {
            "conv_id": pa.array(["a", "a", "b", "b"], pa.string()),
            "turn_idx": pa.array([0, 1, 0, 1], pa.int32()),
            "role": ["user", "assistant"] * 2,
            "text": ["alpha beta gamma delta " * 10] * 4,  # a == b → dup pair
            "tool": [""] * 4,
            "ts": pa.array([0, 1, 2, 3], pa.timestamp("us")),
        }
    )
    path = str(d / "turns.parquet")
    pq.write_table(t, path)
    return path


def test_cli_dedup(turns_file, tmp_path):
    out = str(tmp_path / "out")
    r = _run(["dedup", "--input", turns_file, "--output", out])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["pairs"] == 1 and res["clustered"] == 2
    assert os.path.isdir(f"{out}/pairs") and os.path.isdir(f"{out}/clusters")


def test_cli_validate_and_export(tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 2], pa.int64()),
            "text": ["hello world", "x", ""],
            "n_chars": pa.array([11, 1, 5], pa.int64()),  # one mismatch
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)

    r = _run(["validate", "--input", src])
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep == {"n_rows": 3, "n_dup_ids": 1, "n_len_mismatch": 1, "n_empty": 1}

    db = str(tmp_path / "o.db")
    r = _run(["export", "--input", src, "--format", "sqlite",
              "--output", db, "--table", "docs"])
    assert r.returncode == 0, r.stderr[-2000:]
    import sqlite3

    assert sqlite3.connect(db).execute("SELECT count(*) FROM docs").fetchone()[0] == 3


def test_cli_entities_and_graph(tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": [
                "alice met bob; call (212) 555-0173 re EFTA00039025",
                "alice emailed carol at a@b.co",
            ],
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)

    out = str(tmp_path / "ents")
    r = _run(["extract-entities", "--input", src, "--output", out])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["entities"] == 3  # PHONE + BATES on doc 1, EMAIL on doc 2
    got = pq.read_table(out).to_pydict()
    assert sorted(got["entity_type"]) == ["BATES", "EMAIL_ADDR", "PHONE"]

    gexf = str(tmp_path / "g.gexf")
    r = _run(["build-graph", "--input", src, "--terms", "alice,bob,carol",
              "--format", "gexf", "--output", gexf])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["edges"] == 2  # alice-bob (doc1), alice-carol (doc2)
    body = open(gexf).read()
    assert "alice" in body and "<gexf" in body


def test_cli_audit_persons_and_prep(tmp_path):
    persons = pa.table({
        "person_id": pa.array([1, 2, 3], pa.int64()),
        "name": ["Jeffrey Edwards", "Jefrey Edwards", "Unrelated Name Here"],
    })
    psrc = str(tmp_path / "persons.parquet")
    pq.write_table(persons, psrc)
    out = str(tmp_path / "audit")
    r = _run(["audit-persons", "--input", psrc, "--output", out,
              "--threshold", "0.85"])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["pairs"] == 1
    got = pq.read_table(out).to_pydict()
    assert (got["id_a"], got["id_b"]) == ([1], [2])

    good = ("a perfectly fine first sentence with words here.\n"
            "a perfectly fine second sentence with words here.\n"
            "a perfectly fine third sentence with words here.")
    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": [good, good + "\nlorem ipsum filler line with words."],
        "lang": ["en", "en"],
        "source": ["s", "s"],
        "n_chars": pa.array([len(good), len(good) + 40], pa.int64()),
    })
    dsrc = str(tmp_path / "docs.parquet")
    pq.write_table(docs, dsrc)
    pout = str(tmp_path / "prep")
    r = _run(["prep", "--input", dsrc, "--output", pout, "--min-quality", "0.0",
              "--langs", "en,und", "--c4-clean", "--chunk-size", "64",
              "--overlap", "8"])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["chunks"] >= 1
    got = pq.read_table(pout).to_pydict()
    assert set(got["doc_id"]) == {1}  # lorem page dropped by the C4 stage


def test_cli_hygiene_and_pack(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({
        "conv_id": pa.array(["a"] * 4 + ["b"] * 2, pa.string()),
        "turn_idx": pa.array([0, 1, 2, 3, 0, 1], pa.int32()),
        "role": ["user", "assistant", "assistant", "assistant", "user",
                 "assistant"],
        "text": ["w1 w2 w3", "reply here", "reply here", "more text",
                 "hello there", "general kenobi"],
        "tool": ["", "code", "code", "", "", "search"],
        "ts": pa.array([0, 1, 2, 3, 0, 1], pa.timestamp("us")),
    })
    src = str(tmp_path / "turns.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "hyg")
    r = _run(["hygiene", "--input", src, "--output", out, "--collapse",
              "--token-budget", "5"])
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["convs"] == 2
    # (a,2) is a (role,text) stutter of (a,1) -> collapsed
    assert summary["turns_after_collapse"] == 5
    assert 0 < summary["turns_within_budget"] < 5

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b c", "d e", "f g h i"], pa.string()),
    })
    dsrc = str(tmp_path / "docs.parquet")
    pq.write_table(docs, dsrc)
    pout = str(tmp_path / "pack")
    r = _run(["pack", "--input", dsrc, "--output", pout, "--seq-len", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    # 9 tokens at seq_len 4 -> samples 0..2
    assert stats == {"docs": 3, "samples": 3}


def test_cli_profile_and_health(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "source": pa.array(["s1", "s1", "s2", "s2"], pa.string()),
        "text": pa.array(["a b", "a b", "c d", None], pa.string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)

    r = _run(["profile", "--input", src, "--columns", "source,text"])
    assert r.returncode == 0, r.stderr[-2000:]
    prof = {row["column"]: row
            for row in json.loads(r.stdout.strip().splitlines()[-1])}
    assert prof["text"]["n_null"] == 1
    assert prof["source"]["n_distinct"] == 2

    r = _run(["health", "--input", src])
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["key_skew"]["n_keys"] == 2
    dup = {row["source"]: row for row in rep["dup_rate"]}
    assert dup["s1"]["n_dup_docs"] == 2  # "a b" repeats within s1
    assert dup["s2"]["n_dup_docs"] == 0
