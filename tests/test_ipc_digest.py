"""IPC shard sink/source roundtrip, corpus digest invariance, KWIC."""

import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.sources.ipc import read_ipc, write_ipc
from epstein_pipeline_ray.stages.textops import kwic_snippets
from epstein_pipeline_ray.stages.validate import corpus_digest


def test_ipc_roundtrip_multishard(ray_session, tmp_path):
    tbl = pa.table({
        "id": pa.array(range(100), pa.int64()),
        "t": pa.array([f"row {i}" for i in range(100)], pa.string()),
    })
    n = write_ipc(rd.from_arrow(tbl).repartition(7), str(tmp_path / "x"))
    assert n == 100
    back = read_ipc(str(tmp_path / "x")).to_pandas().sort_values("id")
    assert list(back["id"]) == list(range(100))
    assert back["t"].iloc[42] == "row 42"


def test_corpus_digest_order_invariant(ray_session):
    texts = [f"doc number {i}" for i in range(50)] + [None]
    fwd = corpus_digest(rd.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})))
    rev = corpus_digest(rd.from_arrow(
        pa.table({"text": pa.array(texts[::-1], pa.string())})
    ).repartition(5))
    assert fwd["digest"][0].as_py() == rev["digest"][0].as_py()
    assert fwd["n_hashed"][0].as_py() == 50  # null skipped
    # any single-row change flips the digest
    texts[3] = "doc number 3!"
    changed = corpus_digest(rd.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})))
    assert changed["digest"][0].as_py() != fwd["digest"][0].as_py()


def test_kwic_positions_and_cjk(ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "a window here",            # pos 2, short doc
            "no match at all",
            "中文中文 window 后缀",        # code-point pos 5 (bytes differ)
        ], pa.string()),
    }))
    out = {r["doc_id"]: r for r in
           kwic_snippets(docs, "window", width=4).take_all()}
    assert set(out) == {1, 3}
    assert out[1]["pos"] == 2 and out[1]["snippet"] == "a window her"
    assert out[3]["pos"] == 5 and out[3]["snippet"] == "文中文 window 后缀"


def test_strip_html_hand(ray_session):
    from epstein_pipeline_ray.stages.c4_filter import strip_html

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "<p>Hello <b>world</b></p>",
            "a &amp;lt; b &amp; c &lt;tag&gt;",   # spec order: amp last
            "  no   markup\there  ",
        ], pa.string()),
    }))
    out = {r["doc_id"]: r["clean_text"]
           for r in strip_html(docs).take_all()}
    assert out[1] == "Hello world"
    # '&amp;lt;' → '&lt;' literal (NOT '<' twice); '&lt;tag&gt;' decodes
    # to '<tag>' AFTER tag-stripping so it survives as text
    assert out[2] == 'a &lt; b & c <tag>'
    assert out[3] == "no markup here"
