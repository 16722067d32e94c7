"""Bucketed storage join (stages/bucketed.py), PR-curve and embedding
moments hand truths."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.stages.bucketed import bucketed_join, write_bucketed
from epstein_pipeline_ray.stages.embed import embedding_moments
from epstein_pipeline_ray.stages.evalmetrics import pr_curve


def test_bucketed_join_matches_plain_join(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    a = pa.table({
        "k": pa.array(rng.integers(0, 40, 500), pa.int64()),
        "va": pa.array(rng.random(500), pa.float64()),
    })
    # right side: unique keys 0..29 → some left keys have no match,
    # some buckets hold right rows with no left rows
    b = pa.table({
        "k2": pa.array(np.arange(30, dtype=np.int64), pa.int64()),
        "vb": pa.array(np.arange(30, dtype=np.float64) * 10, pa.float64()),
    })
    pa_dir, pb_dir = str(tmp_path / "a"), str(tmp_path / "b")
    n_a = write_bucketed(rd.from_arrow(a).repartition(8), "k", 7, pa_dir)
    n_b = write_bucketed(rd.from_arrow(b), "k2", 7, pb_dir)
    assert (n_a, n_b) == (500, 30)
    out = bucketed_join(pa_dir, pb_dir, "k", "k2", 7,
                        a.schema, b.schema).to_pandas()
    want = (a.to_pandas().merge(b.to_pandas(), left_on="k", right_on="k2")
            [["k", "va", "vb"]])
    got = out[["k", "va", "vb"]]
    key = ["k", "va", "vb"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want) and len(got) > 0


def test_bucketed_join_empty_bucket(ray_session, tmp_path):
    # all keys hash to bucket 0 of 4 — buckets 1..3 empty on both sides
    a = pa.table({"k": pa.array([0, 4, 8], pa.int64()),
                  "va": pa.array([1.0, 2.0, 3.0], pa.float64())})
    b = pa.table({"k2": pa.array([4, 8], pa.int64()),
                  "vb": pa.array([40.0, 80.0], pa.float64())})
    pa_dir, pb_dir = str(tmp_path / "a"), str(tmp_path / "b")
    write_bucketed(rd.from_arrow(a), "k", 4, pa_dir)
    write_bucketed(rd.from_arrow(b), "k2", 4, pb_dir)
    out = bucketed_join(pa_dir, pb_dir, "k", "k2", 4,
                        a.schema, b.schema).to_pandas()
    assert sorted(out["k"]) == [4, 8]


def test_pr_curve_hand(ray_session):
    # scores .2/.4/.6/.8, labels 0/1/0/1; at t=0.5: tp=1 fp=1 → p=.5 r=.5
    ds = rd.from_arrow(pa.table({
        "score": pa.array([0.2, 0.4, 0.6, 0.8], pa.float64()),
        "y": pa.array([0, 1, 0, 1], pa.int64()),
    }))
    out = {round(r["threshold"], 2): r
           for r in pr_curve(ds, "score", "y").take_all()}
    assert out[0.5]["tp"] == 1 and out[0.5]["fp"] == 1
    assert out[0.5]["precision"] == 0.5 and out[0.5]["recall"] == 0.5
    assert out[0.5]["f1"] == 0.5
    assert out[0.1]["recall"] == 1.0          # everything predicted
    assert out[0.9]["tp"] == 0                # nothing predicted
    assert out[0.9]["precision"] is None or np.isnan(out[0.9]["precision"])


def test_embedding_moments_hand(ray_session):
    vecs = pa.array([[1.0, 10.0], [3.0, 10.0]],
                    pa.list_(pa.float64()))
    ds = rd.from_arrow(pa.table({"embedding": vecs}))
    out = {r["dim"]: r for r in embedding_moments(ds).take_all()}
    assert out[1]["mean"] == 2.0 and out[1]["var"] == 1.0
    assert out[2]["mean"] == 10.0 and out[2]["var"] == 0.0
    assert out[1]["n"] == 2


def test_interleave8_hand():
    from epstein_pipeline_ray.stages.zorder import interleave8

    a = np.array([0b11111111, 0b00000001, 0], np.int64)
    b = np.array([0, 0b00000001, 0b11111111], np.int64)
    z = interleave8(a, b)
    assert z[0] == 0b1010101010101010
    assert z[1] == 0b11
    assert z[2] == 0b0101010101010101


def test_zorder_layout_hand(ray_session):
    from epstein_pipeline_ray.stages.zorder import zorder_layout

    # two tight clusters in (a,b) space land in different z files with
    # tight per-file spreads
    ds = rd.from_arrow(pa.table({
        "a": pa.array([0, 1, 0, 255, 254, 255], pa.int64()),
        "b": pa.array([0, 0, 1, 255, 255, 254], pa.int64()),
    }))
    out = zorder_layout(ds, "a", "b", file_shift=10).to_pandas()
    out = out.sort_values("file_id").reset_index(drop=True)
    assert len(out) == 2
    lo, hi = out.iloc[0], out.iloc[1]
    assert lo["n"] == 3 and lo["a_max"] <= 1 and lo["b_max"] <= 1
    assert hi["n"] == 3 and hi["a_min"] >= 254 and hi["b_min"] >= 254


def test_quantization_error_hand(ray_session):
    from epstein_pipeline_ray.stages.embed import quantization_error

    # dim1 spans [0,255] with integer values → lossless at 8 bits;
    # dim2 constant → zero-range rule, zero error
    vecs = pa.array([[0.0, 5.0], [100.0, 5.0], [255.0, 5.0]],
                    pa.list_(pa.float64()))
    ds = rd.from_arrow(pa.table({"embedding": vecs}))
    out = {r["dim"]: r for r in quantization_error(ds).take_all()}
    assert out[1]["mean_abs_err"] == 0.0 and out[1]["max_abs_err"] == 0.0
    assert out[2]["mean_abs_err"] == 0.0 and out[2]["n"] == 3


def test_truncation_audit_hand(ray_session):
    from epstein_pipeline_ray.stages.textops import truncation_audit

    ds = rd.from_arrow(pa.table({
        "source": pa.array(["a", "a", "a", "b"], pa.string()),
        "text": pa.array(["Fine sentence.", "clipped mid", 'quoted."',
                          "Trailing ws!  "], pa.string()),
    }))
    out = {r["source"]: r for r in truncation_audit(ds).take_all()}
    assert out["a"]["n_truncated"] == 1 and out["a"]["n"] == 3
    assert out["b"]["n_truncated"] == 0  # '!  ' matches the \s* tail


def test_embedding_health_hand(ray_session):
    from epstein_pipeline_ray.stages.embed import embedding_health

    vecs = pa.array([[3.0, 4.0], [0.0, 0.0], [0.0, 1.0]],
                    pa.list_(pa.float64()))
    ds = rd.from_arrow(pa.table({"embedding": vecs}))
    t = embedding_health(ds).to_pandas()
    assert int(t["n"][0]) == 3 and int(t["n_zero"][0]) == 1
    assert t["min_norm"][0] == 0.0 and t["max_norm"][0] == 5.0
    assert t["mean_norm"][0] == 2.0  # (5 + 0 + 1) / 3
