"""Hand truths for the evaluation-metric operators (stages/evalmetrics.py),
SCD2 intervals (stages/cdc.py) and the Pareto skyline (stages/skyline.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.stages.cdc import scd2_intervals
from epstein_pipeline_ray.stages.evalmetrics import (
    calibration_bins,
    cohen_kappa,
    grouped_auc,
)
from epstein_pipeline_ray.stages.skyline import pareto_front


def _scored(rows):
    return rd.from_arrow(pa.table({
        "g": pa.array([r[0] for r in rows], pa.string()),
        "score": pa.array([r[1] for r in rows], pa.float64()),
        "y": pa.array([r[2] for r in rows], pa.int64()),
    }))


def test_auc_perfect_and_reversed(ray_session):
    ds = _scored([
        # group a: every positive outscores every negative → AUC 1
        ("a", 1.0, 0), ("a", 2.0, 0), ("a", 3.0, 1), ("a", 4.0, 1),
        # group b: every positive below every negative → AUC 0
        ("b", 1.0, 1), ("b", 2.0, 1), ("b", 3.0, 0), ("b", 4.0, 0),
    ])
    out = {r["g"]: r for r in grouped_auc(ds, "g", "score", "y").take_all()}
    assert out["a"]["auc"] == 1.0 and out["a"]["n_pos"] == 2
    assert out["b"]["auc"] == 0.0


def test_auc_ties_and_degenerate(ray_session):
    ds = _scored([
        # all scores tied → average ranks equal → AUC exactly 0.5
        ("t", 5.0, 1), ("t", 5.0, 0), ("t", 5.0, 1), ("t", 5.0, 0),
        # single-class group → undefined
        ("p", 1.0, 1), ("p", 2.0, 1),
    ])
    out = {r["g"]: r for r in grouped_auc(ds, "g", "score", "y").take_all()}
    assert out["t"]["auc"] == 0.5
    assert out["p"]["auc"] is None or np.isnan(out["p"]["auc"])


def test_calibration_bins_hand(ray_session):
    ds = rd.from_arrow(pa.table({
        "score": pa.array([0.05, 0.15, 0.15, 0.95, 1.0], pa.float64()),
        "y": pa.array([0, 1, 0, 1, 1], pa.int64()),
    }))
    out = {r["bin"]: r for r in
           calibration_bins(ds, "score", "y", n_bins=10).take_all()}
    assert out[0]["n"] == 1 and out[0]["frac_pos"] == 0.0
    assert out[1]["n"] == 2 and out[1]["frac_pos"] == 0.5
    assert out[1]["mean_score"] == 0.15
    # 1.0 folds into the top bin
    assert out[9]["n"] == 2 and out[9]["frac_pos"] == 1.0


def test_cohen_kappa_hand(ray_session):
    # classic 2×2: a/b agree on 20 yes + 15 no of 50; row marginals
    # (25 yes, 25 no), col marginals (30 yes, 20 no) → po=0.7, pe=0.5,
    # kappa = 0.4
    rows_a, rows_b = [], []
    rows_a += ["y"] * 20 + ["y"] * 5 + ["n"] * 10 + ["n"] * 15
    rows_b += ["y"] * 20 + ["n"] * 5 + ["y"] * 10 + ["n"] * 15
    ds = rd.from_arrow(pa.table({
        "a": pa.array(rows_a, pa.string()),
        "b": pa.array(rows_b, pa.string()),
    }))
    t = cohen_kappa(ds, "a", "b").to_pandas()
    assert int(t["n"][0]) == 50
    assert t["po"][0] == 0.7
    assert t["pe"][0] == 0.5
    assert t["kappa"][0] == 0.4


def test_cohen_kappa_perfect(ray_session):
    ds = rd.from_arrow(pa.table({
        "a": pa.array(["x", "y", "z", "x"], pa.string()),
        "b": pa.array(["x", "y", "z", "x"], pa.string()),
    }))
    t = cohen_kappa(ds, "a", "b").to_pandas()
    assert t["po"][0] == 1.0 and t["kappa"][0] == 1.0


def test_scd2_intervals_hand(ray_session):
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
        "ver": pa.array([1, 3, 7, 2, 2, 5], pa.int64()),
        "v": pa.array([10.0, 30.0, 70.0, 20.0, 21.0, 50.0], pa.float64()),
    }))
    out = scd2_intervals(ds, "k", "ver", "v").to_pandas()
    out = out.sort_values(["k", "valid_from"]).reset_index(drop=True)
    assert list(out["valid_from"]) == [1, 3, 7, 2, 5]
    # duplicate (k=2, ver=2) collapses keeping max value 21.0
    assert out.loc[3, "v"] == 21.0
    # chained intervals, last one open (pandas renders nullable ints as
    # floats with NaN for the open end)
    vt = out["valid_to"].to_numpy(np.float64)
    assert vt[0] == 3 and vt[1] == 7 and np.isnan(vt[2])
    assert np.isnan(vt[4])


def test_pareto_front_hand(ray_session):
    # maximize x, minimize y; planted frontier {(5,1),(3,0)}; (5,2) loses
    # to (5,1) on equal x; duplicate frontier point survives twice
    ds = rd.from_arrow(pa.table({
        "id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "x": pa.array([5.0, 5.0, 3.0, 2.0, 4.0, 3.0], pa.float64()),
        "y": pa.array([1.0, 2.0, 0.0, 0.0, 1.0, 0.0], pa.float64()),
    }))
    out = pareto_front(ds, "x", "y").to_pandas()
    assert sorted(out["id"]) == [0, 2, 5]


def test_pareto_front_merge_invariance(ray_session):
    # many-block input must give the same frontier as single-block
    rng = np.random.default_rng(7)
    x = rng.integers(0, 50, 4000).astype(np.float64)
    y = rng.integers(0, 50, 4000).astype(np.float64)
    tbl = pa.table({"id": pa.array(np.arange(4000), pa.int64()),
                    "x": pa.array(x), "y": pa.array(y)})
    many = pareto_front(rd.from_arrow(tbl).repartition(16), "x", "y")
    one = pareto_front(rd.from_arrow(tbl), "x", "y")
    a = sorted(many.to_pandas()["id"])
    b = sorted(one.to_pandas()["id"])
    assert a == b and len(a) > 0
    # brute-force dominance check
    fx, fy = x[a], y[a]
    for i in range(len(a)):
        dom = (x >= fx[i]) & (y <= fy[i]) & ((x > fx[i]) | (y < fy[i]))
        assert not dom.any()


def test_per_class_prf_hand(ray_session):
    from epstein_pipeline_ray.stages.evalmetrics import per_class_prf

    ds = rd.from_arrow(pa.table({
        "t": pa.array(["a", "a", "a", "b", "b", "c"], pa.string()),
        "p": pa.array(["a", "a", "b", "b", "a", "d"], pa.string()),
    }))
    out = {r["label"]: r for r in
           per_class_prf(ds, "t", "p").to_pylist()}
    # a: tp=2 fp=1 fn=1 → p=2/3 r=2/3 f1=2/3
    assert out["a"]["tp"] == 2 and out["a"]["fp"] == 1 and out["a"]["fn"] == 1
    assert out["a"]["precision"] == round(2 / 3, 6)
    assert out["a"]["f1"] == round(2 / 3, 6)
    # c: never predicted → precision NULL, recall 0
    assert out["c"]["precision"] is None and out["c"]["recall"] == 0.0
    # d: predicted only → recall NULL
    assert out["d"]["recall"] is None and out["d"]["precision"] == 0.0


def test_event_throttle_hand(ray_session):
    import datetime as dt

    from epstein_pipeline_ray.stages.relational import event_throttle

    t0 = dt.datetime(2024, 1, 1)
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([t0,
                        t0 + dt.timedelta(seconds=30),   # <60s → dropped
                        t0 + dt.timedelta(seconds=90),   # 60s after #2 → kept
                        t0 + dt.timedelta(seconds=90),   # other key
                        t0 + dt.timedelta(seconds=100),  # other key, <60s
                        ], pa.timestamp("us")),
        "k": pa.array(["x", "x", "x", "y", "y"], pa.string()),
    }))
    kept = sorted(r["event_id"] for r in
                  event_throttle(ds, ["k"], "ts", "event_id",
                                 min_gap_s=60).take_all())
    # lag semantics: row 3 is 60s after row 2 (dropped or not) → kept
    assert kept == [1, 3, 4]


def test_peak_concurrency_hand(ray_session):
    from epstein_pipeline_ray.stages.relational import peak_concurrency

    # [0,10) [5,15) [9,12) → peak 3 at t=9; [14,20) alone after
    ds = rd.from_arrow(pa.table({
        "s": pa.array([0, 5, 9, 14], pa.int64()),
        "e": pa.array([10, 15, 12, 20], pa.int64()),
    }))
    t = peak_concurrency(ds, "s", "e").to_pandas()
    assert int(t["peak"][0]) == 3 and int(t["at_us"][0]) == 9


def test_peak_concurrency_halfopen_and_multiblock(ray_session):
    from epstein_pipeline_ray.stages.relational import peak_concurrency

    # back-to-back [0,5) [5,10): end closes BEFORE start opens → peak 1
    ds = rd.from_arrow(pa.table({
        "s": pa.array([0, 5], pa.int64()),
        "e": pa.array([5, 10], pa.int64()),
    }))
    t = peak_concurrency(ds, "s", "e").to_pandas()
    assert int(t["peak"][0]) == 1 and int(t["at_us"][0]) == 0
    # many blocks: all 500 overlap at t=499
    big = rd.from_arrow(pa.table({
        "s": pa.array(np.arange(500), pa.int64()),
        "e": pa.array(np.arange(500) + 1000, pa.int64()),
    })).repartition(11)
    t = peak_concurrency(big, "s", "e").to_pandas()
    assert int(t["peak"][0]) == 500 and int(t["at_us"][0]) == 499


def test_prefix_compression_hand(ray_session):
    from epstein_pipeline_ray.stages.relational import prefix_compression

    # sorted: "apple","applesauce","banana","bandana"
    # lcps: 5 ("apple"), 0, 3 ("ban") → total 8 over 3 pairs
    ds = rd.from_arrow(pa.table({
        "t": pa.array(["banana", "apple", "bandana", "applesauce"],
                      pa.string()),
    }))
    t = prefix_compression(ds, "t").to_pandas()
    assert int(t["n_pairs"][0]) == 3
    assert int(t["total_lcp"][0]) == 8
    assert t["avg_lcp"][0] == round(8 / 3, 6)


def test_prefix_compression_multiblock_invariance(ray_session):
    from epstein_pipeline_ray.stages.relational import prefix_compression

    texts = [f"prefix_{i % 7}_{i}" for i in range(300)]
    one = prefix_compression(rd.from_arrow(
        pa.table({"t": pa.array(texts, pa.string())})), "t").to_pandas()
    many = prefix_compression(rd.from_arrow(
        pa.table({"t": pa.array(texts, pa.string())})).repartition(13),
        "t").to_pandas()
    assert one.equals(many)
    assert int(one["n_pairs"][0]) == 299


def test_median_select_forced_narrowing(ray_session):
    from epstein_pipeline_ray.stages.relational import exact_median_select

    # gather_limit far below n forces several histogram-narrowing
    # rounds; odd n → exact middle
    vals = np.random.default_rng(5).permutation(1001).astype(np.float64)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(7)
    t = exact_median_select(ds, "v", buckets=4, gather_limit=10).to_pandas()
    assert int(t["n"][0]) == 1001 and t["median"][0] == 500.0
    # even n → mean of the two middles
    ds2 = rd.from_arrow(pa.table({
        "v": pa.array([1.0, 2.0, 10.0, 20.0], pa.float64())}))
    t2 = exact_median_select(ds2, "v", buckets=4,
                             gather_limit=2).to_pandas()
    assert t2["median"][0] == 6.0
    # all-equal mass: the convergence guard must terminate
    ds3 = rd.from_arrow(pa.table({
        "v": pa.array(np.full(100, 7.5), pa.float64())}))
    t3 = exact_median_select(ds3, "v", buckets=4,
                             gather_limit=10).to_pandas()
    assert t3["median"][0] == 7.5


def test_ks_two_sample_hand(ray_session):
    from epstein_pipeline_ray.stages.evalmetrics import ks_two_sample

    # a = {1,2,3,4}, b = {3,4,5,6} → max gap at v=2: 2/4 - 0 = 0.5
    ds = rd.from_arrow(pa.table({
        "g": pa.array(["a"] * 4 + ["b"] * 4 + ["other"], pa.string()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 3.0, 4.0, 5.0, 6.0, 99.0],
                      pa.float64()),
    }))
    t = ks_two_sample(ds, "g", "v", "a", "b").to_pandas()
    assert int(t["n_a"][0]) == 4 and int(t["n_b"][0]) == 4
    assert t["ks_d"][0] == 0.5
    # identical distributions → D = 0
    ds2 = rd.from_arrow(pa.table({
        "g": pa.array(["a", "b", "a", "b"], pa.string()),
        "v": pa.array([1.0, 1.0, 2.0, 2.0], pa.float64()),
    }))
    assert ks_two_sample(ds2, "g", "v", "a", "b").to_pandas()[
        "ks_d"][0] == 0.0


def test_ab_proportion_test_hand(ray_session):
    from epstein_pipeline_ray.stages.evalmetrics import ab_proportion_test

    # arm 0: units 0,2 (conv 1,0 → p0=.5); arm 1: units 1,3 (conv 1,1
    # → p1=1.0); pooled p=.75, se²=.75*.25*1 → z = .5/sqrt(.1875)
    ds = rd.from_arrow(pa.table({
        "u": pa.array([0, 0, 2, 1, 3, 3], pa.int64()),
        "flag": pa.array([1, 0, 0, 1, 1, 0], pa.int64()),
        "arm": pa.array([0, 0, 0, 1, 1, 1], pa.int64()),
    }))
    t = ab_proportion_test(ds, "u", "flag", "arm").to_pandas()
    assert int(t["n_0"][0]) == 2 and int(t["n_1"][0]) == 2
    assert t["p_0"][0] == 0.5 and t["p_1"][0] == 1.0
    assert t["z"][0] == round(0.5 / np.sqrt(0.1875), 6)


def test_ab_proportion_no_effect(ray_session):
    from epstein_pipeline_ray.stages.evalmetrics import ab_proportion_test

    ds = rd.from_arrow(pa.table({
        "u": pa.array([0, 1, 2, 3], pa.int64()),
        "flag": pa.array([1, 1, 0, 0], pa.int64()),
        "arm": pa.array([0, 1, 0, 1], pa.int64()),
    }))
    t = ab_proportion_test(ds, "u", "flag", "arm").to_pandas()
    assert t["z"][0] == 0.0
