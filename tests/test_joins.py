"""Semi/anti/attach joins: broadcast plan vs forced exchange plan
(broadcast_rows_limit=0) must agree — the exchange plan is the 10^12 path
where no process holds the key set (VERDICT r1 item 4)."""

import pandas as pd
import pyarrow as pa
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


@pytest.fixture()
def left_right(ray_session):
    left = pd.DataFrame({"k": [1, 2, 3, 4, 5, 2], "v": list("abcdef")})
    right = pd.DataFrame({"k": [2, 4, 9]})
    return _ds(left), _ds(right)


@pytest.mark.parametrize("mode,want", [("semi", {"b", "d", "f"}),
                                       ("anti", {"a", "c", "e"})])
def test_membership_join_plans_agree(left_right, mode, want):
    from epstein_pipeline_ray.stages.joins import key_membership_join

    left, right = left_right
    bc = key_membership_join(left, right, "k", mode=mode).to_pandas()
    ex = key_membership_join(left, right, "k", mode=mode,
                             broadcast_rows_limit=0).to_pandas()
    assert set(bc.v) == set(ex.v) == want


def test_membership_join_casts_right_key(ray_session):
    """String right keys (e.g. stringified conv ids) join against an int
    left key."""
    from epstein_pipeline_ray.stages.joins import key_membership_join

    left = _ds(pd.DataFrame({"k": [10, 20, 30]}))
    right = _ds(pd.DataFrame({"k": ["20", "30"]}))
    for lim in (10, 0):
        out = key_membership_join(left, right, "k", mode="anti",
                                  broadcast_rows_limit=lim).to_pandas()
        assert set(out.k) == {10}


def test_attach_column_plans_agree(ray_session):
    from epstein_pipeline_ray.stages.joins import attach_column

    left = _ds(pd.DataFrame({"id": [1, 2, 3, 2], "x": [9, 8, 7, 6]}))
    right = _ds(pd.DataFrame({"rid": [1, 2], "name": ["one", "two"]}))
    bc = attach_column(left, right, "id", "rid", "name", "nm").to_pandas()
    ex = attach_column(left, right, "id", "rid", "name", "nm",
                       broadcast_rows_limit=0).to_pandas()
    for df in (bc, ex):
        m = dict(zip(df.id, df.nm))
        assert m[1] == "one" and m[2] == "two" and pd.isna(m[3])
        assert len(df) == 4


def test_hash_representatives_exchange_plan(ray_session):
    """hash_representatives with a forced 0 broadcast limit (exchange
    semi-join) must pick the same reps as the broadcast plan."""
    from epstein_pipeline_ray.stages.exact import hash_representatives, with_content_hash

    df = pd.DataFrame(
        {
            "conv_id": ["a", "b", "c", "d"],
            "text": ["same", "same", "other", "same"],
        }
    )
    hashed = with_content_hash(_ds(df)).materialize()
    bc = set(hash_representatives(hashed).to_pandas().conv_id)
    ex = set(hash_representatives(hashed, broadcast_ids_limit=0).to_pandas().conv_id)
    assert bc == ex == {"a", "c"}


def test_extended_verify_exchange_plan(ray_session, tiny_turns):
    """extended_verify with forced exchange joins (limit 0) must keep the
    same pairs as the broadcast plan."""
    import ray.data as rd

    from epstein_pipeline_ray.config import DedupConfig
    from epstein_pipeline_ray.pipelines.dedup import dedup_turns
    from epstein_pipeline_ray.stages.verify import extended_verify

    cfg = DedupConfig()
    res = dedup_turns(rd.from_arrow(tiny_turns), cfg)
    bc = extended_verify(res.pairs, res.docs, cfg).to_pandas()
    ex = extended_verify(res.pairs, res.docs, cfg,
                         broadcast_rows_limit=0).to_pandas()
    key = lambda d: set(zip(d.id_a, d.id_b, d.method))  # noqa: E731
    assert key(bc) == key(ex) and len(bc) > 0


def test_kmv_distinct_sketch_accuracy(ray_session):
    """KMV estimate: exact below k, within sketch-sigma error when full,
    and invariant to how rows are batched (mergeable partials)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import kmv_distinct_per_group

    rng = np.random.default_rng(7)
    # group A: 40 distinct (< k=64, must be exact); group B: 5000 distinct
    vals_a = [f"a{v}" for v in rng.integers(0, 40, size=2000)]
    vals_b = [f"b{v}" for v in range(5000)] * 2
    t = pa.table({
        "g": ["A"] * len(vals_a) + ["B"] * len(vals_b),
        "v": vals_a + vals_b,
    })
    for nblocks in (1, 8):
        out = (kmv_distinct_per_group(
                   rd.from_arrow(t).repartition(nblocks), "g", "v", k=256)
               .to_pandas().set_index("g")["n_distinct_est"])
        assert out["A"] == 40.0
        assert abs(out["B"] - 5000) / 5000 < 0.10, out["B"]  # sigma=1/sqrt(k-2)=6.3%
    # batching-invariance: same sketch → identical estimate
    one = kmv_distinct_per_group(rd.from_arrow(t).repartition(1), "g", "v", k=256).to_pandas()
    many = kmv_distinct_per_group(rd.from_arrow(t).repartition(8), "g", "v", k=256).to_pandas()
    assert one.sort_values("g").reset_index(drop=True).equals(
        many.sort_values("g").reset_index(drop=True))


def test_hll_distinct_sketch_accuracy(ray_session):
    """HLL estimate: near-exact for small groups (linear counting), within
    ~3 sigma (1.04/sqrt(4096) ~ 1.6%) for large ones, batching-invariant
    (register max-merge), and the exchange moves one 4 KiB blob per key
    per batch regardless of raw rows."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import hll_distinct_per_group

    rng = np.random.default_rng(11)
    vals_a = [f"a{v}" for v in rng.integers(0, 40, size=3000)]
    vals_b = [f"b{v}" for v in range(20000)] * 2
    t = pa.table({
        "g": ["A"] * len(vals_a) + ["B"] * len(vals_b),
        "v": vals_a + vals_b,
    })
    for nblocks in (1, 8):
        out = (hll_distinct_per_group(
                   rd.from_arrow(t).repartition(nblocks), "g", "v", p=12)
               .to_pandas().set_index("g")["n_distinct_est"])
        assert abs(out["A"] - 40) <= 1, out["A"]          # linear counting
        assert abs(out["B"] - 20000) / 20000 < 0.05, out["B"]
    one = hll_distinct_per_group(rd.from_arrow(t).repartition(1), "g", "v").to_pandas()
    many = hll_distinct_per_group(rd.from_arrow(t).repartition(8), "g", "v").to_pandas()
    assert one.sort_values("g").reset_index(drop=True).equals(
        many.sort_values("g").reset_index(drop=True))


def test_misra_gries_heavy_hitters(ray_session):
    """MG guarantees: every value with true freq > N/capacity survives,
    and reported counts undercount by at most N/capacity."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import misra_gries_topk_per_group

    rng = np.random.default_rng(23)
    # group G: 3 heavy values (20% / 10% / 8%) over a long uniform tail
    N = 30000
    heavy = (["hot-a"] * 6000 + ["hot-b"] * 3000 + ["hot-c"] * 2400)
    tail = [f"t{v}" for v in rng.integers(0, 5000, size=N - len(heavy))]
    vals = heavy + tail
    rng.shuffle(vals)
    t = pa.table({"g": ["G"] * N, "v": vals})
    cap = 256
    for nblocks in (1, 8):
        out = (misra_gries_topk_per_group(
                   rd.from_arrow(t).repartition(nblocks), "g", "v",
                   k=10, capacity=cap).to_pandas())
        got = dict(zip(out.v, out.count_est))
        err = N / cap  # ~117
        for val, true in (("hot-a", 6000), ("hot-b", 3000), ("hot-c", 2400)):
            assert val in got, (nblocks, val)
            assert true - 2 * err <= got[val] <= true, (val, got[val])
        # top of the list is the heaviest value
        assert out.iloc[0].v == "hot-a"


def test_sampled_quantile_sketch(ray_session):
    """Bottom-k-by-hash quantile: exact for small groups, within rank-space
    tolerance for large ones, EXACTLY batching-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import sampled_quantile_per_group

    rng = np.random.default_rng(3)
    small_vals = rng.uniform(0, 100, 200)          # group A: exact (<= k)
    big_vals = rng.uniform(0, 1000, 60000)         # group B: sampled
    t = pa.table({
        "g": ["A"] * 200 + ["B"] * 60000,
        "rid": pa.array(range(60200), pa.int64()),
        "v": pa.array(np.concatenate([small_vals, big_vals]), pa.float64()),
    })
    outs = {}
    for nblocks in (1, 8):
        out = (sampled_quantile_per_group(
                   rd.from_arrow(t).repartition(nblocks), "g", "v", "rid",
                   q=0.9, k=1024)
               .to_pandas().set_index("g")["quantile_est"])
        outs[nblocks] = out
        assert abs(out["A"] - np.quantile(small_vals, 0.9)) < 1e-6
        # rank se = sqrt(.09/1024) ~ 0.0094 → +-4 sigma ~ +-38 on [0,1000]
        assert abs(out["B"] - np.quantile(big_vals, 0.9)) < 40, out["B"]
    # deterministic min-k → bit-identical across batchings
    assert outs[1].equals(outs[8])


def test_rollup_stats_levels(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import rollup_stats

    rows = [("a", "en", 10), ("a", "en", 5), ("a", "fr", 1),
            ("b", "en", 2)]
    ds = rd.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([r[2] for r in rows], pa.int64()),
    }))
    got = rollup_stats(ds, ["source", "lang"], "n_chars").to_pandas()
    key = got.set_index(["source", "lang"])
    # leaf
    assert key.loc[("a", "en")].n_rows == 2 and key.loc[("a", "en")].sum_value == 15
    assert key.loc[("a", "fr")].sum_value == 1
    # source level (lang NULL)
    lvl1 = got[got.lang.isna() & got.source.notna()].set_index("source")
    assert lvl1.loc["a"].n_rows == 3 and lvl1.loc["a"].sum_value == 16
    assert lvl1.loc["b"].sum_value == 2
    # grand total
    total = got[got.source.isna() & got.lang.isna()]
    assert len(total) == 1
    assert total.iloc[0].n_rows == 4 and total.iloc[0].sum_value == 18
    # row count: 3 leaves + 2 source rows + 1 total
    assert len(got) == 6


def test_hash_join_mn_both_plans(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.joins import hash_join

    L = pa.table({"k": pa.array([1, 1, 2, 3, 5], pa.int64()),
                  "v": pa.array(["a", "b", "c", "d", "e"], pa.string()),
                  "shared": pa.array([10, 20, 30, 40, 50], pa.int64())})
    R = pa.table({"kk": pa.array([1, 1, 2, 2, 4], pa.int64()),
                  "w": pa.array([1.5, 2.5, 3.5, 4.5, 5.5], pa.float64()),
                  "shared": pa.array([-1, -2, -3, -4, -5], pa.int64())})
    want = (L.to_pandas().rename(columns={"shared": "shared_l"})
            .merge(R.to_pandas().rename(columns={"shared": "shared_r",
                                                 "kk": "k"}), on="k")
            .sort_values(["k", "v", "w"]).reset_index(drop=True))
    for lim in (2_000_000, 0):  # broadcast plan, forced exchange plan
        got = (hash_join(rd.from_arrow(L), rd.from_arrow(R), "k", "kk",
                         broadcast_rows_limit=lim)
               .to_pandas().sort_values(["k", "v", "w"])
               .reset_index(drop=True))
        # m:n: key 1 → 2x2 = 4 rows; keys 3/5 (left-only) and 4
        # (right-only) drop
        assert (got.k == 1).sum() == 4
        assert set(got.k) == {1, 2}
        pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                      want[sorted(want.columns)],
                                      check_dtype=False)
        # integer payloads survive the NaN-padding round-trip
        assert str(got.shared_l.dtype) == "int64"
        assert str(got.shared_r.dtype) == "int64"


def test_hash_join_left_outer_both_plans(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.joins import hash_join

    L = pa.table({"k": pa.array([1, 3, 5], pa.int64()),
                  "v": pa.array(["a", "b", "c"], pa.string())})
    R = pa.table({"k": pa.array([1, 1], pa.int64()),
                  "w": pa.array([9.0, 8.0], pa.float64())})
    for lim in (2_000_000, 0):
        got = (hash_join(rd.from_arrow(L), rd.from_arrow(R), "k",
                         how="left", broadcast_rows_limit=lim)
               .to_pandas().sort_values(["k", "w"]).reset_index(drop=True))
        # key 1 matches twice; 3 and 5 survive with null right payload
        assert got.k.tolist() == [1, 1, 3, 5]
        assert got.w.tolist()[:2] == [8.0, 9.0]
        assert got.w.isna().tolist() == [False, False, True, True]


def test_with_group_rank_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import with_group_rank

    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([7, 7, 7, 9, 9], pa.int64()),
        "value": pa.array([5.0, 9.0, 5.0, 1.0, 2.0], pa.float64()),
    }))
    got = (with_group_rank(ds, "user_id", "value", "event_id")
           .to_pandas().sort_values(["user_id", "rank"])
           .reset_index(drop=True))
    # user 7: value 9 first, then the 5.0 tie broken by event_id
    assert got[got.user_id == 7].event_id.tolist() == [2, 1, 3]
    assert got[got.user_id == 7]["rank"].tolist() == [1, 2, 3]
    assert got[got.user_id == 9].event_id.tolist() == [5, 4]


def test_grouped_mode_ties_to_smallest(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import grouped_mode

    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "v": pa.array(["b", "b", "a", "a", "z", "y"], pa.string()),
    }))
    got = (grouped_mode(ds, "k", "v").to_pandas()
           .sort_values("k").reset_index(drop=True))
    # k=1: a and b tie at 2 -> smallest wins; k=2: y and z tie at 1
    assert got.mode_value.tolist() == ["a", "y"]


def test_hash_join_full_outer(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.joins import hash_join

    L = pa.table({"k": pa.array([1, 3], pa.int64()),
                  "v": pa.array(["a", "b"], pa.string())})
    R = pa.table({"k": pa.array([1, 4], pa.int64()),
                  "w": pa.array([9.0, 7.0], pa.float64())})
    got = (hash_join(rd.from_arrow(L), rd.from_arrow(R), "k", how="outer")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got.k.tolist() == [1, 3, 4]
    assert got.v.tolist() == ["a", "b", None]
    assert got.w.fillna(-1).tolist() == [9.0, -1.0, 7.0]


def test_budget_select_tie_boundary(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import budget_select

    # scores: one high doc (w=10), then TEN tied docs (w=10 each) at
    # the boundary score; budget 45 keeps the high doc + the first 3
    # tied docs by id (10+10+10+10 = 40 <= 45; the 4th tied doc would
    # reach 50)
    n = 10
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(100, 100 + n)) + [1], pa.int64()),
        "score": pa.array([0.5] * n + [0.9], pa.float64()),
        "w": pa.array([10] * (n + 1), pa.int64()),
    }))
    got = (budget_select(ds, "score", "w", budget=45, id_bucket_width=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.doc_id.tolist() == [1, 100, 101, 102]

    # budget larger than everything -> all rows survive
    got2 = budget_select(ds, "score", "w", budget=1e9).to_pandas()
    assert len(got2) == n + 1
    # budget smaller than the first row -> nothing survives
    got3 = budget_select(ds, "score", "w", budget=5).to_pandas()
    assert len(got3) == 0


def test_cube_stats_lattice(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import cube_stats

    rows = [("a", "en", 10), ("a", "fr", 1), ("b", "en", 2)]
    ds = rd.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([r[2] for r in rows], pa.int64()),
    }))
    got = cube_stats(ds, ["source", "lang"], "n_chars").to_pandas()
    # lattice: 3 leaves + 2 source-only + 2 lang-only + 1 total = 8
    assert len(got) == 8
    lang_only = got[got.source.isna() & got.lang.notna()].set_index("lang")
    assert lang_only.loc["en"].sum_value == 12
    assert lang_only.loc["fr"].sum_value == 1
    total = got[got.source.isna() & got.lang.isna()]
    assert total.iloc[0].n_rows == 3 and total.iloc[0].sum_value == 13


def test_value_histogram_edges(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import value_histogram

    ds = rd.from_arrow(pa.table({
        "value": pa.array([0.0, 1.0, 2.0, 9.9, 10.0], pa.float64()),
    }))
    got = value_histogram(ds, "value", bins=10).to_pandas()
    idx = got.set_index("bin")["n"]
    # max lands in the LAST bin (clamped), exact edge 1.0 in bin 1
    assert idx[0] == 1 and idx[1] == 1 and idx[2] == 1
    assert idx[9] == 2  # 9.9 and the clamped 10.0
    # constant column degenerates to one bucket
    ds2 = rd.from_arrow(pa.table({"value": pa.array([5.0] * 4)}))
    got2 = value_histogram(ds2, "value", bins=10).to_pandas()
    assert got2.n.tolist() == [4]


def test_dataset_diff_statuses(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.exact import dataset_diff

    old = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["same", "will change", "gone", "Same  WS"],
                         pa.string()),
    }))
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 4, 9], pa.int64()),
        "text": pa.array(["same", "did change", "same ws", "brand new"],
                         pa.string()),
    }))
    got = (dataset_diff(old, new).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc 4: 'Same  WS' vs 'same ws' are IDENTICAL after normalization
    assert got.values.tolist() == [
        [2, "changed"], [3, "removed"], [9, "added"]]


def test_with_group_ntile_sql_sizes(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import with_group_ntile

    # 7 rows into 4 tiles: sizes 2,2,2,1 (first n%4=3 tiles get the
    # extra row over floor(7/4)=1... SQL: ceil sizes 2,2,2 then 1)
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1] * 7 + [2] * 2, pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50, 60, 70, 5, 6], pa.float64()),
        "id": pa.array(list(range(9)), pa.int64()),
    }))
    got = (with_group_ntile(ds, "k", "v", "id", n_tiles=4).to_pandas()
           .sort_values(["k", "v"]).reset_index(drop=True))
    assert got[got.k == 1].tile.tolist() == [1, 1, 2, 2, 3, 3, 4]
    assert got[got.k == 2].tile.tolist() == [1, 2]


def test_cms_overcount_and_twin(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import (
        cms_count_per_key, cms_sql)

    rng = np.random.RandomState(23)
    vals = rng.zipf(1.6, 3000) % 200  # skewed, 200-value domain
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))

    got = (cms_count_per_key(ds, "v", d=4, w=32).to_pandas()
           .sort_values("v").reset_index(drop=True))
    con = duckdb.connect()
    lst = ",".join(f"({int(x)})" for x in vals)
    want = (con.sql(cms_sql(f"t(v) AS (VALUES {lst})", d=4, w=32)).df()
            .sort_values("v").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # CMS one-sided error: est >= exact everywhere; at w=32 << 200-value
    # domain collisions MUST produce at least one strict overcount
    exact = pd.Series(vals).value_counts()
    est = got.set_index("v")["est"]
    assert (est >= exact.reindex(est.index)).all()
    assert (est > exact.reindex(est.index)).any()

    # counter addition is exact merge: a different batching cannot change
    # any estimate (KMV/HLL-style merge-order sensitivity does not exist)
    rebatched = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())})) \
        .repartition(7)
    got2 = (cms_count_per_key(rebatched, "v", d=4, w=32).to_pandas()
            .sort_values("v").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


def test_pivot_counts_domain_and_batching(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import pivot_counts

    rng = np.random.RandomState(31)
    n = 500
    ks = [f"s{int(x)}" for x in rng.randint(0, 7, n)]
    cs = [["a", "b", "c", "zz"][int(x)] for x in rng.randint(0, 4, n)]
    tbl = pa.table({"k": pa.array(ks, pa.string()),
                    "c": pa.array(cs, pa.string())})
    # 'zz' is OUTSIDE the declared domain -> ignored, not an error
    got = (pivot_counts(rd.from_arrow(tbl), "k", "c", ["a", "b", "c"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    df = pd.DataFrame({"k": ks, "c": cs})
    want = (df[df.c != "zz"].groupby(["k", "c"]).size().unstack(fill_value=0)
            .rename(columns=lambda c: f"n_{c}").reset_index()
            .rename_axis(None, axis=1).sort_values("k")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # wide-partial sums are batching-invariant
    got2 = (pivot_counts(rd.from_arrow(tbl).repartition(9), "k", "c",
                         ["a", "b", "c"])
            .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


def test_rank_stats_hand_truth(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import with_group_rank_stats

    # group g: values 9,9,7,7,7,2 (DESC) -> rnk 1,1,3,3,3,6; drnk 1,1,2,2,2,3
    # prank (n=6): 0,0,.4,.4,.4,1 ; cdist: 2/6,2/6,5/6,5/6,5/6,1
    # group h: single row -> rnk 1, drnk 1, prank 0, cdist 1
    tbl = pa.table({
        "id": pa.array(list(range(7)), pa.int64()),
        "k": pa.array(["g"] * 6 + ["h"], pa.string()),
        "v": pa.array([9, 7, 2, 9, 7, 7, 5], pa.int64()),
    })
    got = (with_group_rank_stats(rd.from_arrow(tbl), "k", "v")
           .to_pandas().sort_values(["k", "v", "id"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))
    assert got.rnk.tolist() == [1, 1, 3, 3, 3, 6, 1]
    assert got.drnk.tolist() == [1, 1, 2, 2, 2, 3, 1]
    assert got.prank.tolist() == [0.0, 0.0, 0.4, 0.4, 0.4, 1.0, 0.0]
    assert [round(c, 9) for c in got.cdist.tolist()] == [
        round(2 / 6, 9)] * 2 + [round(5 / 6, 9)] * 3 + [1.0, 1.0]


def test_cohort_retention_hand_truth(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import cohort_retention

    DAY = 86_400_000_000  # microseconds
    rows = [  # (user, day): u1 first day0, active d0,d2; u2 d0,d1; u3 d2
        (1, 0), (1, 0), (1, 2),       # duplicate same-day activity counts once
        (2, 0), (2, 1),
        (3, 2),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * DAY + 1 for r in rows],
                       pa.timestamp("us")),
    })
    got = (cohort_retention(rd.from_arrow(tbl), period_s=86400)
           .to_pandas().sort_values(["cohort_period", "period_offset"])
           .reset_index(drop=True))
    # cohort day 0: offset 0 -> {1,2}; offset 1 -> {2}; offset 2 -> {1}
    # cohort day 2: offset 0 -> {3}
    want = pd.DataFrame({
        "cohort_period": [0, 0, 0, 2],
        "period_offset": [0, 1, 2, 0],
        "n_users": [2, 1, 1, 1],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_funnel_steps_hand_truth(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import funnel_steps

    rows = [
        # u1: full funnel in order -> 3
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: click BEFORE the first view -> stuck at 1
        (2, "click", 5), (2, "view", 10),
        # u3: purchase before click -> 2 (click at 40, purchase never after)
        (3, "view", 10), (3, "purchase", 20), (3, "click", 40),
        # u4: never views (click+purchase only) -> absent from output
        (4, "click", 10), (4, "purchase", 20),
        # u5: equal timestamps count (>= inclusive) -> 3
        (5, "view", 7), (5, "click", 7), (5, "purchase", 7),
        # noise types are ignored
        (1, "error", 1), (2, "signup", 1),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
    })
    got = (funnel_steps(rd.from_arrow(tbl), ["view", "click", "purchase"])
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    want = pd.DataFrame({"user_id": [1, 2, 3, 5],
                         "max_step": [3, 1, 2, 3]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_gini_geomean_entropy_closed_forms(ray_session):
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import (
        grouped_entropy, grouped_geomean, grouped_gini)

    # gini: perfect equality -> 0; one-holder extreme -> (n-1)/n
    tbl = pa.table({
        "k": pa.array(["eq"] * 4 + ["ex"] * 4, pa.string()),
        "x": pa.array([5.0, 5.0, 5.0, 5.0, 0.0, 0.0, 0.0, 8.0],
                      pa.float64()),
    })
    g = (grouped_gini(rd.from_arrow(tbl), "k", "x").to_pandas()
         .set_index("k")["gini"])
    assert g["eq"] == 0.0
    assert g["ex"] == round((4 - 1) / 4, 9)

    # geomean: {2,8} -> 4; non-positive values dropped
    t2 = pa.table({"k": pa.array(["a"] * 3, pa.string()),
                   "x": pa.array([2.0, 8.0, 0.0], pa.float64())})
    gm = (grouped_geomean(rd.from_arrow(t2), "k", "x").to_pandas()
          .set_index("k")["geomean"])
    assert abs(gm["a"] - 4.0) < 1e-9

    # entropy: uniform over 4 values -> ln 4; constant -> 0
    t3 = pa.table({
        "k": pa.array(["u"] * 4 + ["c"] * 4, pa.string()),
        "v": pa.array([1, 2, 3, 4, 7, 7, 7, 7], pa.int64()),
    })
    h = (grouped_entropy(rd.from_arrow(t3), "k", "v").to_pandas()
         .set_index("k")["entropy"])
    assert abs(h["u"] - math.log(4)) < 1e-9
    assert h["c"] == 0.0

    # gini batching invariance (one exchange -> same blocks regardless)
    rng = np.random.RandomState(5)
    big = pa.table({
        "k": pa.array([f"g{i % 3}" for i in range(300)], pa.string()),
        "x": pa.array(rng.rand(300) * 10, pa.float64()),
    })
    a = (grouped_gini(rd.from_arrow(big), "k", "x").to_pandas()
         .sort_values("k").reset_index(drop=True))
    b = (grouped_gini(rd.from_arrow(big).repartition(11), "k", "x")
         .to_pandas().sort_values("k").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)


def test_weighted_median_and_argmax_hand_truth(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import (
        grouped_argmax, grouped_weighted_median)

    # g: values 1,2,3 weights 1,1,10 -> running 1,2,12 vs tot/2=6 -> 3
    # h: values 1,2 weights 3,1 -> running 3,4 vs 2 -> 1 (lower median)
    # z: zero/negative weights dropped -> only v=5 survives
    tbl = pa.table({
        "k": pa.array(["g", "g", "g", "h", "h", "z", "z"], pa.string()),
        "v": pa.array([1.0, 2.0, 3.0, 1.0, 2.0, 9.0, 5.0], pa.float64()),
        "w": pa.array([1.0, 1.0, 10.0, 3.0, 1.0, 0.0, 2.0], pa.float64()),
    })
    got = (grouped_weighted_median(rd.from_arrow(tbl), "k", "v", "w")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = pd.DataFrame({"k": ["g", "h", "z"],
                         "wmedian": [3.0, 1.0, 5.0]})
    pd.testing.assert_frame_equal(got, want)

    # argmax: max order, tie -> smallest tie_col, full row preserved
    t2 = pa.table({
        "k": pa.array(["a", "a", "a", "b"], pa.string()),
        "o": pa.array([5, 9, 9, 1], pa.int64()),
        "t": pa.array([7, 4, 2, 0], pa.int64()),
        "payload": pa.array(["x", "y", "z", "w"], pa.string()),
    })
    top = (grouped_argmax(rd.from_arrow(t2), "k", "o", "t")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert top.payload.tolist() == ["z", "w"]  # o=9 tie -> t=2 wins
    assert top.o.tolist() == [9, 1]


def test_harmonic_mean_closed_form(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import grouped_harmonic

    # {2,6,12}: 3 / (1/2+1/6+1/12) = 4; zero dropped
    tbl = pa.table({
        "k": pa.array(["a"] * 4, pa.string()),
        "x": pa.array([2.0, 6.0, 12.0, 0.0], pa.float64()),
    })
    got = (grouped_harmonic(rd.from_arrow(tbl), "k", "x").to_pandas()
           .set_index("k")["harmonic"])
    assert abs(got["a"] - 4.0) < 1e-9


def test_rolling_active_users_hand_truth(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import rolling_active_users

    DAY = 86_400_000_000
    rows = [(1, 0), (1, 0), (2, 0), (1, 2), (3, 5)]  # (user, day)
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * DAY + 5 for r in rows],
                       pa.timestamp("us")),
    })
    got = (rolling_active_users(rd.from_arrow(tbl), window=3)
           .to_pandas().sort_values("period").reset_index(drop=True))
    # window=3: day d covers active days d-2..d
    # actives: day0 {1,2}, day2 {1}, day5 {3}
    want = pd.DataFrame({
        "period": [0, 1, 2, 3, 4, 5, 6, 7],
        "n_users": [2, 2, 2, 1, 1, 1, 1, 1],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_trend_and_markov_hand_truth(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import (
        grouped_trend, markov_transitions)

    DAY = 86_400_000_000
    # type a: counts day0=1, day1=2, day2=3 -> slope 1, intercept 1
    # type b: single day -> NULL slope/intercept
    rows = [("a", 0), ("a", 1), ("a", 1), ("a", 2), ("a", 2), ("a", 2),
            ("b", 4), ("b", 4)]
    tbl = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] * DAY + 3 for r in rows],
                       pa.timestamp("us")),
    })
    got = (grouped_trend(rd.from_arrow(tbl), "event_type", "ts")
           .to_pandas().set_index("event_type"))
    assert got.loc["a", "slope"] == 1.0
    assert got.loc["a", "intercept"] == 1.0
    assert got.loc["a", "n_periods"] == 3
    assert pd.isna(got.loc["b", "slope"])

    # markov: user 1 sequence x->y->x ; user 2: x->y
    # transitions: x->y (2), y->x (1); p(x->y)=1.0, p(y->x)=1.0
    m = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["x", "y", "x", "x", "y"], pa.string()),
        "ts": pa.array([1, 2, 3, 1, 2], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    got2 = (markov_transitions(rd.from_arrow(m), "user_id", "event_type",
                               "ts", "event_id")
            .to_pandas().sort_values(["from_state", "to_state"])
            .reset_index(drop=True))
    want = pd.DataFrame({
        "from_state": ["x", "y"], "to_state": ["y", "x"],
        "n": [2, 1], "p": [1.0, 1.0],
    })
    pd.testing.assert_frame_equal(got2, want, check_dtype=False)


def test_vocab_growth_modes(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.textops import vocab_growth

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta", "beta gamma", "ALPHA  beta",
                          "delta"], pa.string()),
    })
    # tokens mode, bucket=2: alpha,beta first in doc 0; gamma doc 1;
    # delta doc 3 -> bucket0: 3 tokens, bucket1: 1 -> cum 3, 4
    got = (vocab_growth(rd.from_arrow(tbl), bucket=2).to_pandas()
           .sort_values("prefix_docs").reset_index(drop=True))
    want = pd.DataFrame({"prefix_docs": [2, 4], "vocab_size": [3, 4]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # content mode: doc2 normalizes to doc0's content -> distinct
    # contents first appear at 0, 1, 3 -> cum 2, 3
    got2 = (vocab_growth(rd.from_arrow(tbl), bucket=2, mode="content")
            .to_pandas().sort_values("prefix_docs")
            .reset_index(drop=True))
    want2 = pd.DataFrame({"prefix_docs": [2, 4], "vocab_size": [2, 3]})
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)


def test_key_skew_and_cms_join_size(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import (
        cms_join_size, key_skew_report)

    # keys: a x6, b x3, c x1 -> n_keys 3, n_rows 10, max 6,
    # top1 0.6, hhi = (36+9+1)/100 = 0.46
    ks = ["a"] * 6 + ["b"] * 3 + ["c"]
    ds = rd.from_arrow(pa.table({"k": pa.array(ks, pa.string())}))
    got = key_skew_report(ds, "k").to_pandas().iloc[0]
    assert got.n_keys == 3 and got.n_rows == 10 and got.max_freq == 6
    assert got.top1_share == 0.6 and got.hhi == 0.46

    # CMS join estimate is one-sided: est >= true join size; with a
    # wide sketch (w >> domain) it is EXACT
    rng = np.random.RandomState(3)
    la = rng.randint(0, 40, 300).astype(np.int64)
    rb = rng.randint(0, 40, 200).astype(np.int64)
    left = rd.from_arrow(pa.table({"k": pa.array(la, pa.int64())}))
    right = rd.from_arrow(pa.table({"j": pa.array(rb, pa.int64())}))
    true_join = int(sum((la == v).sum() * (rb == v).sum()
                        for v in np.unique(np.concatenate([la, rb]))))
    est_wide = int(cms_join_size(left, right, "k", "j", d=4, w=4096)
                   .to_pandas().iloc[0].est_join_rows)
    assert est_wide == true_join
    est_narrow = int(cms_join_size(left, right, "k", "j", d=4, w=16)
                     .to_pandas().iloc[0].est_join_rows)
    assert est_narrow >= true_join


def test_winsorize_per_group_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import winsorize_per_group

    # 11 values 0..10: p10 = 1.0, p90 = 9.0 (linear interpolation on
    # integer grid) -> 0 clips to 1, 10 clips to 9, middle unchanged
    tbl = pa.table({
        "id": pa.array(list(range(11)), pa.int64()),
        "k": pa.array(["g"] * 11, pa.string()),
        "v": pa.array([float(i) for i in range(11)], pa.float64()),
    })
    got = (winsorize_per_group(rd.from_arrow(tbl), "k", "v",
                               lo=0.1, hi=0.9)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert got.v_w.tolist() == [1.0] + [float(i) for i in range(1, 10)] + [9.0]
    assert list(got.columns) == ["id", "k", "v", "v_w"]


def test_phrase_positions_repeated_terms(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.ranking import phrase_positions

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b a a b c",      # "a a b" starts at pos 2
            "a a a b",          # "a a b" starts at pos 1 AND... pos 2? a(1) a(2) b(3) yes; pos 0: a a a no
            "b a b a",          # no match
        ], pa.string()),
    }))
    got = (phrase_positions(docs, ["a", "a", "b"]).to_pandas()
           .sort_values(["doc_id", "anchor"]).reset_index(drop=True))
    want = pd.DataFrame({"doc_id": [1, 2], "anchor": [2, 1]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bigram_pmi_hand_truth(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.ranking import bigram_pmi

    # corpus: "x y" always adjacent; "a b" and "a c" split a's mass
    docs = rd.from_arrow(pa.table({"text": pa.array(
        ["x y a b", "x y a c", "x y a b"], pa.string())}))
    got = (bigram_pmi(docs, min_count=1).to_pandas()
           .set_index(["w1", "w2"]))
    # bigrams: (x,y)x3 (y,a)x3 (a,b)x2 (a,c)x1 -> N=9
    # pmi(x,y) = ln(9*3/(3*3)) = ln 3
    assert abs(got.loc[("x", "y"), "pmi"] - math.log(3)) < 1e-9
    assert got.loc[("x", "y"), "n"] == 3
    # pmi(a,b) = ln(9*2/(3*2)) = ln 3 ; pmi(a,c) = ln(9*1/(3*1)) = ln 3
    assert abs(got.loc[("a", "b"), "pmi"] - math.log(3)) < 1e-9
    # min_count prunes
    got2 = bigram_pmi(docs, min_count=2).to_pandas()
    assert ("a", "c") not in set(zip(got2.w1, got2.w2))


def test_time_weighted_avg_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import time_weighted_avg

    US = 1_000_000
    # u1: v=10 held 2s, v=0 held 8s -> twa = 20/10 = 2.0
    # u2: single event -> no interval -> absent
    # u3: two events at the SAME ts -> total duration 0 -> absent
    rows = [(1, 10.0, 0), (1, 0.0, 2), (1, 99.0, 10),
            (2, 5.0, 0),
            (3, 1.0, 4), (3, 2.0, 4)]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "value": pa.array([r[1] for r in rows], pa.float64()),
        "ts": pa.array([r[2] * US for r in rows], pa.timestamp("us")),
        "event_id": pa.array(list(range(6)), pa.int64()),
    })
    got = (time_weighted_avg(rd.from_arrow(tbl), "user_id", "value",
                             "ts", "event_id")
           .to_pandas().set_index("user_id")["twa"])
    assert got.to_dict() == {1: 2.0}


def test_mutual_information_truths(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import mutual_information

    # independent uniform 2x2 -> MI = 0
    ind = pa.table({
        "a": pa.array(["x", "x", "y", "y"], pa.string()),
        "b": pa.array(["p", "q", "p", "q"], pa.string()),
    })
    mi0 = mutual_information(rd.from_arrow(ind), "a", "b") \
        .to_pandas().iloc[0]
    assert abs(mi0.mi) < 1e-12 and mi0.n == 4

    # perfectly dependent binary -> MI = ln 2
    dep = pa.table({
        "a": pa.array(["x", "x", "y", "y"], pa.string()),
        "b": pa.array(["p", "p", "q", "q"], pa.string()),
    })
    mi1 = mutual_information(rd.from_arrow(dep), "a", "b") \
        .to_pandas().iloc[0]
    assert abs(mi1.mi - math.log(2)) < 1e-9


def test_chi_square_truths(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import chi_square

    # perfect dependence 2x2 with 4 rows -> chi2 = N = 4, V = 1
    dep = pa.table({
        "a": pa.array(["x", "x", "y", "y"], pa.string()),
        "b": pa.array(["p", "p", "q", "q"], pa.string()),
    })
    r = chi_square(rd.from_arrow(dep), "a", "b").to_pandas().iloc[0]
    assert r.chi2 == 4.0 and r.cramers_v == 1.0 and r.dof == 1

    # independence -> chi2 0
    ind = pa.table({
        "a": pa.array(["x", "x", "y", "y"], pa.string()),
        "b": pa.array(["p", "q", "p", "q"], pa.string()),
    })
    r2 = chi_square(rd.from_arrow(ind), "a", "b").to_pandas().iloc[0]
    assert abs(r2.chi2) < 1e-12 and r2.cramers_v == 0.0


def test_spearman_truths(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import grouped_spearman

    rng = np.random.RandomState(3)
    x = rng.randint(0, 10, 60).astype(float)   # heavy ties
    noise = rng.randn(60)
    y = x * 2 + noise
    tbl = pa.table({
        "k": pa.array(["m"] * 60 + ["up"] * 4 + ["down"] * 4, pa.string()),
        "x": pa.array(list(x) + [1, 2, 3, 4] + [1, 2, 3, 4], pa.float64()),
        "y": pa.array(list(y) + [10, 20, 30, 40] + [9, 7, 5, 3],
                      pa.float64()),
    })
    got = (grouped_spearman(rd.from_arrow(tbl), "k", "x", "y")
           .to_pandas().set_index("k"))
    assert got.loc["up", "spearman"] == 1.0
    assert got.loc["down", "spearman"] == -1.0

    # tie-aware reference: pearson of pandas average ranks
    rx = pd.Series(x).rank(method="average")
    ry = pd.Series(y).rank(method="average")
    want = np.corrcoef(rx, ry)[0, 1]
    assert abs(got.loc["m", "spearman"] - want) < 1e-9


def test_daily_anomaly_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import daily_anomaly

    DAY = 86_400_000_000
    # type a: days 0..4 have 2 events, day 5 spikes to 12
    rows = []
    for d in range(5):
        rows += [("a", d)] * 2
    rows += [("a", 5)] * 12
    # type b: constant -> sd 0 -> NULL z, never flagged
    rows += [("b", 0), ("b", 1)]
    tbl = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] * DAY + 9 for r in rows],
                       pa.timestamp("us")),
    })
    got = (daily_anomaly(rd.from_arrow(tbl), "event_type", "ts")
           .to_pandas())
    a5 = got[(got.event_type == "a") & (got.period == 5)].iloc[0]
    assert bool(a5.is_anomaly) and a5.z > 2
    a0 = got[(got.event_type == "a") & (got.period == 0)].iloc[0]
    assert not bool(a0.is_anomaly)
    import pandas as pd
    b = got[got.event_type == "b"]
    assert b.z.isna().all() and (~b.is_anomaly).all()


def test_gap_fill_daily_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import gap_fill_daily

    day_us = 86_400 * 1_000_000
    ts = pa.array([
        0 * day_us + 10,       # a, day 0
        0 * day_us + 20,       # a, day 0 (later -> closing)
        3 * day_us + 5,        # a, day 3 (days 1-2 are gaps)
        1 * day_us + 7,        # b, day 1 only
        0 * day_us + 20,       # a, day 0, SAME ts as event 2 -> tie on id
    ], pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": ts,
        "event_type": pa.array(["a", "a", "a", "b", "a"], pa.string()),
        "value": pa.array([10.0, 20.0, 30.0, 7.0, 99.0], pa.float64()),
    }))
    got = (gap_fill_daily(ev, "event_type").to_pandas()
           .sort_values(["event_type", "day"]).reset_index(drop=True))
    a = got[got.event_type == "a"]
    assert a.day.tolist() == [0, 1, 2, 3]
    # tie at (day 0, ts 20): event_id 5 wins -> closing 99.0, then ffill
    assert a.value.tolist() == [99.0, 99.0, 99.0, 30.0]
    assert a.is_observed.tolist() == [True, False, False, True]
    b = got[got.event_type == "b"]
    assert b.day.tolist() == [1] and b.value.tolist() == [7.0]


def test_event_path_ngrams_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import event_path_ngrams

    # user 1: a b a b  -> paths aba, bab ; user 2: a b (too short)
    ev = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": pa.array([10, 20, 30, 40, 10, 20], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "b", "a", "b"], pa.string()),
    }))
    got = (event_path_ngrams(ev, "user_id", "event_type", "ts", "event_id",
                             n=3).to_pandas()
           .sort_values(["s1", "s2", "s3"]).reset_index(drop=True))
    assert got[["s1", "s2", "s3"]].agg("".join, axis=1).tolist() == \
        ["aba", "bab"]
    assert got.n_paths.tolist() == [1, 1]
    # min_count prunes singletons
    pruned = event_path_ngrams(ev, "user_id", "event_type", "ts",
                               "event_id", n=3, min_count=2).to_pandas()
    assert len(pruned) == 0
    # n=2 equals the markov pair counts: ab x2(user1) +1(user2), ba x1
    two = (event_path_ngrams(ev, "user_id", "event_type", "ts", "event_id",
                             n=2).to_pandas()
           .set_index(["s1", "s2"]).n_paths)
    assert two.loc[("a", "b")] == 3 and two.loc[("b", "a")] == 1


def test_grouped_autocorr1_hand_truths(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import grouped_autocorr1

    def mk(key, vals):
        return [(key, i, float(v)) for i, v in enumerate(vals)]

    rows = (mk("trend", [1, 2, 3, 4, 5, 6])        # strong positive r1
            + mk("alt", [1, 9, 1, 9, 1, 9])        # strong negative r1
            + mk("flat", [5, 5, 5])                # zero variance -> NULL
            + mk("single", [3]))                   # n < 2 -> NULL
    ev = rd.from_arrow(pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array([r[1] * 1000 for r in rows], pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    }))
    got = (grouped_autocorr1(ev, "event_type", "value", "ts", "event_id")
           .to_pandas().set_index("event_type"))

    def ref(vals):
        x = np.asarray(vals, np.float64)
        m = x.mean()
        return float(((x[1:] - m) * (x[:-1] - m)).sum()
                     / ((x - m) ** 2).sum())

    assert abs(got.loc["trend", "r1"] - ref([1, 2, 3, 4, 5, 6])) < 1e-9
    assert got.loc["trend", "r1"] >= 0.5
    assert abs(got.loc["alt", "r1"] - ref([1, 9, 1, 9, 1, 9])) < 1e-9
    assert got.loc["alt", "r1"] < -0.5
    assert pd.isna(got.loc["flat", "r1"])
    assert pd.isna(got.loc["single", "r1"])
    assert got.loc["single", "n"] == 1


def test_iqr_outliers_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import iqr_outliers

    # values 1..11 plus a planted 100: q1=3.0, q3=8.5 (linear interp on
    # 12 values), IQR=5.5, fences [-5.25, 16.75] -> exactly one outlier
    vals = [float(v) for v in range(1, 12)] + [100.0]
    ev = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 12, pa.string()),
        "value": pa.array(vals, pa.float64()),
    }))
    got = iqr_outliers(ev, "event_type", "value").to_pandas().iloc[0]
    assert got.q1 == 3.75 or got.q1 == 3.0  # pinned below
    import numpy as np
    q1 = float(np.quantile(np.array(vals), 0.25))
    q3 = float(np.quantile(np.array(vals), 0.75))
    assert abs(got.q1 - round(q1, 6)) < 1e-9
    assert abs(got.q3 - round(q3, 6)) < 1e-9
    assert got.n_outliers == 1 and got.n == 12


def test_stratified_fold_assign_balance(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import stratified_fold_assign

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(23)), pa.int64()),
        "lang": pa.array(["en"] * 17 + ["fr"] * 6, pa.string()),
    }))
    got = stratified_fold_assign(ds, "lang", "doc_id", k=5).to_pandas()
    en = got[got.lang == "en"].fold.value_counts()
    fr = got[got.lang == "fr"].fold.value_counts()
    # every fold's share of every stratum within +-1
    assert en.max() - en.min() <= 1 and sorted(en.index) == [0, 1, 2, 3, 4]
    assert fr.max() - fr.min() <= 1
    # deterministic: smallest en doc_id gets fold 0
    assert got.set_index("doc_id").loc[0, "fold"] == 0


def test_impute_group_median_hand_truth(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import impute_group_median

    ev = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "event_type": pa.array(["a", "a", "a", "a", "b", "b"],
                               pa.string()),
        "value": pa.array([1.0, None, 3.0, 10.0, None, None],
                          pa.float64()),
    }))
    got = (impute_group_median(ev, "event_type", "value", "event_id")
           .to_pandas().set_index("event_id").sort_index())
    # group a non-null median of [1,3,10] = 3.0 fills event 2
    assert got.loc[2, "value_filled"] == 3.0 and got.loc[2, "was_null"]
    assert got.loc[1, "value_filled"] == 1.0 and not got.loc[1, "was_null"]
    # all-null group stays null
    assert pd.isna(got.loc[5, "value_filled"]) and got.loc[5, "was_null"]


def test_events_hopping_window_hand_truth(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import events_hopping_window

    # one event at t=3600s with size=3600, hop=1800: windows 1800 and 3600
    ev = rd.from_arrow(pa.table({
        "ts": pa.array([3600 * 1_000_000, 3599 * 1_000_000],
                       pa.timestamp("us")),
        "event_type": pa.array(["a", "a"], pa.string()),
    }))
    got = (events_hopping_window(ev, "event_type", size_s=3600,
                                 hop_s=1800).to_pandas()
           .set_index("window_start").n)
    # t=3600 -> windows {1800, 3600}; t=3599 -> windows {0, 1800}
    assert got.loc[0] == 1 and got.loc[1800] == 2 and got.loc[3600] == 1
    with pytest.raises(ValueError):
        events_hopping_window(ev, "event_type", size_s=3600, hop_s=1000)


def test_psi_drift_hand_truths(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import psi_drift

    rng = np.random.default_rng(3)
    same = rng.normal(0, 1, 400)
    shifted = rng.normal(3, 1, 200)  # strong drift
    tbl = pa.table({
        "k": ["stable"] * 400 + ["drift"] * 400,
        "value": np.r_[same, same[:200], shifted].tolist(),
        "split": (["ref", "cur"] * 200) + ["ref"] * 200 + ["cur"] * 200,
    })
    got = (psi_drift(rd.from_arrow(tbl), "k", "value", "split", "ref")
           .to_pandas().set_index("k"))
    # identical distributions: PSI ~ 0; 3-sigma shift: PSI >> 0.25
    assert got.loc["stable", "psi"] < 0.1
    assert got.loc["drift", "psi"] > 0.25
    assert got.loc["drift", "n_ref"] == 200
    assert got.loc["drift", "n_cur"] == 200


def test_ewma_trailing_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import ewma_trailing

    ev = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([10, 20, 30], pa.timestamp("us")),
        "event_type": pa.array(["a", "a", "a"], pa.string()),
        "value": pa.array([4.0, 8.0, 2.0], pa.float64()),
    }))
    got = (ewma_trailing(ev, "event_type", "value", "ts", "event_id",
                         alpha=0.5, depth=8).to_pandas()
           .set_index("event_id").ewma)
    # t=0: just x0; t=1: (.5*8 + .25*4)/.75; t=2: (.5*2+.25*8+.125*4)/.875
    assert got.loc[1] == 4.0
    assert abs(got.loc[2] - (0.5 * 8 + 0.25 * 4) / 0.75) < 1e-9
    assert abs(got.loc[3] - (0.5 * 2 + 0.25 * 8 + 0.125 * 4) / 0.875) < 1e-9


def test_banded_count_join_hand(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.joins import banded_count_join

    # band 10: event t=100 matches rights at 90,100,110 (inclusive
    # edges) but not 89/111; bucket-boundary partner (t=109, bucket 10)
    # must be seen by an event at t=100 (bucket 10) AND t=99 (bucket 9)
    left = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "k": pa.array([7, 7, 8], pa.int64()),
        "t": pa.array([100, 99, 100], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k2": pa.array([7, 7, 7, 7, 7, 8], pa.int64()),
        "t2": pa.array([90, 100, 110, 89, 111, 109], pa.int64()),
    }))
    out = {r["id"]: r["n"] for r in banded_count_join(
        left, right, "k", "k2", "t", "t2", band_us=10,
        id_col="id", out_col="n").take_all()}
    assert out[1] == 3          # 90, 100, 110
    assert out[2] == 3          # 89, 90, 100 — both band edges inclusive
    assert out[3] == 1          # k=8: 109 within [90, 110]


def test_banded_count_join_zero_and_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.joins import banded_count_join

    rng = np.random.default_rng(13)
    lt = rng.integers(0, 1000, 80)
    lk = rng.integers(0, 5, 80)
    rt = rng.integers(0, 1000, 120)
    rk = rng.integers(0, 5, 120)
    left = rd.from_arrow(pa.table({
        "id": pa.array(np.arange(80), pa.int64()),
        "k": pa.array(lk, pa.int64()),
        "t": pa.array(lt, pa.int64()),
    })).repartition(5)
    right = rd.from_arrow(pa.table({
        "k2": pa.array(rk, pa.int64()),
        "t2": pa.array(rt, pa.int64()),
    })).repartition(4)
    out = {r["id"]: r["n"] for r in banded_count_join(
        left, right, "k", "k2", "t", "t2", band_us=37,
        id_col="id", out_col="n").take_all()}
    assert len(out) == 80
    for i in range(80):
        want = int(((rk == lk[i]) & (np.abs(rt - lt[i]) <= 37)).sum())
        assert out[i] == want


def test_banded_count_join_negative_ts_and_fallback(ray_session):
    """Negative timestamps (floor-division buckets) and the
    overflow-guard per-run-slice fallback path (band so wide that
    n_runs·4·band ≥ 2^62) both agree with brute force; result is
    invariant under input repartitioning."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.joins import banded_count_join

    rng = np.random.default_rng(29)
    lt = rng.integers(-500, 500, 60)
    lk = rng.integers(0, 4, 60)
    rt = rng.integers(-500, 500, 90)
    rk = rng.integers(0, 4, 90)

    def run(band, parts):
        left = rd.from_arrow(pa.table({
            "id": pa.array(np.arange(60), pa.int64()),
            "k": pa.array(lk, pa.int64()),
            "t": pa.array(lt, pa.int64()),
        })).repartition(parts)
        right = rd.from_arrow(pa.table({
            "k2": pa.array(rk, pa.int64()),
            "t2": pa.array(rt, pa.int64()),
        })).repartition(parts + 1)
        return {r["id"]: r["n"] for r in banded_count_join(
            left, right, "k", "k2", "t", "t2", band_us=band,
            id_col="id", out_col="n").take_all()}

    for band in (37, 2**61):  # 2^61 forces the n_runs·4·band overflow
        out3 = run(band, 3)   # fallback (4·band alone ≥ 2^62)
        out7 = run(band, 7)
        assert out3 == out7   # batching-invariant
        for i in range(60):
            want = int(((rk == lk[i]) & (np.abs(rt - lt[i]) <= band)).sum())
            assert out3[i] == want, (band, i)


def test_unpivot_melt_roundtrip(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import unpivot

    rng = np.random.RandomState(7)
    n = 200
    tbl = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "grp": pa.array([f"g{i % 3}" for i in range(n)], pa.string()),
        "m1": pa.array(rng.randint(0, 50, n), pa.int32()),
        "m2": pa.array(rng.rand(n).round(4), pa.float64()),
    })
    got = (unpivot(rd.from_arrow(tbl), ["id", "grp"], ["m1", "m2"])
           .to_pandas().sort_values(["id", "metric"])
           .reset_index(drop=True))
    want = (pd.DataFrame({
        "id": np.repeat(np.arange(n), 2),
        "grp": np.repeat([f"g{i % 3}" for i in range(n)], 2),
        "metric": ["m1", "m2"] * n,
        "value": np.column_stack([
            tbl["m1"].to_numpy().astype(np.float64),
            tbl["m2"].to_numpy()]).ravel(),
    }).sort_values(["id", "metric"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # long form is batching-invariant and 2x the input rows
    assert len(got) == 2 * n
    got2 = (unpivot(rd.from_arrow(tbl).repartition(9), ["id", "grp"],
                    ["m1", "m2"])
            .to_pandas().sort_values(["id", "metric"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


def test_bloom_semi_join_exact_both_plans(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.joins import (
        bloom_semi_join,
        key_membership_join,
    )

    rng = np.random.RandomState(11)
    left = pa.table({
        "k": pa.array(rng.randint(0, 5000, 4000), pa.int64()),
        "v": pa.array(rng.rand(4000).round(4), pa.float64()),
    })
    # sparse right side → the bloom pre-filter removes most left rows
    right = pa.table({"rk": pa.array(rng.choice(5000, 60, replace=False),
                                     pa.int64())})
    want = (key_membership_join(rd.from_arrow(left), rd.from_arrow(right),
                                "k", "rk", mode="semi")
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    got = (bloom_semi_join(rd.from_arrow(left), rd.from_arrow(right),
                           "k", "rk")
           .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # forced-limit-0: the exact stage runs the EXCHANGE plan — result
    # must be identical (the bloom is a pure volume cut, never semantic)
    got2 = (bloom_semi_join(rd.from_arrow(left), rd.from_arrow(right),
                            "k", "rk", broadcast_rows_limit=0)
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, want)
    # empty right side → empty result, no crash
    got3 = bloom_semi_join(
        rd.from_arrow(left),
        rd.from_arrow(right).filter(lambda r: False),
        "k", "rk").count()
    assert got3 == 0
    # dtype-mismatched keys (int32 left vs int64 right) must still match:
    # the bloom hashes the right keys AS the left key's type, else every
    # true match bloom-misses (hash64 is dtype-sensitive)
    left32 = pa.table({
        "k": pa.array(rng.randint(0, 5000, 2000), pa.int32()),
        "v": pa.array(rng.rand(2000).round(4), pa.float64()),
    })
    want32 = (key_membership_join(rd.from_arrow(left32),
                                  rd.from_arrow(right), "k", "rk",
                                  mode="semi")
              .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    assert len(want32) > 0  # the regression is only visible on matches
    got32 = (bloom_semi_join(rd.from_arrow(left32), rd.from_arrow(right),
                             "k", "rk", broadcast_rows_limit=0)
             .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got32, want32)


def test_grouped_quantile_disc_convention(ray_session):
    """quantile_disc rank = max(ceil(q*n), 1) — an actual group element,
    pinned against hand truths where interpolation='lower' disagrees."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import grouped_quantile_disc

    # g10: 1..10 at q=0.31 → rank ceil(3.1)=4 → value 4 (pandas-lower
    # would pick 3); g3: 1..3 at q=0.31 → rank 1 → value 1
    tbl = pa.table({
        "g": pa.array(["g10"] * 10 + ["g3"] * 3, pa.string()),
        "v": pa.array(list(range(1, 11)) + [1, 2, 3], pa.float64()),
    })
    got = (grouped_quantile_disc(rd.from_arrow(tbl), "g", "v", 0.31)
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = pd.DataFrame({"g": ["g10", "g3"], "quantile_value": [4.0, 1.0]})
    pd.testing.assert_frame_equal(got, want)
    # batching-invariant; q=1 → max, q=0 → min
    got2 = (grouped_quantile_disc(rd.from_arrow(tbl).repartition(6),
                                  "g", "v", 0.31)
            .to_pandas().sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)
    hi = grouped_quantile_disc(rd.from_arrow(tbl), "g", "v", 1.0).to_pandas()
    assert sorted(hi["quantile_value"]) == [3.0, 10.0]
    lo = grouped_quantile_disc(rd.from_arrow(tbl), "g", "v", 0.0).to_pandas()
    assert lo["quantile_value"].tolist() == [1.0, 1.0]


def test_grouped_quantile_disc_nulls(ray_session):
    """Null keys form ONE group and null values are ignored by the rank
    (the DuckDB quantile_disc convention) — checked directly against
    DuckDB on a null-laden table including an all-null-value group."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import grouped_quantile_disc

    tbl = pa.table({
        "g": pa.array(["a", "a", "a", None, None, "b", "b", "c", "a"],
                      pa.string()),
        "v": pa.array([3.0, None, 1.0, 5.0, 2.0, None, None, 7.0, 2.0],
                      pa.float64()),
    })
    for q in (0.0, 0.31, 0.5, 1.0):
        got = (grouped_quantile_disc(rd.from_arrow(tbl), "g", "v", q)
               .to_pandas()
               .sort_values("g", na_position="last")
               .reset_index(drop=True))
        con = duckdb.connect()
        want = con.execute(
            "SELECT g, quantile_disc(v, ?) AS quantile_value FROM tbl "
            "GROUP BY g ORDER BY g NULLS LAST", [q]).df()
        con.close()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # batching-invariant under repartition
        got2 = (grouped_quantile_disc(rd.from_arrow(tbl).repartition(5),
                                      "g", "v", q)
                .to_pandas()
                .sort_values("g", na_position="last")
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, got2)
