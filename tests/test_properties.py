"""Property-based kernel tests (hypothesis) — no Ray session needed."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

texts = st.text(max_size=300)
small_texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=120
)


@given(st.lists(texts, max_size=20))
@settings(max_examples=60, deadline=None)
def test_normalize_array_matches_python(batch):
    from epstein_pipeline_ray.functions.normalize import normalize_array

    got = normalize_array(pa.array(batch, pa.string())).to_pylist()
    want = [" ".join(s.lower().split()) for s in batch]
    assert got == want


@given(st.lists(st.integers(0, 2**32 - 1), min_size=1, max_size=500),
       st.randoms(use_true_random=False))
@settings(max_examples=40, deadline=None)
def test_signature_is_order_and_multiplicity_invariant(hashes, rnd):
    from epstein_pipeline_ray.functions.minhash import signature

    arr = np.asarray(hashes, dtype=np.uint64)
    base = signature(arr, 32, 7)
    shuffled = arr.copy()
    rnd.shuffle(shuffled)
    dup = np.concatenate([shuffled, shuffled[: len(shuffled) // 2 + 1]])
    assert np.array_equal(base, signature(dup, 32, 7))


@given(small_texts, small_texts)
@settings(max_examples=80, deadline=None)
def test_indel_ratio_properties(a, b):
    from epstein_pipeline_ray.functions.fuzzy import ratio

    r = ratio(a, b)
    assert 0.0 <= r <= 1.0
    assert ratio(a, b) == ratio(b, a)
    assert ratio(a, a) == 1.0


@given(st.floats(min_value=-1e6, max_value=1e6,
                 allow_nan=False, allow_infinity=False),
       st.integers(0, 6))
@settings(max_examples=120, deadline=None)
def test_sql_round_matches_duckdb(x, n):
    import duckdb

    from epstein_pipeline_ray.functions.rounding import sql_round

    want = duckdb.sql(f"SELECT round({x!r}::DOUBLE, {n})").fetchone()[0]
    got = float(sql_round(np.array([x]), n)[0])
    assert got == want, (x, n, got, want)


@given(st.integers(0, 5000), st.integers(0, 50),
       st.integers(0, 5000), st.integers(0, 50))
@settings(max_examples=80, deadline=None)
def test_bates_overlap_is_interval_intersection(lo1, span1, lo2, span2):
    from epstein_pipeline_ray.functions.bates import bates_overlap

    a = f"EFTA{lo1:08d}-EFTA{lo1 + span1:08d}"
    b = f"EFTA{lo2:08d}-EFTA{lo2 + span2:08d}"
    want = lo1 <= lo2 + span2 and lo2 <= lo1 + span1
    assert bates_overlap(a, b) == want


@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=60), max_size=12))
@settings(max_examples=40, deadline=None)
def test_token_counts_match_split(batch):
    from epstein_pipeline_ray.functions.textstats import token_count_array

    got = token_count_array(pa.array(batch, pa.string())).to_pylist()
    want = [len(s.split()) for s in batch]
    assert got == want


@given(st.lists(st.text(max_size=200), max_size=16))
@settings(max_examples=80, deadline=None)
def test_native_normalize_matches_python(batch):
    import hashlib

    from epstein_pipeline_ray.functions.normalize import (
        content_hash_buffers,
        normalize_array_native,
    )

    arr = pa.array(batch, pa.large_string())
    got = normalize_array_native(arr).to_pylist()
    want = [" ".join(s.lower().split()) for s in batch]
    assert got == want
    hashes = content_hash_buffers(normalize_array_native(arr)).to_pylist()
    assert hashes == [hashlib.sha256(w.encode()).hexdigest() for w in want]


def test_native_normalize_full_casemap_regressions():
    """Explicit cases where Arrow's simple case mapping diverges from
    Python's full mapping (ADVICE r1): U+0130 'İ', Greek final sigma,
    plus mixed ASCII/non-ASCII batches exercising the per-element merge."""
    from epstein_pipeline_ray.functions.normalize import (
        normalize_array,
        normalize_array_native,
    )

    batch = [
        "İstanbul  Meeting",
        "ΣΟΦΟΣ",
        "plain ascii  text",
        None,
        "ΣΟΦΟΣ ΣΟΦΟΣ tail",
        "",
        "ẞharp",
    ]
    want = [None if s is None else " ".join(s.lower().split()) for s in batch]
    arr = pa.array(batch, pa.large_string())
    assert normalize_array_native(arr).to_pylist() == want
    assert normalize_array(arr).to_pylist() == want
    # sliced array → nonzero offset path in the byte scan
    sliced = arr.slice(1, 5)
    assert normalize_array_native(sliced).to_pylist() == want[1:6]


@given(st.text(alphabet="abcdefgh ", min_size=0, max_size=150),
       st.text(alphabet="abcdefgh ", min_size=20, max_size=60),
       st.text(alphabet="abcdefgh ", min_size=0, max_size=150))
@settings(max_examples=40, deadline=None)
def test_winnowing_shared_substring_guarantee(prefix, shared, suffix):
    """Two docs sharing a substring of length >= k + window - 1 must share
    at least one fingerprint (SIGMOD'03 winnowing guarantee)."""
    from epstein_pipeline_ray.functions.textstats import winnow_fingerprints

    k, w = 8, 4
    a = " ".join((prefix + shared).split())
    b = " ".join((shared + suffix).split())
    # the normalized shared run must still be long enough
    s = " ".join(shared.split())
    if len(s) < k + w - 1 or s not in a or s not in b:
        return
    fa = set(winnow_fingerprints(a, k, w))
    fb = set(winnow_fingerprints(b, k, w))
    assert fa & fb


def test_cms_one_sided_property(ray_session):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import cms_count_per_key

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=50),
                    min_size=1, max_size=300))
    def check(vals):
        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
        got = cms_count_per_key(ds, "v", d=3, w=8).to_pandas()
        exact = pd.Series(vals).value_counts()
        est = got.set_index("v")["est"]
        assert set(est.index) == set(exact.index)
        assert (est >= exact.reindex(est.index)).all()

    check()


def test_kcore_fixpoint_property(ray_session):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import kcore

    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                    min_size=1, max_size=80), st.integers(2, 4))
    def check(edges, k):
        ds = rd.from_arrow(pa.table({
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64())}))
        # 16 nodes -> peel depth <= 16 rounds, guaranteed fixpoint
        out = kcore(ds, k=k, rounds=16)
        assert out.schema().names == ["node", "deg"]  # typed even empty
        got = out.to_pandas()
        if not len(got):     # fully peeled — ray's empty to_pandas
            return           # drops columns; the schema check above holds
        # at the fixpoint every survivor's degree within the core >= k
        assert (got.deg >= k).all()
        # survivors' deg never exceeds original simple-graph degree
        und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        deg0 = {}
        for a, b in und:
            deg0[a] = deg0.get(a, 0) + 1
            deg0[b] = deg0.get(b, 0) + 1
        for n, d in zip(got.node, got.deg):
            assert d <= deg0[n]

    check()


def test_funnel_monotone_property(ray_session):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import funnel_steps

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 5),
                              st.sampled_from(["s1", "s2", "s3", "zz"]),
                              st.integers(0, 100)),
                    min_size=1, max_size=120))
    def check(rows):
        tbl = pa.table({
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "t": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array([r[2] * 1_000_000 for r in rows],
                           pa.timestamp("us")),
        })
        got = funnel_steps(rd.from_arrow(tbl), ["s1", "s2", "s3"],
                           user_col="u", type_col="t").to_pandas()
        if not len(got):     # nobody entered the funnel — ray's empty
            return           # to_pandas drops columns; vacuous case
        # step-k reach counts are non-increasing in k
        counts = [int((got.max_step >= s).sum()) for s in (1, 2, 3)]
        assert counts == sorted(counts, reverse=True)
        # every user in the output has at least one s1 event
        s1_users = {r[0] for r in rows if r[1] == "s1"}
        assert set(got.u) <= s1_users

    check()


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=1, max_size=120))
@settings(max_examples=25, deadline=None)
def test_local_skyline_matches_brute(points):
    """_local_skyline (the mergeable kernel under pareto_front) equals
    the O(n²) dominance definition on any point set, ties included."""
    import numpy as np
    import pyarrow as pa

    from epstein_pipeline_ray.stages.skyline import _local_skyline

    x = np.array([p[0] for p in points], np.float64)
    y = np.array([p[1] for p in points], np.float64)
    tbl = pa.table({"i": pa.array(range(len(points)), pa.int64()),
                    "x": pa.array(x), "y": pa.array(y)})
    got = set(_local_skyline(tbl, "x", "y")["i"].to_pylist())
    want = set()
    for i in range(len(points)):
        dom = ((x >= x[i]) & (y <= y[i])
               & ((x > x[i]) | (y < y[i])))
        if not dom.any():
            want.add(i)
    assert got == want


@given(st.lists(st.integers(0, 15), min_size=1, max_size=60),
       st.lists(st.integers(0, 15), min_size=1, max_size=60))
@settings(max_examples=8, deadline=None)
def test_ks_statistic_bounds_and_zero(ray_session, a_vals, b_vals):
    """ks_two_sample (the operator, over a Ray dataset) matches a
    brute tie-correct ECDF reference, stays in [0, 1], and returns
    exactly 0 for two independent copies of the same multiset."""
    import numpy as np
    import pyarrow as pa
    import ray

    from epstein_pipeline_ray.stages.evalmetrics import ks_two_sample

    def run(avs, bvs):
        tbl = pa.table({
            "g": pa.array(["a"] * len(avs) + ["b"] * len(bvs)),
            "v": pa.array([float(v) for v in avs + bvs], pa.float64()),
        })
        out = ks_two_sample(ray.data.from_arrow(tbl), "g", "v", "a", "b")
        return float(out["ks_d"][0].as_py())

    # brute-force tie-correct ECDF over the union of distinct points
    keys = sorted(set(a_vals) | set(b_vals))
    xa = np.cumsum([a_vals.count(k) for k in keys]) / len(a_vals)
    xb = np.cumsum([b_vals.count(k) for k in keys]) / len(b_vals)
    want = float(np.abs(xa - xb).max())
    got = run(a_vals, b_vals)
    assert 0.0 <= got <= 1.0
    assert abs(got - want) <= 5e-7  # operator rounds to 6 digits
    # self-distance through the operator: an independent copy of the
    # same multiset in group b must give D = 0 exactly
    assert run(a_vals, list(a_vals)) == 0.0


@given(st.lists(st.integers(0, 2**20), min_size=1, max_size=200))
@settings(max_examples=25, deadline=None)
def test_interleave8_is_bijective_and_monotone_on_boxes(vals):
    """Morton interleave: injective on (a, b) pairs and recoverable by
    bit de-interleave — layout assignment never merges distinct cells."""
    import numpy as np

    from epstein_pipeline_ray.stages.zorder import interleave8

    a = np.array([v % 256 for v in vals], np.int64)
    b = np.array([(v // 256) % 256 for v in vals], np.int64)
    z = interleave8(a, b)
    # de-interleave
    da = np.zeros_like(z)
    db = np.zeros_like(z)
    for i in range(8):
        da |= ((z >> (2 * i + 1)) & 1) << i
        db |= ((z >> (2 * i)) & 1) << i
    assert (da == a).all() and (db == b).all()


@settings(max_examples=12, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 6),                       # key
              st.integers(0, 50),                      # rank (ties ok)
              st.one_of(st.none(), st.integers(-9, 9)),  # value a
              st.one_of(st.none(), st.text("xy", max_size=2))),
    min_size=1, max_size=60))
def test_golden_records_matches_pandas_reference(ray_session, rows):
    """golden_records == per-field first non-null under the composite
    (rank, a, b) order, one row per key — checked against a plain
    pandas groupby on arbitrary null-laden inputs. Composite rank makes
    the order total up to full-duplicate rows, so both sides are
    deterministic."""
    import pandas as pd
    import ray.data as rd

    from epstein_pipeline_ray.stages.entity_resolution import golden_records

    tbl = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "rnk": pa.array([r[1] for r in rows], pa.int64()),
        "a": pa.array([r[2] for r in rows], pa.float64()),
        "b": pa.array([r[3] for r in rows], pa.string()),
    })
    got = (golden_records(rd.from_arrow(tbl), "k", ["rnk", "a", "b"],
                          ["a", "b"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    df = tbl.to_pandas().sort_values(
        ["k", "rnk", "a", "b"], na_position="last", kind="mergesort")
    want = (df.groupby("k", sort=True)
              .agg(a=("a", "first"), b=("b", "first"),
                   n_rec=("rnk", "size"))  # pandas first() skips nulls
              .reset_index().rename(columns={"k": "k"}))
    want["n_rec"] = want["n_rec"].astype("int64")
    pd.testing.assert_frame_equal(
        got, want[["k", "a", "b", "n_rec"]], check_dtype=False)
