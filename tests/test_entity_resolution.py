"""Blocked entity resolution (reference J5/J6) — exact + fuzzy tiers and
merge-map application."""

import pyarrow as pa
import pytest


@pytest.fixture()
def people(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "pid": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "name": [
                "Martha Jones",
                "martha jones",    # exact after normalize → 1
                "Martha Jhones",   # fuzzy (JW high, same block 'martha') → 1
                "Bob Smith",
                "Bob Smyth",       # fuzzy → 4
                "Carol White",     # singleton
            ],
        }
    )
    return rd.from_arrow(t)


def test_exact_tier(people):
    from epstein_pipeline_ray.stages.entity_resolution import resolve_entities

    out = resolve_entities(people, "pid", "name").to_pandas().set_index("entity_id")
    assert out.loc[2, "canonical_id"] == 1
    assert out.loc[3, "canonical_id"] == 3  # fuzzy off: stays itself
    assert out.loc[6, "canonical_id"] == 6


def test_fuzzy_tier_and_apply(people, ray_session):
    import ray.data as rd

    from epstein_pipeline_ray.stages.entity_resolution import (
        apply_merge_map,
        resolve_entities,
    )

    merge = resolve_entities(people, "pid", "name", fuzzy_threshold=0.93)
    out = merge.to_pandas().set_index("entity_id")
    assert out.loc[2, "canonical_id"] == 1
    assert out.loc[3, "canonical_id"] == 1
    assert out.loc[5, "canonical_id"] == 4
    assert out.loc[6, "canonical_id"] == 6

    refs = rd.from_arrow(
        pa.table({"doc": ["d1", "d2", "d3"], "pid": pa.array([2, 5, 6], pa.int64())})
    )
    applied = apply_merge_map(refs, merge, "pid").to_pandas().sort_values("doc")
    assert applied["pid"].tolist() == [1, 4, 6]


def test_fs_score_matches_bruteforce(ray_session):
    """Fellegi–Sunter weights equal a brute-force per-pair log2 Bayes sum,
    NULL fields contribute zero, NULL block keys never pair."""
    import itertools
    import math

    import numpy as np
    import ray.data as rd

    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.entity_resolution import fs_score_pairs

    rng = np.random.default_rng(7)
    n = 400
    blocks = [f"b{i}" for i in rng.integers(0, 12, n)]
    blocks[0] = None  # NULL block: rows never pair
    rows = {
        "rid": pa.array(range(n), pa.int64()),
        "blk": pa.array(blocks),
        "c1": pa.array(
            [None if i % 37 == 0 else f"v{x}" for i, x in enumerate(rng.integers(0, 6, n))]
        ),
        "c2": pa.array(rng.integers(0, 4, n), pa.int64()),
    }
    comparisons = [("c1", 0.9, 0.1), ("c2", 0.8, 0.25)]
    got = (
        fs_score_pairs(rd.from_arrow(pa.table(rows)), "rid", "blk",
                       comparisons, weight_threshold=0.5, prior=0.01)
        .to_pandas()
    )
    got_map = {
        (a, b): (w, p)
        for a, b, w, p in zip(got.id_a, got.id_b, got.match_weight,
                              got.match_probability)
    }

    terms = [(c, math.log2(m / u), math.log2((1 - m) / (1 - u)))
             for c, m, u in comparisons]
    cols = {k: v.to_pylist() for k, v in rows.items()}
    want = {}
    for i, j in itertools.combinations(range(n), 2):
        if cols["blk"][i] is None or cols["blk"][i] != cols["blk"][j]:
            continue
        w = 0.0
        for c, wa, wd in terms:
            vi, vj = cols[c][i], cols[c][j]
            if vi is None or vj is None:
                continue
            w += wa if vi == vj else wd
        if w >= 0.5:
            prob = 0.01 * 2.0 ** w / (0.01 * 2.0 ** w + 0.99)
            want[(i, j)] = (float(sql_round(np.float64(w), 6)),
                            float(sql_round(np.float64(prob), 6)))
    assert got_map == want and len(want) > 0


def test_sorted_neighborhood_pairs_brute(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.entity_resolution import (
        sorted_neighborhood_pairs)

    # keys spread over many 1-char buckets, several buckets SMALLER than
    # the window -> pairs must span 2+ buckets through the edge stream
    rng = np.random.RandomState(17)
    letters = "abcdefghij"
    keys = [letters[rng.randint(0, 10)] + letters[rng.randint(0, 10)]
            for _ in range(60)]
    ids = list(range(60))
    ds = rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "k": pa.array(keys, pa.string()),
    }))
    w = 5
    got = (sorted_neighborhood_pairs(ds, "id", "k", window=w)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True).drop_duplicates())

    order = sorted(range(60), key=lambda i: (keys[i], i))
    want = sorted((order[i], order[j])
                  for i in range(60) for j in range(i + 1, min(i + w + 1, 60)))
    want = pd.DataFrame(want, columns=["id_a", "id_b"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)


def test_golden_records_survivorship(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.entity_resolution import golden_records

    tbl = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "rnk": pa.array([1, 2, 3, 1, 2, 1], pa.int64()),
        # k=1: rank-1 null -> rank-2 value survives; k=2 all null -> NULL;
        # k=3 single record
        "a": pa.array([None, 10.0, 20.0, None, None, 7.0], pa.float64()),
        # k=1: rank-1 value survives even though later ranks differ
        "b": pa.array(["x", None, "z", "p", None, None], pa.string()),
    })
    got = (golden_records(rd.from_arrow(tbl), "k", "rnk", ["a", "b"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = pd.DataFrame({
        "k": [1, 2, 3],
        "a": [10.0, np.nan, 7.0],
        "b": ["x", "p", None],
        "n_rec": [3, 2, 1],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # batching-invariant (the exchange reassembles whole key groups)
    got2 = (golden_records(rd.from_arrow(tbl).repartition(5), "k", "rnk",
                           ["a", "b"])
            .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2, check_dtype=False)

    # composite rank: value columns break rank ties deterministically
    t2 = pa.table({
        "k": pa.array([9, 9], pa.int64()),
        "rnk": pa.array([1, 1], pa.int64()),
        "a": pa.array([5.0, 3.0], pa.float64()),
    })
    g = golden_records(rd.from_arrow(t2), "k", ["rnk", "a"], ["a"]).to_pandas()
    assert g["a"].tolist() == [3.0]

    # NULL keys form ONE group (SQL GROUP BY semantics), not one row each
    t3 = pa.table({
        "k": pa.array(["x", None, None, None], pa.string()),
        "rnk": pa.array([1, 1, 2, 3], pa.int64()),
        "a": pa.array([None, None, 9.0, 4.0], pa.float64()),
    })
    g3 = (golden_records(rd.from_arrow(t3), "k", "rnk", ["a"])
          .to_pandas().sort_values("k", na_position="last")
          .reset_index(drop=True))
    assert len(g3) == 2
    assert g3.loc[1, "n_rec"] == 3 and g3.loc[1, "a"] == 9.0
    assert pd.isna(g3.loc[0, "a"]) and g3.loc[0, "k"] == "x"
