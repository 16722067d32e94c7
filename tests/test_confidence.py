"""Tiered confidence matching (stages/confidence.py) vs a naive scalar
reference — pins the fuzzy rungs the SQL oracle for confidence_match
cannot express (reference processors/confidence.py:30-119 ladder)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from epstein_pipeline_ray.functions.fuzzy import token_sort_ratio
from epstein_pipeline_ray.stages.confidence import (
    TIER_ALIAS,
    TIER_EXACT,
    TIER_FUZZY_90,
    TIER_FUZZY_95,
    TIER_SUBSTRING,
    match_mentions,
)

REGISTRY = pd.DataFrame(
    {
        "person_id": [1, 2, 3, 4],
        "name": [
            "jeffrey edwards",
            "virginia roberts",
            "alan dershowitz",
            "sarah kellen",
        ],
        "aliases": [
            ["jeff edwards"],
            ["virginia giuffre", "v roberts"],
            [],
            None,
        ],
    }
)


def _run(mentions, **kw):
    ds = ray.data.from_arrow(
        pa.table({"mention_id": list(range(len(mentions))), "mention": mentions})
    )
    return match_mentions(ds, REGISTRY, **kw).to_pandas().sort_values(
        "mention_id"
    ).reset_index(drop=True)


def _naive_tier(mention: str, registry: pd.DataFrame):
    """Scalar re-implementation of the reference ladder using the repo's
    own token_sort_ratio scalar (itself hypothesis-tested vs indel laws)."""
    norm = " ".join(mention.lower().split())
    if not norm or len(norm) < 3:
        return None
    exact, alias, ordered = {}, {}, []
    for r in registry.itertuples(index=False):
        n = " ".join(str(r.name).lower().split())
        exact[n] = r.person_id
        ordered.append((n, r.person_id))
        for a in (r.aliases if isinstance(r.aliases, (list, tuple)) else []) or []:
            na = " ".join(str(a).lower().split())
            alias[na] = r.person_id
            ordered.append((na, r.person_id))
    if norm in exact:
        return exact[norm], TIER_EXACT, "exact"
    if norm in alias:
        return alias[norm], TIER_ALIAS, "alias"
    ts_m = " ".join(sorted(norm.split()))
    best, best_pid = -1.0, None
    for n, pid in ordered:
        s = token_sort_ratio(ts_m, " ".join(sorted(n.split())))
        if s > best:  # first max in registry order
            best, best_pid = s, pid
    if best >= 0.95:
        return best_pid, TIER_FUZZY_95, "fuzzy"
    if best >= 0.90:
        return best_pid, TIER_FUZZY_90, "fuzzy"
    return None


MENTIONS = [
    "Jeffrey  Edwards",        # exact after normalize
    "virginia giuffre",        # alias
    "Edwards Jeffrey",         # token permutation → fuzzy 0.85 tier
    "jeffrey edwardz",         # one-char edit → fuzzy
    "alan m dershowitz",       # insertion → fuzzy or miss depending on len
    "completely unrelated",    # miss
    "sk",                      # too short → skipped
    "sarah kellen",            # exact (aliases=None row)
]


def test_fuzzy_parity_vs_scalar(ray_session):
    got = _run(MENTIONS)
    for i, m in enumerate(MENTIONS):
        want = _naive_tier(m, REGISTRY)
        row = got.iloc[i]
        if want is None:
            assert row.person_id is None or pd.isna(row.person_id), (m, row)
        else:
            pid, conf, typ = want
            assert row.person_id == pid, (m, row.person_id, pid)
            assert row.confidence == conf, (m, row.confidence, conf)
            assert row.match_type == typ, (m, row.match_type, typ)


def test_tier_precedence_exact_beats_fuzzy(ray_session):
    # a mention equal to one name and fuzzy-close to another → exact wins
    got = _run(["virginia roberts"])
    assert got.iloc[0].match_type == "exact"
    assert got.iloc[0].confidence == TIER_EXACT
    assert got.iloc[0].person_id == 2


def test_alias_last_write_wins(ray_session):
    # duplicate normalized alias across rows: LAST registry row wins
    reg = pd.DataFrame(
        {
            "person_id": [10, 20],
            "name": ["aaa bbb", "ccc ddd"],
            "aliases": [["shared alias"], ["shared alias"]],
        }
    )
    ds = ray.data.from_arrow(pa.table({"mention": ["shared alias"]}))
    out = match_mentions(ds, reg).to_pandas()
    assert out.iloc[0].person_id == 20
    assert out.iloc[0].confidence == TIER_ALIAS


def test_substring_tier(ray_session):
    got = _run(
        ["deposition of alan dershowitz continued", "nothing here"],
        enable_fuzzy=False,
        enable_substring=True,
    )
    assert got.iloc[0].match_type == "substring"
    assert got.iloc[0].confidence == TIER_SUBSTRING
    assert got.iloc[0].person_id == 3
    assert pd.isna(got.iloc[1].confidence)


def test_fuzzy_thresholds_bracket():
    # pin the rung boundaries with direct scalar checks
    assert token_sort_ratio("jeffrey edwards", "jeffrey edwards") == 1.0
    mid = token_sort_ratio("jeffrey edwards", "jeffrey edwardz")
    assert 0.90 <= mid < 1.0


def test_null_and_empty_mentions(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"mention_id": [0, 1, 2], "mention": pa.array([None, "", "   "], pa.string())})
    )
    out = match_mentions(ds, REGISTRY).to_pandas()
    assert out.person_id.isna().all()
    assert len(out) == 3


def _registry_ds():
    import ray.data as rd

    names = REGISTRY["name"].tolist()
    aliases = [a if a is not None else [] for a in REGISTRY["aliases"]]
    flat = [x for al in aliases for x in al]
    offs = np.cumsum([0] + [len(al) for al in aliases]).astype("int32")
    tbl = pa.table({
        "person_id": pa.array(REGISTRY["person_id"], pa.int64()),
        "name": pa.array(names, pa.string()),
        "aliases": pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                            pa.array(flat, pa.string())),
    })
    return rd.from_arrow(tbl)


def test_match_mentions_ds_equals_pandas_registry(ray_session):
    """VERDICT r2 item 4: the Dataset-registry variant (state built in a
    Ray task, not on the driver) matches the pandas-registry path."""
    import ray.data as rd

    from epstein_pipeline_ray.stages.confidence import match_mentions_ds

    mentions_tbl = pa.table({
        "mention_id": pa.array(range(7), pa.int64()),
        "mention": pa.array([
            "Jeffrey Edwards",        # exact
            "virginia  giuffre",      # alias (ws collapse)
            "jefrey edwards",         # fuzzy
            "met sarah kellen today", # substring
            "nobody here",
            None,
            "xx",                     # too short
        ], pa.string()),
    })
    cols = ["mention_id", "person_id", "confidence", "match_type", "matched_name"]
    base = (match_mentions(rd.from_arrow(mentions_tbl), REGISTRY,
                           enable_fuzzy=True, enable_substring=True)
            .to_pandas()[cols].sort_values("mention_id").reset_index(drop=True))
    ds = (match_mentions_ds(rd.from_arrow(mentions_tbl), _registry_ds(),
                            enable_fuzzy=True, enable_substring=True)
          .to_pandas()[cols].sort_values("mention_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, ds)


def test_match_mentions_ds_exchange_plan_exact_alias(ray_session):
    """Forced limit 0 → the exact/alias tiers run through the keyed
    exchange; output equals the broadcast path on those tiers."""
    import ray.data as rd

    from epstein_pipeline_ray.stages.confidence import match_mentions_ds

    mentions_tbl = pa.table({
        "mention_id": pa.array(range(6), pa.int64()),
        "mention": pa.array([
            "jeffrey edwards",
            "V Roberts",
            "no match at all",
            "alan dershowitz",
            None,
            "ab",
        ], pa.string()),
    })
    cols = ["mention_id", "person_id", "confidence", "match_type", "matched_name"]
    base = (match_mentions(rd.from_arrow(mentions_tbl), REGISTRY,
                           enable_fuzzy=False, enable_substring=False)
            .to_pandas()[cols].sort_values("mention_id").reset_index(drop=True))
    forced = (match_mentions_ds(rd.from_arrow(mentions_tbl), _registry_ds(),
                                enable_fuzzy=False, enable_substring=False,
                                broadcast_rows_limit=0)
              .to_pandas()[cols].sort_values("mention_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, forced)
    with pytest.raises(ValueError):
        match_mentions_ds(rd.from_arrow(mentions_tbl), _registry_ds(),
                          enable_fuzzy=True, broadcast_rows_limit=0)


def test_prep_corpus_attach_exchange_plan(ray_session):
    """prep_corpus export path: attach_column at a forced limit 0 (exchange
    plan) produces the same partitioned output as the broadcast plan."""
    import ray.data as rd

    from epstein_pipeline_ray.stages.joins import attach_column

    left = rd.from_arrow(pa.table({
        "doc_id": pa.array([3, 1, 2, 1], pa.int64()),
        "x": pa.array(["a", "b", "c", "d"], pa.string()),
    }))
    right = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "source": pa.array(["s1", "s2", "s3"], pa.string()),
    }))
    kw = dict(left_key="doc_id", right_key="doc_id",
              value_col="source", out_col="source")
    a = (attach_column(left, right, **kw)
         .to_pandas().sort_values(["doc_id", "x"]).reset_index(drop=True))
    b = (attach_column(left, right, broadcast_rows_limit=0, **kw)
         .to_pandas().sort_values(["doc_id", "x"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
