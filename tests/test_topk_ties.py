"""Tie-break audit for every partial top-k operator (VERDICT r4 item 6,
the ADVICE knn bug class): plant MORE than k rows tied exactly at the
selection boundary, split them across partitions, and assert the result
is identical under different batch partitionings AND equal to the
deterministic brute-force convention (score DESC, id ASC)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st


def _repartition_invariant(build, parts_a=2, parts_b=9):
    got_a = build(parts_a)
    got_b = build(parts_b)
    pd.testing.assert_frame_equal(got_a, got_b)
    return got_a


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31), st.integers(2, 6))
def test_ann_topk_boundary_ties(ray_session, seed, k):
    """>k vectors with IDENTICAL embeddings (all cosines tie at 1.0):
    the winners must be the k smallest vec_ids, regardless of how the
    tied rows are split across batches."""
    from epstein_pipeline_ray.stages.embed import ann_topk

    rng = np.random.default_rng(seed)
    n_tied, n_noise = k + 4, 10
    q = rng.normal(size=4)
    tied = np.tile(q * 3.0, (n_tied, 1))  # cos = 1.0 exactly, all tied
    noise = rng.normal(size=(n_noise, 4)) - 10 * q  # cos < 1
    ids = rng.permutation(n_tied + n_noise).astype(np.int64)
    emb = np.vstack([tied, noise])

    def build(parts):
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float64())),
        })).repartition(parts)
        return (ann_topk(ds, np.array([q]), query_ids=[-1], k=k)
                .reset_index(drop=True))

    got = _repartition_invariant(build)
    tied_ids = np.sort(ids[:n_tied])
    assert got["neighbor_id"].tolist() == tied_ids[:k].tolist()
    assert (got["cos"] == 1.0).all()


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31), st.integers(1, 5))
def test_top_k_boundary_ties(ray_session, seed, k):
    """Global top_k with tie_cols: >k rows share the boundary value —
    membership must be (value DESC, tie ASC) and batching-invariant."""
    from epstein_pipeline_ray.stages.relational import top_k

    rng = np.random.default_rng(seed)
    n = 40
    vals = rng.integers(0, 3, n).astype(np.float64)  # heavy ties
    ids = rng.permutation(n).astype(np.int64)

    def build(parts):
        ds = rd.from_arrow(pa.table({
            "id": pa.array(ids, pa.int64()),
            "v": pa.array(vals, pa.float64()),
        })).repartition(parts)
        return (top_k(ds, "v", k, tie_cols=["id"]).to_pandas()
                .reset_index(drop=True))

    got = _repartition_invariant(build)
    want = (pd.DataFrame({"id": ids, "v": vals})
            .sort_values(["v", "id"], ascending=[False, True],
                         kind="mergesort")
            .head(k).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31), st.integers(1, 4))
def test_topk_per_group_boundary_ties(ray_session, seed, k):
    """Per-group top-k: one group holds >k rows with the SAME value —
    the tie column must decide membership identically at any batching."""
    from epstein_pipeline_ray.stages.relational import topk_per_group

    rng = np.random.default_rng(seed)
    n = 60
    keys = rng.integers(0, 4, n).astype(np.int64)
    vals = rng.integers(0, 2, n).astype(np.float64)  # ties everywhere
    ids = rng.permutation(n).astype(np.int64)

    def build(parts):
        ds = rd.from_arrow(pa.table({
            "user_id": pa.array(keys, pa.int64()),
            "value": pa.array(vals, pa.float64()),
            "event_id": pa.array(ids, pa.int64()),
        })).repartition(parts)
        return (topk_per_group(ds, "user_id", "value", k,
                               tie_col="event_id").to_pandas()
                .sort_values(["user_id", "value", "event_id"],
                             ascending=[True, False, True],
                             kind="mergesort").reset_index(drop=True))

    got = _repartition_invariant(build)
    want = (pd.DataFrame({"user_id": keys, "value": vals, "event_id": ids})
            .sort_values(["user_id", "value", "event_id"],
                         ascending=[True, False, True], kind="mergesort")
            .groupby("user_id", sort=False).head(k)
            .sort_values(["user_id", "value", "event_id"],
                         ascending=[True, False, True], kind="mergesort")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("seed", [3, 11])
def test_mmr_panel_fetch_boundary_ties(ray_session, seed):
    """MMR candidate fetch: plant more identical-cosine vectors than
    fetch_m; the whole MMR output (panel + greedy) must be invariant
    under input repartitioning."""
    from epstein_pipeline_ray.stages.embed import mmr_topk

    rng = np.random.default_rng(seed)
    q = rng.normal(size=6)
    m, n_tied = 8, 14  # ties exceed the panel size
    tied = np.tile(q, (n_tied, 1)) * rng.uniform(0.5, 2.0, (n_tied, 1))
    noise = rng.normal(size=(20, 6)) - 5 * q
    ids = rng.permutation(n_tied + 20).astype(np.int64)
    emb = np.vstack([tied, noise])

    def build(parts):
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float64())),
        })).repartition(parts)
        return (mmr_topk(ds, q, k=5, fetch_m=m).to_pandas()
                .reset_index(drop=True))

    _repartition_invariant(build)
