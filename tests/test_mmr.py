"""MMR diversified top-k (embed.mmr_topk) — diversification hand truth
and panel invariants (rows-only query; no SQL twin by design)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.stages.embed import mmr_topk


def _vecs(rows):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              pa.list_(pa.float64())),
    }))


def test_mmr_diversifies(ray_session):
    # an exact duplicate of the top pick vs a diverse runner-up: plain
    # top-2 takes the duplicate (rel .95 > .9); MMR(λ=0.5) penalizes
    # div=1.0 and swaps in the diverse vector
    # (score_dup = .5*(.95-1) < 0 < .5*(.9-.79255) = score_diverse)
    ds = _vecs([
        (1, [0.95, 0.31225, 0.0]),
        (2, [0.95, 0.31225, 0.0]),
        (3, [0.9, -0.2, 0.38730]),
    ])
    out = mmr_topk(ds, np.array([1.0, 0.0, 0.0]), k=2, fetch_m=3,
                   lam=0.5).to_pandas()
    assert list(out["vec_id"]) == [1, 3]
    # rank 1 is always the highest-relevance candidate
    assert out.loc[0, "relevance"] == 0.95


def test_mmr_lambda_one_is_plain_topk(ray_session):
    ds = _vecs([(i, [float(i + 1), 1.0]) for i in range(10)])
    out = mmr_topk(ds, np.array([1.0, 0.0]), k=3, fetch_m=10,
                   lam=1.0).to_pandas()
    # λ=1 → pure relevance order (cos grows with i here)
    assert list(out["vec_id"]) == [9, 8, 7]
    assert list(out["rank"]) == [1, 2, 3]


def test_mmr_panel_containment_multiblock(ray_session):
    rng = np.random.default_rng(3)
    vec = rng.standard_normal((200, 8))
    ds = _vecs([(i, vec[i].tolist()) for i in range(200)]).repartition(9)
    q = rng.standard_normal(8)
    out = mmr_topk(ds, q, k=8, fetch_m=32).to_pandas()
    assert len(out) == 8 and out["vec_id"].is_unique
    # every selected id must be inside the exact top-32 relevance panel
    qn = q / np.linalg.norm(q)
    vn = vec / np.linalg.norm(vec, axis=1, keepdims=True)
    top32 = set(np.argsort(-(vn @ qn))[:32].tolist())
    assert set(out["vec_id"]) <= top32
    # mmr scores are non-increasing with rank
    assert (np.diff(out["mmr_score"].to_numpy()) <= 1e-12).all()
