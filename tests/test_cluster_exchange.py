"""Exchange-plan connected components vs the driver union-find plan.

VERDICT r2 item 2: the documented distributed fallback
(stages/cluster.py) must produce a cluster table EQUAL to the driver
plan's on the same input — forced via ``driver_pairs_limit=0``.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from epstein_pipeline_ray.stages.cluster import (
    assign_clusters,
    min_label_propagation,
)
from epstein_pipeline_ray.stages.exact import PAIRS_SCHEMA


def _pairs_ds(edges, score=0.9, method="minhash"):
    return rd.from_arrow(pa.table(
        {
            "id_a": pa.array([a for a, _ in edges], pa.string()),
            "id_b": pa.array([b for _, b in edges], pa.string()),
            "score": pa.array([score] * len(edges), pa.float64()),
            "method": pa.array([method] * len(edges), pa.string()),
            "reason": pa.array(["t"] * len(edges), pa.string()),
        },
        schema=PAIRS_SCHEMA,
    ))


def _docs_ds(ids, rng):
    return rd.from_arrow(pa.table(
        {
            "conv_id": pa.array(ids, pa.string()),
            "n_chars": pa.array(rng.integers(10, 5000, len(ids)), pa.int64()),
        }
    ))


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values("conv_id")
        .reset_index(drop=True)
        .astype({"cluster_size": np.int64})
        .round({"avg_similarity": 9})
    )


def test_min_label_propagation_chain_and_star(ray_session):
    # 40-node chain (deep diameter → exercises pointer jumping) + a star +
    # singleton edges far away
    chain = [(f"c-{i:03d}", f"c-{i + 1:03d}") for i in range(40)]
    star = [("s-000", f"s-{i:03d}") for i in range(1, 6)]
    labels = min_label_propagation(_pairs_ds(chain + star)).to_pandas()
    lab = dict(zip(labels.node, labels.label))
    assert all(lab[f"c-{i:03d}"] == "c-000" for i in range(41))
    assert all(lab[f"s-{i:03d}"] == "s-000" for i in range(6))
    assert len(labels) == 47


@pytest.mark.parametrize("topology", ["chain", "mixed"])
def test_exchange_plan_equals_driver_plan(ray_session, topology):
    rng = np.random.default_rng(7)
    if topology == "chain":
        edges = [(f"d-{i:04d}", f"d-{i + 1:04d}") for i in range(60)]
        ids = [f"d-{i:04d}" for i in range(80)]  # 19 unclustered docs
    else:
        # random components of mixed size over 300 nodes + 100 loners
        ids = [f"m-{i:04d}" for i in range(400)]
        edges = []
        for lo in range(0, 300, 25):
            members = [f"m-{i:04d}" for i in range(lo, lo + 25)]
            perm = rng.permutation(members)
            edges += list(zip(perm[:-1], perm[1:]))  # random spanning chain
            extra = rng.choice(members, size=(10, 2))
            edges += [(a, b) for a, b in extra if a != b]
    # scores vary so avg_similarity actually discriminates
    scores = rng.uniform(0.8, 1.0, len(edges))
    pairs = rd.from_arrow(pa.table(
        {
            "id_a": pa.array([a for a, _ in edges], pa.string()),
            "id_b": pa.array([b for _, b in edges], pa.string()),
            "score": pa.array(scores, pa.float64()),
            "method": pa.array(["minhash"] * len(edges), pa.string()),
            "reason": pa.array(["t"] * len(edges), pa.string()),
        },
        schema=PAIRS_SCHEMA,
    ))
    docs = _docs_ds(ids, rng)
    driver = assign_clusters(docs, pairs, driver_pairs_limit=10**9).to_pandas()
    exchange = assign_clusters(docs, pairs, driver_pairs_limit=0).to_pandas()
    pd.testing.assert_frame_equal(_norm(driver), _norm(exchange))
    # sanity: every edge endpoint is clustered, loners are not
    clustered = set(driver.conv_id)
    assert clustered == {x for e in edges for x in e}


def test_flagship_clusters_unchanged_under_exchange_plan(ray_session, monkeypatch):
    # end-to-end: the full dedup pipeline's cluster table is identical when
    # connected components are forced through the exchange plan
    from epstein_pipeline_ray.pipelines.dedup import dedup_turns
    from epstein_pipeline_ray.sources.synth import turns_table

    turns = turns_table(400, seed=11)
    base = dedup_turns(rd.from_arrow(turns)).clusters.to_pandas()
    monkeypatch.setenv("EPR_CC_DRIVER_LIMIT", "0")
    forced = dedup_turns(rd.from_arrow(turns)).clusters.to_pandas()
    pd.testing.assert_frame_equal(_norm(base), _norm(forced))
    assert len(base) > 0


def test_env_limit_switches_plan(ray_session, monkeypatch):
    monkeypatch.setenv("EPR_CC_DRIVER_LIMIT", "0")
    edges = [("a-1", "a-2"), ("a-2", "a-3"), ("b-1", "b-2")]
    docs = _docs_ds(["a-1", "a-2", "a-3", "b-1", "b-2", "z-9"],
                    np.random.default_rng(3))
    out = assign_clusters(docs, _pairs_ds(edges)).to_pandas()
    assert sorted(out.cluster_id.unique()) == ["a-1", "b-1"]
    assert out.loc[out.conv_id == "a-1", "cluster_size"].iloc[0] == 3
    # exactly one representative per cluster
    assert out.groupby("cluster_id")["representative"].sum().tolist() == [1, 1]


def test_partition_agreement_truths(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.cluster import partition_agreement

    def lab(nodes, labels):
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.string()),
            "label": pa.array(labels, pa.string())}))

    nodes = [f"n{i}" for i in range(6)]
    a = lab(nodes, ["x", "x", "x", "y", "y", "y"])
    # identical partition under RENAMED labels -> RI = ARI = 1
    b = lab(nodes, ["q", "q", "q", "r", "r", "r"])
    r = partition_agreement(a, b).to_pandas().iloc[0]
    assert r.rand_index == 1.0 and r.adjusted_rand == 1.0 and r.n == 6

    # hand-computed disagreement: split one cluster of a in b
    c = lab(nodes, ["q", "q", "z", "r", "r", "r"])
    r2 = partition_agreement(a, c).to_pandas().iloc[0]
    # pairs: C(6,2)=15; agreements: same-same pairs = C(2,2 in qq)=1
    # + C(3,2 in rrr)=3 = 4 (sab); a marginals C(3,2)*2 = 6 (sa);
    # b marginals C(2,2)+C(3,2)=1+3=4 (sb)
    # RI = (2*4 + 15 - 6 - 4)/15 = 13/15
    assert r2.rand_index == round(13 / 15, 9)
    exp = 6 * 4 / 15
    want_ari = (4 - exp) / ((6 + 4) / 2 - exp)
    assert r2.adjusted_rand == round(want_ari, 9)


def test_partition_agreement_nmi(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.cluster import partition_agreement

    def lab(nodes, labels):
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.string()),
            "label": pa.array(labels, pa.string())}))

    nodes = [f"n{i}" for i in range(4)]
    a = lab(nodes, ["x", "x", "y", "y"])
    # identical partition renamed -> NMI 1
    r = partition_agreement(a, lab(nodes, ["p", "p", "q", "q"])) \
        .to_pandas().iloc[0]
    assert r.nmi == 1.0
    # independent uniform 2x2 (each cell 1) -> MI 0 -> NMI 0
    r2 = partition_agreement(a, lab(nodes, ["p", "q", "p", "q"])) \
        .to_pandas().iloc[0]
    assert abs(r2.nmi) < 1e-9


def test_partition_agreement_b3(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.cluster import partition_agreement

    def lab(nodes, labels):
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.string()),
            "label": pa.array(labels, pa.string())}))

    nodes = [f"n{i}" for i in range(4)]
    gold = lab(nodes, ["x", "x", "y", "y"])
    # system splits cluster y into singletons: precision stays 1
    # (every cluster pure), recall drops: items in y see 1/2 recall
    sys_ = lab(nodes, ["a", "a", "b", "c"])
    r = partition_agreement(gold, sys_).to_pandas().iloc[0]
    assert r.b3_precision == 1.0
    assert r.b3_recall == round((1 + 1 + 0.5 + 0.5) / 4, 9)
    # system merges everything: recall 1, precision = avg purity
    sys2 = lab(nodes, ["m", "m", "m", "m"])
    r2 = partition_agreement(gold, sys2).to_pandas().iloc[0]
    assert r2.b3_recall == 1.0
    assert r2.b3_precision == 0.5


def test_cc_cached_edge_shards_parity(ray_session, monkeypatch):
    """The static-edge-shard-caching loop (edges partitioned once,
    label messages co-grouped against the cached shards each round)
    must produce the same label table as the per-round re-exchange."""
    rng = np.random.default_rng(5)
    # chain + stars + isolated pairs → multi-round convergence
    edges = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(40)]
    edges += [(f"h{j}", f"h{j}_{k}") for j in range(5) for k in range(6)]
    edges += [(f"p{i}a", f"p{i}b") for i in range(10)]
    rng.shuffle(edges)

    def run():
        return (min_label_propagation(_pairs_ds(edges))
                .to_pandas().sort_values("node").reset_index(drop=True))

    monkeypatch.setenv("EPR_CC_CACHE_EDGES", "1")
    cached = run()
    monkeypatch.setenv("EPR_CC_CACHE_EDGES", "0")
    classic = run()
    pd.testing.assert_frame_equal(cached, classic)
    # every chain node got the chain min; stars got the hub-min label
    lab = dict(zip(cached["node"], cached["label"]))
    assert all(lab[f"c{i:03d}"] == "c000" for i in range(41))
    assert lab["h3_4"] == "h3"
