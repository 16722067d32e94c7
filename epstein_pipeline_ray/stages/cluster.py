"""Union-find clustering over verified duplicate pairs.

Reference semantics (src/epstein_pipeline/processors/dedup.py:173-236):
path-halving union-find over pairs; groups of >= 2 become clusters;
representative = member with the longest text; avg_similarity = mean of
pair scores whose BOTH endpoints are in the cluster.

Scale notes: the verified-pair set is orders of magnitude smaller than
the corpus (it is proportional to the duplicate rate), so union-find runs
on the driver over a *streamed* pair iterator — no corpus-sized state.
Cluster assignment is then a broadcast map (``ray.put`` once, read inside
``map_batches``), not a shuffle join. If pairs ever outgrow driver memory
the fallback is iterative min-label propagation over groupby (see
PAPERS.md BTS, ICDE 2024) — not needed at the duplicate rates this engine
targets, and documented here as the partitioning assumption.

Deviation from the reference: cluster_id is the lexicographic min member
conv_id (deterministic) instead of ``uuid4()[:8]`` (dedup.py:228), and
representative ties break by id; the reference's uuid is nondeterministic
run-to-run so no output-parity is lost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

CLUSTERS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("cluster_id", pa.string()),
        ("representative", pa.bool_()),
        ("cluster_size", pa.int32()),
        ("avg_similarity", pa.float64()),
    ]
)


class UnionFind:
    """Path-halving union-find keyed by string ids (dedup.py:183-200)."""

    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        self.parent.setdefault(a, a)
        self.parent.setdefault(b, b)
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb

    def groups(self) -> dict[str, list[str]]:
        out: dict[str, list[str]] = {}
        for x in self.parent:
            out.setdefault(self.find(x), []).append(x)
        return {k: v for k, v in out.items() if len(v) >= 2}


def union_find_pairs(pairs: Dataset) -> tuple[dict[str, str], dict[str, float]]:
    """Stream pairs → ({member: cluster_id}, {cluster_id: avg_similarity}).

    cluster_id = min member id. avg_similarity averages every pair score
    with both endpoints inside the cluster, matching dedup.py:222-231.
    """
    uf = UnionFind()
    edge_scores: list[tuple[str, str, float]] = []
    for batch in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ia, ib = batch["id_a"].to_pylist(), batch["id_b"].to_pylist()
        sc = batch["score"].to_pylist()
        for a, b, s in zip(ia, ib, sc):
            uf.union(a, b)
            edge_scores.append((a, b, s))
    member_to_cluster: dict[str, str] = {}
    cluster_scores: dict[str, list[float]] = {}
    for _root, members in uf.groups().items():
        cid = min(members)
        for m in members:
            member_to_cluster[m] = cid
    for a, b, s in edge_scores:
        ca, cb = member_to_cluster.get(a), member_to_cluster.get(b)
        if ca is not None and ca == cb:
            cluster_scores.setdefault(ca, []).append(s)
    avg = {cid: float(np.mean(v)) for cid, v in cluster_scores.items()}
    return member_to_cluster, avg


def assign_clusters(docs: Dataset, pairs: Dataset) -> Dataset:
    """Docs + pairs → cluster membership table (CLUSTERS_SCHEMA).

    One broadcast of the (small) cluster map; representative selection
    needs per-member text lengths, which ride the same broadcast pass:
    the first map_batches collects (conv_id, n_chars) for clustered docs
    only — a metadata-sized projection — and a second pass stamps rows.
    """
    member_to_cluster, avg = union_find_pairs(pairs)
    if not member_to_cluster:
        return ray.data.from_arrow(CLUSTERS_SCHEMA.empty_table())

    map_ref = ray.put(member_to_cluster)

    # pass 1: lengths of clustered members only (small: one row per member)
    def member_lengths(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        ids = batch["conv_id"].to_pylist()
        keep = [i for i, d in enumerate(ids) if d in m]
        sub = batch.take(pa.array(keep, pa.int64()))
        return sub.select(["conv_id", "n_chars"])

    lengths = docs.map_batches(member_lengths, batch_format="pyarrow").to_pandas()
    lengths_map = dict(zip(lengths["conv_id"], lengths["n_chars"]))

    # representative = longest text, ties → larger id (dedup.py:217-220;
    # the oracle pins the same (length, id) tuple-max tie-break)
    best: dict[str, str] = {}
    for m, cid in member_to_cluster.items():
        cur = best.get(cid)
        if cur is None or (lengths_map.get(m, 0), m) > (lengths_map.get(cur, 0), cur):
            best[cid] = m
    sizes: dict[str, int] = {}
    for cid in member_to_cluster.values():
        sizes[cid] = sizes.get(cid, 0) + 1
    reps_ref = ray.put((best, sizes, avg))

    def stamp(batch: pa.Table) -> pd.DataFrame:
        m = ray.get(map_ref)
        best_, sizes_, avg_ = ray.get(reps_ref)
        rows = {"conv_id": [], "cluster_id": [], "representative": [],
                "cluster_size": [], "avg_similarity": []}
        for d in batch["conv_id"].to_pylist():
            cid = m.get(d)
            if cid is None:
                continue
            rows["conv_id"].append(d)
            rows["cluster_id"].append(cid)
            rows["representative"].append(best_[cid] == d)
            rows["cluster_size"].append(np.int32(sizes_[cid]))
            rows["avg_similarity"].append(avg_.get(cid, 1.0))
        return pd.DataFrame(rows)

    out = docs.select_columns(["conv_id"]).map_batches(stamp, batch_format="pyarrow")
    return out
