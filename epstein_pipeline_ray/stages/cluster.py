"""Union-find clustering over verified duplicate pairs.

Reference semantics (src/epstein_pipeline/processors/dedup.py:173-236,
path-halving union-find at dedup.py:183-200): groups of >= 2 become clusters;
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


def union_find_pairs(pairs: Dataset) -> tuple[dict[str, str], dict[str, float]]:
    """Stream pairs → ({member: cluster_id}, {cluster_id: avg_similarity}).

    cluster_id = min member id. avg_similarity averages every pair score
    with both endpoints inside the cluster, matching dedup.py:222-231.

    Connected components run as vectorized min-label propagation with
    pointer jumping (O(E log D) numpy passes — the driver's Python-loop
    DSU was a serial, CPU-count-independent cost that capped scaling
    efficiency). Every node comes from an edge, so every component has
    >= 2 members by construction.
    """
    dfs = []
    for batch in pairs.iter_batches(batch_size=262144, batch_format="pyarrow"):
        if batch.num_rows:
            dfs.append(batch.select(["id_a", "id_b", "score"]).to_pandas())
    if not dfs:
        return {}, {}
    df = pd.concat(dfs, ignore_index=True)
    both = pd.concat([df["id_a"], df["id_b"]], ignore_index=True)
    codes, uniques = pd.factorize(both)
    m = len(df)
    a = codes[:m].astype(np.int64)
    b = codes[m:].astype(np.int64)
    n = len(uniques)
    lab = np.arange(n, dtype=np.int64)
    while True:
        l2 = lab.copy()
        np.minimum.at(l2, a, lab[b])
        np.minimum.at(l2, b, lab[a])
        l2 = l2[l2]
        l2 = l2[l2]
        if np.array_equal(l2, lab):
            break
        lab = l2
    # cluster_id = lexicographic-min member STRING per component (the
    # propagated label is the min CODE, which is appearance order)
    u = pd.Series(uniques.astype(object))
    cid = u.groupby(lab).transform("min")
    member_to_cluster = dict(zip(u, cid))
    edge_cid = cid.to_numpy()[a]
    avg_s = pd.Series(df["score"].to_numpy()).groupby(edge_cid).mean()
    avg = {k: float(v) for k, v in avg_s.items()}
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
    def member_lengths(batch: pa.Table) -> pd.DataFrame:
        m = ray.get(map_ref)
        df = batch.select(["conv_id", "n_chars"]).to_pandas()
        return df[df["conv_id"].isin(m)]

    lengths = docs.map_batches(member_lengths, batch_format="pyarrow").to_pandas()
    lengths_map = dict(zip(lengths["conv_id"], lengths["n_chars"]))

    # representative = longest text, ties → larger id (dedup.py:217-220;
    # the oracle pins the same (length, id) tuple-max tie-break) —
    # vectorized: sort by (cluster, length, id) and keep each cluster's last
    mem = pd.DataFrame(
        {"conv_id": list(member_to_cluster.keys()),
         "cluster_id": list(member_to_cluster.values())}
    )
    mem["n_chars"] = mem["conv_id"].map(lengths_map).fillna(0)
    mem = mem.sort_values(["cluster_id", "n_chars", "conv_id"], kind="mergesort")
    best = dict(zip(mem.drop_duplicates("cluster_id", keep="last")["cluster_id"],
                    mem.drop_duplicates("cluster_id", keep="last")["conv_id"]))
    sizes = mem.groupby("cluster_id")["conv_id"].size().to_dict()
    reps_ref = ray.put((best, sizes, avg))

    def stamp(batch: pa.Table) -> pd.DataFrame:
        m = ray.get(map_ref)
        best_, sizes_, avg_ = ray.get(reps_ref)
        df = pd.DataFrame({"conv_id": batch["conv_id"].to_pylist()})
        df["cluster_id"] = df["conv_id"].map(m)
        df = df[df["cluster_id"].notna()]
        df["representative"] = df["cluster_id"].map(best_) == df["conv_id"]
        df["cluster_size"] = df["cluster_id"].map(sizes_).astype(np.int32)
        df["avg_similarity"] = df["cluster_id"].map(avg_).fillna(1.0)
        return df.reset_index(drop=True)

    out = docs.select_columns(["conv_id"]).map_batches(stamp, batch_format="pyarrow")
    return out
