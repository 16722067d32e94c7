"""Union-find clustering over verified duplicate pairs.

Reference semantics (src/epstein_pipeline/processors/dedup.py:173-236,
path-halving union-find at dedup.py:183-200): groups of >= 2 become clusters;
representative = member with the longest text; avg_similarity = mean of
pair scores whose BOTH endpoints are in the cluster.

Scale notes: the verified-pair set is orders of magnitude smaller than
the corpus (it is proportional to the duplicate rate). Two physical
plans, switched on the pair count (``assign_clusters``):

- **driver plan** (default below ``driver_pairs_limit``): union-find runs
  on the driver over a *streamed* pair iterator — no corpus-sized state;
  cluster assignment is a broadcast map (``ray.put`` once, read inside
  ``map_batches``), not a shuffle join.
- **exchange plan** (above the limit, or forced via
  ``EPR_CC_DRIVER_LIMIT=0``): iterative min-label propagation with
  pointer jumping through the partitioned-file exchange (PAPERS.md BTS,
  ICDE 2024; Kiveris et al. "Connected Components in MapReduce", SoCC'14
  — same message-passing shape). No process ever holds the pair stream or
  the member→cluster map; labels are the member id STRINGS, so the
  converged label is the lexicographic-min member — identical cluster ids
  to the driver plan by construction (equality-tested at a forced limit).

Deviation from the reference: cluster_id is the lexicographic min member
conv_id (deterministic) instead of ``uuid4()[:8]`` (dedup.py:228), and
representative ties break by id; the reference's uuid is nondeterministic
run-to-run so no output-parity is lost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from epstein_pipeline_ray.stages.groupblock import group_starts

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


def min_label_propagation(pairs: Dataset, num_partitions: int | None = None,
                          max_iters: int = 64) -> Dataset:
    """Distributed connected components over the pair stream: (node, label)
    with label = lexicographic-min member id of the node's component.

    Each iteration is two keyed exchanges:

    1. scatter — messages (src → dst) carry ``label(src)`` to dst. The
       message set is the static directed edge list (both directions)
       PLUS the current label table read as edges (label(x) → x), which
       delivers ``label(label(x))`` to x — pointer jumping for free, so
       chains converge in O(log D) rounds instead of O(D).
    2. gather — per node, new label = min(own label, received labels);
       a ``changed`` flag per node drives convergence.

    Everything is edge/node-proportional — no corpus-sized or
    pair-stream-sized state on any single process. ``num_partitions``
    defaults to the pair count / 250k (clamped to [4, default]): a CC
    loop runs several exchanges per iteration, and full-width exchanges
    over small label tables are pure fixed cost.
    """
    from epstein_pipeline_ray.stages.exchange import gc_exchange_dirs
    from epstein_pipeline_ray.stages.groupblock import (
        default_partitions,
        map_key_blocks,
    )

    if num_partitions is None:
        try:
            n_pairs = pairs.count()
            num_partitions = max(4, min(default_partitions(),
                                        -(-n_pairs // 250_000)))
        except Exception:
            num_partitions = None

    LBL = pa.schema([("node", pa.string()), ("label", pa.string())])
    MSG = pa.schema([("k", pa.string()), ("dst", pa.string()),
                     ("lab", pa.string()), ("own", pa.int8())])
    CAND = pa.schema([("node", pa.string()), ("cand", pa.string()),
                      ("own", pa.int8())])
    STEP = pa.schema([("node", pa.string()), ("label", pa.string()),
                      ("changed", pa.int8())])

    def to_directed(batch: pa.Table) -> pa.Table:
        a = batch["id_a"]
        b = batch["id_b"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        a = a.cast(pa.string())
        b = b.cast(pa.string())
        n = batch.num_rows
        return pa.table(
            {"k": pa.concat_arrays([a, b]),
             "dst": pa.concat_arrays([b, a]),
             "lab": pa.nulls(2 * n, pa.string()),
             "own": pa.array(np.zeros(2 * n, dtype=np.int8))},
            schema=MSG,
        )

    directed = pairs.select_columns(["id_a", "id_b"]).map_batches(
        to_directed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def init_labels(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return LBL.empty_table()
        ks = block["k"]
        if isinstance(ks, pa.ChunkedArray):
            ks = ks.combine_chunks()
        codes = np.asarray(ks.dictionary_encode().indices)
        starts = group_starts(codes)
        uniq = ks.take(pa.array(starts))
        return pa.table({"node": uniq, "label": uniq}, schema=LBL)

    labels = map_key_blocks(
        directed.select_columns(["k"]), ["k"], init_labels, num_partitions
    ).materialize()
    gc_exchange_dirs()

    def label_msgs(batch: pa.Table) -> pa.Table:
        # current labels as messages: own-label row (k=node, own=1) plus a
        # pointer-jump edge (k=label(x), dst=x) delivering label(label(x))
        node = batch["node"]
        lab = batch["label"]
        if isinstance(node, pa.ChunkedArray):
            node = node.combine_chunks()
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        n = batch.num_rows
        return pa.table(
            {"k": pa.concat_arrays([node, lab]),
             "dst": pa.concat_arrays([pa.nulls(n, pa.string()), node]),
             "lab": pa.concat_arrays([lab, pa.nulls(n, pa.string())]),
             "own": pa.array(
                 np.concatenate([np.ones(n, dtype=np.int8),
                                 np.zeros(n, dtype=np.int8)]))},
            schema=MSG,
        )

    def scatter_block(block: pa.Table) -> pa.Table:
        # per key run: ℓ = the own-label row's lab; emit ℓ to every dst,
        # and (node=k, cand=ℓ, own=1) once to carry the old label forward
        if block.num_rows == 0:
            return CAND.empty_table()
        block = block.combine_chunks().sort_by(
            [("k", "ascending"), ("own", "descending")])
        ks = block["k"]
        if isinstance(ks, pa.ChunkedArray):
            ks = ks.combine_chunks()
        codes = np.asarray(ks.dictionary_encode().indices)
        starts = group_starts(codes)
        run_id = np.cumsum(
            np.concatenate([[0], (codes[1:] != codes[:-1]).astype(np.int64)]))
        lab = block["lab"]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        run_lab = lab.take(pa.array(starts))          # ℓ per run
        row_lab = run_lab.take(pa.array(run_id))      # ℓ per row
        dst = block["dst"]
        if isinstance(dst, pa.ChunkedArray):
            dst = dst.combine_chunks()
        msg_mask = pa.array(np.asarray(dst.is_valid()))
        msgs = pa.table(
            {"node": dst.filter(msg_mask),
             "cand": row_lab.filter(msg_mask),
             "own": pa.array(
                 np.zeros(int(pc.sum(msg_mask).as_py() or 0), dtype=np.int8))},
            schema=CAND,
        )
        own = pa.table(
            {"node": ks.take(pa.array(starts)),
             "cand": run_lab,
             "own": pa.array(np.ones(len(starts), dtype=np.int8))},
            schema=CAND,
        )
        return pa.concat_tables([own, msgs])

    def gather_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return STEP.empty_table()
        block = block.combine_chunks().sort_by(
            [("node", "ascending"), ("cand", "ascending")])
        nodes = block["node"]
        if isinstance(nodes, pa.ChunkedArray):
            nodes = nodes.combine_chunks()
        codes = np.asarray(nodes.dictionary_encode().indices)
        starts = group_starts(codes)
        cand = block["cand"]
        if isinstance(cand, pa.ChunkedArray):
            cand = cand.combine_chunks()
        new = cand.take(pa.array(starts))             # min cand per run
        own_mask = pa.array(
            np.asarray(block["own"].to_numpy(zero_copy_only=False)) == 1)
        old = cand.filter(own_mask)                   # exactly one per run
        changed = pc.cast(pc.not_equal(new, old), pa.int8())
        return pa.table(
            {"node": nodes.take(pa.array(starts)), "label": new,
             "changed": changed},
            schema=STEP,
        )

    # Static-edge-shard caching (disk exchange only): the directed edge
    # table is the SAME every round — partition it once and co-group each
    # round's label-message exchange against the cached shards (same keys
    # + same width → co-partitioned by construction). Per round, only the
    # node-sized label table moves; the edge table never re-ships.
    import os as _os

    from epstein_pipeline_ray.stages.exchange import disk_exchange_is_safe

    use_cached_edges = (
        _os.environ.get("EPR_SHUFFLE", "disk") == "disk"
        and disk_exchange_is_safe()
        and _os.environ.get("EPR_CC_CACHE_EDGES", "1").lower()
        not in ("0", "false")
    )
    edges_mdf = edges_dir = None
    if use_cached_edges:
        from epstein_pipeline_ray.stages.exchange import (
            _CREATED_DIRS,
            consume_exchange_manifests,
            write_exchange_shards,
        )

        edges_mdf, num_partitions, edges_dir = write_exchange_shards(
            directed, ["k"], num_partitions)
        # unregister from the round-GC list: the cached shards must
        # survive every per-round gc_exchange_dirs() below
        if edges_dir in _CREATED_DIRS:
            _CREATED_DIRS.remove(edges_dir)

    try:
        for _ in range(max_iters):
            lbl_msgs = labels.map_batches(
                label_msgs, batch_format="pyarrow", zero_copy_batch=True)
            if use_cached_edges:
                lbl_mdf, _, _ = write_exchange_shards(
                    lbl_msgs, ["k"], num_partitions,
                    materialize_input=False)
                cands = consume_exchange_manifests(
                    [edges_mdf, lbl_mdf], scatter_block, num_partitions,
                    ["k"], sort_blocks=False)
            else:
                from epstein_pipeline_ray.stages.groupblock import (
                    concat_datasets,
                )

                msgs = concat_datasets([directed, lbl_msgs.materialize()])
                cands = map_key_blocks(msgs, ["k"], scatter_block,
                                       num_partitions, sort_blocks=False)
            step = map_key_blocks(cands, ["node"], gather_block,
                                  num_partitions,
                                  sort_blocks=False).materialize()
            gc_exchange_dirs()
            labels = step.select_columns(["node", "label"]).materialize()
            n_changed = step.sum("changed") or 0
            if n_changed == 0:
                return labels
        raise RuntimeError(
            f"min_label_propagation did not converge in {max_iters} "
            f"iterations"
        )
    finally:
        if edges_dir is not None:
            import shutil

            shutil.rmtree(edges_dir, ignore_errors=True)


def _cc_driver_limit(default: int = 20_000_000) -> int:
    import os

    return int(os.environ.get("EPR_CC_DRIVER_LIMIT", default))


def assign_clusters_exchange(docs: Dataset, pairs: Dataset,
                             num_partitions: int | None = None) -> Dataset:
    """Exchange-plan cluster assignment: identical output to the broadcast
    plan (same cluster ids, representatives, sizes, avg similarity) with
    no pair-stream- or member-map-sized state on any process.

    Stages: min-label CC → stamp members through one corpus exchange
    (docs ⋈ labels on conv_id) → per-cluster stats (size, representative =
    longest text, ties → larger id) in one cluster-keyed exchange →
    avg_similarity from the relabeled pair stream attached by cluster key.
    """
    import pandas as pd

    from epstein_pipeline_ray.stages.groupblock import default_partitions, map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    # pair-/member-sized exchanges take a width sized to the pair count
    # (fixed cost per partition); the corpus-sized member stamp keeps the
    # caller's width / the engine default
    small_p = num_partitions
    if small_p is None:
        try:
            small_p = max(4, min(default_partitions(),
                                 -(-pairs.count() // 250_000)))
        except Exception:
            small_p = None

    labels = min_label_propagation(pairs, small_p)

    # per-cluster mean pair score: relabel one endpoint (both endpoints
    # share a component by construction), then mean per cluster
    relabeled = attach_column(
        pairs.select_columns(["id_a", "score"]), labels,
        left_key="id_a", right_key="node", value_col="label",
        out_col="cluster_id", broadcast_rows_limit=0,
        num_partitions=small_p,
    )

    AVG = pa.schema([("cluster_id", pa.string()), ("avg_similarity", pa.float64())])

    def mean_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return AVG.empty_table()
        df = pd.DataFrame({
            "cluster_id": block["cluster_id"].to_pandas(),
            "score": block["score"].to_pandas(),
        })
        g = df.groupby("cluster_id", sort=True)["score"].mean().reset_index()
        return pa.table({"cluster_id": pa.array(g["cluster_id"], pa.string()),
                         "avg_similarity": pa.array(g["score"], pa.float64())},
                        schema=AVG)

    avg = map_key_blocks(relabeled, ["cluster_id"], mean_block, small_p)

    # stamp members: ONE corpus-sized exchange (the scale price the
    # broadcast plan pays in plasma instead), then drop non-members. Width
    # scales with the doc count (250k rows/partition, clamped) unless the
    # caller pinned one — full width on a small table is pure fixed cost.
    stamp_p = num_partitions
    if stamp_p is None:
        try:
            stamp_p = max(4, min(default_partitions(),
                                 -(-docs.count() // 250_000)))
        except Exception:
            stamp_p = None
    members = attach_column(
        docs.select_columns(["conv_id", "n_chars"]), labels,
        left_key="conv_id", right_key="node", value_col="label",
        out_col="cluster_id", broadcast_rows_limit=0,
        num_partitions=stamp_p,
    ).map_batches(
        lambda b: b.filter(pc.is_valid(b["cluster_id"])),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    STATS = pa.schema([
        ("conv_id", pa.string()), ("cluster_id", pa.string()),
        ("representative", pa.bool_()), ("cluster_size", pa.int32()),
    ])

    def stats_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return STATS.empty_table()
        # representative = longest text, ties → larger id: sort each
        # cluster by (n_chars, conv_id) and flag the last row
        block = block.combine_chunks().sort_by([
            ("cluster_id", "ascending"), ("n_chars", "ascending"),
            ("conv_id", "ascending"),
        ])
        cids = block["cluster_id"]
        if isinstance(cids, pa.ChunkedArray):
            cids = cids.combine_chunks()
        codes = np.asarray(cids.dictionary_encode().indices)
        starts = group_starts(codes)
        n = len(codes)
        ends = np.concatenate([starts[1:], [n]]) - 1
        rep = np.zeros(n, dtype=bool)
        rep[ends] = True
        sizes = np.diff(np.concatenate([starts, [n]])).astype(np.int32)
        run_id = np.cumsum(
            np.concatenate([[0], (codes[1:] != codes[:-1]).astype(np.int64)]))
        return pa.table(
            {"conv_id": block["conv_id"], "cluster_id": cids,
             "representative": pa.array(rep),
             "cluster_size": pa.array(sizes[run_id])},
            schema=STATS,
        )

    stats = map_key_blocks(members, ["cluster_id"], stats_block, small_p)
    out = attach_column(
        stats, avg, left_key="cluster_id", right_key="cluster_id",
        value_col="avg_similarity", out_col="avg_similarity",
        broadcast_rows_limit=0, num_partitions=small_p,
    )
    from epstein_pipeline_ray.stages.groupblock import drop_empty_blocks

    shaped = out.map_batches(
        lambda b: pa.table(
            {"conv_id": b["conv_id"], "cluster_id": b["cluster_id"],
             "representative": b["representative"],
             "cluster_size": b["cluster_size"],
             "avg_similarity": pc.fill_null(
                 b["avg_similarity"].combine_chunks()
                 if isinstance(b["avg_similarity"], pa.ChunkedArray)
                 else b["avg_similarity"], 1.0)},
            schema=CLUSTERS_SCHEMA),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # launder zero-row blocks: Ray skips UDFs on empty blocks, and a
    # schema-less empty poisons downstream schema unions (cosmetic
    # warnings at best, shuffle crashes at worst)
    return drop_empty_blocks(shaped)


def assign_clusters(docs: Dataset, pairs: Dataset,
                    driver_pairs_limit: int | None = None) -> Dataset:
    """Docs + pairs → cluster membership table (CLUSTERS_SCHEMA).

    Size switch (the engine's broadcast-vs-exchange convention,
    joins.py/minhash_stage.py): at or below ``driver_pairs_limit``
    (default 20M, env ``EPR_CC_DRIVER_LIMIT``) union-find runs on the
    driver and assignment is one broadcast of the (small) cluster map;
    above it the whole computation moves to
    :func:`assign_clusters_exchange` and nothing pair- or member-sized
    ever lands on one process.
    """
    limit = _cc_driver_limit() if driver_pairs_limit is None else driver_pairs_limit
    if pairs.count() > limit:
        return assign_clusters_exchange(docs, pairs)
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


def partition_agreement(
    labels_a, labels_b, key: str = "node",
    label_a_col: str = "label", label_b_col: str = "label",
    round_digits: int = 9, num_partitions: int | None = None,
):
    """Rand index and Adjusted Rand Index between two labelings of the
    same node set — THE clustering-agreement metric for comparing dedup
    cluster assignments (e.g. a fast pass vs a reference pass). Label
    VALUES don't matter, only the partitions.

    All inputs to the closed form are integer pair counts, computed
    scale-safely: one size-switched label attach, a (la, lb)-keyed cell
    exchange, two marginal exchanges, and fixed-size per-block
    sum-of-C(c,2) partials reduced on the driver (never a
    cell-proportional pull). RI = (2*Sab + C(n,2) - Sa - Sb) / C(n,2);
    ARI = (Sab - Sa*Sb/C(n,2)) / ((Sa+Sb)/2 - Sa*Sb/C(n,2)) with
    S* = sum of C(count, 2) over cells / marginals; NMI from the same
    tables via the integer-count entropy closed form. Output: one row
    (n, rand_index, adjusted_rand, nmi, b3_precision,
    b3_recall, b3_f1) — la treated as gold classes, lb as system
    clusters (Bagga & Baldwin 1998)."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    la = labels_a.select_columns([key, label_a_col])
    if label_a_col != "la":
        la = la.map_batches(
            lambda b: pa.table({key: b[key], "la": b[label_a_col]}),
            batch_format="pyarrow", zero_copy_batch=True)
    lb = labels_b.select_columns([key, label_b_col])
    if label_b_col != "lb":
        lb = lb.map_batches(
            lambda b: pa.table({key: b[key], "lb": b[label_b_col]}),
            batch_format="pyarrow", zero_copy_batch=True)
    joined = attach_column(la, lb, key, key, "lb", "lb",
                           num_partitions=num_partitions)

    CELL = pa.schema([("la", pa.string()), ("lb", pa.string()),
                      ("c", pa.int64())])

    def cell_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"la": batch["la"].to_pandas().astype(str),
                           "lb": batch["lb"].to_pandas().astype(str)})
        g = df.groupby(["la", "lb"], sort=False).size().rename("c") \
              .reset_index()
        return pa.table({"la": pa.array(g["la"], pa.string()),
                         "lb": pa.array(g["lb"], pa.string()),
                         "c": pa.array(g["c"].to_numpy(np.int64),
                                       pa.int64())}, schema=CELL)

    def cell_sum(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return CELL.empty_table()
        g = (block.to_pandas()
             .groupby(["la", "lb"], sort=False, as_index=False)["c"].sum())
        return pa.table({"la": pa.array(g["la"], pa.string()),
                         "lb": pa.array(g["lb"], pa.string()),
                         "c": pa.array(g["c"].to_numpy(np.int64),
                                       pa.int64())}, schema=CELL)

    cells = map_key_blocks(
        joined.map_batches(cell_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["la", "lb"], cell_sum, num_partitions,
        sort_blocks=False).materialize()

    PART = pa.schema([("n", pa.int64()), ("s", pa.float64())])

    def choose2_partials(ds, cnt_col):
        def p(batch: pa.Table) -> pa.Table:
            c = np.asarray(batch[cnt_col].to_numpy(zero_copy_only=False),
                           np.float64)
            return pa.table({
                "n": pa.array([int(c.sum())], pa.int64()),
                "s": pa.array([float((c * (c - 1.0) / 2.0).sum())],
                              pa.float64()),
            }, schema=PART)

        tabs = [t for t in ray.get(
            ds.map_batches(p, batch_format="pyarrow",
                           zero_copy_batch=True).to_arrow_refs())
            if t.num_rows]
        n = sum(int(t["n"].to_pandas().sum()) for t in tabs)
        s = sum(float(t["s"].to_pandas().sum()) for t in tabs)
        return n, s

    n, sab = choose2_partials(cells, "c")

    def marginal(col: str):
        M = pa.schema([(col, pa.string()), ("c", pa.int64())])

        def msum(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return M.empty_table()
            g = (block.to_pandas()
                 .groupby(col, sort=False, as_index=False)["c"].sum())
            return pa.table({col: pa.array(g[col], pa.string()),
                             "c": pa.array(g["c"].to_numpy(np.int64),
                                           pa.int64())}, schema=M)

        return map_key_blocks(cells.select_columns([col, "c"]), [col],
                              msum, num_partitions, sort_blocks=False)

    _, sa = choose2_partials(marginal("la"), "c")
    _, sb = choose2_partials(marginal("lb"), "c")

    tot = n * (n - 1) / 2.0
    ri = (2.0 * sab + tot - sa - sb) / tot if tot else 1.0
    exp = sa * sb / tot if tot else 0.0
    den = (sa + sb) / 2.0 - exp
    ari = (sab - exp) / den if den != 0 else 1.0

    # NMI from the SAME bounded cell/marginal tables (integer-count
    # closed forms, the mutual_information convention):
    # MI = (sum c ln c - sum ca ln ca - sum cb ln cb)/n + ln n,
    # H = ln n - sum c ln c / n, NMI = MI / sqrt(Ha*Hb)
    def _clnc(ds, cnt_col) -> float:
        def q(batch: pa.Table) -> pa.Table:
            c = np.asarray(batch[cnt_col].to_numpy(zero_copy_only=False),
                           np.float64)
            return pa.table({"s": pa.array([float((c * np.log(c)).sum())],
                                           pa.float64())})

        tabs = [t for t in ray.get(
            ds.map_batches(q, batch_format="pyarrow",
                           zero_copy_batch=True).to_arrow_refs())
            if t.num_rows]
        return sum(float(t["s"].to_pandas().sum()) for t in tabs)

    cl = _clnc(cells, "c")
    al = _clnc(marginal("la"), "c")
    bl = _clnc(marginal("lb"), "c")
    ln_n = float(np.log(n)) if n else 0.0
    mi = (cl - al - bl) / n + ln_n if n else 0.0
    ha = ln_n - al / n if n else 0.0
    hb = ln_n - bl / n if n else 0.0
    nmi = mi / float(np.sqrt(ha * hb)) if ha > 0 and hb > 0 else (
        1.0 if mi == 0 and (ha == 0 or hb == 0) else 0.0)

    # B-cubed (Bagga & Baldwin 1998): per-item precision/recall averaged
    # = sum over cells of c^2/|cluster| / n, with |cluster| the cell's
    # own-side marginal — one size-switched marginal attach per side,
    # fixed-size partial sums
    from epstein_pipeline_ray.stages.joins import attach_column

    def _b3(side: str) -> float:
        att = attach_column(cells, marginal(side), side, side, "c", "m",
                            num_partitions=num_partitions)

        def q(batch: pa.Table) -> pa.Table:
            c = np.asarray(batch["c"].to_numpy(zero_copy_only=False),
                           np.float64)
            m = np.asarray(batch["m"].to_numpy(zero_copy_only=False),
                           np.float64)
            return pa.table({"s": pa.array([float((c * c / m).sum())],
                                           pa.float64())})

        tabs = [t for t in ray.get(
            att.map_batches(q, batch_format="pyarrow",
                            zero_copy_batch=True).to_arrow_refs())
            if t.num_rows]
        return sum(float(t["s"].to_pandas().sum()) for t in tabs)

    # treating la as gold classes and lb as system clusters:
    b3_p = _b3("lb") / n if n else 1.0   # precision: divide by cluster
    b3_r = _b3("la") / n if n else 1.0   # recall: divide by class
    b3_f = (2 * b3_p * b3_r / (b3_p + b3_r)) if (b3_p + b3_r) else 0.0
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "rand_index": pa.array(
            [float(sql_round(np.array([ri]), round_digits)[0])],
            pa.float64()),
        "adjusted_rand": pa.array(
            [float(sql_round(np.array([ari]), round_digits)[0])],
            pa.float64()),
        "nmi": pa.array(
            [float(sql_round(np.array([nmi]), round_digits)[0])],
            pa.float64()),
        "b3_precision": pa.array(
            [float(sql_round(np.array([b3_p]), round_digits)[0])],
            pa.float64()),
        "b3_recall": pa.array(
            [float(sql_round(np.array([b3_r]), round_digits)[0])],
            pa.float64()),
        "b3_f1": pa.array(
            [float(sql_round(np.array([b3_f]), round_digits)[0])],
            pa.float64()),
    }))
