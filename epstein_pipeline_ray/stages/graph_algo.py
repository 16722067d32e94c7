"""Iterative graph algorithms over edge Datasets.

The engine's second iterative-exchange loop (the first is the
connected-components fallback in ``stages/cluster.py``): fixed-iteration
PageRank (Page et al. 1999) where each round is one size-switched
key-attach join (score to out-edges by src) plus one keyed exchange
(inflow sum by dst). The reference's knowledge-graph module ranks nodes
by degree only (processors/knowledge_graph.py weight accumulation); this
is the axis-B extension a corpus-scale entity graph wants.

Cross-engine float determinism: scores are re-rounded (``sql_round``,
= DuckDB round) to ``round_digits`` after EVERY iteration, so the
engine's numpy per-group sums and an unrolled SQL twin's aggregate sums
cannot drift apart across rounds (addition-order ulps are ~1e-18 while
the rounding grid is 1e-9). Dangling-node mass is dropped, not
redistributed — both sides implement the same convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from epstein_pipeline_ray.functions.rounding import sql_round


def _graph_cache_enabled() -> bool:
    """Shared kill switch for the static-edge-shard caching used by the
    pagerank family / HITS / label_propagation (connected components has
    its own ``EPR_CC_CACHE_EDGES``). ``EPR_GRAPH_CACHE_EDGES=0``
    disables it; the historical name ``EPR_PR_CACHE_EDGES`` is honored
    for back-compat (new name wins when both are set). Documented next
    to ``EPR_SHUFFLE`` in README.md."""
    import os

    v = os.environ.get("EPR_GRAPH_CACHE_EDGES",
                       os.environ.get("EPR_PR_CACHE_EDGES", "1"))
    return v.lower() not in ("0", "false")


def _auto_partitions(ds: Dataset, num_partitions: int | None) -> int | None:
    """Loop-exchange width from the MATERIALIZED edge count — an
    iterative graph algorithm runs several exchanges per round, and
    full-width exchanges over small tables are pure fixed cost (the
    min_label_propagation convention, cluster.py)."""
    if num_partitions is not None:
        return num_partitions
    try:
        from epstein_pipeline_ray.stages.groupblock import default_partitions

        n = ds.count()
        return max(4, min(default_partitions(), -(-n // 250_000)))
    except Exception:
        return None


def _npcols(block: pa.Table, names: list[str]) -> list[np.ndarray]:
    return [np.asarray(block[n].to_numpy(zero_copy_only=False),
                       dtype=np.int64) for n in names]


def _lex_order(arrs: list[np.ndarray]) -> np.ndarray:
    """Row order by (arrs[0], arrs[1], ...) ascending — np.lexsort wants
    the PRIMARY key last."""
    return np.lexsort(tuple(reversed(arrs)))


def _distinct_sorted(block: pa.Table, names: list[str]) -> list[np.ndarray]:
    """drop_duplicates + sort over int64 columns, pure numpy (replaces
    the pandas round-trip the r3 review flagged on corpus-proportional
    edge blocks — VERDICT r3 'What's wrong' #2). Returns one deduped,
    lexsorted array per column."""
    arrs = _npcols(block, names)
    order = _lex_order(arrs)
    arrs = [a[order] for a in arrs]
    n = order.size
    if n == 0:
        return arrs
    neq = np.zeros(n, dtype=bool)
    neq[0] = True
    for a in arrs:
        neq[1:] |= a[1:] != a[:-1]
    return [a[neq] for a in arrs]


def _group_count(block: pa.Table, key: str) -> tuple[np.ndarray, np.ndarray]:
    """(sorted unique keys, per-key counts) over one int64 column."""
    k = _npcols(block, [key])[0]
    uniq, counts = np.unique(k, return_counts=True)
    return uniq, counts.astype(np.int64)


def _edge_support(block: pa.Table):
    """For a mixed block of support rows (kind=0, ``u`` = support value)
    and edge rows (kind=1): unique edges with their looked-up support
    (0 when absent), via dense pair codes + one sorted searchsorted.
    Returns (a, b, support) arrays or None when the block has no edges."""
    a, b, u, kind = _npcols(block, ["a", "b", "u", "kind"])
    m1 = kind == 1
    if not m1.any():
        return None
    vals = np.unique(np.concatenate([a, b]))
    k_ = vals.size
    code = np.searchsorted(vals, a) * k_ + np.searchsorted(vals, b)
    ecodes, eidx = np.unique(code[m1], return_index=True)
    ea, eb = a[m1][eidx], b[m1][eidx]
    scodes_all, svals_all = code[~m1], u[~m1]
    if scodes_all.size == 0:
        return ea, eb, np.zeros(ecodes.size, dtype=np.int64)
    order = np.argsort(scodes_all, kind="stable")
    scodes, svals = scodes_all[order], svals_all[order]
    pos = np.searchsorted(scodes, ecodes)
    pos_c = np.minimum(pos, scodes.size - 1)
    found = (pos < scodes.size) & (scodes[pos_c] == ecodes)
    supv = np.where(found, svals[pos_c], 0).astype(np.int64)
    return ea, eb, supv


def _group_sum_i64(block: pa.Table, keys: list[str],
                   val: str) -> tuple[list[np.ndarray], np.ndarray]:
    """(sorted unique key columns, exact int64 per-group sums).
    ``np.add.reduceat`` on the sorted order keeps integer exactness
    (bincount-with-weights would round-trip through float64)."""
    arrs = _npcols(block, keys)
    v = _npcols(block, [val])[0]
    order = _lex_order(arrs)
    arrs = [a[order] for a in arrs]
    v = v[order]
    n = order.size
    if n == 0:
        return arrs, v
    neq = np.zeros(n, dtype=bool)
    neq[0] = True
    for a in arrs:
        neq[1:] |= a[1:] != a[:-1]
    starts = np.flatnonzero(neq)
    return [a[starts] for a in arrs], np.add.reduceat(v, starts)



def pagerank(
    edges: Dataset,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    round_digits: int = 9,
    personalize: str | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """→ (node, pr) after ``iters`` rounds of
    pr(v) = (1-d)/N + d * Σ_{u→v} pr(u)/outdeg(u).

    With ``personalize`` set to a node id, runs PERSONALIZED PageRank
    (random walk with restart, Jeh & Widom WWW'03): the teleport mass
    (1-d) lands entirely on that node and the walk starts there —
    pr(v) = (1-d)*[v=s] + d*Σ, r0 = [v=s]. Same loop, same rounding,
    same dangling convention; the twin gains the matching CASE."""
    from epstein_pipeline_ray.stages.groupblock import (
        default_partitions,
        group_starts,
        map_key_blocks,
    )
    from epstein_pipeline_ray.stages.joins import attach_column

    if num_partitions is None:
        # a 10-round loop runs ~30 exchanges; full width over small
        # node/edge tables is pure fixed cost (same sizing as the CC loop)
        try:
            num_partitions = max(4, min(default_partitions(),
                                        -(-edges.count() // 250_000)))
        except Exception:
            num_partitions = None

    NODE = pa.schema([("node", pa.string())])

    def node_rows(batch: pa.Table) -> pa.Table:
        a = batch[src_col]
        b = batch[dst_col]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return pa.table(
            {"node": pa.concat_arrays([a.cast(pa.string()), b.cast(pa.string())])},
            schema=NODE)

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return NODE.empty_table()
        ks = block["node"]
        if isinstance(ks, pa.ChunkedArray):
            ks = ks.combine_chunks()
        starts = group_starts(np.asarray(ks.dictionary_encode().indices))
        return pa.table({"node": ks.take(pa.array(starts))}, schema=NODE)

    nodes = map_key_blocks(edges.map_batches(
        node_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["node"], distinct_block, num_partitions).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: pa.table({"node": pa.array([], pa.string()),
                                "pr": pa.array([], pa.float64())}),
            batch_format="pyarrow")

    DEG = pa.schema([("node", pa.string()), ("deg", pa.int64())])

    def deg_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return DEG.empty_table()
        ks = block["node"]
        if isinstance(ks, pa.ChunkedArray):
            ks = ks.combine_chunks()
        codes = np.asarray(ks.dictionary_encode().indices)
        starts = group_starts(codes)
        counts = np.diff(np.concatenate([starts, [len(codes)]]))
        return pa.table({"node": ks.take(pa.array(starts)),
                         "deg": pa.array(counts, pa.int64())}, schema=DEG)

    src_nodes = edges.map_batches(
        lambda b, c=src_col: pa.table(
            {"node": (b[c].combine_chunks() if isinstance(b[c], pa.ChunkedArray)
                      else b[c]).cast(pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True)
    outdeg = map_key_blocks(src_nodes, ["node"], deg_block, num_partitions)

    def to_str_edges(batch: pa.Table) -> pa.Table:
        a = batch[src_col]
        b = batch[dst_col]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return pa.table({"src": a.cast(pa.string()), "dst": b.cast(pa.string())})

    e = edges.map_batches(to_str_edges, batch_format="pyarrow", zero_copy_batch=True)
    e = attach_column(e, outdeg, "src", "node", "deg", "deg",
                      num_partitions=num_partitions).materialize()

    if personalize is None:
        pr0 = float(sql_round(1.0 / n_nodes, round_digits))

        def init(batch: pa.Table, v=pr0) -> pa.Table:
            return batch.append_column(
                "pr", pa.array([v] * batch.num_rows, pa.float64()))
    else:
        def init(batch: pa.Table, s_=personalize) -> pa.Table:
            import pyarrow.compute as pc

            is_s = pc.equal(batch["node"], pa.scalar(s_, pa.string()))
            return batch.append_column(
                "pr", pc.if_else(is_s, 1.0, 0.0))

    pr = nodes.map_batches(init, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    IN = pa.schema([("dst", pa.string()), ("inflow", pa.float64())])

    def inflow_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return IN.empty_table()
        df = pd.DataFrame({
            "dst": block["dst"].to_pandas(),
            "c": (np.asarray(block["pr"].to_numpy(zero_copy_only=False))
                  / np.asarray(block["deg"].to_numpy(zero_copy_only=False))),
        })
        g = df.groupby("dst", sort=True)["c"].sum().reset_index()
        return pa.table({"dst": pa.array(g["dst"], pa.string()),
                         "inflow": pa.array(g["c"], pa.float64())}, schema=IN)

    from epstein_pipeline_ray.stages.exchange import (
        disk_exchange_is_safe,
        gc_exchange_dirs,
    )

    # Static-edge-shard caching (same trade as the CC loop): the
    # deg-attached edge table is identical every round — partition it by
    # dst ONCE and, per round, ship only the node-sized pr table into the
    # cached-shard consume as a broadcast lookup. Within-dst-group
    # summand ORDER may differ from the classic plan (shard files are
    # concatenated in sorted-filename order, and the names embed
    # per-task uuids) — parity with the unrolled SQL twin is
    # rounding-mediated: the per-iteration sql_round absorbs ulp-level
    # float-sum differences, as the equivalence tests pin.
    import os as _os

    use_cached_edges = (
        _os.environ.get("EPR_SHUFFLE", "disk") == "disk"
        and disk_exchange_is_safe()
        and _graph_cache_enabled()
        and n_nodes <= 5_000_000  # pr must broadcast
    )
    edges_mdf = edges_dir = None
    if use_cached_edges:
        import ray as _ray

        from epstein_pipeline_ray.stages.exchange import (
            _CREATED_DIRS,
            consume_exchange_manifests,
            write_exchange_shards,
        )

        edges_mdf, num_partitions, edges_dir = write_exchange_shards(
            e, ["dst"], num_partitions)
        if edges_dir in _CREATED_DIRS:
            _CREATED_DIRS.remove(edges_dir)

    def _inflow_cached(pr_ds):
        # node-sized broadcast: (index of node → pr) hash lookup per block
        pr_tbl = pa.concat_tables(
            [t for t in _ray.get(pr_ds.to_arrow_refs()) if t.num_rows])
        idx = pd.Index(pr_tbl["node"].to_pandas())
        vals = np.asarray(pr_tbl["pr"].to_numpy(zero_copy_only=False))
        look_ref = _ray.put((idx, vals))

        def block_fn(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return IN.empty_table()
            lidx, lvals = _ray.get(look_ref)
            pos = lidx.get_indexer(block["src"].to_pandas())
            # get_indexer returns -1 for a missing key, which would
            # silently read the LAST node's value — fail loudly instead.
            assert (pos >= 0).all(), "pagerank: src missing from pr table"
            df = pd.DataFrame({
                "dst": block["dst"].to_pandas(),
                "c": (lvals[pos]
                      / np.asarray(block["deg"].to_numpy(
                          zero_copy_only=False))),
            })
            g = df.groupby("dst", sort=True)["c"].sum().reset_index()
            return pa.table(
                {"dst": pa.array(g["dst"], pa.string()),
                 "inflow": pa.array(g["c"], pa.float64())}, schema=IN)

        return consume_exchange_manifests(
            [edges_mdf], block_fn, num_partitions, ["dst"],
            sort_blocks=False)

    try:
        for _ in range(iters):
            if use_cached_edges:
                inflow = _inflow_cached(pr)
            else:
                contrib = attach_column(e, pr, "src", "node", "pr", "pr",
                                        num_partitions=num_partitions)
                inflow = map_key_blocks(contrib, ["dst"], inflow_block,
                                        num_partitions)
            stepped = attach_column(
                nodes, inflow, "node", "dst",
                "inflow", "inflow", num_partitions=num_partitions)

            def update(batch: pa.Table, d=damping, r=round_digits,
                       s_=personalize, nn=n_nodes) -> pa.Table:
                import pyarrow.compute as pc

                infl = np.asarray(pc.fill_null(
                    batch["inflow"].combine_chunks()
                    if isinstance(batch["inflow"], pa.ChunkedArray)
                    else batch["inflow"], 0.0).to_numpy(zero_copy_only=False))
                if s_ is None:
                    b = (1.0 - d) / nn
                else:
                    nodes_arr = (batch["node"].combine_chunks()
                                 if isinstance(batch["node"], pa.ChunkedArray)
                                 else batch["node"])
                    b = np.where(
                        np.asarray(pc.equal(nodes_arr,
                                            pa.scalar(s_, pa.string()))
                                   .to_numpy(zero_copy_only=False)),
                        1.0 - d, 0.0)
                newpr = sql_round(b + d * infl, r)
                return pa.table({"node": batch["node"],
                                 "pr": pa.array(newpr, pa.float64())})

            pr = stepped.map_batches(update, batch_format="pyarrow",
                                     zero_copy_batch=True).materialize()
            gc_exchange_dirs()
        return pr
    finally:
        if edges_dir is not None:
            import shutil

            shutil.rmtree(edges_dir, ignore_errors=True)


def pagerank_sql(edges_cte: str, damping: float = 0.85, iters: int = 10,
                 round_digits: int = 9,
                 personalize: str | None = None) -> str:
    """The exactly-unrolled DuckDB twin of :func:`pagerank`: one CTE per
    iteration, same formula, same per-iteration rounding, same dangling
    convention. ``edges_cte`` must define ``edges(src, dst)``. With
    ``personalize``, the personalized-PageRank CASE variants."""
    if personalize is None:
        r0_expr = f"round(1.0 / nn.n, {round_digits})"
        base_expr = f"(1 - {damping}) / nn.n"
    else:
        lit = personalize.replace("'", "''")
        r0_expr = f"CASE WHEN node = '{lit}' THEN 1.0 ELSE 0.0 END"
        base_expr = (f"CASE WHEN n.node = '{lit}' "
                     f"THEN 1.0 - {damping} ELSE 0.0 END")
    parts = [f"""WITH {edges_cte},
            nodes AS (
                SELECT src AS node FROM edges UNION SELECT dst FROM edges
            ),
            nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
            outdeg AS (
                SELECT src AS node, count(*)::DOUBLE AS deg
                FROM edges GROUP BY src
            ),
            r0 AS (
                SELECT node, {r0_expr} AS pr
                FROM nodes, nn
            )"""]
    for k in range(1, iters + 1):
        parts.append(f""",
            r{k} AS (
                SELECT n.node,
                       round({base_expr}
                             + {damping} * coalesce(s.inflow, 0.0),
                             {round_digits}) AS pr
                FROM nodes n CROSS JOIN nn
                LEFT JOIN (
                    SELECT e.dst AS node, sum(r.pr / od.deg) AS inflow
                    FROM edges e
                    JOIN r{k - 1} r ON r.node = e.src
                    JOIN outdeg od ON od.node = e.src
                    GROUP BY e.dst
                ) s USING (node)
            )""")
    parts.append(f"\n            SELECT node, pr FROM r{iters}")
    return "".join(parts)


_TRI_CREDIT_SCHEMA = pa.schema([
    ("node", pa.int64()),
    ("cnt", pa.int64()),
])


def triangle_counts(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
    max_wedge_degree: int = 4096,
) -> Dataset:
    """Per-node triangle counts over the undirected simple graph spanned
    by ``edges`` (int64 endpoints; self-loops dropped, parallel edges
    collapsed). Returns ``(node, n_triangles)`` for every node in >= 1
    triangle — each triangle credits all three corners once.

    Degree-ordered compact-forward plan (Chiba–Nishizeki / Schank's
    forward algorithm — the MapReduce formulation of Suri & Vassilvitskii
    WWW'11): orient each edge from its lower-(degree, id) endpoint, emit
    wedges only from out-neighbor pairs (out-degree is O(sqrt(m))-bounded
    on skewed graphs under this orientation), close wedges against the
    canonical edge set in one keyed exchange. Exchanges: distinct-edge,
    degree, wedge-close on the (a, b) corner key, credit sum — plus two
    size-switched degree attaches (joins.attach_column). Out-neighbor
    lists longer than ``max_wedge_degree`` are truncated with metrics
    accounting (``triangles.wedge_capped``; never fires on the sf
    corpora, so oracle parity holds).
    """
    import pandas as pd

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[src_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(batch[dst_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        # map-side distinct
        df = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
        return pa.table({"a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
                         "b": pa.array(df["b"].to_numpy(np.int64), pa.int64())})

    canoned = edges.select_columns([src_col, dst_col]).map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True)

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table()
        a, b = _distinct_sorted(block, ["a", "b"])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    dedup = map_key_blocks(canoned, ["a", "b"], distinct_block,
                           num_partitions, sort_blocks=False)

    def explode_ends(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(np.concatenate([a, b]), pa.int64())})

    ends = dedup.map_batches(explode_ends, batch_format="pyarrow",
                             zero_copy_batch=True)

    def deg_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.schema([("node", pa.int64()),
                              ("deg", pa.int64())]).empty_table()
        uniq, counts = _group_count(block, "node")
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "deg": pa.array(counts, pa.int64())})

    degrees = map_key_blocks(ends, ["node"], deg_block, num_partitions,
                             sort_blocks=False)

    withdeg = attach_column(
        attach_column(dedup, degrees, "a", "node", "deg", "deg_a",
                      num_partitions=num_partitions),
        degrees, "b", "node", "deg", "deg_b",
        num_partitions=num_partitions)

    def orient(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        da = np.asarray(batch["deg_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
        db = np.asarray(batch["deg_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        # u -> v where (deg, id) of u < (deg, id) of v; ids are distinct
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64())})

    oriented = withdeg.map_batches(orient, batch_format="pyarrow",
                                   zero_copy_batch=True)

    # rows for the closing exchange: wedges (kind=0, corner key (a,b),
    # third corner u) and canonical edges (kind=1)
    def wedge_block(block: pa.Table) -> pa.Table:
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("u", pa.int64()), ("kind", pa.int8())])
        if block.num_rows == 0:
            return schema.empty_table()
        u, v = _npcols(block, ["u", "v"])
        order = _lex_order([u, v])
        u, v = u[order], v[order]
        new_run = np.r_[True, u[1:] != u[:-1]]
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        over = run_len > max_wedge_degree
        if over.any():
            from epstein_pipeline_ray.state import metrics
            pos = np.arange(u.size) - np.repeat(np.flatnonzero(new_run), run_len)
            keep = pos < max_wedge_degree
            metrics.inc("triangles.wedge_capped", int(over.sum()))
            metrics.inc("triangles.rows_capped", int((~keep).sum()))
            u, v, run_id = u[keep], v[keep], run_id[keep]
        from epstein_pipeline_ray.stages.corpus_dedup import _run_pairs
        I, J = _run_pairs(run_id)
        wa = np.minimum(v[I], v[J])
        wb = np.maximum(v[I], v[J])
        return pa.table({
            "a": pa.array(wa, pa.int64()),
            "b": pa.array(wb, pa.int64()),
            "u": pa.array(u[I], pa.int64()),
            "kind": pa.array(np.zeros(wa.size, dtype=np.int8), pa.int8()),
        }, schema=schema)

    wedges = map_key_blocks(oriented, ["u"], wedge_block, num_partitions,
                            sort_blocks=False)

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "a": batch["a"],
            "b": batch["b"],
            "u": pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
            "kind": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
        })

    closing_in = wedges.union(dedup.map_batches(
        edge_rows, batch_format="pyarrow", zero_copy_batch=True))

    def close_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _TRI_CREDIT_SCHEMA.empty_table()
        a, b, u, kind = _npcols(block, ["a", "b", "u", "kind"])
        is_edge = kind == 1
        if not is_edge.any() or is_edge.all():
            return _TRI_CREDIT_SCHEMA.empty_table()
        # dense-encode (a, b) so the wedge-closes-an-edge membership test
        # is one sorted isin over exact int64 codes (k*k < 2^63 for any
        # per-partition node count)
        vals = np.unique(np.concatenate([a, b]))
        k = vals.size
        code = np.searchsorted(vals, a) * k + np.searchsorted(vals, b)
        closed = ~is_edge & np.isin(code, code[is_edge])
        if not closed.any():
            return _TRI_CREDIT_SCHEMA.empty_table()
        credit = np.concatenate([a[closed], b[closed], u[closed]])
        uniq, counts = np.unique(credit, return_counts=True)
        return pa.table({
            "node": pa.array(uniq, pa.int64()),
            "cnt": pa.array(counts.astype(np.int64), pa.int64()),
        }, schema=_TRI_CREDIT_SCHEMA)

    credits = map_key_blocks(closing_in, ["a", "b"], close_block,
                             num_partitions, sort_blocks=False)

    def sum_block(block: pa.Table) -> pa.Table:
        schema = pa.schema([("node", pa.int64()), ("n_triangles", pa.int64())])
        if block.num_rows == 0:
            return schema.empty_table()
        (nodes_u,), sums = _group_sum_i64(block, ["node"], "cnt")
        return pa.table({
            "node": pa.array(nodes_u, pa.int64()),
            "n_triangles": pa.array(sums, pa.int64()),
        }, schema=schema)

    return map_key_blocks(credits, ["node"], sum_block, num_partitions,
                          sort_blocks=False)


def label_propagation(
    edges: Dataset,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> Dataset:
    """Synchronous label-propagation communities (Raghavan 2007, the
    deterministic sync variant): every node starts as its own label;
    each round every node adopts the most frequent label among its
    neighbors, ties to the SMALLEST label — fully deterministic, so a
    fixed ``iters`` unrolls to an exact SQL twin
    (:func:`label_propagation_sql`, the pagerank_sql convention). Sync
    LPA can oscillate on bipartite structure; with both engines
    unrolled identically that is a feature of the semantics, not a
    divergence. Returns ``(node, label)`` over int64 nodes.

    Undirected simple graph (self-loops dropped, parallel edges
    collapsed — a doubled edge must not double its vote). Per round:
    one size-switched label attach onto the directed edge list + one
    dst-keyed vote exchange (count per label, block-local argmax)."""
    import pyarrow.compute as pc_

    from epstein_pipeline_ray.stages.exchange import gc_exchange_dirs
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[src_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(batch[dst_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        df = pd.DataFrame({"a": np.minimum(s, d),
                           "b": np.maximum(s, d)}).drop_duplicates()
        return pa.table({"a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
                         "b": pa.array(df["b"].to_numpy(np.int64), pa.int64())})

    UND = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return UND.empty_table()
        a, b = _distinct_sorted(block, ["a", "b"])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    und = map_key_blocks(
        edges.select_columns([src_col, dst_col]).map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], distinct_block, num_partitions, sort_blocks=False)

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False))
        return pa.table({"s": pa.array(np.concatenate([a, b]), pa.int64()),
                         "d": pa.array(np.concatenate([b, a]), pa.int64())})

    de = und.map_batches(both_dirs, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    num_partitions = _auto_partitions(de, num_partitions)

    NODE = pa.schema([("node", pa.int64()), ("lab", pa.int64())])

    def node_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return NODE.empty_table()
        u = np.unique(np.asarray(block["s"].to_numpy(zero_copy_only=False)))
        return pa.table({"node": pa.array(u, pa.int64()),
                         "lab": pa.array(u, pa.int64())}, schema=NODE)

    labels = map_key_blocks(
        de.select_columns(["s"]), ["s"], node_block, num_partitions,
        sort_blocks=False).materialize()

    def vote_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return NODE.empty_table()
        d, lab = _npcols(block, ["d", "lab"])
        order = _lex_order([d, lab])
        ds_, ls_ = d[order], lab[order]
        neq = np.zeros(ds_.size, dtype=bool)
        neq[0] = True
        neq[1:] = (ds_[1:] != ds_[:-1]) | (ls_[1:] != ls_[:-1])
        starts = np.flatnonzero(neq)
        du, lu = ds_[starts], ls_[starts]
        counts = np.diff(np.r_[starts, ds_.size])
        # per node: max vote count, ties to the smallest label
        win = np.lexsort((lu, -counts, du))
        dw, lw = du[win], lu[win]
        first = np.r_[True, dw[1:] != dw[:-1]]
        return pa.table({
            "node": pa.array(dw[first], pa.int64()),
            "lab": pa.array(lw[first], pa.int64()),
        }, schema=NODE)

    # Static-edge-shard caching (the CC/PageRank trade): partition the
    # directed edge list by d ONCE; per round broadcast the node-sized
    # label table into the cached consume. vote_block is order-blind
    # (integer counts, pinned ties), so the plans are trivially equal.
    import os as _os

    import ray as _ray

    from epstein_pipeline_ray.stages.exchange import disk_exchange_is_safe

    use_cached_edges = (
        _os.environ.get("EPR_SHUFFLE", "disk") == "disk"
        and disk_exchange_is_safe()
        and _graph_cache_enabled()
        and labels.count() <= 5_000_000  # the label table must broadcast
    )
    edges_mdf = edges_dir = None
    if use_cached_edges:
        from epstein_pipeline_ray.stages.exchange import (
            _CREATED_DIRS,
            consume_exchange_manifests,
            write_exchange_shards,
        )

        edges_mdf, num_partitions, edges_dir = write_exchange_shards(
            de, ["d"], num_partitions)
        if edges_dir in _CREATED_DIRS:
            _CREATED_DIRS.remove(edges_dir)

    def _vote_cached(lbl_ds):
        lbl_tbl = pa.concat_tables(
            [t for t in _ray.get(lbl_ds.to_arrow_refs()) if t.num_rows])
        look_ref = _ray.put((
            pd.Index(np.asarray(lbl_tbl["node"].to_numpy(
                zero_copy_only=False), np.int64)),
            np.asarray(lbl_tbl["lab"].to_numpy(zero_copy_only=False),
                       np.int64)))

        def block_fn(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return NODE.empty_table()
            lidx, lvals = _ray.get(look_ref)
            s = np.asarray(block["s"].to_numpy(zero_copy_only=False),
                           np.int64)
            pos = lidx.get_indexer(s)
            # -1 (missing key) would silently read the LAST label
            assert (pos >= 0).all(), "label_prop: src missing from labels"
            lab = lvals[pos]
            return vote_block(pa.table({
                "d": block["d"], "lab": pa.array(lab, pa.int64())}))

        return consume_exchange_manifests(
            [edges_mdf], block_fn, num_partitions, ["d"],
            sort_blocks=False)

    try:
        for _ in range(iters):
            if use_cached_edges:
                labels = _vote_cached(labels).materialize()
            else:
                tagged = attach_column(de, labels, "s", "node", "lab",
                                       "lab",
                                       num_partitions=num_partitions)
                labels = map_key_blocks(tagged, ["d"], vote_block,
                                        num_partitions,
                                        sort_blocks=False).materialize()
            gc_exchange_dirs()
    finally:
        if edges_dir is not None:
            import shutil

            shutil.rmtree(edges_dir, ignore_errors=True)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "label": batch["lab"]})

    return labels.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True)


def label_propagation_sql(edges_cte: str, iters: int = 4) -> str:
    """Exactly-unrolled DuckDB twin of :func:`label_propagation` — one
    CTE per round (the pagerank_sql convention). ``edges_cte`` must
    define ``edges(src, dst)``."""
    parts = [f"""WITH {edges_cte},
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM edges WHERE src <> dst
        ),
        de AS (
            SELECT a AS s, b AS d FROM und
            UNION ALL SELECT b, a FROM und
        ),
        l0 AS (SELECT DISTINCT s AS node, s AS lab FROM de)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
        l{i} AS (
            SELECT node, lab FROM (
                SELECT e.d AS node, l.lab AS lab,
                       row_number() OVER (PARTITION BY e.d
                           ORDER BY count(*) DESC, l.lab ASC) AS rn
                FROM de e JOIN l{i - 1} l ON l.node = e.s
                GROUP BY e.d, l.lab
            ) WHERE rn = 1
        )""")
    parts.append(f"""
        SELECT node::BIGINT AS node, lab::BIGINT AS label FROM l{iters}""")
    return "".join(parts)


def pagerank_weighted(
    edges: Dataset,
    damping: float = 0.85,
    iters: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Weighted PageRank: pr(v) = (1−d)/N + d·Σ_{u→v} pr(u)·w(u,v)/W(u)
    with W(u) = Σ of u's out-edge weights — the KG variant where edge
    mass follows co-occurrence counts (term_cooccur weights) instead of
    uniform splits. Same iterative-exchange loop and per-round rounding
    as :func:`pagerank`; kept as a SEPARATE function so the green
    unweighted twin stays untouched. Weights are int64/float; rows with
    non-positive weight are dropped."""
    import pyarrow.compute as pc_

    from epstein_pipeline_ray.stages.exchange import gc_exchange_dirs
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    def clean(batch: pa.Table) -> pa.Table:
        w = pc_.cast(batch[weight_col], pa.float64())
        t = pa.table({"src": pc_.cast(batch[src_col], pa.string()),
                      "dst": pc_.cast(batch[dst_col], pa.string()),
                      "w": w})
        return t.filter(pc_.greater(t["w"], pa.scalar(0.0)))

    e = edges.map_batches(clean, batch_format="pyarrow",
                          zero_copy_batch=True)

    NODE = pa.schema([("node", pa.string())])

    def node_rows(batch: pa.Table) -> pa.Table:
        a = batch["src"]
        b = batch["dst"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b])}, schema=NODE)

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return NODE.empty_table()
        u = sorted(set(block["node"].to_pylist()))
        return pa.table({"node": pa.array(u, pa.string())}, schema=NODE)

    nodes = map_key_blocks(
        e.map_batches(node_rows, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["node"], distinct_block, num_partitions).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: pa.table({"node": pa.array([], pa.string()),
                                "pr": pa.array([], pa.float64())}),
            batch_format="pyarrow")

    WS = pa.schema([("node", pa.string()), ("wout", pa.float64())])

    def wsum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return WS.empty_table()
        g = block.to_pandas().groupby("src", sort=True)["w"].sum()
        return pa.table({"node": pa.array(g.index, pa.string()),
                         "wout": pa.array(g.to_numpy(np.float64),
                                          pa.float64())}, schema=WS)

    wout = map_key_blocks(e.select_columns(["src", "w"]), ["src"],
                          wsum_block, num_partitions, sort_blocks=False)
    e = attach_column(e, wout, "src", "node", "wout", "wout",
                      num_partitions=num_partitions).materialize()

    base = (1.0 - damping) / n_nodes
    pr0 = float(sql_round(1.0 / n_nodes, round_digits))
    pr = nodes.map_batches(
        lambda b, v=pr0: b.append_column(
            "pr", pa.array([v] * b.num_rows, pa.float64())),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    IN = pa.schema([("dst", pa.string()), ("inflow", pa.float64())])

    def inflow_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return IN.empty_table()
        df = pd.DataFrame({
            "dst": block["dst"].to_pandas(),
            "c": (np.asarray(block["pr"].to_numpy(zero_copy_only=False))
                  * np.asarray(block["w"].to_numpy(zero_copy_only=False))
                  / np.asarray(block["wout"].to_numpy(zero_copy_only=False))),
        })
        g = df.groupby("dst", sort=True)["c"].sum().reset_index()
        return pa.table({"dst": pa.array(g["dst"], pa.string()),
                         "inflow": pa.array(g["c"], pa.float64())},
                        schema=IN)

    for _ in range(iters):
        contrib = attach_column(e, pr, "src", "node", "pr", "pr",
                                num_partitions=num_partitions)
        inflow = map_key_blocks(contrib, ["dst"], inflow_block,
                                num_partitions)
        stepped = attach_column(nodes, inflow, "node", "dst",
                                "inflow", "inflow",
                                num_partitions=num_partitions)

        def update(batch: pa.Table, b=base, d=damping,
                   r=round_digits) -> pa.Table:
            infl = np.asarray(pc_.fill_null(
                batch["inflow"].combine_chunks()
                if isinstance(batch["inflow"], pa.ChunkedArray)
                else batch["inflow"], 0.0).to_numpy(zero_copy_only=False))
            newpr = sql_round(b + d * infl, r)
            return pa.table({"node": batch["node"],
                             "pr": pa.array(newpr, pa.float64())})

        pr = stepped.map_batches(update, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
        gc_exchange_dirs()
    return pr


def pagerank_weighted_sql(edges_cte: str, damping: float = 0.85,
                          iters: int = 6, round_digits: int = 9) -> str:
    """Exactly-unrolled DuckDB twin of :func:`pagerank_weighted`.
    ``edges_cte`` must define ``edges(src, dst, w)`` with w > 0."""
    d = damping
    parts = [f"""WITH {edges_cte},
        nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges)
        ),
        nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        wo AS (SELECT src, sum(w)::DOUBLE AS wout FROM edges GROUP BY src),
        p0 AS (SELECT node, round(1.0 / nn.n, {round_digits}) AS pr
               FROM nodes CROSS JOIN nn)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
        p{i} AS (
            SELECT nodes.node,
                   round((1.0 - {d}) / nn.n + {d} * coalesce(f.inflow, 0.0),
                         {round_digits}) AS pr
            FROM nodes CROSS JOIN nn
            LEFT JOIN (
                SELECT e.dst AS node, sum(p.pr * e.w / wo.wout) AS inflow
                FROM edges e
                JOIN p{i - 1} p ON p.node = e.src
                JOIN wo ON wo.src = e.src
                GROUP BY e.dst
            ) f ON f.node = nodes.node
        )""")
    parts.append(f"""
        SELECT node, pr FROM p{iters}""")
    return "".join(parts)


_BFS_INF = 1 << 30


def bfs_hops(
    edges: Dataset,
    source: int,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> Dataset:
    """Unweighted shortest-path hop counts from ``source`` over the
    undirected graph, bounded to ``rounds`` synchronous relaxations —
    the Bellman-Ford/BFS frontier loop as keyed exchanges
    (dist(v) ← min(dist(v), min over neighbors dist(u) + 1) per round).
    Returns ``(node, dist)`` for nodes REACHED within ``rounds`` hops;
    fixed rounds unroll to the exact SQL twin (:func:`bfs_hops_sql`).
    Int64 nodes; self-loops dropped, parallel edges collapsed."""
    import pandas as _pd

    from epstein_pipeline_ray.stages.exchange import gc_exchange_dirs
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[src_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(batch[dst_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        df = _pd.DataFrame({"s": np.concatenate([s, d]),
                            "d": np.concatenate([d, s])}).drop_duplicates()
        return pa.table({"s": pa.array(df["s"].to_numpy(np.int64), pa.int64()),
                         "d": pa.array(df["d"].to_numpy(np.int64), pa.int64())})

    UND = pa.schema([("s", pa.int64()), ("d", pa.int64())])

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return UND.empty_table()
        s, d = _distinct_sorted(block, ["s", "d"])
        return pa.table({"s": pa.array(s, pa.int64()),
                         "d": pa.array(d, pa.int64())})

    de = map_key_blocks(
        edges.select_columns([src_col, dst_col]).map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True),
        ["s", "d"], distinct_block, num_partitions,
        sort_blocks=False).materialize()

    NODE = pa.schema([("node", pa.int64()), ("dist", pa.int64())])

    def node_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return NODE.empty_table()
        u = np.unique(np.asarray(block["s"].to_numpy(zero_copy_only=False)))
        d = np.where(u == source, 0, _BFS_INF).astype(np.int64)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "dist": pa.array(d, pa.int64())}, schema=NODE)

    dist = map_key_blocks(de.select_columns(["s"]), ["s"], node_block,
                          num_partitions, sort_blocks=False).materialize()

    def relax_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return NODE.empty_table()
        d, dist_v = _npcols(block, ["d", "dist"])
        order = _lex_order([d, dist_v])
        ds_, vs_ = d[order], dist_v[order]
        first = np.r_[True, ds_[1:] != ds_[:-1]]
        return pa.table({
            "node": pa.array(ds_[first], pa.int64()),
            "dist": pa.array(np.minimum(vs_[first] + 1, _BFS_INF),
                             pa.int64()),
        }, schema=NODE)

    for _ in range(rounds):
        tagged = attach_column(de, dist, "s", "node", "dist", "dist",
                               num_partitions=num_partitions)
        relaxed = map_key_blocks(tagged, ["d"], relax_block,
                                 num_partitions, sort_blocks=False)
        stepped = attach_column(dist, relaxed, "node", "node",
                                "dist", "nbr", num_partitions=num_partitions)

        def take_min(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc_

            cur = np.asarray(batch["dist"].to_numpy(zero_copy_only=False),
                             np.int64)
            nbr = np.asarray(pc_.fill_null(
                batch["nbr"].combine_chunks()
                if isinstance(batch["nbr"], pa.ChunkedArray)
                else batch["nbr"], _BFS_INF).to_numpy(zero_copy_only=False),
                np.int64)
            return pa.table({"node": batch["node"],
                             "dist": pa.array(np.minimum(cur, nbr),
                                              pa.int64())}, schema=NODE)

        dist = stepped.map_batches(take_min, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
        gc_exchange_dirs()

    def reached(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return batch.filter(pc_.less(batch["dist"],
                                     pa.scalar(_BFS_INF, pa.int64())))

    return dist.map_batches(reached, batch_format="pyarrow",
                            zero_copy_batch=True)


def bfs_hops_sql(edges_cte: str, source: int, rounds: int = 4) -> str:
    """Exactly-unrolled DuckDB twin of :func:`bfs_hops`. ``edges_cte``
    must define ``edges(src, dst)``."""
    INF = _BFS_INF
    parts = [f"""WITH {edges_cte},
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM edges WHERE src <> dst
        ),
        de AS (SELECT a AS s, b AS d FROM und
               UNION ALL SELECT b, a FROM und),
        n0 AS (SELECT DISTINCT s AS node FROM de),
        d0 AS (SELECT node,
                      CASE WHEN node = {source} THEN 0
                           ELSE {INF} END::BIGINT AS dist FROM n0)"""]
    for i in range(1, rounds + 1):
        parts.append(f""",
        d{i} AS (
            SELECT p.node,
                   least(p.dist,
                         coalesce(m.md, {INF}))::BIGINT AS dist
            FROM d{i - 1} p
            LEFT JOIN (
                SELECT e.d AS node,
                       least(min(q.dist) + 1, {INF}) AS md
                FROM de e JOIN d{i - 1} q ON q.node = e.s
                GROUP BY e.d
            ) m ON m.node = p.node
        )""")
    parts.append(f"""
        SELECT node, dist FROM d{rounds} WHERE dist < {INF}""")
    return "".join(parts)


_CN_SCHEMA = pa.schema([
    ("id_a", pa.int64()),
    ("id_b", pa.int64()),
    ("n_common", pa.int64()),
    ("jaccard", pa.float64()),
])


def common_neighbors(
    edges: Dataset,
    min_common: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
    max_wedge_degree: int = 4096,
) -> Dataset:
    """Link-prediction scores: for every node pair with at least
    ``min_common`` shared neighbors, the common-neighbor count and the
    neighborhood Jaccard ``|N(a) ∩ N(b)| / |N(a) ∪ N(b)|``
    (= cn / (deg_a + deg_b − cn); the union double-counts nothing —
    a and b themselves are counted only if adjacent to the other,
    documented convention). The wedge machinery of triangle_counts
    WITHOUT degree orientation (every wedge center votes once); hub
    adjacency lists above ``max_wedge_degree`` truncate with metrics
    accounting. Self-loops dropped, parallel edges collapsed."""
    import pandas as _pd

    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[src_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(batch[dst_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        df = _pd.DataFrame({"a": np.minimum(s, d),
                            "b": np.maximum(s, d)}).drop_duplicates()
        return pa.table({"a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
                         "b": pa.array(df["b"].to_numpy(np.int64), pa.int64())})

    UND = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return UND.empty_table()
        a, b = _distinct_sorted(block, ["a", "b"])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    und = map_key_blocks(
        edges.select_columns([src_col, dst_col]).map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], distinct_block, num_partitions, sort_blocks=False)

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False))
        return pa.table({"u": pa.array(np.concatenate([a, b]), pa.int64()),
                         "v": pa.array(np.concatenate([b, a]), pa.int64())})

    de = und.map_batches(both_dirs, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()

    DEG = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def deg_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return DEG.empty_table()
        uniq, counts = _group_count(block, "u")
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "deg": pa.array(counts, pa.int64())},
                        schema=DEG)

    degrees = map_key_blocks(de.select_columns(["u"]), ["u"], deg_block,
                             num_partitions, sort_blocks=False)

    WEDGE = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                       ("cnt", pa.int64())])

    def wedge_block(block: pa.Table) -> pa.Table:
        if block.num_rows < 2:
            return WEDGE.empty_table()
        u, v = _npcols(block, ["u", "v"])
        order = _lex_order([u, v])
        u, v = u[order], v[order]
        new_run = np.r_[True, u[1:] != u[:-1]]
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        over = run_len > max_wedge_degree
        if over.any():
            from epstein_pipeline_ray.state import metrics
            pos = np.arange(u.size) - np.repeat(np.flatnonzero(new_run),
                                                run_len)
            keep = pos < max_wedge_degree
            metrics.inc("common_nbrs.wedge_capped", int(over.sum()))
            metrics.inc("common_nbrs.rows_capped", int((~keep).sum()))
            u, v, run_id = u[keep], v[keep], run_id[keep]
        from epstein_pipeline_ray.stages.corpus_dedup import _run_pairs
        I, J = _run_pairs(run_id)
        if I.size == 0:
            return WEDGE.empty_table()
        wa, wb = np.minimum(v[I], v[J]), np.maximum(v[I], v[J])
        order2 = _lex_order([wa, wb])
        wa, wb = wa[order2], wb[order2]
        neq = np.zeros(wa.size, dtype=bool)
        neq[0] = True
        neq[1:] = (wa[1:] != wa[:-1]) | (wb[1:] != wb[:-1])
        starts = np.flatnonzero(neq)
        return pa.table({
            "id_a": pa.array(wa[starts], pa.int64()),
            "id_b": pa.array(wb[starts], pa.int64()),
            "cnt": pa.array(np.diff(np.r_[starts, wa.size]), pa.int64()),
        }, schema=WEDGE)

    partials = map_key_blocks(de, ["u"], wedge_block, num_partitions,
                              sort_blocks=False)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return WEDGE.empty_table()
        (ia, ib), sums = _group_sum_i64(block, ["id_a", "id_b"], "cnt")
        keep = sums >= min_common
        return pa.table({
            "id_a": pa.array(ia[keep], pa.int64()),
            "id_b": pa.array(ib[keep], pa.int64()),
            "cnt": pa.array(sums[keep], pa.int64()),
        }, schema=WEDGE)

    cn = map_key_blocks(partials, ["id_a", "id_b"], sum_block,
                        num_partitions, sort_blocks=False)
    cn = attach_column(cn, degrees, "id_a", "node", "deg", "da",
                       num_partitions=num_partitions)
    cn = attach_column(cn, degrees, "id_b", "node", "deg", "db",
                       num_partitions=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _CN_SCHEMA.empty_table()
        c = np.asarray(batch["cnt"].to_numpy(zero_copy_only=False),
                       np.float64)
        da = np.asarray(batch["da"].to_numpy(zero_copy_only=False),
                        np.float64)
        db = np.asarray(batch["db"].to_numpy(zero_copy_only=False),
                        np.float64)
        j = sql_round(c / (da + db - c), 6)
        return pa.table({
            "id_a": batch["id_a"],
            "id_b": batch["id_b"],
            "n_common": batch["cnt"],
            "jaccard": pa.array(j, pa.float64()),
        }, schema=_CN_SCHEMA)

    return cn.map_batches(finish, batch_format="pyarrow",
                          zero_copy_batch=True)


def hits(
    edges: Dataset,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """HITS hubs & authorities (Kleinberg JACM'99) over the DIRECTED
    distinct edge set, L1-normalized each half-step (L1 instead of the
    classic L2 keeps the twin free of sqrt-accumulation drift; ranks
    are unaffected by the norm choice) with per-round rounding — the
    pagerank house convention, so a fixed ``iters`` unrolls to the
    exact SQL twin (:func:`hits_sql`). Returns
    ``(node, hub, authority)``; nodes with no in-edges get authority 0,
    no out-edges hub 0."""
    import pandas as _pd
    import pyarrow.compute as pc_

    from epstein_pipeline_ray.stages.exchange import gc_exchange_dirs
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    def canon(batch: pa.Table) -> pa.Table:
        df = _pd.DataFrame({
            "s": np.asarray(batch[src_col].to_numpy(zero_copy_only=False),
                            np.int64),
            "d": np.asarray(batch[dst_col].to_numpy(zero_copy_only=False),
                            np.int64),
        }).drop_duplicates()
        return pa.table({"s": pa.array(df["s"].to_numpy(np.int64), pa.int64()),
                         "d": pa.array(df["d"].to_numpy(np.int64), pa.int64())})

    E = pa.schema([("s", pa.int64()), ("d", pa.int64())])

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return E.empty_table()
        s, d = _distinct_sorted(block, ["s", "d"])
        return pa.table({"s": pa.array(s, pa.int64()),
                         "d": pa.array(d, pa.int64())})

    de = map_key_blocks(
        edges.select_columns([src_col, dst_col]).map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True),
        ["s", "d"], distinct_block, num_partitions,
        sort_blocks=False).materialize()
    num_partitions = _auto_partitions(de, num_partitions)

    NODE = pa.schema([("node", pa.int64()), ("x", pa.float64())])

    def node_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return NODE.empty_table()
        u = np.unique(np.asarray(block["node"].to_numpy(
            zero_copy_only=False)))
        return pa.table({"node": pa.array(u, pa.int64()),
                         "x": pa.array(np.ones(u.size), pa.float64())},
                        schema=NODE)

    ends = de.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays([
            b["s"].combine_chunks() if isinstance(b["s"], pa.ChunkedArray)
            else b["s"],
            b["d"].combine_chunks() if isinstance(b["d"], pa.ChunkedArray)
            else b["d"]])}),
        batch_format="pyarrow", zero_copy_batch=True)
    nodes = map_key_blocks(ends, ["node"], node_block, num_partitions,
                           sort_blocks=False).materialize()

    def normalized(vec: Dataset, col_from: str) -> Dataset:
        total = float(vec.sum("x") or 0.0)

        def norm(batch: pa.Table, t=total) -> pa.Table:
            x = np.asarray(batch["x"].to_numpy(zero_copy_only=False),
                           np.float64)
            y = sql_round(x / t, round_digits) if t > 0 else x
            return pa.table({"node": batch["node"],
                             "x": pa.array(y, pa.float64())}, schema=NODE)

        return vec.map_batches(norm, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    # Static-edge-shard caching (the CC/PageRank trade, twice over): the
    # distinct edge table is pushed through an exchange TWICE per
    # iteration (once keyed by d, once by s) yet never changes —
    # partition it once per direction and per half-step broadcast the
    # node-sized vector into the cached consume.
    import os as _os

    import ray as _ray

    from epstein_pipeline_ray.stages.exchange import disk_exchange_is_safe

    use_cached_edges = (
        _os.environ.get("EPR_SHUFFLE", "disk") == "disk"
        and disk_exchange_is_safe()
        and _graph_cache_enabled()
        and nodes.count() <= 5_000_000  # the vector must broadcast
    )
    cached_dirs: list[str] = []
    cached_mdf: dict[str, object] = {}
    if use_cached_edges:
        from epstein_pipeline_ray.stages.exchange import (
            _CREATED_DIRS,
            consume_exchange_manifests,
            write_exchange_shards,
        )

        for kcol in ("d", "s"):
            mdf, num_partitions, dir_ = write_exchange_shards(
                de, [kcol], num_partitions)
            cached_mdf[kcol] = mdf
            cached_dirs.append(dir_)
            if dir_ in _CREATED_DIRS:
                _CREATED_DIRS.remove(dir_)

    def push(vec: Dataset, from_col: str, to_col: str) -> Dataset:
        """out[to] = Σ over edges (from → to) of vec[from], 0-filled."""
        SUM = pa.schema([(to_col, pa.int64()), ("x", pa.float64())])

        if use_cached_edges:
            vec_tbl = pa.concat_tables(
                [t for t in _ray.get(vec.to_arrow_refs()) if t.num_rows])
            look_ref = _ray.put((
                _pd.Index(np.asarray(vec_tbl["node"].to_numpy(
                    zero_copy_only=False), np.int64)),
                np.asarray(vec_tbl["x"].to_numpy(zero_copy_only=False),
                           np.float64)))

            def sum_block_cached(block: pa.Table) -> pa.Table:
                if block.num_rows == 0:
                    return SUM.empty_table()
                lidx, lvals = _ray.get(look_ref)
                pos = lidx.get_indexer(np.asarray(
                    block[from_col].to_numpy(zero_copy_only=False),
                    np.int64))
                # -1 (missing key) would silently read the LAST value
                assert (pos >= 0).all(), "hits: node missing from vector"
                g = _pd.DataFrame({
                    to_col: np.asarray(block[to_col].to_numpy(
                        zero_copy_only=False), np.int64),
                    "x": lvals[pos],
                }).groupby(to_col, sort=True)["x"].sum()
                return pa.table(
                    {to_col: pa.array(g.index.to_numpy(np.int64),
                                      pa.int64()),
                     "x": pa.array(g.to_numpy(np.float64), pa.float64())},
                    schema=SUM)

            summed = consume_exchange_manifests(
                [cached_mdf[to_col]], sum_block_cached, num_partitions,
                [to_col], sort_blocks=False)
        else:
            tagged = attach_column(de, vec, from_col, "node", "x", "x",
                                   num_partitions=num_partitions)

            def sum_block(block: pa.Table) -> pa.Table:
                if block.num_rows == 0:
                    return SUM.empty_table()
                g = block.to_pandas().groupby(to_col, sort=True)["x"].sum()
                return pa.table(
                    {to_col: pa.array(g.index.to_numpy(np.int64),
                                      pa.int64()),
                     "x": pa.array(g.to_numpy(np.float64), pa.float64())},
                    schema=SUM)

            summed = map_key_blocks(tagged, [to_col], sum_block,
                                    num_partitions, sort_blocks=False)
        stepped = attach_column(nodes, summed, "node", to_col, "x", "nx",
                                num_partitions=num_partitions)

        def fill(batch: pa.Table) -> pa.Table:
            nx = pc_.fill_null(
                batch["nx"].combine_chunks()
                if isinstance(batch["nx"], pa.ChunkedArray)
                else batch["nx"], 0.0)
            return pa.table({"node": batch["node"], "x": nx}, schema=NODE)

        return stepped.map_batches(fill, batch_format="pyarrow",
                                   zero_copy_batch=True)

    try:
        hub = normalized(nodes, "init")
        auth = hub
        for _ in range(iters):
            auth = normalized(push(hub, "s", "d"), "auth")
            hub = normalized(push(auth, "d", "s"), "hub")
            gc_exchange_dirs()
    finally:
        if cached_dirs:
            import shutil

            for dir_ in cached_dirs:
                shutil.rmtree(dir_, ignore_errors=True)

    joined = attach_column(hub, auth, "node", "node", "x", "authority",
                           num_partitions=num_partitions)

    def rename(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        return pa.table({
            "node": batch["node"],
            "hub": batch["x"],
            "authority": pc2.fill_null(
                batch["authority"].combine_chunks()
                if isinstance(batch["authority"], pa.ChunkedArray)
                else batch["authority"], 0.0),
        })

    return joined.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True)


def hits_sql(edges_cte: str, iters: int = 5, round_digits: int = 9) -> str:
    """Exactly-unrolled DuckDB twin of :func:`hits`. ``edges_cte`` must
    define ``edges(src, dst)``."""
    r = round_digits
    # every CTE that is referenced more than once is MATERIALIZED —
    # DuckDB re-expands plain CTEs per reference, which is exponential
    # across an unrolled iteration chain
    parts = [f"""WITH {edges_cte},
        de AS MATERIALIZED (SELECT DISTINCT src AS s, dst AS d FROM edges),
        nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
            SELECT s AS node FROM de UNION ALL SELECT d FROM de)),
        h0 AS MATERIALIZED (
            SELECT node, round(1.0 / (SELECT count(*) FROM nodes), {r}) AS x
            FROM nodes)"""]
    prev_h = "h0"
    for i in range(1, iters + 1):
        parts.append(f""",
        ar{i} AS MATERIALIZED (
            SELECT n.node, coalesce(s.v, 0.0) AS x
            FROM nodes n LEFT JOIN (
                SELECT de.d AS node, sum(p.x) AS v
                FROM de JOIN {prev_h} p ON p.node = de.s GROUP BY de.d
            ) s ON s.node = n.node),
        a{i} AS MATERIALIZED (
            SELECT node, CASE WHEN (SELECT sum(x) FROM ar{i}) > 0
                THEN round(x / (SELECT sum(x) FROM ar{i}), {r})
                ELSE x END AS x FROM ar{i}),
        hr{i} AS MATERIALIZED (
            SELECT n.node, coalesce(s.v, 0.0) AS x
            FROM nodes n LEFT JOIN (
                SELECT de.s AS node, sum(p.x) AS v
                FROM de JOIN a{i} p ON p.node = de.d GROUP BY de.s
            ) s ON s.node = n.node),
        h{i} AS MATERIALIZED (
            SELECT node, CASE WHEN (SELECT sum(x) FROM hr{i}) > 0
                THEN round(x / (SELECT sum(x) FROM hr{i}), {r})
                ELSE x END AS x FROM hr{i})""")
        prev_h = f"h{i}"
    parts.append(f"""
        SELECT h.node, h.x AS hub, a.x AS authority
        FROM h{iters} h JOIN a{iters} a USING (node)""")
    return "".join(parts)


def kcore(
    edges: Dataset,
    k: int = 3,
    rounds: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> Dataset:
    """k-core peel (Seidman 1983) bounded to exactly ``rounds``
    synchronous rounds — each round drops every node whose degree in
    the current surviving subgraph is < ``k`` and restricts the edge
    set to surviving endpoints; with ``rounds`` ≥ the peel depth this
    is the true k-core. Fixed rounds unroll to the exact SQL twin
    (:func:`kcore_sql`, the bfs_hops convention). Runs over the
    undirected simple graph (self-loops dropped, parallel edges
    collapsed). Returns ``(node, deg)`` — survivors of the final round
    with their degree inside the surviving subgraph.

    Per round: one degree exchange + two size-switched membership
    attaches onto the directed edge list; everything edge/node
    proportional."""
    import pyarrow.compute as pc_

    from epstein_pipeline_ray.stages.exchange import gc_exchange_dirs
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[src_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(batch[dst_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        df = pd.DataFrame({"a": np.minimum(s, d),
                           "b": np.maximum(s, d)}).drop_duplicates()
        return pa.table({"a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
                         "b": pa.array(df["b"].to_numpy(np.int64), pa.int64())})

    UND = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return UND.empty_table()
        a, b = _distinct_sorted(block, ["a", "b"])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    und = map_key_blocks(
        edges.select_columns([src_col, dst_col]).map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], distinct_block, num_partitions, sort_blocks=False)

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False))
        return pa.table({"s": pa.array(np.concatenate([a, b]), pa.int64()),
                         "d": pa.array(np.concatenate([b, a]), pa.int64())})

    de = und.map_batches(both_dirs, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    num_partitions = _auto_partitions(de, num_partitions)

    DEG = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def deg_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return DEG.empty_table()
        s = np.asarray(block["s"].to_numpy(zero_copy_only=False), np.int64)
        u, c = np.unique(s, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(c.astype(np.int64), pa.int64())},
                        schema=DEG)

    def degrees(d: Dataset) -> Dataset:
        return map_key_blocks(d.select_columns(["s"]), ["s"], deg_block,
                              num_partitions, sort_blocks=False)

    def _empty() -> Dataset:
        import ray.data as rd

        return rd.from_arrow(DEG.empty_table())

    for _ in range(rounds):
        # a fully-peeled (or self-loop-only) graph leaves a schema-less
        # empty dataset that the attaches cannot type — stop early
        if de.count() == 0:
            return _empty()
        deg = degrees(de).materialize()
        keep = deg.filter(expr=f"deg >= {int(k)}")
        # fixed point: no node falls below k → restrict is the identity and
        # every remaining round reproduces this exact state, so the final
        # degrees ARE `deg` (equality with the exactly-unrolled SQL twin is
        # preserved — the twin's extra rounds are identities too)
        if keep.count() == deg.count():
            return deg
        tagged = attach_column(de, keep, "s", "node", "deg", "__fs",
                               num_partitions=num_partitions)
        tagged = attach_column(tagged, keep, "d", "node", "deg", "__fd",
                               num_partitions=num_partitions)

        def restrict(batch: pa.Table) -> pa.Table:
            m = pc_.and_(pc_.is_valid(batch["__fs"]),
                         pc_.is_valid(batch["__fd"]))
            t = batch.filter(m)
            return pa.table({"s": t["s"], "d": t["d"]})

        de = tagged.map_batches(restrict, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
        gc_exchange_dirs()

    if de.count() == 0:
        return _empty()
    return degrees(de)


def kcore_sql(edges_cte: str, k: int = 3, rounds: int = 8) -> str:
    """Exactly-unrolled DuckDB twin of :func:`kcore` — one
    degree/keep/restrict CTE triple per round (MATERIALIZED: a plain
    CTE re-expands per reference, exponential across the chain).
    ``edges_cte`` must define ``edges(src, dst)``."""
    parts = [f"""WITH {edges_cte},
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM edges WHERE src <> dst),
        e0 AS MATERIALIZED (
            SELECT a AS s, b AS d FROM und UNION ALL SELECT b, a FROM und)"""]
    for i in range(1, rounds + 1):
        parts.append(f""",
        deg{i} AS MATERIALIZED (
            SELECT s AS node, count(*) AS c FROM e{i - 1} GROUP BY s),
        keep{i} AS MATERIALIZED (
            SELECT node FROM deg{i} WHERE c >= {int(k)}),
        e{i} AS MATERIALIZED (
            SELECT e.s, e.d FROM e{i - 1} e
            JOIN keep{i} ka ON ka.node = e.s
            JOIN keep{i} kb ON kb.node = e.d)""")
    parts.append(f"""
        SELECT s::BIGINT AS node, count(*)::BIGINT AS deg
        FROM e{rounds} GROUP BY s""")
    return "".join(parts)


def clustering_coefficient(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Local clustering coefficient (Watts–Strogatz 1998) per node with
    degree >= 2: ``C(v) = 2*T(v) / (deg(v)*(deg(v)-1))`` over the
    undirected simple graph — composes :func:`triangle_counts` (the
    degree-ordered compact-forward plan) with a degree exchange and one
    size-switched triangle attach. Output
    ``(node, deg, n_triangles, coef)``; triangle-free nodes get 0.

    Twin shape: the triangles 3-way self-join + a degree CTE + LEFT
    JOIN with the identical rounded formula."""
    import pyarrow.compute as pc_

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[src_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(batch[dst_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        df = pd.DataFrame({"a": np.minimum(s, d),
                           "b": np.maximum(s, d)}).drop_duplicates()
        return pa.table({"a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
                         "b": pa.array(df["b"].to_numpy(np.int64), pa.int64())})

    UND = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return UND.empty_table()
        a, b = _distinct_sorted(block, ["a", "b"])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    und = map_key_blocks(
        edges.select_columns([src_col, dst_col]).map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], distinct_block, num_partitions, sort_blocks=False)

    DEG = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def ends(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(np.concatenate([a, b]),
                                          pa.int64())})

    def deg_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return DEG.empty_table()
        v = np.asarray(block["node"].to_numpy(zero_copy_only=False),
                       np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(c.astype(np.int64), pa.int64())},
                        schema=DEG)

    deg = map_key_blocks(
        und.map_batches(ends, batch_format="pyarrow", zero_copy_batch=True),
        ["node"], deg_block, num_partitions, sort_blocks=False)

    tri = triangle_counts(edges, src_col=src_col, dst_col=dst_col,
                          num_partitions=num_partitions)
    joined = attach_column(deg, tri, "node", "node", "n_triangles",
                           "n_triangles", num_partitions=num_partitions)

    from epstein_pipeline_ray.functions.rounding import sql_round

    def finish(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["deg"].to_numpy(zero_copy_only=False),
                       np.float64)
        t = np.asarray(pc_.fill_null(
            batch["n_triangles"].combine_chunks()
            if isinstance(batch["n_triangles"], pa.ChunkedArray)
            else batch["n_triangles"], 0).to_numpy(zero_copy_only=False),
            np.float64)
        keep = d >= 2
        coef = 2.0 * t[keep] / (d[keep] * (d[keep] - 1.0))
        return pa.table({
            "node": pa.array(np.asarray(
                batch["node"].to_numpy(zero_copy_only=False),
                np.int64)[keep], pa.int64()),
            "deg": pa.array(d[keep].astype(np.int64), pa.int64()),
            "n_triangles": pa.array(t[keep].astype(np.int64), pa.int64()),
            "coef": pa.array(sql_round(coef, round_digits), pa.float64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def reciprocity(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Directed-graph reciprocity: the fraction of distinct non-loop
    directed edges whose reverse edge also exists — ONE unordered-pair
    keyed exchange; each pair block counts its directions (1 or 2), so
    ``r = sum(pairs with both directions) * 2 / n_directed``. Returns a
    single row ``(n_directed, n_reciprocal, reciprocity)``. Twin: a
    distinct-edge self-join on the reversed key."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[src_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(batch[dst_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        df = pd.DataFrame({
            "a": np.minimum(s, d), "b": np.maximum(s, d),
            "fwd": (s < d).astype(np.int8),
        }).drop_duplicates()
        return pa.table({
            "a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
            "b": pa.array(df["b"].to_numpy(np.int64), pa.int64()),
            "fwd": pa.array(df["fwd"].to_numpy(np.int8), pa.int8()),
        })

    PART = pa.schema([("n_dir", pa.int64()), ("n_rec", pa.int64())])

    def pair_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return PART.empty_table()
        a, b, fwd = _distinct_sorted(block, ["a", "b", "fwd"])
        # rows now unique on (a, b, fwd) and lexsorted: per-pair distinct
        # direction count = run length (1 or 2) over (a, b)
        pair_start = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        starts = np.flatnonzero(pair_start)
        dirs = np.diff(np.r_[starts, a.size])
        n_dir = int(dirs.sum())            # 1 or 2 directions per pair
        n_rec = int((dirs == 2).sum()) * 2  # both-direction pairs -> 2 edges
        return pa.table({"n_dir": pa.array([n_dir], pa.int64()),
                         "n_rec": pa.array([n_rec], pa.int64())},
                        schema=PART)

    parts = map_key_blocks(
        edges.select_columns([src_col, dst_col]).map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], pair_block, num_partitions, sort_blocks=False)

    import ray

    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    n_dir = sum(int(t["n_dir"].to_pandas().sum()) for t in tabs)
    n_rec = sum(int(t["n_rec"].to_pandas().sum()) for t in tabs)
    r = float(sql_round(np.array([n_rec / n_dir if n_dir else 0.0]),
                        round_digits)[0])
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "n_directed": pa.array([n_dir], pa.int64()),
        "n_reciprocal": pa.array([n_rec], pa.int64()),
        "reciprocity": pa.array([r], pa.float64()),
    }))


def degree_assortativity(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Degree assortativity (Newman 2002) of the undirected simple
    graph: the Pearson correlation of (deg(a), deg(b)) over BOTH
    orientations of every distinct edge (the symmetric convention, so
    the coefficient is orientation-free) — degree exchange + two
    size-switched attaches + exact moment sums. Returns one row
    ``(n_edges, assortativity)``; the twin computes the identical
    closed-form moments. Degenerate variance (e.g. regular graphs)
    yields NULL on both sides."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[src_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(batch[dst_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        df = pd.DataFrame({"a": np.minimum(s, d),
                           "b": np.maximum(s, d)}).drop_duplicates()
        return pa.table({"a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
                         "b": pa.array(df["b"].to_numpy(np.int64), pa.int64())})

    UND = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return UND.empty_table()
        a, b = _distinct_sorted(block, ["a", "b"])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    und = map_key_blocks(
        edges.select_columns([src_col, dst_col]).map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], distinct_block, num_partitions,
        sort_blocks=False).materialize()

    DEG = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def ends(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(np.concatenate([a, b]),
                                          pa.int64())})

    def deg_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return DEG.empty_table()
        v = np.asarray(block["node"].to_numpy(zero_copy_only=False),
                       np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(c.astype(np.int64), pa.int64())},
                        schema=DEG)

    deg = map_key_blocks(
        und.map_batches(ends, batch_format="pyarrow", zero_copy_batch=True),
        ["node"], deg_block, num_partitions, sort_blocks=False)

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False))
        return pa.table({"x": pa.array(np.concatenate([a, b]), pa.int64()),
                         "y": pa.array(np.concatenate([b, a]), pa.int64())})

    de = und.map_batches(both_dirs, batch_format="pyarrow",
                         zero_copy_batch=True)
    de = attach_column(de, deg, "x", "node", "deg", "dx",
                       num_partitions=num_partitions)
    de = attach_column(de, deg, "y", "node", "deg", "dy",
                       num_partitions=num_partitions)

    MOM = pa.schema([("n", pa.int64()), ("sx", pa.float64()),
                     ("sy", pa.float64()), ("sxx", pa.float64()),
                     ("syy", pa.float64()), ("sxy", pa.float64())])

    def moments(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch["dx"].to_numpy(zero_copy_only=False),
                       np.float64)
        y = np.asarray(batch["dy"].to_numpy(zero_copy_only=False),
                       np.float64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([float(x.sum())], pa.float64()),
            "sy": pa.array([float(y.sum())], pa.float64()),
            "sxx": pa.array([float((x * x).sum())], pa.float64()),
            "syy": pa.array([float((y * y).sum())], pa.float64()),
            "sxy": pa.array([float((x * y).sum())], pa.float64()),
        }, schema=MOM)

    import ray
    import ray.data as rd

    tabs = [t for t in ray.get(
        de.map_batches(moments, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs())
        if t.num_rows]
    agg = {c: sum(float(t[c].to_pandas().sum()) for t in tabs)
           for c in MOM.names}
    n = agg["n"]
    cov = agg["sxy"] - agg["sx"] * agg["sy"] / n
    vx = agg["sxx"] - agg["sx"] ** 2 / n
    vy = agg["syy"] - agg["sy"] ** 2 / n
    if vx > 0 and vy > 0:
        r = pa.array(
            [float(sql_round(np.array([cov / np.sqrt(vx * vy)]),
                             round_digits)[0])], pa.float64())
    else:
        r = pa.nulls(1, pa.float64())
    return rd.from_arrow(pa.table({
        "n_edges": pa.array([int(n) // 2], pa.int64()),
        "assortativity": r,
    }))


def ktruss(
    edges: Dataset,
    k: int = 4,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    max_wedge_degree: int = 4096,
    num_partitions: int | None = None,
) -> Dataset:
    """k-truss peel (Cohen 2008) bounded to exactly ``rounds``
    synchronous rounds — each round computes per-EDGE triangle support
    within the current subgraph (the degree-ordered compact-forward
    wedge plan of :func:`triangle_counts`, crediting edges instead of
    nodes) and drops edges with support < k-2; with enough rounds this
    is the true k-truss, and fixed rounds unroll to the exact SQL twin
    (:func:`ktruss_sql`). Undirected simple graph. Returns the
    surviving edges with their final within-subgraph support:
    ``(a, b, support)``. Requires k >= 3."""
    assert k >= 3
    import pyarrow.compute as pc_

    from epstein_pipeline_ray.stages.exchange import gc_exchange_dirs
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    E = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    SUP = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                     ("c", pa.int64())])
    OUT = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                     ("support", pa.int64())])

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[src_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(batch[dst_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        df = pd.DataFrame({"a": np.minimum(s, d),
                           "b": np.maximum(s, d)}).drop_duplicates()
        return pa.table({"a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
                         "b": pa.array(df["b"].to_numpy(np.int64), pa.int64())},
                        schema=E)

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return E.empty_table()
        a, b = _distinct_sorted(block, ["a", "b"])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())}, schema=E)

    cur = map_key_blocks(
        edges.select_columns([src_col, dst_col]).map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], distinct_block, num_partitions,
        sort_blocks=False).materialize()
    num_partitions = _auto_partitions(cur, num_partitions)

    DEG = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def ends(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(np.concatenate([a, b]),
                                          pa.int64())})

    def deg_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return DEG.empty_table()
        v = np.asarray(block["node"].to_numpy(zero_copy_only=False),
                       np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(c.astype(np.int64), pa.int64())},
                        schema=DEG)

    WROW = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                      ("u", pa.int64()), ("kind", pa.int8())])

    def edge_support(de: Dataset) -> Dataset:
        """(a, b, c) for every current edge in >=1 triangle."""
        deg = map_key_blocks(
            de.map_batches(ends, batch_format="pyarrow",
                           zero_copy_batch=True),
            ["node"], deg_block, num_partitions, sort_blocks=False)
        withdeg = attach_column(
            attach_column(de, deg, "a", "node", "deg", "deg_a",
                          num_partitions=num_partitions),
            deg, "b", "node", "deg", "deg_b",
            num_partitions=num_partitions)

        def orient(batch: pa.Table) -> pa.Table:
            a = np.asarray(batch["a"].to_numpy(zero_copy_only=False),
                           np.int64)
            b = np.asarray(batch["b"].to_numpy(zero_copy_only=False),
                           np.int64)
            da = np.asarray(batch["deg_a"].to_numpy(zero_copy_only=False),
                            np.int64)
            db = np.asarray(batch["deg_b"].to_numpy(zero_copy_only=False),
                            np.int64)
            a_first = (da < db) | ((da == db) & (a < b))
            return pa.table({
                "u": pa.array(np.where(a_first, a, b), pa.int64()),
                "v": pa.array(np.where(a_first, b, a), pa.int64()),
            })

        oriented = withdeg.map_batches(orient, batch_format="pyarrow",
                                       zero_copy_batch=True)

        def wedge_block(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return WROW.empty_table()
            u, v = _npcols(block, ["u", "v"])
            order = _lex_order([u, v])
            u, v = u[order], v[order]
            new_run = np.r_[True, u[1:] != u[:-1]]
            run_id = np.cumsum(new_run) - 1
            run_len = np.bincount(run_id)
            over = run_len > max_wedge_degree
            if over.any():
                from epstein_pipeline_ray.state import metrics
                pos = np.arange(u.size) - np.repeat(
                    np.flatnonzero(new_run), run_len)
                keep = pos < max_wedge_degree
                metrics.inc("ktruss.wedge_capped", int(over.sum()))
                u, v, run_id = u[keep], v[keep], run_id[keep]
            from epstein_pipeline_ray.stages.corpus_dedup import _run_pairs
            I, J = _run_pairs(run_id)
            return pa.table({
                "a": pa.array(np.minimum(v[I], v[J]), pa.int64()),
                "b": pa.array(np.maximum(v[I], v[J]), pa.int64()),
                "u": pa.array(u[I], pa.int64()),
                "kind": pa.array(np.zeros(I.size, dtype=np.int8),
                                 pa.int8()),
            }, schema=WROW)

        wedges = map_key_blocks(oriented, ["u"], wedge_block,
                                num_partitions, sort_blocks=False)

        def edge_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "a": batch["a"], "b": batch["b"],
                "u": pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
                "kind": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            }, schema=WROW)

        closing_in = wedges.union(de.map_batches(
            edge_rows, batch_format="pyarrow", zero_copy_batch=True))

        def close_block(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return SUP.empty_table()
            a, b, u, kind = _npcols(block, ["a", "b", "u", "kind"])
            is_edge = kind == 1
            if not is_edge.any() or is_edge.all():
                return SUP.empty_table()
            vals = np.unique(np.concatenate([a, b]))
            k_ = vals.size
            code = np.searchsorted(vals, a) * k_ + np.searchsorted(vals, b)
            cm = ~is_edge & np.isin(code, code[is_edge])
            if not cm.any():
                return SUP.empty_table()
            # triangle {u, a, b}: credit all three edges canonically
            ca, cb, cu = a[cm], b[cm], u[cm]
            ea = np.concatenate([ca, np.minimum(cu, ca),
                                 np.minimum(cu, cb)])
            eb = np.concatenate([cb, np.maximum(cu, ca),
                                 np.maximum(cu, cb)])
            order = _lex_order([ea, eb])
            ea, eb = ea[order], eb[order]
            first = np.r_[True, (ea[1:] != ea[:-1]) | (eb[1:] != eb[:-1])]
            starts = np.flatnonzero(first)
            return pa.table({
                "a": pa.array(ea[starts], pa.int64()),
                "b": pa.array(eb[starts], pa.int64()),
                "c": pa.array(np.diff(np.r_[starts, ea.size]), pa.int64()),
            }, schema=SUP)

        credits = map_key_blocks(closing_in, ["a", "b"], close_block,
                                 num_partitions, sort_blocks=False)

        def sup_block(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return SUP.empty_table()
            (sa, sb), sums = _group_sum_i64(block, ["a", "b"], "c")
            return pa.table({
                "a": pa.array(sa, pa.int64()),
                "b": pa.array(sb, pa.int64()),
                "c": pa.array(sums, pa.int64()),
            }, schema=SUP)

        return map_key_blocks(credits, ["a", "b"], sup_block,
                              num_partitions, sort_blocks=False)

    def _empty() -> Dataset:
        import ray.data as rd

        return rd.from_arrow(OUT.empty_table())

    def filter_by_support(de: Dataset, sup: Dataset) -> Dataset:
        """edges with support >= k-2 (absent support = 0 -> dropped)."""
        def sup_rows(batch: pa.Table) -> pa.Table:
            return pa.table({"a": batch["a"], "b": batch["b"],
                             "u": batch["c"],
                             "kind": pa.array(
                                 np.zeros(batch.num_rows, np.int8),
                                 pa.int8())}, schema=WROW)

        def edge_rows2(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "a": batch["a"], "b": batch["b"],
                "u": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                "kind": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            }, schema=WROW)

        both = de.map_batches(edge_rows2, batch_format="pyarrow",
                              zero_copy_batch=True).union(
            sup.map_batches(sup_rows, batch_format="pyarrow",
                            zero_copy_batch=True))

        def keep_block(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return E.empty_table()
            es = _edge_support(block)
            if es is None:
                return E.empty_table()
            ea, eb, supv = es
            keep = supv >= k - 2
            return pa.table({
                "a": pa.array(ea[keep], pa.int64()),
                "b": pa.array(eb[keep], pa.int64()),
            }, schema=E)

        return map_key_blocks(both, ["a", "b"], keep_block,
                              num_partitions, sort_blocks=False)

    for _ in range(rounds):
        n_before = cur.count()
        if n_before == 0:
            return _empty()
        sup = edge_support(cur).materialize()
        cur = filter_by_support(cur, sup).materialize()
        gc_exchange_dirs()
        if cur.count() == n_before:
            # fixed point: every edge survived, so every remaining round
            # (and the post-loop support pass) reproduces exactly this
            # state — `sup` IS the final (a, b, support) table: it covers
            # precisely the surviving edges (an edge absent from sup has
            # support 0 and would have been dropped) with their final
            # within-subgraph support. Twin equality is preserved — its
            # extra unrolled rounds are identities too.
            return sup.map_batches(
                lambda b: pa.table({"a": b["a"], "b": b["b"],
                                    "support": b["c"]}, schema=OUT),
                batch_format="pyarrow", zero_copy_batch=True)

    if cur.count() == 0:
        return _empty()
    final_sup = edge_support(cur)
    joined_rows = cur.map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["b"],
                            "u": pa.array(np.zeros(b.num_rows, np.int64),
                                          pa.int64()),
                            "kind": pa.array(np.ones(b.num_rows, np.int8),
                                             pa.int8())}, schema=WROW),
        batch_format="pyarrow", zero_copy_batch=True).union(
        final_sup.map_batches(
            lambda b: pa.table({"a": b["a"], "b": b["b"], "u": b["c"],
                                "kind": pa.array(
                                    np.zeros(b.num_rows, np.int8),
                                    pa.int8())}, schema=WROW),
            batch_format="pyarrow", zero_copy_batch=True))

    def out_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        es = _edge_support(block)
        if es is None:
            return OUT.empty_table()
        ea, eb, supv = es
        return pa.table({
            "a": pa.array(ea, pa.int64()),
            "b": pa.array(eb, pa.int64()),
            "support": pa.array(supv, pa.int64()),
        }, schema=OUT)

    return map_key_blocks(joined_rows, ["a", "b"], out_block,
                          num_partitions, sort_blocks=False)


def ktruss_sql(edges_cte: str, k: int = 4, rounds: int = 4) -> str:
    """Exactly-unrolled DuckDB twin of :func:`ktruss` — per round a
    triangle 3-way self-join, an edge-credit union, and a support
    filter (all MATERIALIZED). ``edges_cte`` must define
    ``edges(src, dst)``."""
    thr = int(k) - 2
    parts = [f"""WITH {edges_cte},
        e0 AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM edges WHERE src <> dst)"""]
    for i in range(1, rounds + 1):
        parts.append(f""",
        tri{i} AS MATERIALIZED (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e{i - 1} e1
            JOIN e{i - 1} e2 ON e2.a = e1.b
            JOIN e{i - 1} e3 ON e3.a = e1.a AND e3.b = e2.b),
        sup{i} AS MATERIALIZED (
            SELECT a, b, count(*)::BIGINT AS c FROM (
                SELECT x AS a, y AS b FROM tri{i}
                UNION ALL SELECT y, z FROM tri{i}
                UNION ALL SELECT x, z FROM tri{i}
            ) GROUP BY a, b),
        e{i} AS MATERIALIZED (
            SELECT e.a, e.b FROM e{i - 1} e
            JOIN sup{i} s ON s.a = e.a AND s.b = e.b
            WHERE s.c >= {thr})""")
    parts.append(f""",
        trif AS MATERIALIZED (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e{rounds} e1
            JOIN e{rounds} e2 ON e2.a = e1.b
            JOIN e{rounds} e3 ON e3.a = e1.a AND e3.b = e2.b),
        supf AS MATERIALIZED (
            SELECT a, b, count(*)::BIGINT AS c FROM (
                SELECT x AS a, y AS b FROM trif
                UNION ALL SELECT y, z FROM trif
                UNION ALL SELECT x, z FROM trif
            ) GROUP BY a, b)
        SELECT e.a, e.b, coalesce(s.c, 0)::BIGINT AS support
        FROM e{rounds} e
        LEFT JOIN supf s ON s.a = e.a AND s.b = e.b""")
    return "".join(parts)


def community_conductance(
    edges: Dataset,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Cut quality of the synchronous-LPA communities: per label,
    internal edges (both endpoints inside), cut edges (exactly one
    endpoint), and edge-volume conductance
    ``cut / (2*internal + cut)`` — 0 = perfectly separated, →1 = no
    community structure. Runs :func:`label_propagation` (same
    deterministic semantics as the oracled label_prop query), attaches
    labels to both endpoints of the distinct undirected edge list, and
    sums per-label contributions through one keyed exchange (cut edges
    contribute to BOTH sides' labels). Twin: the exactly-unrolled LPA
    twin embedded as a CTE + the same contribution union."""
    import pyarrow.compute as pc_

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    labels = label_propagation(edges, iters=iters, src_col=src_col,
                               dst_col=dst_col,
                               num_partitions=num_partitions).materialize()

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[src_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(batch[dst_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        df = pd.DataFrame({"a": np.minimum(s, d),
                           "b": np.maximum(s, d)}).drop_duplicates()
        return pa.table({"a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
                         "b": pa.array(df["b"].to_numpy(np.int64), pa.int64())})

    UND = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return UND.empty_table()
        a, b = _distinct_sorted(block, ["a", "b"])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    und = map_key_blocks(
        edges.select_columns([src_col, dst_col]).map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], distinct_block, num_partitions, sort_blocks=False)

    el = attach_column(und, labels, "a", "node", "label", "l1",
                       num_partitions=num_partitions)
    el = attach_column(el, labels, "b", "node", "label", "l2",
                       num_partitions=num_partitions)

    PART = pa.schema([("label", pa.int64()), ("i", pa.int64()),
                      ("c", pa.int64())])

    def contrib(batch: pa.Table) -> pa.Table:
        l1 = np.asarray(batch["l1"].to_numpy(zero_copy_only=False),
                        np.int64)
        l2 = np.asarray(batch["l2"].to_numpy(zero_copy_only=False),
                        np.int64)
        same = l1 == l2
        lab = np.concatenate([l1, l2[~same]])
        i = np.concatenate([same.astype(np.int64),
                            np.zeros(int((~same).sum()), np.int64)])
        c = np.concatenate([(~same).astype(np.int64),
                            np.ones(int((~same).sum()), np.int64)])
        df = (pd.DataFrame({"label": lab, "i": i, "c": c})
              .groupby("label", sort=False, as_index=False).sum())
        return pa.table({
            "label": pa.array(df["label"].to_numpy(np.int64), pa.int64()),
            "i": pa.array(df["i"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(df["c"].to_numpy(np.int64), pa.int64()),
        }, schema=PART)

    OUT = pa.schema([("label", pa.int64()), ("internal_edges", pa.int64()),
                     ("cut_edges", pa.int64()),
                     ("conductance", pa.float64())])

    def reduce_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        (labels_u,), i_sum = _group_sum_i64(block, ["label"], "i")
        _, c_sum = _group_sum_i64(block, ["label"], "c")
        i = i_sum.astype(np.float64)
        c = c_sum.astype(np.float64)
        from epstein_pipeline_ray.functions.rounding import sql_round

        cond = sql_round(c / (2.0 * i + c), round_digits)
        return pa.table({
            "label": pa.array(labels_u, pa.int64()),
            "internal_edges": pa.array(i.astype(np.int64), pa.int64()),
            "cut_edges": pa.array(c.astype(np.int64), pa.int64()),
            "conductance": pa.array(cond, pa.float64()),
        }, schema=OUT)

    parts = el.map_batches(contrib, batch_format="pyarrow",
                           zero_copy_batch=True)
    return map_key_blocks(parts, ["label"], reduce_block, num_partitions,
                          sort_blocks=False)


def community_conductance_sql(edges_cte: str, iters: int = 4) -> str:
    """Twin of :func:`community_conductance` — the exactly-unrolled LPA
    twin embedded as a CTE (its inner WITH shadows the outer names) plus
    the same cut/internal contribution union. ``edges_cte`` must define
    ``edges(src, dst)``."""
    lpa = label_propagation_sql(edges_cte, iters=iters)
    return f"""WITH {edges_cte},
        lab AS ({lpa}),
        ud AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM edges WHERE src <> dst),
        el AS (
            SELECT la.label AS l1, lb.label AS l2
            FROM ud JOIN lab la ON la.node = ud.a
                    JOIN lab lb ON lb.node = ud.b),
        contrib AS (
            SELECT l1 AS label,
                   CASE WHEN l1 = l2 THEN 1 ELSE 0 END AS i,
                   CASE WHEN l1 = l2 THEN 0 ELSE 1 END AS c
            FROM el
            UNION ALL SELECT l2, 0, 1 FROM el WHERE l1 <> l2)
        SELECT label, sum(i)::BIGINT AS internal_edges,
               sum(c)::BIGINT AS cut_edges,
               round(sum(c)::DOUBLE / (2 * sum(i) + sum(c)), 9)
                   AS conductance
        FROM contrib GROUP BY label"""


def degree_histogram(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> Dataset:
    """Degree distribution of the undirected simple graph: (deg,
    n_nodes) — the one-look heavy-tail / skew diagnostic before any
    wedge-based plan (wedge counts grow with the squared tail). One
    degree exchange + one degree-keyed count exchange. Twin: two nested
    GROUP BYs."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[src_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        d = np.asarray(batch[dst_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        df = pd.DataFrame({"a": np.minimum(s, d),
                           "b": np.maximum(s, d)}).drop_duplicates()
        return pa.table({"a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
                         "b": pa.array(df["b"].to_numpy(np.int64), pa.int64())})

    UND = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return UND.empty_table()
        a, b = _distinct_sorted(block, ["a", "b"])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    und = map_key_blocks(
        edges.select_columns([src_col, dst_col]).map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], distinct_block, num_partitions, sort_blocks=False)

    DEG = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def ends(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(np.concatenate([a, b]),
                                          pa.int64())})

    def deg_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return DEG.empty_table()
        v = np.asarray(block["node"].to_numpy(zero_copy_only=False),
                       np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(c.astype(np.int64), pa.int64())},
                        schema=DEG)

    deg = map_key_blocks(
        und.map_batches(ends, batch_format="pyarrow", zero_copy_batch=True),
        ["node"], deg_block, num_partitions, sort_blocks=False)

    OUT = pa.schema([("deg", pa.int64()), ("n_nodes", pa.int64())])

    def hist_partial(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["deg"].to_numpy(zero_copy_only=False),
                       np.int64)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"deg": pa.array(u, pa.int64()),
                         "n_nodes": pa.array(c.astype(np.int64),
                                             pa.int64())}, schema=OUT)

    def hist_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        (degs_u,), sums = _group_sum_i64(block, ["deg"], "n_nodes")
        return pa.table({
            "deg": pa.array(degs_u, pa.int64()),
            "n_nodes": pa.array(sums, pa.int64()),
        }, schema=OUT)

    return map_key_blocks(
        deg.map_batches(hist_partial, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["deg"], hist_block, num_partitions, sort_blocks=False)
