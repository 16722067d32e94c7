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


def pagerank(
    edges: Dataset,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """→ (node, pr) after ``iters`` rounds of
    pr(v) = (1-d)/N + d * Σ_{u→v} pr(u)/outdeg(u)."""
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

    base = (1.0 - damping) / n_nodes
    pr0 = float(sql_round(1.0 / n_nodes, round_digits))
    pr = nodes.map_batches(
        lambda b, v=pr0: b.append_column("pr", pa.array([v] * b.num_rows, pa.float64())),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

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

    from epstein_pipeline_ray.stages.exchange import gc_exchange_dirs

    for _ in range(iters):
        contrib = attach_column(e, pr, "src", "node", "pr", "pr",
                                num_partitions=num_partitions)
        inflow = map_key_blocks(contrib, ["dst"], inflow_block, num_partitions)
        stepped = attach_column(nodes, inflow, "node", "dst",
                                "inflow", "inflow", num_partitions=num_partitions)

        def update(batch: pa.Table, b=base, d=damping, r=round_digits) -> pa.Table:
            import pyarrow.compute as pc

            infl = np.asarray(pc.fill_null(
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


def pagerank_sql(edges_cte: str, damping: float = 0.85, iters: int = 10,
                 round_digits: int = 9) -> str:
    """The exactly-unrolled DuckDB twin of :func:`pagerank`: one CTE per
    iteration, same formula, same per-iteration rounding, same dangling
    convention. ``edges_cte`` must define ``edges(src, dst)``."""
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
                SELECT node, round(1.0 / nn.n, {round_digits}) AS pr
                FROM nodes, nn
            )"""]
    for k in range(1, iters + 1):
        parts.append(f""",
            r{k} AS (
                SELECT n.node,
                       round((1 - {damping}) / nn.n
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
