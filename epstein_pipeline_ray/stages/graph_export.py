"""Knowledge-graph export (reference K8: processors/knowledge_graph.py
:400-476 — GEXF XML + JSON serialization of the aggregated graph).

The edge table is the output of a distributed aggregation (G10,
``textops.term_cooccur``); serialization happens driver-side on that
already-small result, exactly as the reference does."""

from __future__ import annotations

from xml.sax.saxutils import escape

import pandas as pd
from ray.data import Dataset


def _edges_df(edges: Dataset | pd.DataFrame) -> pd.DataFrame:
    if isinstance(edges, pd.DataFrame):
        return edges
    return edges.to_pandas()


def write_gexf(edges: Dataset | pd.DataFrame, path: str,
               src_col: str = "term_a", dst_col: str = "term_b",
               weight_col: str = "weight") -> None:
    """Weighted undirected GEXF 1.2 (the reference's networkx
    ``write_gexf`` output shape, knowledge_graph.py:400-430)."""
    df = _edges_df(edges)
    nodes = sorted(set(df[src_col]) | set(df[dst_col]))
    node_idx = {n: i for i, n in enumerate(nodes)}
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">',
        '  <graph defaultedgetype="undirected">',
        "    <nodes>",
    ]
    for n in nodes:
        lines.append(f'      <node id="{node_idx[n]}" label="{escape(str(n))}" />')
    lines.append("    </nodes>")
    lines.append("    <edges>")
    for i, r in enumerate(df.itertuples(index=False)):
        s = node_idx[getattr(r, src_col)]
        d = node_idx[getattr(r, dst_col)]
        w = getattr(r, weight_col)
        lines.append(f'      <edge id="{i}" source="{s}" target="{d}" weight="{w}" />')
    lines += ["    </edges>", "  </graph>", "</gexf>", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def write_graph_json(edges: Dataset | pd.DataFrame, path: str,
                     src_col: str = "term_a", dst_col: str = "term_b",
                     weight_col: str = "weight") -> None:
    """node-link JSON (knowledge_graph.py:432-476 shape)."""
    import json

    df = _edges_df(edges)
    nodes = sorted(set(df[src_col]) | set(df[dst_col]))
    payload = {
        "nodes": [{"id": n} for n in nodes],
        "links": [
            {"source": getattr(r, src_col), "target": getattr(r, dst_col),
             "weight": int(getattr(r, weight_col))}
            for r in df.itertuples(index=False)
        ],
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
