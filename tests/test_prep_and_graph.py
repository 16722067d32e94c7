"""prep pipeline composition + graph export round-trips."""

import xml.etree.ElementTree as ET

import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def prep_docs(ray_session):
    import ray.data as rd

    words = ("the quick brown fox jumps over a lazy dog and we keep running far "
             "away with many other quite different tokens every single time more "
             "than before because variety matters here so ratios stay high enough")
    stop = {"the", "a", "and", "we", "with", "so", "than", "more", "over",
            "because", "here", "every", "other"}
    good = " ".join(
        w if w in stop else f"{w}{i}" for i, w in enumerate(words.split() * 4)
    )
    rows = {
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [
            good,                     # exact dup of 2 → dropped (rep tie-break = max id)
            good,                     # kept, representative
            "a a a a a a a a a a " * 40,   # low quality → dropped
            "el perro y el gato y la casa y el sol y la luna " * 12,  # es → dropped
        ],
    }
    return rd.from_arrow(pa.table(rows))


def test_prep_corpus_filters_and_chunks(prep_docs):
    from epstein_pipeline_ray.pipelines.prep import prep_corpus

    out = prep_corpus(prep_docs, min_quality=0.25, keep_langs=("en",),
                      chunk_size=120, overlap=20).to_pandas()
    assert set(out["doc_id"]) == {2}
    assert (out["chunk_index"].sort_values().to_numpy()
            == range(len(out))).all()
    assert (out["n_tokens"] > 0).all()


def test_graph_exports(tmp_path):
    from epstein_pipeline_ray.stages.graph_export import write_gexf, write_graph_json

    edges = pd.DataFrame(
        {"term_a": ["spark", "spark"], "term_b": ["stream", "window"],
         "weight": [3, 1]}
    )
    gexf = tmp_path / "g.gexf"
    write_gexf(edges, str(gexf))
    root = ET.parse(gexf).getroot()
    ns = {"g": "http://www.gexf.net/1.2draft"}
    assert len(root.findall(".//g:node", ns)) == 3
    assert len(root.findall(".//g:edge", ns)) == 2

    import json

    jpath = tmp_path / "g.json"
    write_graph_json(edges, str(jpath))
    payload = json.loads(jpath.read_text())
    assert [n["id"] for n in payload["nodes"]] == ["spark", "stream", "window"]
    assert payload["links"][0]["weight"] == 3


def test_media_resize_and_frame_sample(ray_session):
    import ray.data as rd

    from epstein_pipeline_ray.stages.multimodal import (
        frame_sample,
        media_resize,
        synth_media_table,
    )

    media = rd.from_arrow(synth_media_table(30))
    resized = media_resize(media, target_w=32, target_h=32).to_pandas()
    assert (resized["width"] == 32).all() and (resized["height"] == 32).all()
    assert resized["payload"].map(len).max() <= 4096

    frames = frame_sample(media, every_ms=60_000, max_frames=4).to_pandas()
    assert set(frames.columns) == {"media_id", "frame_ts_ms", "frame"}
    assert len(frames) > 0
    per_video = frames.groupby("media_id").size()
    assert (per_video <= 4).all()
    assert frames["frame"].map(len).eq(32).all()


def test_prep_corpus_c4_and_decontam_stages(ray_session):
    """The optional cleaning stages: C4 page rewrite drops flagged pages
    and rewrites text to kept lines; decontamination drops docs sharing a
    benchmark n-gram — both before dedup/chunking."""
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.pipelines.prep import prep_corpus

    good = ("a perfectly fine first sentence with words here.\n"
            "a perfectly fine second sentence with words here.\n"
            "a perfectly fine third sentence with words here.")
    bench_sent = "the quick brown fox jumps over the lazy dog today"
    leaky = (f"prefix {bench_sent} suffix words.\n"
             "another fine sentence with enough words here too.\n"
             "a third fine sentence with enough words here now.")
    lorem = good + "\nlorem ipsum filler line with several words."
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([good, leaky, lorem], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([len(good), len(leaky), len(lorem)], pa.int64()),
    }))
    bench = rd.from_arrow(pa.table({"text": pa.array([bench_sent], pa.string())}))
    chunks = prep_corpus(docs, min_quality=0.0, keep_langs=("en", "und"),
                         c4_clean=True, decontam_bench=bench,
                         chunk_size=64, overlap=8).to_pandas()
    # doc 2 decontaminated, doc 3 lorem-dropped → only doc 1 survives
    assert set(chunks.doc_id) == {1}
    assert all("lorem" not in t for t in chunks.chunk_text)


def test_triangle_counts_matches_brute(ray_session):
    import itertools
    from collections import Counter

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import triangle_counts

    rng = np.random.RandomState(11)
    raw = {(int(rng.randint(0, 30)), int(rng.randint(0, 30)))
           for _ in range(250)}
    raw |= {(1, 1), (2, 2)}  # self loops must be dropped
    raw |= {(3, 4), (4, 3)}  # parallel/reversed edges collapse
    E = sorted(raw)
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64()),
    }))
    got = (triangle_counts(edges).to_pandas()
           .sort_values("node").reset_index(drop=True))

    und = {(min(s, d), max(s, d)) for s, d in E if s != d}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    cnt: Counter = Counter()
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            cnt[a] += 1
            cnt[b] += 1
            cnt[c] += 1
    want = pd.DataFrame(sorted(cnt.items()),
                        columns=["node", "n_triangles"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_triangle_counts_triangle_free(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import triangle_counts

    # a path and a 4-cycle: no triangles anywhere
    E = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (12, 13), (13, 10)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64()),
    }))
    assert triangle_counts(edges).count() == 0


def test_label_propagation_two_communities(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import (
        label_propagation, label_propagation_sql)

    rng = np.random.RandomState(3)
    E = set()
    for _ in range(120):
        E.add((int(rng.randint(0, 12)), int(rng.randint(0, 12))))
    for _ in range(120):
        E.add((int(rng.randint(20, 32)), int(rng.randint(20, 32))))
    E.add((5, 25))  # one weak bridge
    E = sorted(E)
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64()),
    }))
    got = (label_propagation(edges, iters=4).to_pandas()
           .sort_values("node").reset_index(drop=True))
    vals = ", ".join(f"({a},{b})" for a, b in E)
    con = duckdb.connect()
    want = (con.sql(label_propagation_sql(
        f"edges(src,dst) AS (VALUES {vals})", iters=4)).df()
        .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    # the two planted blocks resolve to exactly two communities and the
    # bridge does not merge them
    lab = got.set_index("node")["label"]
    assert got.label.nunique() == 2
    assert lab[lab.index < 12].nunique() == 1
    assert lab[lab.index >= 20].nunique() == 1


def test_pagerank_weighted_twin_and_mass(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import (
        pagerank_weighted, pagerank_weighted_sql)

    rng = np.random.RandomState(5)
    E = {}
    for _ in range(200):
        s, d = int(rng.randint(0, 25)), int(rng.randint(0, 25))
        if s != d:
            E[(s, d)] = E.get((s, d), 0) + int(rng.randint(1, 9))
    rows = sorted((f"n{s}", f"n{d}", w) for (s, d), w in E.items())
    edges = rd.from_arrow(pa.table({
        "src": pa.array([r[0] for r in rows], pa.string()),
        "dst": pa.array([r[1] for r in rows], pa.string()),
        "weight": pa.array([r[2] for r in rows], pa.int64()),
    }))
    got = (pagerank_weighted(edges, iters=6).to_pandas()
           .sort_values("node").reset_index(drop=True))
    vals = ", ".join(f"('{a}','{b}',{w})" for a, b, w in rows)
    con = duckdb.connect()
    want = (con.sql(pagerank_weighted_sql(
        f"edges(src,dst,w) AS (VALUES {vals})", iters=6)).df()
        .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert abs(got.pr.sum() - 1.0) < 1e-6  # probability mass conserved


def test_bfs_hops_twin_and_hand_truth(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import bfs_hops, bfs_hops_sql

    # a 6-hop path plus a clique hanging off node 2
    E = [(i, i + 1) for i in range(6)] + [
        (2, 10), (10, 11), (11, 12), (12, 13), (10, 12), (11, 13)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64()),
    }))
    got = (bfs_hops(edges, source=0, rounds=4).to_pandas()
           .sort_values("node").reset_index(drop=True))
    vals = ", ".join(f"({a},{b})" for a, b in E)
    con = duckdb.connect()
    want = (con.sql(bfs_hops_sql(f"edges(src,dst) AS (VALUES {vals})",
                                 source=0, rounds=4)).df()
            .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    # nodes 5, 6, 13 are 5+ hops out -> unreached within 4 rounds
    assert dict(zip(got.node, got.dist)) == {
        0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 10: 3, 11: 4, 12: 4}


def test_common_neighbors_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import common_neighbors

    # star: hub 0 adjacent to 1..4; plus edge (1,2).
    # pairs among leaves share neighbor {0}: cn=1; pair (1,2) shares
    # only 0 too (their own edge is not a common NEIGHBOR).
    E = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64()),
    }))
    got = (common_neighbors(edges, min_common=1).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    m = {(a, b): (c, j) for a, b, c, j in got.to_numpy()}
    # (3,4): cn=1 (hub), deg 1 each -> jaccard 1/(1+1-1) = 1.0
    assert m[(3, 4)] == (1, 1.0)
    # (1,2): cn=1, deg 2 each -> 1/(2+2-1) = 0.333333
    assert m[(1, 2)] == (1, 0.333333)
    # hub 0 vs leaf 3: common neighbor? N(0)={1,2,3,4}, N(3)={0} -> none
    assert (0, 3) not in m


def test_hits_twin_and_hand_truth(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import hits, hits_sql

    rng = np.random.RandomState(7)
    E = sorted({(int(rng.randint(0, 20)), int(rng.randint(0, 20)))
                for _ in range(120)})
    # duplicate a few edges + a self loop: hits() must distinct first
    raw = E + E[:5] + [(3, 3)]
    E = sorted(set(raw))
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in raw], pa.int64()),
        "dst": pa.array([e[1] for e in raw], pa.int64()),
    }))
    got = (hits(edges, iters=5).to_pandas()
           .sort_values("node").reset_index(drop=True))
    vals = ", ".join(f"({a},{b})" for a, b in raw)
    con = duckdb.connect()
    want = (con.sql(hits_sql(f"edges(src, dst) AS (VALUES {vals})",
                             iters=5)).df()
            .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # L1 normalization: both score vectors sum to ~1
    assert abs(got.hub.sum() - 1.0) < 1e-6
    assert abs(got.authority.sum() - 1.0) < 1e-6


def test_hits_star_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import hits

    # all leaves point AT node 0: node 0 is the sole authority
    # (authority 1.0, hub 0.0); every leaf is a pure equal hub.
    E = [(i, 0) for i in range(1, 5)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64()),
    }))
    got = hits(edges, iters=3).to_pandas().set_index("node")
    assert got.loc[0, "authority"] == 1.0
    assert got.loc[0, "hub"] == 0.0
    for leaf in range(1, 5):
        assert got.loc[leaf, "hub"] == 0.25
        assert got.loc[leaf, "authority"] == 0.0


def test_kcore_twin(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import kcore, kcore_sql

    rng = np.random.RandomState(11)
    E = sorted({(int(rng.randint(0, 30)), int(rng.randint(0, 30)))
                for _ in range(140)})
    raw = E + E[:7] + [(4, 4)]  # parallel edges + self loop must collapse
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in raw], pa.int64()),
        "dst": pa.array([e[1] for e in raw], pa.int64())}))
    got = (kcore(edges, k=4, rounds=5).to_pandas()
           .sort_values("node").reset_index(drop=True))
    vals = ",".join(f"({s},{d})" for s, d in raw)
    con = duckdb.connect()
    want = (con.sql(kcore_sql(f"edges(src, dst) AS (VALUES {vals})",
                              k=4, rounds=5)).df()
            .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_kcore_clique_and_tail(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import kcore

    # K4 clique with a 3-node tail: the k=3 peel eats the tail back to
    # the clique (multi-round cascade), clique survives with deg 3 each
    E = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
         (3, 10), (10, 11), (11, 12)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64())}))
    got = (kcore(edges, k=3, rounds=4).to_pandas()
           .sort_values("node").reset_index(drop=True))
    assert got.node.tolist() == [0, 1, 2, 3]
    assert got.deg.tolist() == [3, 3, 3, 3]


def test_clustering_coefficient_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import clustering_coefficient

    # K4 (coef 1.0 each, deg 3) + a path b-c-d (c: deg 2, 0 triangles,
    # coef 0; b,d deg 1 -> excluded) + bridge 3-20 raises deg(3) to 4
    E = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
         (20, 21), (21, 22), (3, 20)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64())}))
    got = (clustering_coefficient(edges).to_pandas()
           .set_index("node").sort_index())
    assert got.loc[0, "coef"] == 1.0 and got.loc[0, "deg"] == 3
    assert got.loc[3, "deg"] == 4 and got.loc[3, "n_triangles"] == 3
    assert got.loc[3, "coef"] == 0.5  # 2*3/(4*3)
    assert got.loc[20, "coef"] == 0.0 and got.loc[20, "deg"] == 2
    assert got.loc[21, "coef"] == 0.0
    assert 22 not in got.index and 1 in got.index


def test_reciprocity_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import reciprocity

    # (0,1) reciprocated, (2,3) not; dup edges and a self loop collapse
    E = [(0, 1), (1, 0), (2, 3), (0, 1), (4, 4)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64())}))
    got = reciprocity(edges).to_pandas().iloc[0]
    assert got.n_directed == 3 and got.n_reciprocal == 2
    assert got.reciprocity == round(2 / 3, 9)


def test_degree_assortativity_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import degree_assortativity

    rng = np.random.RandomState(13)
    E = sorted({(int(rng.randint(0, 25)), int(rng.randint(0, 25)))
                for _ in range(90)})
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64())}))
    got = degree_assortativity(edges).to_pandas().iloc[0]

    und = sorted({(min(s, d), max(s, d)) for s, d in E if s != d})
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = [deg[a] for a, b in und] + [deg[b] for a, b in und]
    ys = [deg[b] for a, b in und] + [deg[a] for a, b in und]
    want = np.corrcoef(xs, ys)[0, 1]
    assert got.n_edges == len(und)
    assert abs(got.assortativity - want) < 1e-9

    # star graph: perfectly disassortative -> -1
    S = [(0, i) for i in range(1, 5)]
    star = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in S], pa.int64()),
        "dst": pa.array([e[1] for e in S], pa.int64())}))
    g2 = degree_assortativity(star).to_pandas().iloc[0]
    assert g2.assortativity == -1.0


def test_personalized_pagerank_localizes(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import pagerank

    # two components: source's component holds ALL mass; the other gets 0
    E = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
         ("x", "y"), ("y", "x")]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.string()),
        "dst": pa.array([e[1] for e in E], pa.string())}))
    got = (pagerank(edges, iters=8, personalize="a").to_pandas()
           .set_index("node")["pr"])
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["a"] > got["c"] > 0  # restart mass concentrates at source
    assert abs(got[["a", "b", "c"]].sum() - 1.0) < 1e-6


def test_ktruss_twin_and_k5(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import ktruss, ktruss_sql

    rng = np.random.RandomState(19)
    E = sorted({(int(rng.randint(0, 25)), int(rng.randint(0, 25)))
                for _ in range(160)})
    raw = E + E[:5] + [(3, 3)]  # dupes + self loop collapse
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in raw], pa.int64()),
        "dst": pa.array([e[1] for e in raw], pa.int64())}))
    got = (ktruss(edges, k=4, rounds=4).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    vals = ",".join(f"({s},{d})" for s, d in raw)
    con = duckdb.connect()
    want = (con.sql(ktruss_sql(f"edges(src, dst) AS (VALUES {vals})",
                               k=4, rounds=4)).df()
            .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0

    # K5 with a pendant triangle hanging off node 4: the 4-truss keeps
    # exactly K5 (support 3 per edge), the pendant triangle (support 1
    # per edge) peels away
    K5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    E2 = K5 + [(4, 10), (4, 11), (10, 11)]
    e2 = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E2], pa.int64()),
        "dst": pa.array([e[1] for e in E2], pa.int64())}))
    g2 = (ktruss(e2, k=4, rounds=4).to_pandas()
          .sort_values(["a", "b"]).reset_index(drop=True))
    assert set(map(tuple, g2[["a", "b"]].to_numpy())) == set(K5)
    assert (g2.support == 3).all()

    # fully peeled graph (triangle-free) -> typed empty, no crash
    path = rd.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 3], pa.int64())}))
    out = ktruss(path, k=3, rounds=2)
    assert out.count() == 0
    assert out.schema().names == ["a", "b", "support"]


def test_community_conductance_two_cliques(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import community_conductance

    # two K4 cliques joined by ONE bridge: LPA labels each clique by its
    # min node; each community: 6 internal edges, 1 cut edge
    K = lambda off: [(off + i, off + j) for i in range(4)
                     for j in range(i + 1, 4)]
    E = K(0) + K(10) + [(0, 10)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64())}))
    got = (community_conductance(edges, iters=4).to_pandas()
           .sort_values("label").reset_index(drop=True))
    assert got.label.tolist() == [0, 10]
    assert got.internal_edges.tolist() == [6, 6]
    assert got.cut_edges.tolist() == [1, 1]
    assert (got.conductance == round(1 / 13, 9)).all()


def test_pagerank_cached_edge_shards_parity(ray_session, monkeypatch):
    """Static-edge-shard pagerank (edges partitioned once by dst, pr
    broadcast into the cached consume per round) must equal the classic
    per-round re-exchange plan exactly — same per-iteration rounding."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import pagerank

    rng = np.random.RandomState(17)
    rows = sorted({(f"n{int(rng.randint(0, 40))}",
                    f"n{int(rng.randint(0, 40))}") for _ in range(300)})
    rows = [(s, d) for s, d in rows if s != d]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([r[0] for r in rows], pa.string()),
        "dst": pa.array([r[1] for r in rows], pa.string()),
    }))

    def run():
        return (pagerank(edges, iters=6)
                .to_pandas().sort_values("node").reset_index(drop=True))

    monkeypatch.setenv("EPR_PR_CACHE_EDGES", "1")
    cached = run()
    monkeypatch.setenv("EPR_PR_CACHE_EDGES", "0")
    classic = run()
    pd.testing.assert_frame_equal(cached, classic)
    # personalized variant through the same loop
    monkeypatch.setenv("EPR_PR_CACHE_EDGES", "1")
    p1 = pagerank(edges, iters=4, personalize="n1").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    monkeypatch.setenv("EPR_PR_CACHE_EDGES", "0")
    p0 = pagerank(edges, iters=4, personalize="n1").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(p1, p0)


def test_hits_cached_edge_shards_parity(ray_session, monkeypatch):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import hits

    rng = np.random.RandomState(23)
    rows = sorted({(int(rng.randint(0, 30)), int(rng.randint(0, 30)))
                   for _ in range(200)})
    rows = [(s, d) for s, d in rows if s != d]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([r[0] for r in rows], pa.int64()),
        "dst": pa.array([r[1] for r in rows], pa.int64()),
    }))

    def run():
        return (hits(edges, iters=3)
                .to_pandas().sort_values("node").reset_index(drop=True))

    monkeypatch.setenv("EPR_PR_CACHE_EDGES", "1")
    cached = run()
    monkeypatch.setenv("EPR_PR_CACHE_EDGES", "0")
    classic = run()
    pd.testing.assert_frame_equal(cached, classic)


def test_label_prop_cached_edge_shards_parity(ray_session, monkeypatch):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_algo import label_propagation

    rng = np.random.RandomState(29)
    rows = sorted({(int(rng.randint(0, 30)), int(rng.randint(0, 30)))
                   for _ in range(150)})
    edges = rd.from_arrow(pa.table({
        "src": pa.array([r[0] for r in rows], pa.int64()),
        "dst": pa.array([r[1] for r in rows], pa.int64()),
    }))

    def run():
        return (label_propagation(edges, iters=3)
                .to_pandas().sort_values("node").reset_index(drop=True))

    monkeypatch.setenv("EPR_PR_CACHE_EDGES", "1")
    cached = run()
    monkeypatch.setenv("EPR_PR_CACHE_EDGES", "0")
    classic = run()
    pd.testing.assert_frame_equal(cached, classic)
