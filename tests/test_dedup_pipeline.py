"""Engine vs oracle conformance on the tiny corpus + reference seed cases
(modelled on reference tests/test_dedup.py:11-179)."""

import pandas as pd
import pyarrow as pa
import pytest

from epstein_pipeline_ray.config import DedupConfig
from epstein_pipeline_ray.oracle.refsem import oracle_clusters, rollup_turns_pandas
from epstein_pipeline_ray.pipelines.dedup import dedup_conv_docs, dedup_turns


def _docs_ds(rows):
    import ray.data as rd

    t = pa.table(
        {
            "conv_id": [r[0] for r in rows],
            "text": pa.array([r[1] for r in rows], pa.large_string()),
            "n_turns": pa.array([1] * len(rows), pa.int32()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    return rd.from_arrow(t)


def test_exact_content_hash_pair(ray_session):
    # same text, different ids → one exact pair, score 1.0
    # (reference tests/test_dedup.py content-hash case)
    body = "this is the same long document body " * 10
    res = dedup_conv_docs(_docs_ds([("d-1", body), ("d-2", body), ("d-3", "other " * 40)]))
    pairs = res.pairs.to_pandas()
    assert len(pairs) == 1
    p = pairs.iloc[0]
    assert (p.id_a, p.id_b, p.score, p.method) == ("d-1", "d-2", 1.0, "exact")


def test_normalization_equal_is_exact(ray_session):
    a = "Hello   World this is   A Document with  enough text " * 5
    b = "hello world THIS is a document WITH enough TEXT " * 5
    # normalize to different strings → not exact; make them normalize-equal:
    b = a.upper()
    res = dedup_conv_docs(_docs_ds([("x-1", a), ("x-2", b)]))
    pairs = res.pairs.to_pandas()
    assert len(pairs) == 1 and pairs.iloc[0].method == "exact"


def test_near_duplicate_found_by_minhash(ray_session):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 12).strip()
    near = base.replace("gamma", "gamme", 2)
    res = dedup_conv_docs(_docs_ds([("m-1", base), ("m-2", near)]))
    pairs = res.pairs.to_pandas()
    assert len(pairs) == 1
    p = pairs.iloc[0]
    assert p.method == "minhash" and 0.8 <= p.score < 1.0


def test_no_false_positive(ray_session):
    # distinct content must not pair (reference tests/test_dedup.py:53-70)
    a = "completely unrelated first document about shuffle partitioning " * 8
    b = "second text discussing actor pools and object store spilling now " * 8
    res = dedup_conv_docs(_docs_ds([("n-1", a), ("n-2", b)]))
    assert res.pairs.count() == 0
    assert res.clusters.count() == 0


def test_transitive_chain_clusters_together(ray_session):
    # A~B, B~C, A~C only transitively → one cluster of 3
    # (reference tests/test_dedup.py:146-179 find_clusters)
    words = [f"tok{i:03d}" for i in range(120)]
    a = " ".join(words)
    b = " ".join(words[:108] + [w.upper() for w in words[108:]])  # case change → exactish? no: minhash
    b = " ".join(words[:108] + [f"x{w}" for w in words[108:]])
    c = " ".join([f"x{w}" if i >= 96 else w for i, w in enumerate(words)])
    res = dedup_conv_docs(_docs_ds([("t-1", a), ("t-2", b), ("t-3", c)]))
    clusters = res.clusters.to_pandas()
    assert set(clusters.conv_id) == {"t-1", "t-2", "t-3"}
    assert clusters.cluster_id.nunique() == 1
    # representative = longest text (all equal-ish → max (len, id))
    reps = clusters[clusters.representative]
    assert len(reps) == 1


def test_tiny_corpus_engine_equals_oracle(ray_session, tiny_turns):
    import ray.data as rd

    cfg = DedupConfig()
    res = dedup_turns(rd.from_arrow(tiny_turns), cfg)
    pairs = res.pairs.to_pandas()
    clusters = res.clusters.to_pandas()

    docs_df = rollup_turns_pandas(tiny_turns.to_pandas())
    docs = list(zip(docs_df.conv_id, docs_df.text))
    opairs, ogroups, orep = oracle_clusters(docs, cfg)

    assert set(zip(pairs.id_a, pairs.id_b)) == {(p.id_a, p.id_b) for p in opairs}
    eng_sets = set()
    for cid, grp in clusters.groupby("cluster_id"):
        eng_sets.add(frozenset(grp.conv_id))
    assert eng_sets == {frozenset(v) for v in ogroups.values()}
    assert set(clusters[clusters.representative].conv_id) == set(orep.values())


def test_semantic_pass_in_flagship_merge(ray_session):
    """VERDICT r2 item 3: 5-pass first-wins merge with the semantic pass
    (rank 4, reference dedup.py:143-168, 404-464) over a precomputed
    embedding column — engine pairs/clusters equal the extended oracle."""
    import numpy as np
    import ray.data as rd

    from epstein_pipeline_ray.oracle.refsem import oracle_clusters

    rng = np.random.default_rng(5)
    base = rng.standard_normal(16)

    def jitter(eps, seed):
        r = np.random.default_rng(seed)
        v = base + eps * r.standard_normal(16)
        return (v / np.linalg.norm(v)).astype(np.float64)

    body = "this is the same long document body " * 10
    mbody = " ".join(f"token{i:03d} word{i * 7 % 91:02d}" for i in range(80))
    texts = {
        "e-1": body,                       # exact pair with e-2
        "e-2": body,
        "m-1": mbody,                      # minhash near-dups, and their
        "m-2": mbody + " tail",            # embeddings ALSO match → first-wins keeps minhash
        "s-1": "completely different text about maritime law " * 6,
        "s-2": "unrelated discussion of astrophysics and telescopes " * 6,
        "x-1": "short",                    # ineligible everywhere (len <= 50)
    }
    emb = {
        "e-1": jitter(5.0, 1), "e-2": jitter(5.0, 2),   # far apart
        "m-1": jitter(0.01, 3), "m-2": jitter(0.01, 3),  # identical → cos 1.0
        "s-1": jitter(0.02, 4), "s-2": jitter(0.02, 4),  # identical → semantic-only pair
        "x-1": jitter(0.0, 5),
    }
    ids = sorted(texts)
    tbl = pa.table({
        "conv_id": pa.array(ids, pa.string()),
        "text": pa.array([texts[i] for i in ids], pa.large_string()),
        "n_turns": pa.array([1] * len(ids), pa.int32()),
        "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
        "embedding": pa.array([emb[i].tolist() for i in ids],
                              pa.list_(pa.float64())),
    })
    cfg = DedupConfig(enable_semantic=True)
    res = dedup_conv_docs(rd.from_arrow(tbl), cfg)
    pairs = res.pairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    opairs, ogroups, _ = oracle_clusters(
        [(i, texts[i]) for i in ids], cfg, embeddings=emb)
    odf = (pd.DataFrame([(p.id_a, p.id_b, p.score, p.method) for p in opairs],
                        columns=["id_a", "id_b", "score", "method"])
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        pairs[["id_a", "id_b", "score", "method"]], odf, check_exact=False, atol=1e-6)
    # the semantic-only pair is present with method=semantic; the
    # minhash+semantic pair kept the minhash record (first wins)
    by_key = {(r.id_a, r.id_b): r.method for r in pairs.itertuples()}
    assert by_key[("s-1", "s-2")] == "semantic"
    assert by_key[("m-1", "m-2")] == "minhash"
    assert by_key[("e-1", "e-2")] == "exact"
    # clusters match the oracle's components
    clusters = res.clusters.to_pandas()
    eng_sets = {frozenset(g.conv_id) for _, g in clusters.groupby("cluster_id")}
    assert eng_sets == {frozenset(v) for v in ogroups.values()}


def test_semantic_pass_disabled_without_embeddings(ray_session):
    # enable_semantic on a corpus with no embedding column: pass skipped
    body = "words " * 60
    res = dedup_conv_docs(
        _docs_ds([("a-1", body), ("a-2", body)]),
        DedupConfig(enable_semantic=True))
    pairs = res.pairs.to_pandas()
    assert pairs.method.tolist() == ["exact"]
