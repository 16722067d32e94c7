"""The recall >= 0.99 conformance harness (BASELINE.md target).

Engine (distributed shuffle machinery) vs the pure-Python
reference-semantics oracle on the 'small' corpus (~2k convs, FIXTURES.md).
Recall is measured over cluster-implied pairs — all intra-cluster pairs —
per the north rule's "matching the reference's cluster assignments".
Pair-for-pair equality in parity mode is asserted as the stronger check.
"""

import itertools

import pytest

from epstein_pipeline_ray.config import DedupConfig
from epstein_pipeline_ray.oracle.refsem import oracle_clusters
from epstein_pipeline_ray.pipelines.dedup import dedup_conv_docs


def _implied_pairs(sets):
    out = set()
    for members in sets:
        for a, b in itertools.combinations(sorted(members), 2):
            out.add((a, b))
    return out


@pytest.fixture(scope="module")
def oracle_result(small_docs):
    return oracle_clusters(small_docs, DedupConfig())


def _docs_ds(docs):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "conv_id": [d for d, _ in docs],
            "text": pa.array([t for _, t in docs], pa.large_string()),
            "n_turns": pa.array([1] * len(docs), pa.int32()),
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
        }
    )
    return rd.from_arrow(t)


def test_parity_mode_recall(ray_session, small_docs, oracle_result):
    opairs, ogroups, orep = oracle_result
    res = dedup_conv_docs(_docs_ds(small_docs), DedupConfig())
    pairs = res.pairs.to_pandas()
    clusters = res.clusters.to_pandas()

    eng_pairs = set(zip(pairs.id_a, pairs.id_b))
    ora_pairs = {(p.id_a, p.id_b) for p in opairs}
    # strict pair-for-pair parity in parity mode
    assert eng_pairs == ora_pairs

    eng_sets = [frozenset(g.conv_id) for _, g in clusters.groupby("cluster_id")]
    ora_sets = [frozenset(v) for v in ogroups.values()]
    eng_implied = _implied_pairs(eng_sets)
    ora_implied = _implied_pairs(ora_sets)
    recall = len(eng_implied & ora_implied) / max(1, len(ora_implied))
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99"
    assert set(eng_sets) == set(ora_sets)
    # representatives match
    assert set(clusters[clusters.representative].conv_id) == set(orep.values())


def test_reps_mode_cluster_parity(ray_session, small_docs, oracle_result):
    """minhash_on_reps=True (the scale path) must keep cluster assignments
    identical even though redundant cross-pairs are not emitted."""
    _, ogroups, _ = oracle_result
    res = dedup_conv_docs(_docs_ds(small_docs), DedupConfig(), minhash_on_reps=True)
    clusters = res.clusters.to_pandas()
    eng_sets = {frozenset(g.conv_id) for _, g in clusters.groupby("cluster_id")}
    ora_sets = {frozenset(v) for v in ogroups.values()}
    assert eng_sets == ora_sets


def test_blank_docs_never_pair(ray_session):
    """Blank/whitespace-only docs all share the hash of '' — the reference
    skips them (dedup.py:250) so the engine must too (ADVICE r1): two blank
    docs must NOT become an 'exact' pair, and a blank-heavy corpus must not
    emit a C(n,2) clique."""
    docs = [
        ("b1", "   "),
        ("b2", ""),
        ("b3", "\t\n "),
        ("r1", "real text that is identical"),
        ("r2", "real text that is identical"),
    ]
    opairs, ogroups, _ = oracle_clusters(docs, DedupConfig())
    res = dedup_conv_docs(_docs_ds(docs), DedupConfig())
    pairs = res.pairs.to_pandas()
    eng_pairs = set(zip(pairs.id_a, pairs.id_b))
    assert eng_pairs == {(p.id_a, p.id_b) for p in opairs} == {("r1", "r2")}


def test_scale_path_matches_broadcast(ray_session, small_docs):
    """The beyond-broadcast scale plan (signatures riding the band rows,
    forced via broadcast_sig_rows_limit=0) must emit exactly the pairs the
    broadcast plan emits."""
    from dataclasses import replace

    from epstein_pipeline_ray.stages.minhash_stage import minhash_raw_pairs

    ds = _docs_ds(small_docs)
    base = DedupConfig()
    joined = replace(base, broadcast_sig_rows_limit=0)

    def pairset(res):
        df = res.to_pandas()
        return set(zip(df["id_a"], df["id_b"], df["score"]))

    got_b = pairset(minhash_raw_pairs(_docs_ds(small_docs), base))
    got_j = pairset(minhash_raw_pairs(ds, joined))
    assert got_b == got_j and len(got_b) > 0


def test_four_pass_parity(ray_session, small_docs):
    """Flagship with bates + title passes enabled must be pair-for-pair
    equal (ids, method, score) to the 4-pass reference-semantics oracle —
    VERDICT r1 item 6: bates/title fold into the same first-wins stream."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(5)
    docs = list(small_docs[:300])
    titles = {}
    bates = {}
    title_pool = ["annual report 2005", "annual, report 2005", "annual report 2006",
                  "deposition records", "deposition record", "misc file"]
    for i, (d, _) in enumerate(docs):
        if i % 3 != 2:
            titles[d] = title_pool[int(rng.integers(len(title_pool)))]
        if i % 4 != 3:
            lo = int(rng.integers(0, 400))
            bates[d] = f"EFTA{lo:05d}-EFTA{lo + int(rng.integers(0, 30)):05d}"

    cfg = DedupConfig(enable_bates=True, enable_title=True)
    opairs, ogroups, _ = oracle_clusters(docs, cfg, titles=titles, bates=bates)

    t = pa.table(
        {
            "conv_id": [d for d, _ in docs],
            "text": pa.array([t for _, t in docs], pa.large_string()),
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
            "title": pa.array([titles.get(d) for d, _ in docs], pa.string()),
            "bates_range": pa.array([bates.get(d) for d, _ in docs], pa.string()),
        }
    )
    res = dedup_conv_docs(rd.from_arrow(t), cfg)
    got = res.pairs.to_pandas()
    eng = {(a, b): (m, s) for a, b, m, s in
           zip(got.id_a, got.id_b, got.method, got.score)}
    ora = {(p.id_a, p.id_b): (p.method, p.score) for p in opairs}
    assert set(eng) == set(ora)
    for k in ora:
        assert eng[k][0] == ora[k][0], (k, eng[k], ora[k])
        assert abs(eng[k][1] - ora[k][1]) < 1e-9, (k, eng[k], ora[k])
    # bates and title pairs actually participated
    methods_scores = {(m, round(s, 2)) for (m, s) in ora.values()}
    assert ("exact", 0.95) in methods_scores
