"""TF-IDF ranking stage: hand-computed truth on a tiny corpus, plan
equality between the broadcast and exchange DF-attach paths, and
determinism of the tie-break."""

import math

import pandas as pd
import pyarrow as pa
import pytest


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows),
                                              preserve_index=False))


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_tfidf_hand_computed(ray_session):
    from epstein_pipeline_ray.stages.ranking import tfidf_top_terms

    docs = [
        {"doc_id": 1, "text": "apple banana apple"},
        {"doc_id": 2, "text": "banana cherry"},
        {"doc_id": 3, "text": "apple Cherry cherry!"},
    ]
    got = tfidf_top_terms(_ds(docs), k=2).to_pandas()
    n = 3.0

    def idf(df_):
        return math.log((1.0 + n) / (1.0 + df_))

    # doc 1: apple tf=2 df=2 -> 2*ln(4/3); banana tf=1 df=2 -> ln(4/3)
    # doc 3: cherry tf=2 df=2 (Cherry lowercased, '!' not a token char)
    by_doc = {d: g.sort_values("tfidf", ascending=False)
              for d, g in got.groupby("doc_id")}
    assert list(by_doc[1].term) == ["apple", "banana"]
    assert by_doc[1].tfidf.iloc[0] == pytest.approx(2 * idf(2), abs=1e-6)
    assert list(by_doc[3].term) == ["cherry", "apple"]
    assert by_doc[3].tf.tolist() == [2, 1]
    # doc 2: banana and cherry both tf=1 df=2 — equal score, term-asc tie
    assert list(by_doc[2].term) == ["banana", "cherry"]


def test_tfidf_plan_equality_forced_exchange(ray_session):
    """broadcast_rows_limit=0 forces the exchange DF-attach plan; results
    must match the default broadcast plan row-for-row."""
    import pyarrow.parquet as pq

    from epstein_pipeline_ray.stages.ranking import tfidf_top_terms

    df = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                       columns=["doc_id", "text"]).to_pandas().head(200)
    a = tfidf_top_terms(_ds(df), k=5).to_pandas()
    b = tfidf_top_terms(_ds(df), k=5, broadcast_rows_limit=0).to_pandas()
    assert _canon(a).equals(_canon(b))


def test_dup_ngrams_hand_computed(ray_session):
    from epstein_pipeline_ray.stages.ranking import dup_ngram_stats

    shared = "the quick brown fox jumps"          # exactly one 5-gram
    docs = [
        {"doc_id": 1, "text": shared + " over the lazy dog"},
        {"doc_id": 2, "text": "INTRO " + shared},
        {"doc_id": 3, "text": "totally unrelated words in this one"},
        {"doc_id": 4, "text": "too short"},        # <5 tokens: no rows
    ]
    got = dup_ngram_stats(_ds(docs), n=5, min_df=2).to_pandas()
    by = got.set_index("doc_id")
    # doc 1: 9 tokens -> 5 distinct grams; only the shared one is dup
    assert by.loc[1, "n_grams"] == 5 and by.loc[1, "n_dup"] == 1
    # doc 2: 6 tokens -> 2 grams ("intro the quick brown fox" + shared)
    assert by.loc[2, "n_grams"] == 2 and by.loc[2, "n_dup"] == 1
    assert by.loc[3, "n_dup"] == 0
    assert 4 not in by.index
    assert by.loc[2, "dup_ratio"] == pytest.approx(0.5, abs=1e-9)


def test_dup_ngrams_plan_equality_forced_exchange(ray_session):
    import pyarrow.parquet as pq

    from epstein_pipeline_ray.stages.ranking import dup_ngram_stats

    df = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                       columns=["doc_id", "text"]).to_pandas().head(200)
    a = dup_ngram_stats(_ds(df)).to_pandas()
    b = dup_ngram_stats(_ds(df), broadcast_rows_limit=0).to_pandas()
    assert _canon(a).equals(_canon(b))


def test_tfidf_empty_and_blank_docs(ray_session):
    from epstein_pipeline_ray.stages.ranking import tfidf_top_terms

    docs = [
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": "   \n\t"},
        {"doc_id": 3, "text": "only words here"},
    ]
    got = tfidf_top_terms(_ds(docs), k=5).to_pandas()
    # token-less docs contribute no rows (same as the SQL twin's unnest)
    assert set(got.doc_id) == {3}
    assert len(got) == 3


def test_bm25_hand_truth(ray_session):
    import math
    import pyarrow as pa
    import ray.data as rd
    from epstein_pipeline_ray.stages.ranking import bm25_scores
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "spark spark flow",       # tf(spark)=2, dl=3
            "spark other words here", # tf(spark)=1, dl=4
            "nothing relevant at all",
        ], pa.string()),
    })
    out = bm25_scores(rd.from_arrow(t), ["spark"], k1=1.2, b=0.75) \
        .to_pandas().set_index("doc_id")
    n, df = 3.0, 2.0
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    avgdl = 11 / 3
    def sc(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert 2 not in out.index
    assert abs(out.loc[0, "bm25"] - round(sc(2, 3), 6)) < 1e-9
    assert abs(out.loc[1, "bm25"] - round(sc(1, 4), 6)) < 1e-9
    assert out.loc[0, "bm25"] > out.loc[1, "bm25"]


def test_char_entropy_truths(ray_session):
    import math
    import pyarrow as pa
    import ray.data as rd
    from epstein_pipeline_ray.stages.textops import with_char_entropy
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["aaaa", "abab", "", "abcd"], pa.string()),
    })
    out = with_char_entropy(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert out.loc[0, "char_entropy"] == 0.0
    assert abs(out.loc[1, "char_entropy"] - round(math.log(2), 6)) < 1e-9
    assert 2 not in out.index
    assert abs(out.loc[3, "char_entropy"] - round(math.log(4), 6)) < 1e-9


def test_deterministic_sample_reproducible(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from epstein_pipeline_ray.stages.relational import deterministic_sample
    t = pa.table({"doc_id": pa.array(range(1000), pa.int64())})
    a = deterministic_sample(rd.from_arrow(t), k=20).to_pandas()
    b = deterministic_sample(rd.from_arrow(t), k=20).to_pandas()
    assert len(a) == 20
    assert sorted(a.doc_id) == sorted(b.doc_id)
    # not just the first 20 ids (mixing decorrelates from id order)
    assert sorted(a.doc_id) != list(range(20))


def test_weighted_sample_deterministic_and_weight_biased(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import weighted_sample

    n = 2000
    # half the docs get weight 100, half weight 1
    w = np.where(np.arange(n) % 2 == 0, 100, 1).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "n_chars": pa.array(w, pa.int64()),
    }))
    got = weighted_sample(ds, k=100, weight_col="n_chars").to_pandas()
    again = weighted_sample(ds, k=100, weight_col="n_chars").to_pandas()
    assert got.doc_id.tolist() == again.doc_id.tolist()  # reproducible
    assert len(got) == 100
    assert got.es_key.is_monotonic_increasing
    # heavy rows dominate: expected heavy share ~ 100/101, allow slack
    heavy = (got.doc_id % 2 == 0).mean()
    assert heavy > 0.85

    # zero/negative weights are excluded
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "n_chars": pa.array([0, -5, 10], pa.int64()),
    }))
    got2 = weighted_sample(ds2, k=3, weight_col="n_chars").to_pandas()
    assert got2.doc_id.tolist() == [3]


def test_tfidf_cosine_pairs_brute(ray_session):
    import math
    from collections import Counter

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.ranking import (
        WORD_RE, tfidf_cosine_pairs)

    texts = [
        "apple banana cherry apple",
        "apple banana cherry",          # near-identical to doc 0
        "dog cat mouse",
        "dog cat mouse dog cat",        # near-identical to doc 2
        "completely different tokens here",
        "the the the the",              # single-term doc
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = (tfidf_cosine_pairs(ds, threshold=0.5, max_df_frac=0.9)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))

    # brute force with the identical weight/prune rules
    N = len(texts)
    tfs = [Counter(m.group(0).lower() for m in WORD_RE.finditer(t))
           for t in texts]
    df = Counter()
    for c in tfs:
        df.update(c.keys())
    vecs = []
    for c in tfs:
        v = {t: float(sql_round(np.array([n * math.log((1 + N) / (1 + df[t]))]), 6)[0])
             for t, n in c.items() if df[t] <= 0.9 * N}
        vecs.append(v)
    want = []
    for a in range(N):
        for b in range(a + 1, N):
            shared = set(vecs[a]) & set(vecs[b])
            if not shared:
                continue
            dot = sum(vecs[a][t] * vecs[b][t] for t in shared)
            na = math.sqrt(sum(w * w for w in vecs[a].values()))
            nb = math.sqrt(sum(w * w for w in vecs[b].values()))
            cos = float(sql_round(np.array([dot / (na * nb)]), 6)[0])
            if cos >= 0.5:
                want.append((a, b, cos))
    assert (list(map(tuple, got.to_numpy().tolist()))
            == [(float(a), float(b), c) for a, b, c in want]
            or got.to_numpy().tolist() == [[a, b, c] for a, b, c in want])
    # the two planted near-identical pairs are found
    pairs = set(zip(got.id_a, got.id_b))
    assert (0, 1) in pairs and (2, 3) in pairs


def test_rrf_fusion_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.ranking import rrf_fusion

    # group g: doc 1 wins list A, doc 2 wins list B, doc 3 strong in
    # both → RRF puts the consistently-good doc 3 first
    ds = rd.from_arrow(pa.table({
        "g": pa.array(["g"] * 4, pa.string()),
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "sa": pa.array([100, 10, 90, 1], pa.int64()),   # A: 1,3,2,4
        "sb": pa.array([10, 100, 90, 1], pa.int64()),   # B: 2,3,1,4
    }))
    out = rrf_fusion(ds, "g", "sa", "sb", "id", k=60, top=4).to_pandas()
    out = out.sort_values(["rrf", "id"],
                          ascending=[False, True]).reset_index(drop=True)
    # 1/(k+r) is convex, so the symmetric (1,3)/(3,1) pair beats (2,2):
    # docs 1 and 2 tie exactly at 1/61 + 1/63 (id breaks the tie),
    # doc 3 third with 2/62, doc 4 last
    assert list(out["id"]) == [1, 2, 3, 4]
    assert out.loc[0, "rrf"] == out.loc[1, "rrf"] == round(
        1 / 61 + 1 / 63, 6)
    assert out.loc[2, "rrf"] == round(2 / 62, 6)
    assert out.loc[2, "rank_a"] == 2 and out.loc[2, "rank_b"] == 2


def test_grouped_string_agg_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import grouped_string_agg

    ds = rd.from_arrow(pa.table({
        "k": pa.array(["a"] * 4 + ["b"], pa.string()),
        "v": pa.array([9, 10, 2, 1, 7], pa.int64()),
        "o": pa.array([1, 1, 2, 3, 1], pa.int64()),
    }))
    out = {r["k"]: r for r in
           grouped_string_agg(ds, "k", "v", "o", k=3).take_all()}
    # order ties at o=1 break on STRING value: "10" < "9"
    assert out["a"]["agg"] == "10,9,2" and out["a"]["n"] == 4
    assert out["b"]["agg"] == "7" and out["b"]["n"] == 1


def test_bool_search_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.textops import bool_search

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "spark and window",           # both musts → hit
            "spark window stream",        # has must_not → out
            "only spark",                 # missing window → out
            None,                         # null → out
        ], pa.string()),
    }))
    assert [r["doc_id"] for r in
            bool_search(ds, ["spark", "window"], ["stream"]).take_all()] == [1]
