"""Sequence packing (stages/packing.py): hand truths, bucket-width
invariance, straddle accounting; self-repetition signal truths."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.stages.packing import pack_sequences
from epstein_pipeline_ray.stages.textops import with_self_repetition


def _docs(tokens_per_doc: list[int]) -> "rd.Dataset":
    texts = [" ".join(["w"] * n) if n else "" for n in tokens_per_doc]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_pack_hand_truth(ray_session):
    # tokens: 3, 4, 0, 6 with seq_len 5
    # cum_before: 0, 3, 7, 7
    out = pack_sequences(_docs([3, 4, 0, 6]), seq_len=5,
                         bucket_width=2).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert out.n_tokens.tolist() == [3, 4, 0, 6]
    assert out.sample_idx.tolist() == [0, 0, 1, 1]
    assert out.sample_offset.tolist() == [0, 3, 2, 2]
    # doc1 spans tokens 3..6 -> samples 0 and 1; doc3 spans 7..12 -> 1,2
    assert out.n_samples_spanned.tolist() == [1, 2, 0, 2]


def test_pack_bucket_width_invariance(ray_session):
    rng = np.random.default_rng(7)
    toks = rng.integers(0, 40, size=300).tolist()
    a = pack_sequences(_docs(toks), seq_len=128,
                       bucket_width=7).to_pandas().sort_values("doc_id")
    b = pack_sequences(_docs(toks), seq_len=128,
                       bucket_width=100_000).to_pandas().sort_values("doc_id")
    for c in ["n_tokens", "sample_idx", "sample_offset", "n_samples_spanned"]:
        assert a[c].tolist() == b[c].tolist(), c
    # total token conservation: last doc's end == sum of tokens
    last = a.iloc[-1]
    assert (last.sample_idx * 128 + last.sample_offset + last.n_tokens
            == sum(toks))


def test_self_repetition_truths(ray_session):
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "a" * 40,              # all 30-windows identical -> 1 - 1/11
            "short",               # < 30 chars -> dropped
            "abcdefghijklmnopqrstuvwxyz0123",  # 30 chars, 1 window, distinct
        ], pa.string()),
    })
    out = with_self_repetition(rd.from_arrow(t), window=30).to_pandas()
    out = out.set_index("doc_id")
    assert 1 not in out.index
    assert abs(out.loc[0, "rep_ratio"] - round(1 - 1 / 11, 6)) < 1e-12
    assert out.loc[2, "rep_ratio"] == 0.0


def test_assign_split_deterministic_and_balanced(ray_session):
    from epstein_pipeline_ray.stages.relational import assign_split
    ids = pa.table({"doc_id": pa.array(range(20000), pa.int64())})
    out = assign_split(rd.from_arrow(ids)).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert 0.03 < frac.get("val", 0) < 0.07
    assert 0.03 < frac.get("test", 0) < 0.07
    assert frac.get("train", 0) > 0.85
    # deterministic: same assignment on a re-run
    again = assign_split(rd.from_arrow(ids)).to_pandas()
    assert (out.sort_values("doc_id")["split"].to_numpy()
            == again.sort_values("doc_id")["split"].to_numpy()).all()
    # not id-range correlated: first 1000 ids are not all one split
    head = set(out[out.doc_id < 1000]["split"])
    assert head == {"train", "val", "test"}


def test_trailing_window_hand_truth_and_fallback(ray_session):
    from epstein_pipeline_ray.stages.relational import with_trailing_window_agg
    # user A at t=0,50,100,170 with window 100: frames (inclusive left)
    #   t0:[0] t50:[0,50] t100:[0,50,100] t170:[100,170]
    # tie pair for user B at t=10,10 -> peers share the frame
    t = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "user_id": pa.array(["A", "A", "A", "A", "B", "B"], pa.string()),
        "ts": pa.array([0, 50, 100, 170, 10, 10], pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0], pa.float64()),
    })
    out = with_trailing_window_agg(
        rd.from_arrow(t), "user_id", "ts", "value", 100).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    assert out.w_count.tolist() == [1, 2, 3, 2, 2, 2]
    assert out.w_sum.tolist() == [1.0, 3.0, 7.0, 12.0, 48.0, 48.0]


def test_lm_nll_hand_truth_and_plan_equality(ray_session):
    import math
    from epstein_pipeline_ray.stages.lm_score import ngram_lm_nll
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b a b", "a b", "z"], pa.string()),
    })
    out = ngram_lm_nll(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    # corpus tokens: a,b,a,b,a,b,z -> V=3; c(a)=3, c(b)=3
    # bigrams: (a,b)x3, (b,a)x1
    # P(b|a)=(3+1)/(3+3)=2/3 ; P(a|b)=(1+1)/(3+3)=1/3
    lp_ab, lp_ba = math.log(2/3), math.log(1/3)
    want0 = -(2 * lp_ab + lp_ba) / 3
    want1 = -lp_ab
    assert abs(out.loc[0, "nll"] - round(want0, 6)) < 1e-9
    assert abs(out.loc[1, "nll"] - round(want1, 6)) < 1e-9
    assert 2 not in out.index  # single-token doc: no bigrams
    assert out.loc[0, "n_bigrams"] == 3
    # forced-limit-0: exchange-join plan must equal the broadcast plan
    alt = ngram_lm_nll(rd.from_arrow(t), broadcast_rows_limit=0).to_pandas()
    alt = alt.set_index("doc_id")
    assert alt.sort_index().equals(out.sort_index())


def test_dsir_prefers_target_like_docs(ray_session):
    from epstein_pipeline_ray.stages.lm_score import dsir_log_ratio
    # target domain: "alpha beta"-style; raw adds "zulu yankee" docs
    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            "alpha beta alpha beta", "alpha beta gamma",   # target-like
            "zulu yankee zulu yankee", "zulu yankee xray",
            "alpha beta alpha", "zulu yankee zulu",
        ], pa.string()),
    })
    ds = rd.from_arrow(docs)
    tgt = rd.from_arrow(docs.slice(0, 2))  # docs 0,1 define the domain
    out = dsir_log_ratio(ds, tgt).to_pandas().set_index("doc_id")
    # target-like docs score strictly higher than off-domain docs
    assert out.loc[[0, 1, 4], "log_importance"].min() > \
        out.loc[[2, 3, 5], "log_importance"].max()


def test_kmeans_assign_self_and_ties(ray_session):
    from epstein_pipeline_ray.stages.embed import kmeans_assign
    vecs = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0],
                               [0.9, 0.1], [0.5, 0.5]],
                              pa.list_(pa.float64())),
    })
    import numpy as np
    out = kmeans_assign(rd.from_arrow(vecs),
                        np.array([[1.0, 0.0], [0.0, 1.0]]),
                        [0, 1]).to_pandas().set_index("vec_id")
    assert out.loc[0, "centroid_id"] == 0 and out.loc[0, "cos"] == 1.0
    assert out.loc[1, "centroid_id"] == 1
    assert out.loc[2, "centroid_id"] == 0
    # exact tie (0.5, 0.5): smaller centroid id wins
    assert out.loc[3, "centroid_id"] == 0


def test_quality_logit_monotone_in_quality(ray_session):
    from epstein_pipeline_ray.stages.textops import with_quality_logit
    good = ("the quick brown fox and the lazy dog have decided that " * 10)[:-1]
    bad = "### ### ### 123 456 789 ### $$$ %%% ^^^ &&& *** ((( )))"
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array([good, bad], pa.string())})
    out = with_quality_logit(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert out.loc[0, "quality_score"] > out.loc[1, "quality_score"]
    assert 0.0 <= out["quality_score"].min() <= out["quality_score"].max() <= 1.0


def test_kmeans_fit_separates_blobs_and_keeps_empty_centroids(ray_session):
    import numpy as np
    from epstein_pipeline_ray.stages.embed import kmeans_fit
    rng = np.random.default_rng(3)
    # two tight blobs on orthogonal axes + k=3 (third centroid starves)
    a = rng.normal([10, 0, 0], 0.1, size=(20, 3))
    b = rng.normal([0, 10, 0], 0.1, size=(20, 3))
    vecs = np.vstack([
        [[10, 0, 0]], [[0, 10, 0]], [[5.0, 5.0, 0.1]],  # ids 0,1,2 = init
        a, b,
    ])
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
    })
    out = kmeans_fit(rd.from_arrow(t), k=3, iters=4).to_pandas()
    lbl = out.set_index("vec_id")["centroid_id"]
    a_ids = list(range(3, 23))
    b_ids = list(range(23, 43))
    assert set(lbl[a_ids]) == {0}
    assert set(lbl[b_ids]) == {1}
    assert lbl[0] == 0 and lbl[1] == 1


def test_semdedup_subset_of_exact_and_finds_blob_dups(ray_session):
    import numpy as np
    from epstein_pipeline_ray.stages.embed import (
        cosine_neardup_pairs,
        semantic_dedup_pairs,
    )
    rng = np.random.default_rng(11)
    a = rng.normal([10, 0, 0], 0.05, size=(15, 3))
    b = rng.normal([0, 10, 0], 0.05, size=(15, 3))
    vecs = np.vstack([[[10, 0, 0]], [[0, 10, 0]], a, b])
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t)
    sem = semantic_dedup_pairs(ds, k=2, iters=3, threshold=0.99).to_pandas()
    full = cosine_neardup_pairs(ds, threshold=0.99).to_pandas()
    sem_pairs = set(zip(sem.id_a, sem.id_b))
    full_pairs = set(zip(full.id_a, full.id_b))
    assert sem_pairs <= full_pairs
    # tight blobs: every within-blob pair is near-dup and same-cluster,
    # so SemDeDup recovers the full set here
    assert sem_pairs == full_pairs
    assert len(sem_pairs) > 50


def test_padding_waste_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.packing import padding_waste

    ds = rd.from_arrow(pa.table({
        "n_chars": pa.array([1, 2, 3, 5, 8, 9], pa.int64()),
    }))
    out = {r["bucket"]: r for r in padding_waste(ds).take_all()}
    # exact powers stay in their own bucket (1→1, 2→2, 8→8)
    assert out[1]["n"] == 1 and out[1]["waste_pct"] == 0.0
    assert out[2]["n"] == 1 and out[2]["waste_pct"] == 0.0
    assert out[4]["n"] == 1 and out[4]["total_len"] == 3
    assert out[8]["n"] == 2 and out[8]["total_len"] == 13   # 5 + 8
    assert out[8]["padded_len"] == 16
    assert out[16]["n"] == 1 and out[16]["waste_pct"] == round(7 / 16, 6)
