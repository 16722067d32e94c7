"""Brute-force parity + edge cases for stages/corpus_dedup.py and
stages/mixing.py (line-level boilerplate removal, shingle containment,
UniMax allocation)."""

from __future__ import annotations

import itertools
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def _brute_line_dedup(rows, width=12, min_docs=2):
    def lines_of(t):
        ws = (t or "").split(" ")
        return [" ".join(ws[i * width: i * width + width])
                for i in range((len(ws) + width - 1) // width)]

    docline = {did: lines_of(t) for did, t in rows}
    cnt = Counter()
    for ls in docline.values():
        for l in set(ls):
            cnt[l] += 1
    out = []
    for did in sorted(docline):
        ls = docline[did]
        dup = [cnt[l] >= min_docs for l in ls]
        out.append((did, len(ls), sum(dup),
                    " ".join(l for l, d in zip(ls, dup) if not d)))
    return pd.DataFrame(out, columns=["doc_id", "n_lines", "n_removed",
                                      "clean_text"])


def _brute_containment(rows, threshold=0.8, ngram=5):
    from epstein_pipeline_ray.functions.rounding import sql_round

    sets = {}
    for did, t in rows:
        ws = str(t or "").lower().split()
        if len(ws) < ngram:
            continue
        sets[did] = {" ".join(ws[j: j + ngram])
                     for j in range(len(ws) - ngram + 1)}
    out = []
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        if inter / len(sets[a]) >= threshold:
            out.append((a, b, inter, float(sql_round(inter / len(sets[a]), 6))))
        if inter / len(sets[b]) >= threshold:
            out.append((b, a, inter, float(sql_round(inter / len(sets[b]), 6))))
    return (pd.DataFrame(out, columns=["id_a", "id_b", "n_inter", "containment"])
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _synth_docs(n=60, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        nw = int(rng.integers(3, 40))
        text = " ".join(WORDS[int(rng.integers(0, len(WORDS)))]
                        for _ in range(nw))
        rows.append((i, text))
    # planted: exact dup, truncation, blank, short
    rows.append((100, rows[0][1]))
    base = rows[1][1]
    rows.append((101, " ".join(base.split()[: max(6, len(base.split()) * 2 // 3)])))
    rows.append((102, ""))
    rows.append((103, "just three words"))
    return rows


def test_line_dedup_matches_brute(ray_session):
    from epstein_pipeline_ray.stages.corpus_dedup import line_dedup_corpus

    rows = _synth_docs()
    got = (line_dedup_corpus(_docs_ds(rows), width=4, min_docs=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _brute_line_dedup(rows, width=4, min_docs=2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the planted exact dup removes every line of both copies
    full = got.set_index("doc_id")
    assert full.loc[100, "n_removed"] == full.loc[100, "n_lines"]
    assert full.loc[100, "clean_text"] == ""


def test_line_dedup_min_docs_3_and_within_doc_repeat(ray_session):
    from epstein_pipeline_ray.stages.corpus_dedup import line_dedup_corpus

    # the same line twice WITHIN one doc is 1 distinct doc — not
    # boilerplate at min_docs=2
    rows = [(1, "a b a b"), (2, "c d e f"), (3, "c d g h")]
    got = (line_dedup_corpus(_docs_ds(rows), width=2, min_docs=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _brute_line_dedup(rows, width=2, min_docs=2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.set_index("doc_id").loc[1, "n_removed"] == 0
    assert got.set_index("doc_id").loc[2, "n_removed"] == 1  # shared "c d"


def test_containment_matches_brute(ray_session):
    from epstein_pipeline_ray.stages.corpus_dedup import containment_pairs

    rows = _synth_docs()
    got = (containment_pairs(_docs_ds(rows), threshold=0.6, ngram=3)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    want = _brute_containment(rows, threshold=0.6, ngram=3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # planted truncation must be found contained in its source
    assert ((got.id_a == 101) & (got.id_b == 1)).any()
    # blank + sub-ngram docs never pair
    assert not got.id_a.isin([102, 103]).any()
    assert not got.id_b.isin([102, 103]).any()


def test_containment_is_asymmetric(ray_session):
    from epstein_pipeline_ray.stages.corpus_dedup import containment_pairs

    # doc 2 = prefix of doc 1: containment(2→1) = 1.0 but 1 is NOT
    # contained in 2 at t=0.9
    long = " ".join(WORDS) + " " + " ".join(reversed(WORDS))
    short = " ".join(long.split()[:12])
    got = containment_pairs(_docs_ds([(1, long), (2, short)]),
                            threshold=0.9, ngram=3).to_pandas()
    assert set(map(tuple, got[["id_a", "id_b"]].to_numpy())) == {(2, 1)}
    assert got.containment.iloc[0] == 1.0


def test_containment_posting_cap_metric(ray_session):
    from epstein_pipeline_ray.stages.corpus_dedup import containment_pairs

    # identical docs with a forced tiny posting cap: pairs drop, metric fires
    rows = [(i, " ".join(WORDS)) for i in range(6)]
    got = containment_pairs(_docs_ds(rows), threshold=0.5, ngram=3,
                            max_posting=2).to_pandas()
    full = containment_pairs(_docs_ds(rows), threshold=0.5, ngram=3).to_pandas()
    assert len(got) < len(full)
    assert len(full) == 6 * 5  # all ordered pairs of 6 identical docs


def test_unimax_matches_greedy_loop(ray_session):
    from epstein_pipeline_ray.stages.mixing import unimax_allocation

    rows = [(i, "x") for i in range(10)]
    langs = ["en"] * 60 + ["de"] * 25 + ["fr"] * 10 + ["zh"] * 4 + ["eu"] * 1
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"lang": pa.array(langs, pa.string())}))
    for frac, eps in ((0.4, 2), (1.8, 2), (5.0, 1), (0.05, 3)):
        got = unimax_allocation(ds, budget_frac=frac, n_epochs=eps).to_pandas()
        counts = Counter(langs)
        B = frac * len(langs)
        rem, mm = B, len(counts)
        q = {}
        for lang in sorted(counts, key=lambda l: (eps * counts[l], l)):
            q[lang] = min(eps * counts[lang], rem / mm)
            rem -= q[lang]
            mm -= 1
        for _, r in got.iterrows():
            assert abs(r.quota - q[r.lang]) < 1e-6, (frac, eps, r.lang)
        # budget conservation (up to the global cap) and epoch bound
        assert got.quota.sum() <= B + 1e-6
        assert (got.epochs <= eps + 1e-9).all()
        assert abs(got.quota.sum() - min(B, eps * len(langs))) < 1e-6


def test_unimax_all_capped(ray_session):
    from epstein_pipeline_ray.stages.mixing import unimax_allocation

    import ray.data as rd

    ds = rd.from_arrow(pa.table({"lang": pa.array(["a"] * 3 + ["b"] * 2)}))
    got = unimax_allocation(ds, budget=1000.0, n_epochs=2).to_pandas()
    assert (got.quota == got.cap).all()
    assert (got.epochs == 2.0).all()


def test_domain_kl_matches_brute(ray_session):
    import ray.data as rd

    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.mixing import domain_kl

    rng = np.random.default_rng(11)
    rows = []
    for i in range(80):
        src = f"s{i % 4}"
        nw = int(rng.integers(1, 30))
        rows.append((src, " ".join(
            WORDS[int(rng.integers(0, len(WORDS)))] for _ in range(nw))))
    rows.append(("s0", ""))  # blank doc contributes nothing
    ds = rd.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))
    got = domain_kl(ds, num_partitions=3).to_pandas()
    cst, ns, ct = Counter(), Counter(), Counter()
    for s, t in rows:
        for w in str(t or "").lower().split():
            cst[(s, w)] += 1
            ns[s] += 1
            ct[w] += 1
    N = sum(ns.values())
    kl = Counter()
    for (s, w), c in cst.items():
        p = c / ns[s]
        kl[s] += p * np.log(p / (ct[w] / N))
    want = pd.DataFrame(
        sorted((s, ns[s], float(sql_round(kl[s], 6))) for s in ns),
        columns=["source", "n_tokens", "kl"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # KL is non-negative and a uniform corpus has KL ~ 0 for a domain
    # that mirrors the mixture
    assert (got.kl >= 0).all()


def test_cluster_balanced_sample_cap_and_determinism(ray_session):
    import ray.data as rd

    from epstein_pipeline_ray.stages.embed import kmeans_assign
    from epstein_pipeline_ray.stages.mixing import cluster_balanced_sample

    rng = np.random.default_rng(3)
    n, d, k = 120, 8, 4
    emb = rng.normal(size=(n, d))
    cents = rng.normal(size=(k, d))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in emb],
                              pa.list_(pa.float32())),
    }))
    got = (cluster_balanced_sample(ds, cents, list(range(k)), per_cluster=7)
           .to_pandas().sort_values(["centroid_id", "vec_id"])
           .reset_index(drop=True))
    # oracle: full assignment + LCG rank
    asg = kmeans_assign(ds, cents, list(range(k))).to_pandas()
    asg["mix"] = ((asg.vec_id % 2147483648) * 1103515245 + 12345) % 2147483648
    asg["rr"] = asg.sort_values(["mix", "vec_id"]).groupby("centroid_id").cumcount()
    want = (asg[asg.rr < 7][["vec_id", "centroid_id"]]
            .sort_values(["centroid_id", "vec_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.groupby("centroid_id").size().max() <= 7
    # deterministic across runs
    again = (cluster_balanced_sample(ds, cents, list(range(k)), per_cluster=7)
             .to_pandas().sort_values(["centroid_id", "vec_id"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again)


def test_conv_prefix_dedup_matches_brute(ray_session):
    import ray.data as rd

    from epstein_pipeline_ray.stages.transcript_ops import conv_prefix_dedup

    # convs: a/b share 2-turn prefix then diverge; c duplicates a
    # entirely; d is a PREFIX of a (full_prefix_dup); e unique
    seqs = {
        "a": ["sys", "hello", "branch one", "more"],
        "b": ["sys", "hello", "branch two"],
        "c": ["sys", "hello", "branch one", "more"],
        "d": ["sys", "hello"],
        "e": ["different opening"],
    }
    rows = [(c, i, t) for c, ts in seqs.items() for i, t in enumerate(ts)]
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.large_string()),
    }))
    got = (conv_prefix_dedup(ds).to_pandas()
           .sort_values("conv_id").set_index("conv_id"))
    assert got.loc["a", "shared_prefix_len"] == 4      # c is a twin
    assert bool(got.loc["a", "full_prefix_dup"])       # a IS the shared prefix
    assert got.loc["b", "shared_prefix_len"] == 2
    assert not bool(got.loc["b", "full_prefix_dup"])
    assert got.loc["c", "shared_prefix_len"] == 4
    assert bool(got.loc["c", "full_prefix_dup"])
    assert got.loc["d", "shared_prefix_len"] == 2
    assert bool(got.loc["d", "full_prefix_dup"])       # head of a/b/c
    assert got.loc["e", "shared_prefix_len"] == 0
    assert not bool(got.loc["e", "full_prefix_dup"])
    assert (got["n_turns"] == pd.Series(
        {c: len(ts) for c, ts in seqs.items()})).all()


def test_unimax_realize_totals_and_epochs(ray_session):
    import math

    import ray.data as rd

    from epstein_pipeline_ray.stages.mixing import (_waterfill,
                                                    unimax_realize)

    langs = ["en"] * 60 + ["de"] * 25 + ["fr"] * 10 + ["zh"] * 5
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(langs)), pa.int64()),
        "lang": pa.array(langs, pa.string()),
    }))
    got = unimax_realize(ds, budget_frac=1.8, n_epochs=2).to_pandas()
    counts = {l: langs.count(l) for l in set(langs)}
    ls, cs, _, quota = _waterfill(
        np.array(sorted(counts)), np.array([counts[l] for l in sorted(counts)],
                                           dtype=np.float64),
        1.8 * len(langs), 2)
    targets = {l: int(math.floor(q + 0.5)) for l, q in zip(ls, quota)}
    per_lang = got.groupby("lang")["n_copies"].sum().to_dict()
    assert per_lang == targets
    # every doc appears at most ceil(target/n) and copies differ by <= 1
    spread = got.groupby("lang")["n_copies"].agg(["min", "max"])
    assert ((spread["max"] - spread["min"]) <= 1).all()
    # deterministic
    again = unimax_realize(ds, budget_frac=1.8, n_epochs=2).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))


def test_render_conversations_roundtrip(ray_session):
    import ray.data as rd

    from epstein_pipeline_ray.stages.transcript_ops import render_conversations

    rows = [("c1", 1, "assistant", "hello"), ("c1", 0, "user", "hi"),
            ("c2", 0, "user", "solo")]
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.large_string()),
    }))
    got = (render_conversations(ds).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    assert got.text.tolist() == ["user: hi\nassistant: hello", "user: solo"]
    assert got.n_turns.tolist() == [2, 1]


def _brute_source_overlap(rows, width):
    # rows: (source, text)
    per_src: dict[str, set[str]] = {}
    for src, t in rows:
        ws = (t or "").split(" ")
        lines = {" ".join(ws[i * width: i * width + width])
                 for i in range((len(ws) + width - 1) // width)}
        per_src.setdefault(src, set()).update(lines)
    out = []
    for a, b in itertools.combinations(sorted(per_src), 2):
        n = len(per_src[a] & per_src[b])
        if n:
            out.append((a, b, n))
    return pd.DataFrame(out, columns=["source_a", "source_b", "n_shared"])


def test_source_overlap_matches_brute(ray_session):
    import ray.data as rd

    from epstein_pipeline_ray.stages.corpus_dedup import source_overlap

    rows = [
        ("web", "a b c d e f"),        # lines (w=2): "a b" "c d" "e f"
        ("web", "a b x y"),            # within-source repeat of "a b"
        ("books", "a b c d q r"),      # shares "a b" and "c d" with web
        ("books", "z z"),
        ("chat", "e f e f"),           # shares "e f" with web, once
        ("lone", "n o p q"),           # shares nothing
    ]
    ds = rd.from_arrow(pa.table({
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[0] for r in rows], pa.string()),
    }))
    got = (source_overlap(ds, width=2).to_pandas()
           .sort_values(["source_a", "source_b"]).reset_index(drop=True))
    want = _brute_source_overlap(rows, width=2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # shared lines are counted DISTINCT per pair: web/books share 2,
    # web/chat share 1 despite chat repeating "e f" twice
    idx = got.set_index(["source_a", "source_b"])["n_shared"]
    assert idx[("books", "web")] == 2
    assert idx[("chat", "web")] == 1
    assert "lone" not in set(got.source_a) | set(got.source_b)


def _brute_cross_jaccard(new_rows, old_rows, threshold, ngram):
    from epstein_pipeline_ray.functions.rounding import sql_round

    def sset(t):
        ws = str(t or "").lower().split()
        if len(ws) < ngram:
            return None
        return {" ".join(ws[j: j + ngram]) for j in range(len(ws) - ngram + 1)}

    news = {i: s for i, t in new_rows if (s := sset(t)) is not None}
    olds = {i: s for i, t in old_rows if (s := sset(t)) is not None}
    out = []
    for ni, ns_ in sorted(news.items()):
        for oi, os_ in sorted(olds.items()):
            inter = len(ns_ & os_)
            if inter == 0:
                continue
            j = inter / (len(ns_) + len(os_) - inter)
            if j >= threshold:
                out.append((ni, oi, inter, float(sql_round(np.array([j]), 6)[0])))
    return pd.DataFrame(out, columns=["new_id", "old_id", "n_inter", "jaccard"])


def test_cross_jaccard_matches_brute_and_is_cross_only(ray_session):
    from epstein_pipeline_ray.stages.corpus_dedup import cross_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    old_rows = [
        (1, base),
        (2, base),                       # old-side internal exact dup
        (3, "completely different words that share nothing with anything else here"),
        (4, "tiny doc"),                 # under ngram — never pairs
    ]
    new_rows = [
        (101, base),                     # exact recrawl → J=1.0 vs 1 AND 2
        (102, " ".join(base.split(" ")[2:])),   # prefix-dropped near dup
        (103, base),                     # identical to 101 — must NOT pair with it
        (104, "fresh f104a f104b f104c f104d f104e"),
        (105, "tiny doc"),
    ]
    got = (cross_jaccard_pairs(_xdocs_ds(new_rows), _xdocs_ds(old_rows),
                               threshold=0.8, ngram=5)
           .to_pandas().sort_values(["new_id", "old_id"])
           .reset_index(drop=True))
    want = _brute_cross_jaccard(new_rows, old_rows, 0.8, 5)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # cross-side only: identical NEW docs 101/103 never pair with each
    # other, identical OLD docs 1/2 never pair — but each new recrawl
    # pairs with BOTH old copies
    assert set(map(tuple, got[["new_id", "old_id"]].to_numpy())) >= {
        (101, 1), (101, 2), (103, 1), (103, 2)}
    assert not ((got.new_id == 101) & (got.old_id == 103)).any()


def _xdocs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_temperature_mixture_closed_form(ray_session):
    import ray.data as rd

    from epstein_pipeline_ray.stages.mixing import temperature_mixture

    rows = [("a", "x y z"), ("a", "p q"), ("b", "one"), ("c", "")]
    ds = rd.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))
    got = temperature_mixture(ds, alpha=0.5).to_pandas()
    assert got.source.tolist() == ["a", "b", "c"]
    assert got.n_tokens.tolist() == [5, 1, 0]
    import numpy as np
    s = np.sqrt(5) + 1 + 0
    assert got.weight.tolist() == [round(np.sqrt(5) / s, 6), round(1 / s, 6), 0.0]


def test_dup_rate_by_group_cross_source(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.exact import dup_rate_by_group

    tbl = pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "source": pa.array(["A", "A", "A", "B", "B"], pa.string()),
        # "x" repeats across sources (and normalization folds case/space)
        "text": pa.array(["x y", "X  y", "unique a", "x y", "unique b"],
                         pa.string()),
    })
    got = (dup_rate_by_group(rd.from_arrow(tbl)).to_pandas()
           .sort_values("source").reset_index(drop=True))
    want = pd.DataFrame({
        "source": ["A", "B"],
        "n_docs": [3, 2],
        "n_dup_docs": [2, 1],
        "dup_rate": [round(2 / 3, 9), 0.5],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ngram_novelty_hand_truth(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.corpus_dedup import ngram_novelty

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c d",        # grams(2): ab bc cd -> all first -> 1.0
            "c d e",          # cd (seen), de (new) -> 0.5
            "a b c d",        # all three seen -> 0.0
            "x",              # < n tokens -> absent
        ], pa.string()),
    }))
    got = (ngram_novelty(docs, n=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "n_grams": [3, 2, 3],
        "n_novel": [3, 1, 0],
        "novelty": [1.0, 0.5, 0.0],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ngram_hash_postings_matches_set_semantics():
    """The vectorized featurizer must agree with the original per-doc
    Python set loop on STRUCTURE (doc membership + distinct-shingle
    counts + within-batch set equality of hash collections) for
    whitespace-heavy, unicode and sub-ngram edge docs; hash VALUES are
    an opaque identity, so equality of partition structure is the
    invariant that matters."""
    import numpy as np
    import pyarrow as pa

    from epstein_pipeline_ray.stages.corpus_dedup import (
        _ngram_hash_postings,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup doc
        "  The   QUICK  brown\tfox\n jumps over the lazy dog  ",  # ws/case
        "too few words",                     # < ngram -> no postings
        "",                                  # empty
        None,                                # null
        "a b c d e a b c d e a b c d e",     # repeated shingles
        "naïve café déjà vu encore une fois voilà",  # unicode
    ]
    ids = list(range(len(texts)))
    batch = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.large_string())})
    p, tok, n = _ngram_hash_postings(batch, "doc_id", "text", 5)

    def ref_shingles(t):
        words = str(t or "").lower().split()
        return {" ".join(words[j:j + 5])
                for j in range(len(words) - 4)} if len(words) >= 5 else set()

    ref = [ref_shingles(t) for t in texts]
    got = {i: tok[p == i] for i in set(p.tolist())}
    for i, s in enumerate(ref):
        if not s:
            assert i not in got
            continue
        assert len(got[i]) == len(s) == n[p == i][0]
        assert len(np.unique(got[i])) == len(got[i])
    # identical docs -> identical hash sets; ws/case-variant doc too
    assert np.array_equal(np.sort(got[0]), np.sort(got[1]))
    assert np.array_equal(np.sort(got[0]), np.sort(got[2]))
    # distinct docs -> disjoint hash sets (no collisions at this size)
    assert not set(got[0].tolist()) & set(got[7].tolist())
