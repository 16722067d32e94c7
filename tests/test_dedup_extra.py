"""Pair-for-pair parity of the exchange-based dedup_extra operators
against brute-force Python twins (reference semantics). The twins share
only the leaf functions (simhash64, ratio, tokenization) — agreement
validates the exchange/candidate machinery, not just the leaves."""

import itertools

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    return pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text", "lang"]).to_pandas()


def _ds(df):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_simhash_pairs_match_bruteforce(ray_session, docs_df):
    from epstein_pipeline_ray.functions.minhash import shingle_hashes
    from epstein_pipeline_ray.functions.normalize import normalize_text
    from epstein_pipeline_ray.functions.simhash import hamming64, simhash64
    from epstein_pipeline_ray.stages.dedup_extra import simhash_pairs

    df = docs_df[["doc_id", "text"]]
    got = simhash_pairs(_ds(df), max_hamming=3).to_pandas()
    got_pairs = {(a, b): h for a, b, h in zip(got.id_a, got.id_b, got.hamming)}

    sh = {
        i: np.uint64(simhash64(shingle_hashes(normalize_text(t), 5)))
        for i, t in zip(df.doc_id, df.text)
    }
    want = {}
    for (ia, ha), (ib, hb) in itertools.combinations(sorted(sh.items()), 2):
        d = int(hamming64(np.array([ha]), np.array([hb]))[0])
        if d <= 3:
            want[(ia, ib)] = d
    assert got_pairs == want and len(want) > 0


def test_title_fuzzy_pairs_match_bruteforce(ray_session):
    from epstein_pipeline_ray.functions.fuzzy import ratio
    from epstein_pipeline_ray.stages.dedup_extra import title_fuzzy_pairs

    parts = pq.read_table(f"{SF_DIR}/part.parquet",
                          columns=["p_partkey", "p_name"]).to_pandas()
    got = title_fuzzy_pairs(_ds(parts), threshold=0.90,
                            id_col="p_partkey", title_col="p_name").to_pandas()
    got_pairs = {(a, b): s for a, b, s in zip(got.id_a, got.id_b, got.score)}

    blocks: dict[str, list[tuple[int, str]]] = {}
    for i, t in zip(parts.p_partkey, parts.p_name):
        first = t.lower().split()[0] if t.split() else ""
        blocks.setdefault(first, []).append((i, t.lower()))
    want = {}
    for members in blocks.values():
        for (ia, ta), (ib, tb) in itertools.combinations(sorted(members), 2):
            r = ratio(ta, tb)
            if r >= 0.90:
                want[(min(ia, ib), max(ia, ib))] = round(r, 4)
    assert got_pairs == want and len(want) > 0


def test_wordset_prefix_filter_matches_bruteforce(ray_session, docs_df):
    """The prefix-filter join must have NO false negatives vs the O(n^2)
    scan at the same threshold (the WWW'08 prefix guarantee)."""
    from epstein_pipeline_ray.stages.dedup_extra import wordset_jaccard_pairs

    got = wordset_jaccard_pairs(_ds(docs_df), threshold=0.7).to_pandas()
    got_pairs = {(a, b): j for a, b, j in zip(got.id_a, got.id_b, got.jaccard)}

    toks = {i: set(str(t).lower().split())
            for i, t in zip(docs_df.doc_id, docs_df.text)}
    langs = dict(zip(docs_df.doc_id, docs_df.lang))
    want = {}
    for ia, ib in itertools.combinations(sorted(toks), 2):
        if langs[ia] != langs[ib]:
            continue
        sa, sb = toks[ia], toks[ib]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 0.0
        if j >= 0.7:
            want[(ia, ib)] = round(j, 6)
    assert got_pairs == want and len(want) > 0


def test_ngram_jaccard_matches_bruteforce(ray_session, docs_df):
    """ngram=3 switches the token universe to word trigrams; output must
    equal the brute-force trigram-set Jaccard scan (docs with < 3 words
    have no tokens and never pair)."""
    from epstein_pipeline_ray.stages.dedup_extra import wordset_jaccard_pairs

    got = wordset_jaccard_pairs(_ds(docs_df), threshold=0.4, ngram=3).to_pandas()
    got_pairs = {(a, b): j for a, b, j in zip(got.id_a, got.id_b, got.jaccard)}

    def trigrams(t):
        w = str(t).lower().split()
        return {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}

    toks = {i: trigrams(t) for i, t in zip(docs_df.doc_id, docs_df.text)}
    langs = dict(zip(docs_df.doc_id, docs_df.lang))
    want = {}
    for ia, ib in itertools.combinations(sorted(toks), 2):
        if langs[ia] != langs[ib] or not toks[ia] or not toks[ib]:
            continue
        sa, sb = toks[ia], toks[ib]
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= 0.4:
            want[(ia, ib)] = round(j, 6)
    assert got_pairs == want and len(want) > 0


def test_wordset_blank_docs_never_pair(ray_session):
    from epstein_pipeline_ray.stages.dedup_extra import wordset_jaccard_pairs

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["", "   ", "same words here", "same words here"],
         "lang": ["en"] * 4}
    )
    got = wordset_jaccard_pairs(_ds(df), threshold=0.5).to_pandas()
    assert set(zip(got.id_a, got.id_b)) == {(3, 4)}


def test_bates_multi_dash_and_single_forms(ray_session):
    """Parse parity with the reference's split('-') / parts[0], parts[-1]
    semantics: multi-dash takes first and LAST endpoints; dash-less is a
    degenerate single-page range; prefix mismatch is unparseable."""
    from epstein_pipeline_ray.stages.dedup_extra import bates_overlap_pairs

    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5],
            "bates_range": [
                "AB100-AB110",        # plain range
                "AB105-XY1-AB200",    # multi-dash: endpoints AB105, AB200
                "AB205",              # single page — overlaps nothing here
                "AB090-CD100",        # prefix mismatch → unparseable
                "AB108",              # single page inside both ranges
            ],
        }
    )
    got = bates_overlap_pairs(_ds(df), id_col="id").to_pandas()
    assert set(zip(got.id_a, got.id_b)) == {(1, 2), (1, 5), (2, 5)}


def test_winnow_pairs_shared_substring(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.dedup_extra import winnow_pairs

    shared = "the quick brown fox jumps over the lazy dog again and again"
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "intro words " + shared + " closing remarks",
            "different opening " + shared + " and a different end",
            "completely unrelated content about sqlite indexes",
            "another unrelated row mentioning parquet footers",
        ]),
    })
    df = winnow_pairs(rd.from_arrow(t), min_shared=2).to_pandas()
    pairs = set(zip(df.id_a, df.id_b))
    assert (1, 2) in pairs                      # long shared substring
    assert all(3 not in p and 4 not in p for p in pairs)
    assert (df.n_shared >= 2).all()


def test_winnow_pairs_min_shared_filters(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.dedup_extra import winnow_pairs

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma delta words here",
                          "alpha beta gamma delta words here"]),
    })
    loose = winnow_pairs(rd.from_arrow(t), min_shared=1).to_pandas()
    assert len(loose) == 1
    n = int(loose.n_shared.iloc[0])
    strict = winnow_pairs(rd.from_arrow(t), min_shared=n + 1).to_pandas()
    assert len(strict) == 0


def test_indel_ratio_dominates_lev_ratio_property():
    """VERDICT r2 item 10 — the invariant that upgrades title_fuzzy's
    rows-only status: indel_ratio = 2*LCS/(la+lb) >= LCS/max(la,lb) >=
    lev_ratio (2*max >= la+lb and lev >= max - LCS), so at matched
    thresholds every title_lev pair is a title_fuzzy pair."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from epstein_pipeline_ray.functions.fuzzy import ratio

    def lev(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(la):
            cur = [i + 1] + [0] * lb
            for j in range(lb):
                cur[j + 1] = min(prev[j + 1] + 1, cur[j] + 1,
                                 prev[j] + (a[i] != b[j]))
            prev = cur
        return prev[lb]

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="abcde ", max_size=24),
           st.text(alphabet="abcde ", max_size=24))
    def check(a, b):
        lev_ratio = 1.0 - lev(a, b) / max(len(a), len(b), 1)
        assert ratio(a, b) >= lev_ratio - 1e-12

    check()


def test_title_lev_pairs_subset_of_title_fuzzy(ray_session):
    """Containment at matched threshold on the real sf0.001 part table:
    the DuckDB-oracled title_lev pair set is contained in title_fuzzy's
    (same first-word blocking, indel >= lev ratio)."""
    import ray.data as rd

    parts = rd.read_parquet("/root/testdata/sf0.001/part.parquet",
                            columns=["p_partkey", "p_name"])
    from epstein_pipeline_ray.stages.dedup_extra import title_fuzzy_pairs

    kw = dict(id_col="p_partkey", title_col="p_name", threshold=0.75)
    lev_pairs = title_fuzzy_pairs(parts, metric="levenshtein", **kw).to_pandas()
    indel_pairs = title_fuzzy_pairs(parts, metric="indel", **kw).to_pandas()
    lev_set = set(zip(lev_pairs.id_a, lev_pairs.id_b))
    indel_set = set(zip(indel_pairs.id_a, indel_pairs.id_b))
    assert len(lev_set) > 0
    assert lev_set <= indel_set


def test_edit_distance_pairs_brute(ray_session):
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.dedup_extra import edit_distance_pairs

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            cur = [i + 1]
            for j, cb in enumerate(b):
                cur.append(min(prev[j + 1] + 1, cur[-1] + 1,
                               prev[j] + (ca != cb)))
            prev = cur
        return prev[-1]

    strs = ["kitten", "sitten", "sitting", "kitchen", "mitten",
            "ab", "ac", "b", "", "xyxyxy", "yxyxyx",
            "aaaa", "aaab", "totally different string"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(strs)), pa.int64()),
        "text": pa.array(strs, pa.string()),
    }))
    got = (edit_distance_pairs(ds, k=2, q=2).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    want = sorted((a, b, lev(strs[a], strs[b]))
                  for a, b in itertools.combinations(range(len(strs)), 2)
                  if lev(strs[a], strs[b]) <= 2)
    assert list(map(tuple, got.to_numpy().tolist())) == want
    # the short bucket catches gram-free pairs: ("b","") at dist 1,
    # ("ab","ac") sharing zero bigrams at dist 1
    pairs = set(zip(got.id_a, got.id_b))
    assert (7, 8) in pairs and (5, 6) in pairs


def test_soundex4_classic_truths():
    from epstein_pipeline_ray.functions.fuzzy import soundex4

    # classic Soundex agreement cases (no first-letter-dup / hw rules hit)
    assert soundex4("Robert") == soundex4("Rupert") == "R163"
    assert soundex4("Smith") == soundex4("Smyth") == "S530"
    assert soundex4("cold") == "C430"
    assert soundex4("a") == "A000"
    assert soundex4("") == ""
    # run collapse after vowel drop (documented simplification)
    assert soundex4("sassy") == "S200"


def test_soundex_block_stats_groups_phonetic_matches(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.textops import soundex_block_stats

    ds = rd.from_arrow(pa.table({
        "name": pa.array(["Robert widget", "rupert bolt", "Smith x",
                          "Smyth y", "Smith z"], pa.string()),
    }))
    got = (soundex_block_stats(ds, "name").to_pandas()
           .set_index("soundex"))
    assert got.loc["R163", "n_rows"] == 2
    assert got.loc["R163", "n_words"] == 2  # robert, rupert
    assert got.loc["S530", "n_rows"] == 3
    assert got.loc["S530", "n_words"] == 2  # smith, smyth


def test_blocking_quality_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.dedup_extra import blocking_quality

    # 4 docs: A/B identical content but different leading raw case (true
    # pair NOT co-blocked); C/D identical and same raw prefix (co-blocked)
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "alpha beta gamma",
            "Alpha beta gamma",   # same normalized content, block differs
            "delta one two",
            "delta one two",
        ], pa.string()),
    }))
    got = blocking_quality(docs).to_pandas().iloc[0]
    assert got.n_docs == 4 and got.total_pairs == 6
    assert got.true_pairs == 2          # {1,2} and {3,4}
    assert got.co_blocked == 1          # only {3,4} share 'delt'
    assert got.completeness == 0.5
    # blocks: 'alph'(1), 'Alph'(1), 'delt'(2) -> cand = 1
    assert got.cand_pairs == 1
    assert abs(got.reduction_ratio - round(1 - 1 / 6, 9)) < 1e-12
