"""Exact substring dedup (stages/substring_dedup.py): span-function
truths, recall guarantee with planted blocks, precision on clean text,
raw-offset confirm, span removal, and the winnow_pairs run-contiguity
regression (interleaved fingerprint rows must still pair)."""

import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from epstein_pipeline_ray.functions.substring import (
    longest_common_substring_len,
    longest_common_substring_span,
)
from epstein_pipeline_ray.stages.substring_dedup import (
    exact_substring_pairs,
    remove_duplicate_spans,
)


def _docs(texts: list[str]) -> "rd.Dataset":
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_span_function_matches_len_and_offsets():
    cases = [("xxhelloyy", "abhellocd"), ("same", "same"), ("abc", "xyz"),
             ("", "a"), ("aab", "baa"), ("banana", "ananas")]
    for a, b in cases:
        ln, sa, sb = longest_common_substring_span(a, b)
        assert ln == longest_common_substring_len(a, b)
        if ln:
            assert a[sa:sa + ln] == b[sb:sb + ln]


@given(st.text(alphabet="ab", max_size=40), st.text(alphabet="ab", max_size=40))
@settings(max_examples=200, deadline=None)
def test_span_function_property(a, b):
    ln, sa, sb = longest_common_substring_span(a, b)
    assert ln == longest_common_substring_len(a, b)
    if ln:
        assert a[sa:sa + ln] == b[sb:sb + ln]


BLOCK = "the quick brown fox jumps over the lazy dog again and again ok"  # 63 chars


def test_planted_block_found_with_exact_offsets(ray_session):
    assert len(BLOCK) >= 60
    texts = [
        "left context alpha " + BLOCK + " right context omega",
        "completely different beginning here " + BLOCK,
        "unrelated filler text with nothing shared at all beyond words",
        "more unrelated padding that goes on for quite a while longer",
    ]
    out = exact_substring_pairs(_docs(texts), min_len=60).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.id_a, r.id_b) == (0, 1)
    assert r.span_len >= len(BLOCK)
    a, b = texts[0], texts[1]
    assert a[r.a_start:r.a_start + r.span_len] == b[r.b_start:r.b_start + r.span_len]
    assert BLOCK in a[r.a_start:r.a_start + r.span_len]


def test_clean_corpus_no_pairs(ray_session):
    texts = [f"document number {i} talks about subject {i * 7} only" * 3
             for i in range(12)]
    out = exact_substring_pairs(_docs(texts), min_len=60)
    assert out.count() == 0


def test_confirm_raw_offsets_index_raw_text(ray_session):
    # raw text is UPPERCASE; normalized fingerprints still find the pair,
    # confirm_raw=True reports offsets into the raw string
    raw_block = BLOCK.upper()
    texts = ["PREFIX ONE " + raw_block + " SUFFIX",
             "OTHER START " + raw_block + " TRAILING BIT"]
    out = exact_substring_pairs(_docs(texts), min_len=60,
                                confirm_raw=True).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    a, b = texts[0], texts[1]
    assert a[r.a_start:r.a_start + r.span_len] == b[r.b_start:r.b_start + r.span_len]
    assert raw_block in a[r.a_start:r.a_start + r.span_len]


def test_remove_duplicate_spans_keep_first(ray_session):
    texts = [
        "canonical copy intro " + BLOCK + " canonical tail",
        "victim one starts here " + BLOCK + " victim one ends",
        "victim two begins " + BLOCK,
        "innocent bystander document with its own unique content here ok",
    ]
    docs = _docs(texts)
    pairs = exact_substring_pairs(docs, min_len=60, confirm_raw=True)
    cleaned = remove_duplicate_spans(docs, pairs).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # doc 0 (lowest id of every pair) keeps the canonical copy
    assert cleaned.loc[0, "text"] == texts[0]
    assert cleaned.loc[0, "n_cut"] == 0
    # victims lost the block
    for i in (1, 2):
        assert BLOCK not in cleaned.loc[i, "text"]
        assert cleaned.loc[i, "n_cut"] >= len(BLOCK)
    assert cleaned.loc[3, "text"] == texts[3]
    # after removal no >=60-char shared substring remains
    again = exact_substring_pairs(
        _docs(cleaned["text"].tolist()), min_len=60, confirm_raw=True)
    assert again.count() == 0


def test_winnow_pairs_interleaved_fp_rows_regression(ray_session):
    """Regression: winnow_pairs runs its fingerprint exchange with
    sort_blocks=False, so equal fingerprints arrive interleaved across
    map shards; the bucket fn must sort before run detection. Many
    single-row input blocks force maximal interleaving."""
    from epstein_pipeline_ray.stages.dedup_extra import winnow_pairs

    texts = []
    for i in range(24):
        if i % 3 == 0:
            texts.append(f"unique head {i} then " + BLOCK)
        else:
            texts.append(f"standalone document {i} with nothing shared here")
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    # one row per input block -> each map task ships a 1-row shard
    docs = rd.from_arrow_refs([
        __import__("ray").put(tbl.slice(i, 1)) for i in range(tbl.num_rows)
    ])
    got = winnow_pairs(docs, min_shared=1, k=8, window=53).to_pandas()
    sharers = [i for i in range(24) if i % 3 == 0]
    want = {(a, b) for a in sharers for b in sharers if a < b}
    have = set(zip(got.id_a, got.id_b))
    assert want <= have


def test_suffix_array_kernels_match_brute_force():
    import random
    from epstein_pipeline_ray.functions.suffix_array import (
        lcp_array,
        lcs_via_suffix_array,
        suffix_array,
    )
    random.seed(5)
    for _ in range(120):
        s = "".join(random.choice("abc") for _ in range(random.randint(0, 35)))
        codes = np.frombuffer(s.encode("utf-32-le"),
                              dtype=np.uint32).astype(np.int64)
        sa = suffix_array(codes)
        assert sa.tolist() == sorted(range(len(s)), key=lambda i: s[i:])
        lcp = lcp_array(codes, sa)
        for i in range(1, len(s)):
            x, y = s[sa[i]:], s[sa[i - 1]:]
            m = 0
            while m < min(len(x), len(y)) and x[m] == y[m]:
                m += 1
            assert lcp[i] == m


@given(st.text(alphabet="ab", max_size=50), st.text(alphabet="ab", max_size=50))
@settings(max_examples=150, deadline=None)
def test_suffix_array_lcs_equals_automaton(a, b):
    from epstein_pipeline_ray.functions.suffix_array import lcs_via_suffix_array
    assert lcs_via_suffix_array(a, b) == longest_common_substring_len(a, b)


def test_verify_extended_backend_equivalence(ray_session):
    """Both LCS backends must keep/reject the same pairs through the
    extended verify tier."""
    from epstein_pipeline_ray.config import DedupConfig
    from epstein_pipeline_ray.pipelines.dedup import dedup_turns

    from epstein_pipeline_ray.sources.synth import turns_table
    turns = rd.from_arrow(turns_table(n_convs=120, seed=9))
    outs = []
    for backend in ("automaton", "suffix_array"):
        cfg = DedupConfig(verify_mode="extended", substring_backend=backend)
        res = dedup_turns(turns, cfg=cfg)
        df = res.pairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        outs.append(df[["id_a", "id_b", "method"]])
    assert outs[0].equals(outs[1])
