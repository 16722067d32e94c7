"""Semantic chunker (reference M11) + OCR noise cleaner (M9): branch
behavior pinned against the reference algorithm's semantics
(reference chunker.py:60-123 entry/clean, 126-296 semantic mode)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from epstein_pipeline_ray.functions.textclean import clean_ocr_noise
from epstein_pipeline_ray.stages.chunker import semantic_chunks_one

KW = dict(target_tokens=25, min_tokens=5, max_tokens=50, min_chunk_size=20)
# → target 100 chars, min 20 chars, max 200 chars


def para(word: str, n: int) -> str:
    return " ".join([word] * n)


def test_cleaner_matches_reference_semantics():
    assert clean_ocr_noise("a\x00b\x1fc") == "abc"
    assert clean_ocr_noise("x" + "y" * 20 + "z") == "xyyyz"
    # exactly 10 decorative chars → deleted by the rules pattern
    assert clean_ocr_noise("a ---------- b") == "a  b"
    # 12 identical chars → squashed to 3 by the run pattern FIRST, so the
    # decorative-rule delete (10+) never sees them — reference order
    assert clean_ocr_noise("a " + "=" * 12 + " b") == "a === b"
    assert clean_ocr_noise("a\tb") == "a\tb"
    assert clean_ocr_noise("a" + " " * 8 + "b") == "a  b"
    assert clean_ocr_noise("a\n\n\n\n\nb") == "a\n\nb"
    assert clean_ocr_noise("  padded  ") == "padded"


def test_short_text_filtered():
    assert semantic_chunks_one("tiny", **KW) == []
    assert semantic_chunks_one("", **KW) == []
    assert semantic_chunks_one(None, **KW) == []


def test_short_doc_single_chunk():
    text = para("alpha", 12)  # 71 chars < target 100
    out = semantic_chunks_one(text, **KW)
    assert out == [(0, text, 0, len(text) // 4)]


def test_title_prefix():
    text = para("alpha", 12)
    out = semantic_chunks_one(text, title="Title X", **KW)
    assert len(out) == 1
    assert out[0][1] == f"Title X\n\n{text}"
    assert out[0][3] == len(out[0][1]) // 4


def test_paragraph_merge_respects_target():
    # 4 paragraphs of ~60 chars: pairs merge to ~120 > target, so each
    # flush happens when the next paragraph would exceed 100
    paras = [para(w, 10) for w in ("aaaa", "bbbb", "cccc", "dddd")]
    text = "\n\n".join(paras)
    out = semantic_chunks_one(text, **KW)
    assert len(out) >= 2
    # chunks join source paragraphs with the paragraph separator
    for _, ct, _, _ in out:
        assert all(seg in text for seg in ct.split("\n\n"))
    # indices contiguous from 0
    assert [c[0] for c in out] == list(range(len(out)))


def test_oversized_paragraph_splits_at_sentences():
    sents = [f"{para(w, 8)}." for w in
             ("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj", "kk", "ll")]
    text = " ".join(sents)  # single paragraph ~300 chars > max 200
    assert len(text) > 200
    out = semantic_chunks_one(text, **KW)
    assert len(out) >= 2
    # sentence-built chunks join with single spaces, bounded near target
    for _, ct, _, _ in out[:-1]:
        assert len(ct) <= 100 + 40  # target + one sentence of slack


def test_min_bound_drops_tiny_flush():
    # a paragraph buffer shorter than min_chars (20) must not emit
    text = "\n\n".join([para("word", 2), para("other", 30)])
    out = semantic_chunks_one(text, **KW)
    for _, ct, _, _ in out:
        assert len(ct) >= 20


def test_overlap_tail_carries_over():
    # last buffered paragraph < target/4 (25 chars) re-enters the next
    # chunk as context → appears twice across chunks
    small = para("tiny", 4)  # 19 chars < 25
    paras = [para("aaaa", 15), small, para("bbbb", 15), para("cccc", 15)]
    text = "\n\n".join(paras)
    out = semantic_chunks_one(text, **KW)
    joined = "\n\n".join(ct for _, ct, _, _ in out)
    assert joined.count(small) >= 2


@given(st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]),
                min_size=5, max_size=60))
@settings(max_examples=40, deadline=None)
def test_semantic_chunk_invariants(words):
    """Every chunk within [min_chars, max-ish] bounds; every content word
    of every chunk comes from the input; indices contiguous."""
    text = "\n\n".join(para(w, 9) for w in words)
    out = semantic_chunks_one(text, **KW)
    for i, (ci, ct, off, tc) in enumerate(out):
        assert ci == i
        assert len(ct) >= 20
        assert tc == len(ct) // 4
        assert set(ct.split()) <= set(words)


def test_ray_stage_roundtrip(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.chunker import semantic_chunk_docs

    texts = ["\n\n".join(para(w, 10) for w in ("aaaa", "bbbb", "cccc"))] * 3
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(texts, pa.large_string())})
    out = semantic_chunk_docs(rd.from_arrow(t), **{k: v for k, v in KW.items()}).to_pandas()
    assert set(out.doc_id) == {1, 2, 3}
    want = semantic_chunks_one(texts[0], **KW)
    got = out[out.doc_id == 1].sort_values("chunk_index")
    assert list(got.chunk_text) == [c[1] for c in want]
