"""BPE training/encoding parity against a pure-dict Sennrich reference
(subword-nmt get_stats/merge semantics), plan equality across the
size switch, and encoder properties."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pytest


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def _brute_bpe(freqs: Counter, num_merges: int, min_count: int):
    from epstein_pipeline_ray.stages.bpe import _merge_pair

    vocab = {w: list(w) + ["</w>"] for w in freqs}
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for w, f in freqs.items():
            s = vocab[w]
            for j in range(len(s) - 1):
                pc[(s[j], s[j + 1])] += f
        if not pc:
            break
        negc, pair = min((-c, p) for p, c in pc.items())
        if -negc < min_count:
            break
        merges.append(pair)
        vocab = {w: _merge_pair(s, *pair) for w, s in vocab.items()}
    return merges


TEXTS = [
    "the cat sat on the mat", "the cat ate the rat",
    "that hat that cat", "low lower lowest", "new newer newest",
    "wide wider widest", "she sells sea shells", "", "THE The the",
] * 2


def _freqs():
    c: Counter = Counter()
    for t in TEXTS:
        c.update(t.lower().split())
    return c


def test_bpe_train_matches_reference_both_plans(ray_session):
    from epstein_pipeline_ray.stages.bpe import bpe_train

    want = _brute_bpe(_freqs(), 15, 2)
    driver = bpe_train(_docs_ds(TEXTS), num_merges=15, min_count=2)
    got_d = list(zip(driver["left"].to_pylist(), driver["right"].to_pylist()))
    assert got_d == want
    # forced-limit-0: the distributed pair-exchange loop must produce
    # the identical merge sequence
    exch = bpe_train(_docs_ds(TEXTS), num_merges=15, min_count=2,
                     driver_limit_words=0)
    got_e = list(zip(exch["left"].to_pylist(), exch["right"].to_pylist()))
    assert got_e == want
    assert driver["rank"].to_pylist() == list(range(len(want)))


def test_bpe_train_min_count_stop(ray_session):
    from epstein_pipeline_ray.stages.bpe import bpe_train

    # every word unique and 2 chars: all pairs have count 1 -> no merges
    m = bpe_train(_docs_ds(["ab cd ef", "gh ij kl"]),
                  num_merges=10, min_count=2)
    assert m.num_rows == 0


def test_bpe_encode_roundtrip_and_counts(ray_session):
    from epstein_pipeline_ray.stages.bpe import (
        bpe_encode_counts, bpe_train, encode_word)

    merges = bpe_train(_docs_ds(TEXTS), num_merges=15, min_count=2)
    ranks = {(l, r): k for k, l, r in zip(merges["rank"].to_pylist(),
                                          merges["left"].to_pylist(),
                                          merges["right"].to_pylist())}
    # every word re-joins to itself and never exceeds chars+1 symbols
    for w in _freqs():
        toks = encode_word(w, ranks)
        assert "".join(toks).replace("</w>", "") == w
        assert 1 <= len(toks) <= len(w) + 1

    got = (bpe_encode_counts(_docs_ds(TEXTS), merges, concurrency=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for _, row in got.iterrows():
        words = str(TEXTS[int(row.doc_id)] or "").lower().split()
        assert row.n_words == len(words)
        assert row.n_tokens == sum(len(encode_word(w, ranks)) for w in words)


def test_bpe_encode_lowest_rank_precedence():
    from epstein_pipeline_ray.stages.bpe import encode_word

    # rank 0 (a,b) must fire before rank 1 (b,c): "abc" -> ab | c,
    # never a | bc
    ranks = {("a", "b"): 0, ("b", "c"): 1}
    assert encode_word("abc", ranks) == ["ab", "c", "</w>"]
    # and with reversed ranks the other segmentation wins
    ranks2 = {("a", "b"): 1, ("b", "c"): 0}
    assert encode_word("abc", ranks2) == ["a", "bc", "</w>"]
