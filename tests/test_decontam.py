"""Benchmark decontamination (stages/decontam.py): verbatim inclusion,
partial overlap below n, case/whitespace invariance, short docs."""

import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.stages.decontam import decontaminate


def _ds(rows, col="text"):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        col: pa.array(rows, pa.string()),
    }))


BENCH_SENT = "the quick brown fox jumps over the lazy dog near the river bank"


def test_verbatim_and_partial(ray_session):
    docs = _ds([
        "intro words then " + BENCH_SENT + " and trailing content here",  # hit
        "the quick brown fox jumps over seven words only",  # 7-token prefix: no 8-gram
        "completely unrelated text about maritime law and astrophysics today",
        "THE   Quick BROWN fox JUMPS over the LAZY dog near the river bank",  # case/ws
        "tiny",
        None,
    ])
    bench = _ds([BENCH_SENT, "another benchmark sentence entirely"])
    out = (decontaminate(docs, bench, n=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.contaminated.tolist() == [True, False, False, True, False, False]
    # doc 0 contains the full 13-token sentence: 13-8+1 = 6 distinct 8-grams
    assert out.loc[0, "n_hits"] == 6
    assert out.loc[3, "n_hits"] == 6


def test_empty_bench_flags_nothing(ray_session):
    docs = _ds(["some words repeated many times over and over again ok"])
    bench = _ds([], col="text")
    out = decontaminate(docs, bench, n=8).to_pandas()
    assert out.contaminated.tolist() == [False]
    assert out.n_hits.tolist() == [0]


def test_c4_line_filter_rules(ray_session):
    """C4 rules direct: terminal punctuation, >=5 words, lorem/brace
    flags, clean_text rebuild in order."""
    from epstein_pipeline_ray.stages.c4_filter import c4_line_filter

    pages = [
        # 3 good lines → keep
        "first proper sentence with several words inside.\n"
        "second proper sentence with several words too!\n"
        "is this a third proper sentence here?\nno punct line",
        # good lines but lorem → dropped
        "a good long sentence with lorem ipsum inside it.\n"
        "more good words in a proper sentence here.\n"
        "and a third fine sentence to count now.",
        # brace → dropped
        'var x = { "json": 1 }.\n'
        "a fine sentence with enough words here one.\n"
        "a fine sentence with enough words here two.\n"
        "a fine sentence with enough words here three.",
        # only 2 kept lines → dropped
        "one proper sentence with enough words here.\nshort.\n"
        "two proper sentence with enough words here.",
        None,
    ]
    out = (c4_line_filter(_ds(pages)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.keep.tolist() == [True, False, False, False, False]
    assert out.loc[0, "n_kept"] == 3
    assert out.loc[0, "n_lines"] == 4
    assert out.loc[0, "clean_text"].count("\n") == 2
    assert "no punct line" not in out.loc[0, "clean_text"]
    assert bool(out.loc[1, "has_lorem"]) and not bool(out.loc[1, "has_brace"])
    assert bool(out.loc[2, "has_brace"])
    assert out.loc[4, "n_kept"] == 0 and out.loc[4, "clean_text"] == ""


def test_bloom_kernels_no_false_negatives_and_fpr():
    import numpy as np
    from epstein_pipeline_ray.functions.bloom import (
        bloom_build, bloom_merge, bloom_params, bloom_probe)
    rng = np.random.default_rng(2)
    items = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    m, k = bloom_params(len(items), fpr=0.01)
    # merge-invariance: build in 7 partials vs one shot
    parts = [bloom_build(c, m, k) for c in np.array_split(items, 7)]
    bits = bloom_merge(parts)
    assert (bits == bloom_build(items, m, k)).all()
    # no false negatives
    assert bloom_probe(bits, items, k).all()
    # FPR near target on fresh items
    fresh = rng.integers(0, 2**63, size=20000, dtype=np.uint64)
    fresh = np.setdiff1d(fresh, items)
    fpr = bloom_probe(bits, fresh, k).mean()
    assert fpr < 0.03


def test_bloom_decontaminate_contains_exact(ray_session):
    import ray.data as rd
    from epstein_pipeline_ray.stages.decontam import (
        decontaminate, decontaminate_bloom)
    SF = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    bench = rd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id", "text"]) \
        .filter(lambda r: r["doc_id"] % 50 == 0)
    exact = decontaminate(docs, bench, n=8).to_pandas()
    bloom = decontaminate_bloom(docs, bench, n=8).to_pandas()
    m = exact.merge(bloom, on="doc_id")
    # guarantee: everything the exact set flags, the bloom flags
    assert (m.loc[m.contaminated, "contaminated_bloom"]).all()
    # and the doc-level false-flag rate is tiny at the 1e-6 per-probe fpr
    extra = int((m.contaminated_bloom & ~m.contaminated).sum())
    assert extra <= max(2, int(0.01 * len(m)))


def test_split_leakage_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.decontam import split_leakage
    from epstein_pipeline_ray.stages.relational import assign_split

    # use ids whose LCG bucket we can observe from assign_split itself
    ids = list(range(40))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["shared one two" if i % 2 == 0
                          else f"only{i} uniq{i} here{i}"
                          for i in ids], pa.string()),
    }))
    split = (assign_split(docs, val_pct=20, test_pct=0).to_pandas()
             .set_index("doc_id")["split"])
    has_val_even = any(split[i] == "val" for i in ids if i % 2 == 0)
    has_train_even = any(split[i] == "train" for i in ids if i % 2 == 0)
    got = split_leakage(docs, n=3, val_pct=20).to_pandas().iloc[0]
    # 'shared one two' (one gram) sits on both sides iff even ids span
    # both splits; unique-text grams never shared
    assert got.n_shared == (1 if has_val_even and has_train_even else 0)
    assert got.n_shared <= got.n_val_grams <= got.n_shared + sum(
        1 for i in ids if i % 2 == 1 and split[i] == "val")
    assert 0.0 <= got.leakage <= 1.0
