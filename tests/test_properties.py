"""Property-based kernel tests (hypothesis) — no Ray session needed."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

texts = st.text(max_size=300)
small_texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=120
)


@given(st.lists(texts, max_size=20))
@settings(max_examples=60, deadline=None)
def test_normalize_array_matches_python(batch):
    from epstein_pipeline_ray.functions.normalize import normalize_array

    got = normalize_array(pa.array(batch, pa.string())).to_pylist()
    want = [" ".join(s.lower().split()) for s in batch]
    assert got == want


@given(st.lists(st.integers(0, 2**32 - 1), min_size=1, max_size=500),
       st.randoms(use_true_random=False))
@settings(max_examples=40, deadline=None)
def test_signature_is_order_and_multiplicity_invariant(hashes, rnd):
    from epstein_pipeline_ray.functions.minhash import signature

    arr = np.asarray(hashes, dtype=np.uint64)
    base = signature(arr, 32, 7)
    shuffled = arr.copy()
    rnd.shuffle(shuffled)
    dup = np.concatenate([shuffled, shuffled[: len(shuffled) // 2 + 1]])
    assert np.array_equal(base, signature(dup, 32, 7))


@given(small_texts, small_texts)
@settings(max_examples=80, deadline=None)
def test_indel_ratio_properties(a, b):
    from epstein_pipeline_ray.functions.fuzzy import ratio

    r = ratio(a, b)
    assert 0.0 <= r <= 1.0
    assert ratio(a, b) == ratio(b, a)
    assert ratio(a, a) == 1.0


@given(st.floats(min_value=-1e6, max_value=1e6,
                 allow_nan=False, allow_infinity=False),
       st.integers(0, 6))
@settings(max_examples=120, deadline=None)
def test_sql_round_matches_duckdb(x, n):
    import duckdb

    from epstein_pipeline_ray.functions.rounding import sql_round

    want = duckdb.sql(f"SELECT round({x!r}::DOUBLE, {n})").fetchone()[0]
    got = float(sql_round(np.array([x]), n)[0])
    assert got == want, (x, n, got, want)


@given(st.integers(0, 5000), st.integers(0, 50),
       st.integers(0, 5000), st.integers(0, 50))
@settings(max_examples=80, deadline=None)
def test_bates_overlap_is_interval_intersection(lo1, span1, lo2, span2):
    from epstein_pipeline_ray.functions.bates import bates_overlap

    a = f"EFTA{lo1:08d}-EFTA{lo1 + span1:08d}"
    b = f"EFTA{lo2:08d}-EFTA{lo2 + span2:08d}"
    want = lo1 <= lo2 + span2 and lo2 <= lo1 + span1
    assert bates_overlap(a, b) == want


@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=60), max_size=12))
@settings(max_examples=40, deadline=None)
def test_token_counts_match_split(batch):
    from epstein_pipeline_ray.functions.textstats import token_count_array

    got = token_count_array(pa.array(batch, pa.string())).to_pylist()
    want = [len(s.split()) for s in batch]
    assert got == want


@given(st.lists(st.text(max_size=200), max_size=16))
@settings(max_examples=80, deadline=None)
def test_native_normalize_matches_python(batch):
    import hashlib

    from epstein_pipeline_ray.functions.normalize import (
        content_hash_buffers,
        normalize_array_native,
    )

    arr = pa.array(batch, pa.large_string())
    got = normalize_array_native(arr).to_pylist()
    want = [" ".join(s.lower().split()) for s in batch]
    assert got == want
    hashes = content_hash_buffers(normalize_array_native(arr)).to_pylist()
    assert hashes == [hashlib.sha256(w.encode()).hexdigest() for w in want]


def test_native_normalize_full_casemap_regressions():
    """Explicit cases where Arrow's simple case mapping diverges from
    Python's full mapping (ADVICE r1): U+0130 'İ', Greek final sigma,
    plus mixed ASCII/non-ASCII batches exercising the per-element merge."""
    from epstein_pipeline_ray.functions.normalize import (
        normalize_array,
        normalize_array_native,
    )

    batch = [
        "İstanbul  Meeting",
        "ΣΟΦΟΣ",
        "plain ascii  text",
        None,
        "ΣΟΦΟΣ ΣΟΦΟΣ tail",
        "",
        "ẞharp",
    ]
    want = [None if s is None else " ".join(s.lower().split()) for s in batch]
    arr = pa.array(batch, pa.large_string())
    assert normalize_array_native(arr).to_pylist() == want
    assert normalize_array(arr).to_pylist() == want
    # sliced array → nonzero offset path in the byte scan
    sliced = arr.slice(1, 5)
    assert normalize_array_native(sliced).to_pylist() == want[1:6]


@given(st.text(alphabet="abcdefgh ", min_size=0, max_size=150),
       st.text(alphabet="abcdefgh ", min_size=20, max_size=60),
       st.text(alphabet="abcdefgh ", min_size=0, max_size=150))
@settings(max_examples=40, deadline=None)
def test_winnowing_shared_substring_guarantee(prefix, shared, suffix):
    """Two docs sharing a substring of length >= k + window - 1 must share
    at least one fingerprint (SIGMOD'03 winnowing guarantee)."""
    from epstein_pipeline_ray.functions.textstats import winnow_fingerprints

    k, w = 8, 4
    a = " ".join((prefix + shared).split())
    b = " ".join((shared + suffix).split())
    # the normalized shared run must still be long enough
    s = " ".join(shared.split())
    if len(s) < k + w - 1 or s not in a or s not in b:
        return
    fa = set(winnow_fingerprints(a, k, w))
    fb = set(winnow_fingerprints(b, k, w))
    assert fa & fb
