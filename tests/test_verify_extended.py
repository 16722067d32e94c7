"""Extended verification tier (SimHash + suffix-automaton substring)."""

import numpy as np
import pyarrow as pa
import pytest

from epstein_pipeline_ray.config import DedupConfig
from epstein_pipeline_ray.functions.minhash import shingle_hashes
from epstein_pipeline_ray.functions.simhash import hamming64, simhash64
from epstein_pipeline_ray.functions.substring import (
    longest_common_substring_len,
    substring_overlap_ratio,
)
from epstein_pipeline_ray.pipelines.dedup import dedup_conv_docs


def test_lcs_known_values():
    assert longest_common_substring_len("abcdef", "zabcy") == 3  # "abc"
    assert longest_common_substring_len("", "abc") == 0
    assert longest_common_substring_len("same", "same") == 4
    # containment
    assert substring_overlap_ratio("hello world", "xx hello world yy") == 1.0


def test_simhash_near_vs_far():
    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base.replace("quick", "quack")
    far = "completely different text about distributed shuffles " * 20
    h = lambda t: simhash64(shingle_hashes(t, 5))
    d_near = int(hamming64(np.array([h(base)]), np.array([h(near)]))[0])
    d_far = int(hamming64(np.array([h(base)]), np.array([h(far)]))[0])
    assert d_near < d_far
    assert d_near <= 8


def _docs_ds(docs):
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


def test_extended_is_subset_of_parity(ray_session, tiny_turns):
    from epstein_pipeline_ray.oracle.refsem import rollup_turns_pandas

    docs_df = rollup_turns_pandas(tiny_turns.to_pandas())
    docs = list(zip(docs_df.conv_id, docs_df.text))

    parity = dedup_conv_docs(_docs_ds(docs), DedupConfig(verify_mode="parity"))
    extended = dedup_conv_docs(_docs_ds(docs), DedupConfig(verify_mode="extended"))
    p_pairs = set(zip(*[parity.pairs.to_pandas()[c] for c in ("id_a", "id_b")]))
    e_pairs = set(zip(*[extended.pairs.to_pandas()[c] for c in ("id_a", "id_b")]))
    assert e_pairs <= p_pairs
    # genuine near-dups (high SimHash agreement) must survive the tier
    assert len(e_pairs) > 0
    # exact pairs always survive
    p_exact = set(
        zip(*[parity.pairs.to_pandas().query("method=='exact'")[c] for c in ("id_a", "id_b")])
    )
    assert p_exact <= e_pairs
