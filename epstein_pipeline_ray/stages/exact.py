"""Exact dedup pass: content-hash grouping → duplicate pairs.

Reference semantics: SHA-256 of normalized text, groups of >= 2 emit all
C(n,2) pairs with score 1.0, canonical (min,max) id order
(reference: src/epstein_pipeline/processors/dedup.py:92-95, 247-273).

Ray shape: vectorized hash column in ``map_batches`` (zero-copy Arrow)
followed by ``groupby(content_hash).map_groups`` — the hash-partition
shuffle replaces the reference's driver-side dict.
"""

from __future__ import annotations

import itertools

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from epstein_pipeline_ray.functions.normalize import content_hash_array, normalize_array

PAIRS_SCHEMA = pa.schema(
    [
        ("id_a", pa.string()),
        ("id_b", pa.string()),
        ("score", pa.float64()),
        ("method", pa.string()),
        ("reason", pa.string()),
    ]
)

_EMPTY_PAIRS = pd.DataFrame({"id_a": pd.Series(dtype="object"), "id_b": pd.Series(dtype="object"),
                             "score": pd.Series(dtype="float64"), "method": pd.Series(dtype="object"),
                             "reason": pd.Series(dtype="object")})


def with_content_hash(docs: Dataset, text_col: str = "text") -> Dataset:
    """Append a ``content_hash`` column (SHA-256 of normalized text)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        norm = normalize_array(batch[text_col])
        return batch.append_column("content_hash", content_hash_array(norm))

    return docs.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)


def _emit_exact_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(g["conv_id"].tolist())
    if len(ids) < 2:
        return _EMPTY_PAIRS
    a, b = zip(*itertools.combinations(ids, 2))
    return pd.DataFrame(
        {
            "id_a": list(a),
            "id_b": list(b),
            "score": 1.0,
            "method": "exact",
            "reason": "exact content hash match",
        }
    )


def exact_pairs(docs_hashed: Dataset) -> Dataset:
    """SHUFFLE key=content_hash → all-pairs per group, score 1.0.

    Group blowup note: a group of n identical docs emits C(n,2) pairs, same
    as the reference. Downstream cluster assignment only needs connectivity,
    so callers at extreme scale can cap via DedupConfig.max_bucket_size by
    deduping to representatives first (see pipeline.minhash_on_reps).
    """
    pruned = docs_hashed.select_columns(["conv_id", "content_hash"])
    return pruned.groupby("content_hash").map_groups(_emit_exact_pairs, batch_format="pandas")


def hash_representatives(docs_hashed: Dataset) -> Dataset:
    """One representative doc per content-hash group (min conv_id).

    Scale path for the MinHash pass: identical texts share identical
    signatures, so running LSH once per distinct text removes the largest
    skew source; exact pairs restore full-cluster connectivity.
    """

    def first_by_id(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("conv_id", kind="mergesort").head(1)

    return docs_hashed.groupby("content_hash").map_groups(first_by_id, batch_format="pandas")
