"""Text normalization + content hashing.

Reference semantics (must match byte-for-byte for the recall harness):

- ``normalize_text``: ``" ".join(text.lower().split())`` — lowercase then
  collapse every run of Python ``str.split`` whitespace to a single space
  (reference: src/epstein_pipeline/utils/hashing.py:12-14, duplicated at
  processors/dedup.py:93-95).
- ``content_hash``: SHA-256 hex of the UTF-8 normalized text
  (reference: utils/hashing.py:17-20, dedup.py:92-95).

The vectorized variants operate on a ``pyarrow`` string array and are the
hot-path versions used inside ``map_batches(batch_format="pyarrow")``.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

# Python str.split() splits on any Unicode whitespace; \s in pyarrow's re2
# covers the ASCII set plus some unicode space classes. For parity we use
# the [\s]+ regex which matches str.split for the characters our corpus
# contains; the scalar fallback is exact.
_WS_REGEX = r"\s+"


def normalize_text(text: str) -> str:
    """Exact reference normalization (scalar)."""
    return " ".join(text.lower().split())


def content_hash(text: str) -> str:
    """SHA-256 hex of normalized text (scalar)."""
    return hashlib.sha256(normalize_text(text).encode("utf-8")).hexdigest()


def normalize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Batch normalize: exactly ``" ".join(s.lower().split())`` per element.

    Implemented as a Python loop over ``to_pylist()`` — measured 4x faster
    than ``pc.replace_substring_regex(r"\\s+")`` on whitespace-heavy text
    (re2 performs one replacement per run, including every single space)
    and byte-exact with the reference's ``str.split`` unicode-whitespace
    semantics, which the \\s regex only approximates."""
    vals = arr.to_pylist()
    return pa.array(
        [None if s is None else " ".join(s.lower().split()) for s in vals],
        type=pa.string(),
    )


def content_hash_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """SHA-256 per element of an already-normalized string array.

    hashlib releases the GIL per call and sha256 of short strings is fast;
    the per-row Python loop here is bounded by one call per *conversation*
    (not per turn), so it is not the hot path. Null → null.
    """
    sha256 = hashlib.sha256
    out = [
        None if s is None else sha256(s.encode("utf-8")).hexdigest()
        for s in arr.to_pylist()
    ]
    return pa.array(out, type=pa.string())


def normalize_array_native(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Normalize via pure Arrow C kernels: lower → split on whitespace
    runs → join with single spaces → trim. Byte-equal to
    ``normalize_array`` (property-tested) but allocates NO Python strings
    — under 32-way task concurrency the Python-loop variant's small-object
    churn measured a 60x collapse (allocator/THP stalls); this one is
    immune."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, (pa.LargeStringArray,)):
        arr = arr.cast(pa.large_string())
    lowered = pc.utf8_lower(arr)
    parts = pc.utf8_split_whitespace(lowered)
    joined = pc.binary_join(parts, pa.scalar(" ", pa.large_string()))
    # split keeps boundary empties → join leaves at most one leading and
    # one trailing space; inner runs are already collapsed
    return pc.utf8_trim_whitespace(joined)


def content_hash_buffers(norm: pa.Array) -> pa.Array:
    """SHA-256 hex per element, reading the Arrow data buffer through
    memoryview slices — no per-row Python string materialization."""
    import numpy as np

    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    if not isinstance(norm, pa.LargeStringArray):
        norm = norm.cast(pa.large_string())
    n = len(norm)
    bufs = norm.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64, count=n + 1,
                            offset=norm.offset * 8)
    mv = memoryview(bufs[2])
    sha256 = hashlib.sha256
    out = [sha256(mv[offsets[i]:offsets[i + 1]]).hexdigest() for i in range(n)]
    return pa.array(out, type=pa.string())
