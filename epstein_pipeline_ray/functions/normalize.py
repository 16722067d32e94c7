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


def _non_ascii_element_mask(arr: pa.LargeStringArray):
    """Boolean numpy mask: True where the element contains any byte >= 0x80.

    pc.utf8_lower is simple per-codepoint case mapping; Python str.lower()
    is the full Unicode mapping — they diverge on e.g. U+0130 'İ' (Python
    'i'+combining dot) and Greek final sigma ('ΣΟΦΟΣ' → 'σοφος' vs Arrow
    'σοφοσ'). Whitespace splitting matches for every class we probed
    (\\x0b-\\x1f, \\x85, NBSP), so ASCII-only elements are byte-safe for
    the Arrow path and anything else must take the Python path.
    """
    import numpy as np

    n = len(arr)
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64, count=n + 1,
                            offset=arr.offset * 8)
    data = np.frombuffer(bufs[2], dtype=np.uint8,
                         count=int(offsets[-1]) - int(offsets[0]),
                         offset=int(offsets[0]))
    hi = np.flatnonzero(data >= 0x80)
    mask = np.zeros(n, dtype=bool)
    if hi.size:
        idx = np.searchsorted(offsets, hi + int(offsets[0]), side="right") - 1
        mask[np.unique(idx)] = True
    return mask


def normalize_array_native(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Normalize via pure Arrow C kernels: lower → split on whitespace
    runs → join with single spaces → trim. Byte-equal to
    ``normalize_array`` — ASCII elements run through the zero-Python-alloc
    Arrow path (under 32-way task concurrency the Python-loop variant's
    small-object churn measured a 60x collapse); elements containing any
    non-ASCII byte fall back per-element to the exact Python
    ``" ".join(s.lower().split())`` because Arrow's simple case mapping
    diverges from Python's full mapping (U+0130, Greek final sigma)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, (pa.LargeStringArray,)):
        arr = arr.cast(pa.large_string())
    lowered = pc.utf8_lower(arr)
    parts = pc.utf8_split_whitespace(lowered)
    joined = pc.binary_join(parts, pa.scalar(" ", pa.large_string()))
    # split keeps boundary empties → join leaves at most one leading and
    # one trailing space; inner runs are already collapsed
    out = pc.utf8_trim_whitespace(joined)
    bad = _non_ascii_element_mask(arr)
    if not bad.any():
        return out
    idx = [int(i) for i in bad.nonzero()[0]]
    fixed: list[str | None] = [None] * len(arr)
    for i in idx:
        s = arr[i].as_py()
        fixed[i] = None if s is None else " ".join(s.lower().split())
    return pc.if_else(
        pa.array(bad, pa.bool_()),
        pa.array(fixed, pa.large_string()),
        out,
    )


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
