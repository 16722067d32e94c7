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
    """Vectorized normalize: lower → collapse whitespace runs → strip.

    Equivalent to ``" ".join(s.lower().split())`` for ASCII-whitespace text.
    """
    lowered = pc.utf8_lower(arr)
    collapsed = pc.replace_substring_regex(lowered, pattern=_WS_REGEX, replacement=" ")
    stripped = pc.utf8_trim_whitespace(collapsed)
    if isinstance(stripped, pa.ChunkedArray):
        stripped = stripped.combine_chunks()
    return stripped


def content_hash_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """SHA-256 per element of an already-normalized string array.

    hashlib releases the GIL per call and sha256 of short strings is fast;
    the per-row Python loop here is bounded by one call per *conversation*
    (not per turn), so it is not the hot path. Null → null.
    """
    normalized = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    out: list[str | None] = []
    sha256 = hashlib.sha256
    for v in normalized:
        s = v.as_py()
        out.append(None if s is None else sha256(s.encode("utf-8")).hexdigest())
    return pa.array(out, type=pa.string())
