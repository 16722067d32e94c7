"""64-bit SimHash over character shingles (verification-tier extension).

The reference's docs claim SimHash but its code implements only SHA-256
(reference: docs/ARCHITECTURE.md:118 vs src/epstein_pipeline/utils/hashing.py:12-36
— discrepancy recorded in SURVEY.md). This module is the capability
extension demanded by the north rule: SimHash is used as a cheap hamming
pre-filter inside the extended verification tier, never in parity mode.

Standard construction (Charikar 2002): each shingle contributes its
64-bit hash's bits as +1/-1 votes; the sign of each bit-sum is the
fingerprint bit.
"""

from __future__ import annotations

import numpy as np

from epstein_pipeline_ray.functions.minhash import _mix64


def simhash64(shingle_hashes32: np.ndarray) -> np.uint64:
    """SimHash of a shingle-hash set; input is the uint64-held 32-bit
    hashes from ``minhash.shingle_hashes`` (re-mixed to fill 64 bits)."""
    if shingle_hashes32.size == 0:
        return np.uint64(0)
    h = _mix64(shingle_hashes32 * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1))
    # unpack to bit matrix (n, 64) without Python loops
    bits = (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    # signed arithmetic: uint64 would wrap for negative vote sums
    votes = bits.sum(axis=0).astype(np.int64) * 2 - np.int64(h.shape[0])
    out = np.uint64(0)
    for b in np.nonzero(votes > 0)[0]:
        out |= np.uint64(1) << np.uint64(b)
    return out


def simhash_batch(shingle_sets: list[np.ndarray]) -> np.ndarray:
    return np.array([simhash64(s) for s in shingle_sets], dtype=np.uint64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
