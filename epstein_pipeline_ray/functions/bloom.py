"""Mergeable Bloom filter over 64-bit hashes (Bloom 1970) — the
fixed-size membership side for when even the deduplicated benchmark
n-gram array is too big to broadcast (decontamination at 100 TB: a
1 GiB bloom summarizes ~10^9 n-grams at ~1% FPR vs ~8 GiB of raw
hashes). Partials from different tasks OR-merge, same contract as the
KMV/HLL sketches.

Double hashing (Kirsch & Mitzenmacher 2006): the i-th probe position is
(h1 + i*h2) mod m bits, both halves derived from the input's single
64-bit hash — no per-probe rehash.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bloom_build", "bloom_merge", "bloom_probe", "bloom_params"]


def bloom_params(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_probes) for a target false-positive rate; m rounded up
    to a byte multiple, both floored at sane minimums."""
    n = max(1, n_items)
    m = int(np.ceil(-n * np.log(fpr) / (np.log(2) ** 2)))
    m = max(64, (m + 7) // 8 * 8)
    k = max(1, int(round(m / n * np.log(2))))
    return m, k


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(hashes), k) bit positions via double hashing."""
    h = np.asarray(hashes, dtype=np.uint64)
    h1 = h % np.uint64(m_bits)
    h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd => full-period stride
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def bloom_build(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Bit array (uint8, m_bits/8 bytes) with all hashes inserted."""
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(hashes):
        pos = _positions(hashes, m_bits, k).ravel()
        np.bitwise_or.at(bits, (pos // 8).astype(np.int64),
                         (np.uint8(1) << (pos % 8).astype(np.uint8)))
    return bits


def bloom_merge(parts: list[np.ndarray]) -> np.ndarray:
    """OR-merge of same-shape partials (associative, order-free)."""
    out = parts[0].copy()
    for p in parts[1:]:
        out |= p
    return out


def bloom_probe(bits: np.ndarray, hashes: np.ndarray, k: int) -> np.ndarray:
    """Boolean membership per hash — True may be a false positive, False
    is certain (no false negatives)."""
    if not len(hashes):
        return np.zeros(0, dtype=bool)
    m_bits = bits.shape[0] * 8
    pos = _positions(hashes, m_bits, k)
    byte = bits[(pos // 8).astype(np.int64)]
    bit = (byte >> (pos % 8).astype(np.uint8)) & np.uint8(1)
    return bit.all(axis=1)
