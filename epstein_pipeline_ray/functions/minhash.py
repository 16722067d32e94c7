"""MinHash over character k-shingles, vectorized with numpy.

Semantics mirror the reference's MinHash pass
(reference: src/epstein_pipeline/processors/dedup.py:332-398):

- shingles = the SET of character k-shingles of normalized text; texts
  shorter than k collapse to the single shingle ``{normalized}``
  (reference dedup.py:98-103),
- one signature of ``num_perm`` minimums per document,
- candidate pairs = documents sharing at least one LSH band,
- confirmation = signature-estimated Jaccard >= threshold
  (reference dedup.py:386-387 — the estimate, not the true set Jaccard).

The hash family is our own (the reference delegates to ``datasketch``,
which is not a dependency here): a 64-bit polynomial rolling hash with a
splitmix64 finalizer produces a 32-bit base hash per shingle, and
``num_perm`` affine bijections ``x → a*x + b (mod 2^32)`` with odd ``a``
(true permutations of the uint32 universe, 2-independent — the same
guarantee class as datasketch's ``(a*x+b) mod p``, but SIMD-friendly)
produce the signature.
Parity with the reference is defined at the pair/cluster level, not at
the level of internal hash values (SURVEY.md §7.2 item 4).

Everything here is pure deterministic numpy — safe to call from Ray
tasks and actors on any worker.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

_POLY_BASE = np.uint64(0x100000001B3)  # FNV-1a prime, used as poly base (wraps mod 2^64)
_MERSENNE_61 = np.uint64((1 << 61) - 1)
_MAX_HASH32 = np.uint64(0xFFFFFFFF)
_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — avalanche a uint64 array in place-ish."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= _SPLITMIX_C1
    h ^= h >> np.uint64(27)
    h *= _SPLITMIX_C2
    h ^= h >> np.uint64(31)
    return h


def shingle_hashes(normalized: str, k: int) -> np.ndarray:
    """Unique 32-bit hashes (as uint64) of the char k-shingle SET.

    Short-text degenerate case matches the reference: ``len(norm) < k``
    yields exactly one shingle, the whole string (dedup.py:101-102).
    Implemented as a vectorized rolling polynomial over UTF-32 codepoints
    so multi-byte characters shingle per *character*, as in the reference.
    """
    cps = np.frombuffer(normalized.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    n = cps.shape[0]
    if n < k:
        # hash the entire string as the single shingle (uint64 wrap is intended)
        h = np.zeros(1, dtype=np.uint64)
        for c in cps:
            h = h * _POLY_BASE + c
        h = h * _POLY_BASE + np.uint64(n)  # length-tag so "" != "\0"
        return _mix64(h) & _MAX_HASH32
    # windows: h[i] = ((c[i]*B + c[i+1])*B + ...)*B + c[i+k-1]  (uint64 wrap)
    m = n - k + 1
    h = cps[0:m].copy()
    for j in range(1, k):
        h = h * _POLY_BASE + cps[j : j + m]
    return np.unique(_mix64(h) & _MAX_HASH32)


def shingle_hashes64(normalized: str, k: int) -> np.ndarray:
    """Full-width variant of :func:`shingle_hashes` (no 32-bit mask).

    Used where the shingle-hash SET itself is the statistic (true-Jaccard
    confirm): at ~10^6 distinct shingles the 32-bit space yields ~100
    colliding shingle pairs — enough to move a 6-decimal Jaccard off a
    string-set oracle — while 64 bits leave ~3e-8 expected collisions.
    ``signature()`` truncates these to uint32 internally, so the same
    array feeds both the LSH candidates and the exact confirm.
    """
    cps = np.frombuffer(normalized.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    n = cps.shape[0]
    if n < k:
        h = np.zeros(1, dtype=np.uint64)
        for c in cps:
            h = h * _POLY_BASE + c
        h = h * _POLY_BASE + np.uint64(n)
        return _mix64(h)
    m = n - k + 1
    h = cps[0:m].copy()
    for j in range(1, k):
        h = h * _POLY_BASE + cps[j : j + m]
    return np.unique(_mix64(h))


@lru_cache(maxsize=8)
def permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) affine-permutation parameters, shape (num_perm,).

    ``a`` odd ⇒ ``x → a*x + b (mod 2^32)`` is a BIJECTION on the uint32
    universe — each (a, b) is literally a permutation, which is what
    MinHash permutes. The family is 2-independent, the same guarantee
    class as the classic ``(a*x+b) mod p`` construction (datasketch's),
    but runs on SIMD-friendly uint32 multiplies: measured ~3x faster and
    ~4x less memory traffic than the mod-(2^61-1) variant it replaced.
    Shingle hashes are splitmix64-finalized before this map, so the affine
    structure never sees correlated inputs.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 31, size=num_perm, dtype=np.uint32) * np.uint32(2) + np.uint32(1)
    b = rng.integers(0, 1 << 32, size=num_perm, dtype=np.uint32)
    return a, b


def signature(hashes: np.ndarray, num_perm: int, seed: int, _chunk: int = 4096) -> np.ndarray:
    """MinHash signature (num_perm,) uint32 of a shingle-hash set."""
    a, b = permutations(num_perm, seed)
    h32 = hashes.astype(np.uint32)
    out = np.full(num_perm, np.iinfo(np.uint32).max, dtype=np.uint32)
    for lo in range(0, h32.shape[0], _chunk):
        t = h32[lo : lo + _chunk, None] * a[None, :]  # uint32 wrap
        t += b[None, :]
        np.minimum(out, t.min(axis=0), out=out)
    return out


def signatures_batch(texts: list[str], k: int, num_perm: int, seed: int) -> np.ndarray:
    """Signatures for a batch of already-normalized texts → (len(texts), num_perm) uint32.

    Per-doc processing is deliberate: a doc's (unique shingles x num_perm)
    work matrix fits L2 (~1 MiB), where a batch-wide concatenated pass
    measured 7x slower (DRAM-bound) and loses the per-doc ``np.unique``
    dedup (~3x shingle reduction on templated transcript text).
    """
    out = np.empty((len(texts), num_perm), dtype=np.uint32)
    for i, t in enumerate(texts):
        out[i] = signature(shingle_hashes(t, k), num_perm, seed)
    return out


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Signature-estimated Jaccard — fraction of agreeing minimums
    (the reference's confirm statistic, dedup.py:386)."""
    return float(np.count_nonzero(sig_a == sig_b)) / sig_a.shape[0]


def pairwise_estimate_jaccard(sigs: np.ndarray) -> np.ndarray:
    """All-pairs signature Jaccard for a small group → (n, n) float64.

    Used inside LSH-bucket pair emission where n <= max_bucket_size.
    """
    n, p = sigs.shape
    eq = (sigs[:, None, :] == sigs[None, :, :]).sum(axis=2)
    return eq / float(p)


@lru_cache(maxsize=32)
def optimal_lsh_params(threshold: float, num_perm: int) -> tuple[int, int]:
    """Optimal (bands, rows) minimizing 0.5*FP + 0.5*FN at `threshold`.

    The standard numerical-integration parameter sweep from the MinHash-LSH
    literature (Mining of Massive Datasets ch.3; same objective the
    reference's ``datasketch.MinHashLSH`` optimizes with equal weights).
    """
    best = (1, num_perm)
    best_err = float("inf")
    xs = np.linspace(0.0, 1.0, 1001)
    dx = xs[1] - xs[0]
    for b in range(1, num_perm + 1):
        r = num_perm // b
        if r == 0:
            continue
        prob = 1.0 - (1.0 - xs**r) ** b  # P(candidate | jaccard=s)
        fp = float(prob[xs < threshold].sum() * dx)
        fn = float((1.0 - prob[xs >= threshold]).sum() * dx)
        err = 0.5 * fp + 0.5 * fn
        if err < best_err:
            best_err = err
            best = (b, r)
    return best


def band_keys(sigs: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Hash each band of each signature → (n, bands) uint64 keys.

    Vectorized polynomial-wrap hash over the band's `rows` uint32 values,
    finalized with splitmix64. Collisions across distinct band contents are
    possible at 2^-64 and harmless: a colliding pair is just an extra LSH
    candidate that the Jaccard confirm stage rejects.
    """
    n = sigs.shape[0]
    used = sigs[:, : bands * rows].astype(np.uint64).reshape(n, bands, rows)
    h = np.zeros((n, bands), dtype=np.uint64)
    for j in range(rows):
        h = h * _POLY_BASE + used[:, :, j]
    return _mix64(h)
