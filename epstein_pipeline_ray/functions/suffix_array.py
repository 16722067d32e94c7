"""True suffix-array substring kernels (the north rule names
"suffix-array substring verification" literally; the automaton in
functions/substring.py is the per-pair default — this module provides
the actual suffix-array backend with identical answers).

Construction is the classic prefix-doubling algorithm (Manber & Myers
1990) fully vectorized in numpy: O(n log n) numpy sorts over rank
pairs, no per-character Python. LCS(a, b) is the textbook SA
application: build the SA of a#b (separator below any text byte),
compute the LCP array (Kasai 2001, vectorized h-decrement loop), and
take the max LCP between ADJACENT suffixes from different sides.
"""

from __future__ import annotations

import numpy as np

__all__ = ["suffix_array", "lcp_array", "lcs_via_suffix_array"]


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array of an int array (any non-negative codes)."""
    n = codes.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    rank = np.asarray(codes, dtype=np.int64)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while True:
        # sort by (rank[i], rank[i+k]) via lexsort
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        sa = order.astype(np.int64)
        # re-rank: adjacent-in-order suffixes equal iff both key parts equal
        r_prev = rank[sa]
        s_prev = second[sa]
        new = np.ones(n, dtype=np.int64)
        new[0] = 0
        new[1:] = (r_prev[1:] != r_prev[:-1]) | (s_prev[1:] != s_prev[:-1])
        tmp[sa] = np.cumsum(new)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def lcp_array(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = common-prefix length of sa[i] and sa[i-1]
    (lcp[0] = 0). One O(n) pass; the inner extension loop is amortized
    O(n) total (Kasai 2001)."""
    n = codes.shape[0]
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and codes[i + h] == codes[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def lcs_via_suffix_array(a: str, b: str) -> int:
    """Longest-common-substring length via SA+LCP of a#b — equal by
    construction to substring.longest_common_substring_len (equality is
    pytest-pinned); the backend named by the north rule."""
    if not a or not b:
        return 0
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    # separator strictly below any real code point (codes shifted +1)
    codes = np.concatenate([ca + 1, [0], cb + 1])
    sa = suffix_array(codes)
    lcp = lcp_array(codes, sa)
    na = ca.shape[0]
    side = sa < na  # suffixes starting in a (separator/b side = False)
    diff = np.zeros(sa.shape[0], dtype=bool)
    diff[1:] = side[1:] != side[:-1]
    if not diff.any():
        return 0
    best = int(lcp[diff].max())
    # an LCP can't span the separator (code 0 never matches), so it is a
    # genuine common substring of a and b
    return best
