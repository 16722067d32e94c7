"""Fuzzy string ratios (title-similarity pass + entity matching).

The reference uses ``rapidfuzz.fuzz.ratio`` / ``token_sort_ratio``
(reference: src/epstein_pipeline/processors/dedup.py:313,
confidence.py:98). rapidfuzz is not a dependency here; ``ratio`` is the
same normalized indel similarity ``1 - dist_indel/(len_a+len_b)``,
computed exactly with a banded O(n*m) DP (titles are short — this is not
a hot path; the hot dedup path is MinHash).
"""

from __future__ import annotations


def indel_distance(a: str, b: str) -> int:
    """Insert/delete-only edit distance (substitution = delete+insert)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    # classic LCS-based: dist = len(a)+len(b) - 2*LCS
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        p = 0
        for j, cb in enumerate(b, 1):
            if ca == cb:
                cur.append(prev[j - 1] + 1)
            else:
                cur.append(max(prev[j], cur[-1]))
        prev = cur
    lcs = prev[-1]
    return len(a) + len(b) - 2 * lcs


def ratio(a: str, b: str) -> float:
    """Normalized indel similarity in [0,1] (rapidfuzz fuzz.ratio/100)."""
    total = len(a) + len(b)
    if total == 0:
        return 1.0
    return 1.0 - indel_distance(a, b) / total


def token_sort_ratio(a: str, b: str) -> float:
    """ratio() of the whitespace-token-sorted strings."""
    return ratio(" ".join(sorted(a.split())), " ".join(sorted(b.split())))
