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


def jaro_winkler(a: str, b: str, prefix_scale: float = 0.1) -> float:
    """Jaro-Winkler similarity in [0,1] (the comparison Splink applies in
    the reference's blocked linkage, reference:
    src/epstein_pipeline/processors/entity_resolution.py:183-186)."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0.0
    window = max(la, lb) // 2 - 1
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = True
                match_b[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    jaro = (matches / la + matches / lb + (matches - t // 2) / matches) / 3
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return jaro + prefix * prefix_scale * (1 - jaro)


# --- simplified Soundex (the classic ER phonetic blocking key) ---------
#
# Convention (shared verbatim with the SQL twin — DuckDB's RE2 has no
# backreferences, so the twin collapses runs with one '{2,}' replace per
# digit): first letter uppercased; the REST maps bfpv->1 cgjkqszx->2
# dt->3 l->4 mn->5 r->6, drops aeiouyhw, then collapses adjacent equal
# digits; padded with '0' to 4 chars. Differs from full Soundex only in
# the first-letter-duplicate and h/w-separator rules (documented
# simplification, identical on both engines).

_SOUNDEX_MAP = str.maketrans(
    "bfpvcgjkqszxdtlmnr", "111122222222334556", "aeiouyhw")


def soundex4(word: str) -> str:
    """Simplified 4-char Soundex code of an ASCII word ('' if empty)."""
    w = word.lower()
    if not w:
        return ""
    digits = w[1:].translate(_SOUNDEX_MAP)
    out = []
    for ch in digits:
        if not out or out[-1] != ch:
            out.append(ch)
    return (w[0].upper() + "".join(out) + "000")[:4]
