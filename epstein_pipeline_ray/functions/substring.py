"""Longest-common-substring verification (extension tier).

North-rule extension: "SimHash plus suffix-array substring verification to
confirm pairs". Implemented as a suffix automaton of the shorter string
walked by the longer one — O(n+m) time/space, equivalent power to a
suffix-array LCS for this purpose and cache-friendlier for per-pair calls
inside the verify stage. Standard public construction (Blumer et al. 1985).
"""

from __future__ import annotations


def longest_common_substring_len(a: str, b: str) -> int:
    """Length of the longest common substring of a and b."""
    if not a or not b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    # suffix automaton of `a`
    # states: link[], length[], transitions as list of dicts
    link = [-1]
    length = [0]
    trans: list[dict[str, int]] = [{}]
    last = 0
    for ch in a:
        cur = len(length)
        length.append(length[last] + 1)
        link.append(-1)
        trans.append({})
        p = last
        while p != -1 and ch not in trans[p]:
            trans[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = trans[p][ch]
            if length[p] + 1 == length[q]:
                link[cur] = q
            else:
                clone = len(length)
                length.append(length[p] + 1)
                link.append(link[q])
                trans.append(dict(trans[q]))
                while p != -1 and trans[p].get(ch) == q:
                    trans[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur
    # walk b
    v, cur_len, best = 0, 0, 0
    for ch in b:
        while v and ch not in trans[v]:
            v = link[v]
            cur_len = length[v]
        if ch in trans[v]:
            v = trans[v][ch]
            cur_len += 1
            if cur_len > best:
                best = cur_len
    return best


def longest_common_substring_span(a: str, b: str) -> tuple[int, int, int]:
    """(length, a_start, b_start) of one longest common substring of a
    and b — the position-reporting sibling of
    ``longest_common_substring_len`` used by the exact-substring dedup
    stage (span removal needs offsets, not just lengths). Same suffix
    automaton (built over ``a``, walked by ``b``) with a first-endpos
    table per state; (0, -1, -1) when there is no common character.

    Unlike the len variant this never swaps its arguments, so the
    reported offsets always refer to (a, b) as passed; cost is
    O(len(a) + len(b)) either way.
    """
    if not a or not b:
        return (0, -1, -1)
    link = [-1]
    length = [0]
    firstpos = [-1]
    trans: list[dict[str, int]] = [{}]
    last = 0
    for i, ch in enumerate(a):
        cur = len(length)
        length.append(length[last] + 1)
        firstpos.append(i)
        link.append(-1)
        trans.append({})
        p = last
        while p != -1 and ch not in trans[p]:
            trans[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = trans[p][ch]
            if length[p] + 1 == length[q]:
                link[cur] = q
            else:
                clone = len(length)
                length.append(length[p] + 1)
                firstpos.append(firstpos[q])
                link.append(link[q])
                trans.append(dict(trans[q]))
                while p != -1 and trans[p].get(ch) == q:
                    trans[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur
    v, cur_len, best, a_end, b_end = 0, 0, 0, -1, -1
    for j, ch in enumerate(b):
        while v and ch not in trans[v]:
            v = link[v]
            cur_len = length[v]
        if ch in trans[v]:
            v = trans[v][ch]
            cur_len += 1
            if cur_len > best:
                best, a_end, b_end = cur_len, firstpos[v], j
    if best == 0:
        return (0, -1, -1)
    return (best, a_end - best + 1, b_end - best + 1)


def substring_overlap_ratio(a: str, b: str) -> float:
    """LCS length / len(shorter text) — the containment statistic the
    extended verifier thresholds on (DedupConfig.substring_min_overlap)."""
    if not a or not b:
        return 0.0
    return longest_common_substring_len(a, b) / min(len(a), len(b))
