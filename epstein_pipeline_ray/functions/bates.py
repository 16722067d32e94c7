"""Bates range parsing + overlap predicate.

Reference semantics (src/epstein_pipeline/processors/dedup.py:53-89):
``([A-Z]+)(\\d+)`` prefix+number per endpoint; single endpoint → degenerate
range; prefix mismatch between endpoints → unparseable (None); two ranges
overlap iff same prefix and intervals intersect.
"""

from __future__ import annotations

import re

_BATES = re.compile(r"([A-Z]+)(\d+)")


def parse_bates_range(bates: str) -> tuple[str, int, int] | None:
    parts = bates.split("-")
    if len(parts) < 2:
        m = _BATES.match(parts[0].strip())
        if m:
            return (m.group(1), int(m.group(2)), int(m.group(2)))
        return None
    m1 = _BATES.match(parts[0].strip())
    m2 = _BATES.match(parts[-1].strip())
    if not m1 or not m2:
        return None
    p1, n1 = m1.group(1), int(m1.group(2))
    p2, n2 = m2.group(1), int(m2.group(2))
    if p1 != p2:
        return None
    return (p1, min(n1, n2), max(n1, n2))


def bates_overlap(a: str, b: str) -> bool:
    ra, rb = parse_bates_range(a), parse_bates_range(b)
    if ra is None or rb is None or ra[0] != rb[0]:
        return False
    return ra[1] <= rb[2] and rb[1] <= ra[2]
