"""Date normalization (reference M14: processors/temporal_extractor.py
:240-277 — YYYY[-MM[-DD]] passthrough with padding, range split on '/',
format-list parse fallback)."""

from __future__ import annotations

import re

_ISO = re.compile(r"^(\d{4})(?:-(\d{1,2})(?:-(\d{1,2}))?)?$")
_FORMATS = ["%m/%d/%Y", "%d %B %Y", "%B %d %Y", "%B %d, %Y", "%d %b %Y", "%b %d %Y"]


def normalize_date(raw: str | None) -> str | None:
    """→ canonical 'YYYY-MM-DD' (missing parts default to 01), or None."""
    if not raw:
        return None
    s = raw.strip()
    if "/" in s and s.count("/") == 1 and not any(c.isalpha() for c in s):
        # range "A / B" → normalize the first endpoint (reference behavior)
        first = s.split("/")[0].strip()
        if _ISO.match(first):
            s = first
    m = _ISO.match(s)
    if m:
        y, mo, d = m.group(1), m.group(2) or "1", m.group(3) or "1"
        return f"{int(y):04d}-{int(mo):02d}-{int(d):02d}"
    from datetime import datetime

    for fmt in _FORMATS:
        try:
            dt = datetime.strptime(s, fmt)
            return f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}"
        except ValueError:
            continue
    return None
