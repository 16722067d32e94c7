"""OCR/scrape noise cleaner (reference M9:
src/epstein_pipeline/processors/chunker.py:26-29,381-388).

Order and semantics match the reference's ``_clean_ocr_noise`` exactly:

1. strip control chars (NUL..BS, VT, FF, SO..US — keeps \\t \\n \\r)
2. squash runs of 11+ identical chars to 3
3. delete decorative rules (10+ of ``| _ = -``)
4. collapse 5+ spaces/tabs to two spaces
5. collapse 3+ newlines to a paragraph break
6. strip

The repeated-char squash needs a backreference, which re2 (pyarrow /
DuckDB regex) cannot express — so this runs as compiled Python ``re`` per
row inside ``map_batches``; patterns compile once per worker at import.
"""

from __future__ import annotations

import re

_CONTROL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
_RUNS = re.compile(r"(.)\1{10,}")
_RULES = re.compile(r"[|_=\-]{10,}")
_WIDE_WS = re.compile(r"[ \t]{5,}")
_MANY_NL = re.compile(r"\n{3,}")


def clean_ocr_noise(text: str) -> str:
    text = _CONTROL.sub("", text)
    text = _RUNS.sub(r"\1\1\1", text)
    text = _RULES.sub("", text)
    text = _WIDE_WS.sub("  ", text)
    text = _MANY_NL.sub("\n\n", text)
    return text.strip()
