"""M13 typed entity extractors + M12 heuristic OCR confidence: edge-case
semantics the testdata fixtures can't trigger (the sf oracles in
test_queries cover the happy path end-to-end)."""

import math
import re

import numpy as np
import pyarrow as pa
import pytest

from epstein_pipeline_ray.functions.textstats import heuristic_confidence
from epstein_pipeline_ray.stages.textops import ENTITY_PATTERNS, extract_entities_typed


# --- typed extractors ------------------------------------------------------

CASES = {
    "PHONE": [
        # \b precedes \(? so the paren (non-word char after a space) is
        # outside the match — the reference extracts "212) 555-0173"
        ("call (212) 555-0173 now", ["212) 555-0173"]),
        # likewise '+' sits before the \b: the extracted value starts at 1
        ("+1 212.555.0173", ["1 212.555.0173"]),
        ("id 123456789012 has no 3-3-4 split ending on a boundary", []),
    ],
    "EMAIL_ADDR": [
        ("mail a.b_c%d+e@sub.domain.org.", ["a.b_c%d+e@sub.domain.org"]),
        ("not-an-email @ nowhere", []),
    ],
    "ACCOUNT": [
        ("Account #: 12345 and acct 9876", ["Account #: 12345", "acct 9876"]),
        ("a/c 4521", ["a/c 4521"]),
        ("account 123", []),  # needs 4+ digits
    ],
    "CASE_NUMBER": [
        # (?i) applies INSIDE the [\d\-A-Z:/ ] class too, so trailing
        # lowercase words are consumed up to the {3,20} cap — reference
        # re.IGNORECASE behavior, mirrored by RE2 for the oracle
        ("see Docket # 04-CV-1234: filed", ["Docket # 04-CV-1234: filed"]),
        ("Case 22", []),  # tail class needs 3-20 more chars
    ],
    "FLIGHT_ID": [
        ("tail N908JE and Flight # 123", ["N908JE", "Flight # 123"]),
    ],
    "FINANCIAL_AMOUNT": [
        ("$1,250.00 then 300 dollars and $ 75", ["$1,250.00", "300 dollars", "$ 75"]),
    ],
    "BATES": [
        ("range EFTA00039025-EFTA00039030 cited", ["EFTA00039025", "EFTA00039030"]),
        ("lowercase efta00039025 ignored", []),
    ],
    "ADDRESS": [
        ("at 9 East Hill Road, NY", ["9 East Hill Road"]),
        ("10 downtown street", []),  # lowercase words don't block-match
    ],
}


@pytest.mark.parametrize("etype", sorted(CASES))
def test_pattern_semantics(etype):
    rx = re.compile(ENTITY_PATTERNS[etype])
    for text, want in CASES[etype]:
        assert rx.findall(text) == want, (etype, text)


def test_extract_entities_typed_stage(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 1, "text": CASES["PHONE"][0][0] + " " + CASES["BATES"][0][0]},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": None},
        # a value hit by two types is emitted under both (reference runs
        # each pattern independently): "Flight # 123" + trailing number
        {"doc_id": 4, "text": "Account # 55555 on Flight # 55555"},
    ]
    out = extract_entities_typed(rd.from_items(rows)).to_pandas()
    got = {(r.doc_id, r.entity_type, r.value) for r in out.itertuples()}
    assert (1, "PHONE", "212) 555-0173") in got
    assert (1, "BATES", "EFTA00039025") in got
    assert (1, "BATES", "EFTA00039030") in got
    assert (4, "ACCOUNT", "Account # 55555") in got
    assert (4, "FLIGHT_ID", "Flight # 55555") in got
    assert not any(r[0] in (2, 3) for r in got)


def test_patterns_have_no_capture_groups():
    # findall must return whole matches for oracle multiset parity
    for name, pat in ENTITY_PATTERNS.items():
        assert re.compile(pat).groups == 0, name


# --- heuristic confidence (reference ocr.py:80-118 semantics) --------------


def _reference_confidence(text):
    """Straight port of the reference formula for differential testing."""
    import string

    if not text or not text.strip():
        return 0.0
    printable = set(string.printable)
    printable_ratio = sum(1 for c in text if c in printable) / len(text)
    words = text.split()
    if not words:
        return 0.0
    avg = sum(len(w) for w in words) / len(words)
    wls = 1.0
    if avg < 2.0:
        wls = avg / 2.0
    elif avg > 12.0:
        wls = max(0.3, 1.0 - (avg - 12.0) / 20.0)
    stop = {"the", "and", "of", "to", "in", "a", "is", "that", "for", "it"}
    lower = {w.lower().strip(string.punctuation) for w in words}
    ss = min(1.0, len(stop & lower) / 3.0)
    return min(1.0, max(0.0, 0.40 * printable_ratio + 0.30 * wls + 0.30 * ss))


@pytest.mark.parametrize(
    "text",
    [
        "",
        "   \t\n",
        "The quick brown fox and the lazy dog, that is it.",
        "a b c d e",  # avg word len 1 → ramp below 2
        "pneumonoultramicroscopicsilicovolcanoconiosis antidisestablishmentarianism",
        "x" * 50 + " of the and",
        "binary\x00garbage\x01here and the of it",
        "The, and. of! to? in;",  # punctuation-stripped stopwords
        "word " * 200,
    ],
)
def test_confidence_matches_reference(text):
    got = heuristic_confidence([text])[0]
    want = _reference_confidence(text)
    # engine rounds half-away (oracle convention); reference uses Python
    # round — identical except exact .00005 ties, impossible here
    assert math.isclose(got, round(want, 4), abs_tol=5e-5)


def test_confidence_vector_shape():
    out = heuristic_confidence(["the and of", "", "zz"])
    assert isinstance(out, np.ndarray) and out.shape == (3,)
    assert out[1] == 0.0
    assert 0.0 <= out.min() and out.max() <= 1.0
