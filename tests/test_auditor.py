"""Person-audit duplicate scan (stages/auditor.py) vs a naive scalar
re-implementation of the reference's _phase_dedup
(person_auditor.py:257-303): name fuzzy >= threshold OR alias
cross-match, confidence always the name-pair similarity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.functions.fuzzy import ratio
from epstein_pipeline_ray.functions.rounding import sql_round
from epstein_pipeline_ray.stages.auditor import person_audit_pairs

PERSONS = [
    (1, "Jeffrey Edwards", ["Teflon Don"]),
    (2, "Jefrey Edwards", []),                 # name-tier with 1
    (3, "Virginia Roberts", ["Virginia Giuffre"]),
    (4, "Virginia Giuffre", []),               # alias-tier with 3
    (5, "Alan Dershowitz", None),
    (6, "Totally Unrelated Person", []),
    (7, "teflon don", []),                     # alias-tier with 1 (alias exact)
]


def _persons_ds():
    offs = [0]
    flat = []
    for _, _, al in PERSONS:
        flat.extend(al or [])
        offs.append(len(flat))
    tbl = pa.table({
        "person_id": pa.array([p[0] for p in PERSONS], pa.int64()),
        "name": pa.array([p[1] for p in PERSONS], pa.string()),
        "aliases": pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                            pa.array(flat, pa.string())),
    })
    return rd.from_arrow(tbl)


def _naive(threshold, metric):
    def r(a, b):
        a, b = a.lower(), b.lower()
        if metric == "indel":
            return ratio(a, b)
        import Levenshtein  # not available — compute via DP below
        raise AssertionError

    def lev(a, b):
        a, b = a.lower(), b.lower()
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(la):
            cur = [i + 1] + [0] * lb
            for j in range(lb):
                cur[j + 1] = min(prev[j + 1] + 1, cur[j] + 1,
                                 prev[j] + (a[i] != b[j]))
            prev = cur
        return 1.0 - prev[lb] / max(la, lb, 1)

    sim = (lambda a, b: ratio(a.lower(), b.lower())) if metric == "indel" else lev
    out = []
    for i in range(len(PERSONS)):
        for j in range(i + 1, len(PERSONS)):
            p1, p2 = PERSONS[i], PERSONS[j]
            ns = sim(p1[1], p2[1])
            via = None
            if ns >= threshold:
                via = "name"
            else:
                for a in (p1[2] or []):
                    if sim(a, p2[1]) >= threshold:
                        via = "alias"
                        break
                if via is None:
                    for a in (p2[2] or []):
                        if sim(p1[1], a) >= threshold:
                            via = "alias"
                            break
            if via:
                ia, ib = sorted((p1[0], p2[0]))
                out.append((ia, ib, float(sql_round(ns, 6)), via))
    return (pd.DataFrame(out, columns=["id_a", "id_b", "confidence", "matched_via"])
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def _run(metric, threshold=0.85):
    return (person_audit_pairs(_persons_ds(), threshold=threshold, metric=metric)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))


def test_indel_matches_reference_semantics(ray_session):
    got = _run("indel")
    want = _naive(0.85, "indel")
    pd.testing.assert_frame_equal(got, want)
    by = {(r.id_a, r.id_b): r.matched_via for r in got.itertuples()}
    assert by[(1, 2)] == "name"
    assert by[(3, 4)] == "alias"
    assert by[(1, 7)] == "alias"
    assert not any(6 in k for k in by)


def test_levenshtein_metric_matches_naive(ray_session):
    got = _run("levenshtein")
    want = _naive(0.85, "levenshtein")
    pd.testing.assert_frame_equal(got, want)


def test_alias_confidence_is_name_similarity(ray_session):
    # reference reports name_sim even for alias-matched pairs
    got = _run("indel")
    row = got[(got.id_a == 3) & (got.id_b == 4)].iloc[0]
    assert row.matched_via == "alias"
    assert abs(row.confidence
               - float(sql_round(ratio("virginia roberts", "virginia giuffre"), 6))) < 1e-9
