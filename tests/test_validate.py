"""Row-level validator (reference validators/schema.py:29-50 error list,
integrity.py:20-70 referential / range / format checks): null handling,
every rule kind, and the forced-exchange referential plan."""

import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.stages.validate import (
    Rule,
    integrity_report,
    referential_violations,
    validate_rows,
)


def _violations(ds, id_col, rules):
    df = validate_rows(ds, id_col, rules).to_pandas()
    return set(zip(df.row_id, df.rule))


def test_rule_kinds_and_nulls(ray_session):
    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["hello world", "  ", None, "ok", "toolongtext"]),
        "n": pa.array([11, 2, None, 2, 5], pa.int64()),
        "code": pa.array(["A1", "B22", None, "A9", "A5"]),
    })
    ds = rd.from_arrow(tbl)
    got = _violations(ds, "id", [
        Rule("null_text", "not_null", "text"),
        Rule("blank", "non_empty", "text"),
        Rule("len", "len_match", "text", col2="n"),
        Rule("rng", "range", "n", lo=2, hi=10),
        Rule("fmt", "regex", "code", pattern=r"^[A-Z][0-9]$"),
    ])
    assert got == {
        (3, "null_text"),
        (2, "blank"), (3, "blank"),          # null counts as blank
        (5, "len"),                           # null len / null n not flagged
        (1, "rng"),                           # nulls not flagged by range
        (2, "fmt"), (3, "fmt"),               # null fails format
    }


def test_validate_rows_clean_batch_empty_output(ray_session):
    ds = rd.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "v": pa.array([5, 6], pa.int64()),
    }))
    out = validate_rows(ds, "id", [Rule("rng", "range", "v", lo=0, hi=10)])
    assert out.count() == 0
    assert set(out.schema().names) == {"row_id", "rule"}


def test_referential_both_plans(ray_session):
    left = rd.from_arrow(pa.table({
        "eid": pa.array([10, 11, 12, 13], pa.int64()),
        "k": pa.array([1, 2, 9, None], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({"rk": pa.array([1, 2, 3], pa.int64())}))
    for limit in (5_000_000, 0):  # broadcast plan, then forced exchange plan
        df = referential_violations(left, "k", right, "rk", "ref",
                                    id_col="eid",
                                    broadcast_rows_limit=limit).to_pandas()
        assert set(df.row_id) == {12, 13}, f"limit={limit}"
        assert set(df.rule) == {"ref"}


def test_integrity_extended_columns(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 1, 2], pa.int64()),
        "text": pa.array(["abc", "abc", ""]),
        "lang": pa.array(["en", "xx", "en"]),
        "n_chars": pa.array([3, 3, 99], pa.int64()),
    }))
    rep = integrity_report(ds, allowed_langs=("en",), len_lo=1, len_hi=10)
    row = rep.to_pandas().iloc[0]
    assert row.n_rows == 3 and row.n_dup_ids == 1
    assert row.n_len_mismatch == 1 and row.n_empty == 1
    assert row.n_bad_lang == 1 and row.n_len_out_of_range == 1


def test_profile_columns_nulls_and_distinct(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.validate import profile_columns

    tbl = pa.table({
        "a": pa.array([1, 1, 2, None, None], pa.int64()),
        "b": pa.array(["x", "x", "x", "x", None], pa.string()),
    })
    got = (profile_columns(rd.from_arrow(tbl), ["a", "b"]).to_pandas()
           .sort_values("column").reset_index(drop=True))
    want = pd.DataFrame({
        "column": ["a", "b"],
        "n_rows": [5, 5],
        "n_null": [2, 1],
        "n_distinct": [2, 1],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
