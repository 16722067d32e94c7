"""Email nested-struct operators: explode ↔ nest round trip, null
senders, null contact emails, empty cc lists (VERDICT r2 item 7)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.stages.email_ops import (
    CONTACT_STRUCT,
    explode_participants,
    nest_participants,
    synth_email_table,
)


def test_explode_counts_and_roles(ray_session):
    emails = synth_email_table(70)
    out = explode_participants(rd.from_arrow(emails)).to_pandas()
    df = emails.to_pandas()
    want_from = df["from"].notna().sum()
    want_to = df["to"].map(len).sum()
    want_cc = df["cc"].map(len).sum()
    got = out.groupby("role").size()
    assert got.get("from", 0) == want_from
    assert got.get("to", 0) == want_to
    assert got.get("cc", 0) == want_cc
    # positions are dense per (email, role)
    mx = out.groupby(["email_id", "role"])["pos"].agg(["min", "max", "size"])
    assert (mx["min"] == 0).all()
    assert (mx["max"] == mx["size"] - 1).all()
    # null contact email survives as null
    assert out[out.email_id == "e-00005"].query("role == 'from'").email.isna().all()
    # null sender emitted no from-row
    assert "from" not in set(out[out.email_id == "e-00007"].role)


def test_explode_nest_roundtrip(ray_session):
    emails = synth_email_table(50)
    parts = explode_participants(rd.from_arrow(emails))
    back = nest_participants(parts).to_pandas().sort_values("email_id").reset_index(drop=True)
    orig = emails.to_pandas().sort_values("email_id").reset_index(drop=True)
    assert list(back.email_id) == list(orig.email_id)
    for col in ("from", "to", "cc"):
        for b, o in zip(back[col], orig[col]):
            if col == "from":
                assert (b is None or (isinstance(b, float) and pd.isna(b))) == (
                    o is None or (isinstance(o, float) and pd.isna(o))) or b == o
                if isinstance(o, dict):
                    assert dict(b) == o
            else:
                assert [dict(x) for x in b] == [dict(x) for x in o]


def test_explode_empty_and_all_null(ray_session):
    tbl = pa.table({
        "email_id": pa.array(["e-1"], pa.string()),
        "subject": pa.array(["s"], pa.string()),
        "from": pa.array([None], CONTACT_STRUCT),
        "to": pa.array([[]], pa.list_(CONTACT_STRUCT)),
        "cc": pa.array([None], pa.list_(CONTACT_STRUCT)),
        "date": pa.array(["2001-01-01"], pa.string()),
        "body": pa.array(["b"], pa.large_string()),
        "folder": pa.array([None], pa.string()),
    })
    out = explode_participants(rd.from_arrow(tbl)).to_pandas()
    assert len(out) == 0


def test_hoc_to_emails_bridge(ray_session):
    """HOC raw-string email fields → typed nested contacts: name<addr>
    parsing, bare addresses, semicolon/comma recipient splits, non-email
    docs dropped."""
    from epstein_pipeline_ray.stages.email_ops import hoc_to_emails

    tbl = pa.table({
        "doc_id": pa.array(["d-1", "d-2", "d-3", "d-4"], pa.string()),
        "email_from": pa.array(
            ['"Alice A" <alice@x.com>', "bob@y.org", "", None], pa.string()),
        "email_to": pa.array(
            ["Carol <c@z.net>; dave@z.net, Eve", "", "", ""], pa.string()),
        "email_subject": pa.array(["Lunch", "", "x", None], pa.string()),
    })
    out = hoc_to_emails(rd.from_arrow(tbl)).to_pandas().set_index("email_id")
    assert sorted(out.index) == ["d-1", "d-2"]  # d-3/d-4 have no email fields
    f1 = dict(out.loc["d-1", "from"])
    assert f1 == {"name": "Alice A", "email": "alice@x.com", "person_slug": None}
    to1 = [dict(x) for x in out.loc["d-1", "to"]]
    assert to1 == [
        {"name": "Carol", "email": "c@z.net", "person_slug": None},
        {"name": "dave@z.net", "email": "dave@z.net", "person_slug": None},
        {"name": "Eve", "email": None, "person_slug": None},
    ]
    assert dict(out.loc["d-2", "from"])["email"] == "bob@y.org"
    assert out.loc["d-2", "to"].tolist() == []
    # bridges into the explode operator
    parts = explode_participants(
        hoc_to_emails(rd.from_arrow(tbl))).to_pandas()
    assert len(parts) == 5  # 2 senders + 3 recipients
