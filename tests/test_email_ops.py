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
