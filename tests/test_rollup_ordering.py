"""Stable-ordering + per-turn text-equality invariants (north rule)."""

import pandas as pd
import pyarrow as pa

from epstein_pipeline_ray.oracle.refsem import ROLLUP_SEP, rollup_turns_pandas
from epstein_pipeline_ray.sources.synth import TURNS_SCHEMA, turns_table
from epstein_pipeline_ray.sources.turns import rollup_convs, stable_turns


def test_generator_schema_and_determinism():
    a = turns_table(30, seed=42)
    b = turns_table(30, seed=42)
    assert a.schema.equals(TURNS_SCHEMA)
    assert a.equals(b)
    # rows are shuffled: the physical order must NOT be (conv_id, turn_idx)
    df = a.to_pandas()
    assert not df["conv_id"].is_monotonic_increasing


def test_stable_turns_restores_order_and_preserves_text(ray_session, tiny_turns):
    import ray.data as rd

    ds = rd.from_arrow(tiny_turns)
    got = stable_turns(ds).to_pandas()
    want = (
        tiny_turns.to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    # per-turn text equality under stable (conv_id, turn_idx) ordering
    pd.testing.assert_series_equal(got["text"], want["text"])
    pd.testing.assert_series_equal(got["conv_id"], want["conv_id"])
    pd.testing.assert_series_equal(got["turn_idx"], want["turn_idx"])


def test_rollup_matches_pandas_twin_regardless_of_row_order(ray_session, tiny_turns):
    import ray.data as rd

    ds = rd.from_arrow(tiny_turns)
    got = rollup_convs(ds).to_pandas().sort_values("conv_id").reset_index(drop=True)
    want = rollup_turns_pandas(tiny_turns.to_pandas())
    assert list(got["conv_id"]) == list(want["conv_id"])
    assert list(got["text"]) == list(want["text"])
    # n_chars/n_turns consistency
    assert (got["n_chars"] == got["text"].str.len()).all()
    assert (got["n_turns"] == got["text"].str.count(ROLLUP_SEP) + 1).all()


def test_nested_roundtrip_preserves_turns(ray_session):
    """North-rule invariant through the nested representation: nest →
    explode reproduces every turn byte-identically under stable
    (conv_id, turn_idx) ordering."""
    from epstein_pipeline_ray.sources.derive import turns_from_documents
    from epstein_pipeline_ray.sources.turns import explode_turns, nest_turns

    turns = turns_from_documents("/root/testdata/sf0.001")
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    want = (turns.select_columns(cols).to_pandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))

    nested = nest_turns(turns)
    ndf = nested.to_pandas()
    assert (ndf.n_turns == ndf.segments.map(len)).all()
    # list elements arrive in stable turn order inside each conversation
    assert all(
        [s["turn_idx"] for s in row] == sorted(s["turn_idx"] for s in row)
        for row in ndf.segments
    )

    got = (explode_turns(nested).to_pandas()[cols]
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    want["ts"] = want["ts"].astype("datetime64[us]")
    got["ts"] = got["ts"].astype("datetime64[us]")
    import pandas as pd
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
