"""CDC changelog merge (stages/cdc.py): last-write-wins, delete drops,
snapshot-only keys survive, change beats snapshot at equal version."""

import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.stages.cdc import apply_changelog


def _snap():
    return rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
    }))


def _chg(rows):
    return rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "version": pa.array([r[1] for r in rows], pa.int64()),
        "op": pa.array([r[2] for r in rows], pa.string()),
        "v": pa.array([r[3] for r in rows], pa.float64()),
    }))


def test_apply_changelog_semantics(ray_session):
    changes = _chg([
        (1, 1, "upsert", 11.0),   # update k=1
        (1, 2, "upsert", 12.0),   # later update wins
        (2, 5, "delete", 0.0),    # delete k=2
        (5, 1, "upsert", 50.0),   # brand-new key
        (3, 1, "delete", 0.0),    # delete then re-insert at higher version
        (3, 2, "upsert", 33.0),
    ])
    got = (apply_changelog(_snap(), changes, "k", ["v"]).to_pandas()
           .set_index("k").sort_index())
    assert got.index.tolist() == [1, 3, 4, 5]
    assert got.loc[1, "v"] == 12.0 and got.loc[1, "version"] == 2
    assert got.loc[3, "v"] == 33.0
    assert got.loc[4, "v"] == 40.0 and got.loc[4, "version"] == 0
    assert got.loc[5, "v"] == 50.0


def test_change_beats_snapshot_at_equal_version(ray_session):
    # version 0 change row still beats the version-0 snapshot (src order)
    changes = _chg([(1, 0, "upsert", 99.0)])
    got = (apply_changelog(_snap(), changes, "k", ["v"]).to_pandas()
           .set_index("k"))
    assert got.loc[1, "v"] == 99.0


def test_field_diff_hand(ray_session):
    import ray.data as rd

    from epstein_pipeline_ray.stages.cdc import field_diff

    old = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "a": pa.array(["x", "y", None, "z"], pa.string()),
        "b": pa.array([1.0, 2.0, 3.0, None], pa.float64()),
    }))
    new = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 5], pa.int64()),
        "a": pa.array(["x", "Y", "w", "q"], pa.string()),
        "b": pa.array([1.0, 2.0, None, 9.0], pa.float64()),
    }))
    out = field_diff(old, new, "k", ["a", "b"]).to_pandas()
    rows = {(r.k, r.col): (r.old_value, r.new_value)
            for r in out.itertuples()}
    # k=1 unchanged; k=4/5 one-sided (out of scope); k=2 a changed;
    # k=3 NULL→value and value→NULL both report
    assert set(rows) == {(2, "a"), (3, "a"), (3, "b")}
    assert rows[(2, "a")] == ("y", "Y")
    assert rows[(3, "a")] == ("", "w")
    assert rows[(3, "b")] == ("3.0", "")
