"""Layout-aware local-rollup fast path (sources.turns.rollup_convs_local):
must equal the classic exchange rollup on any physical layout — including
conversations straddling files and shuffled row order — and must refuse
non-bare-read inputs and adversarial (everything-straddles) layouts."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


def _write_corpus(tmp_path, file_convs, extras=None, seed=7):
    """file_convs: list of conv-id ranges, one per file; extras: list of
    (file_idx, conv_id, turn_idx, text) rows planted to straddle files."""
    rng = np.random.default_rng(seed)
    d = tmp_path / "corpus"
    d.mkdir()
    for i, convs in enumerate(file_convs):
        rows = [(f"c{c:04d}", t, f"body {c} {t} " + "x" * int(rng.integers(0, 20)))
                for c in convs for t in range(int(rng.integers(1, 6)))]
        rows += [(cid, ti, tx) for fi, cid, ti, tx in (extras or []) if fi == i]
        rng.shuffle(rows)
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "text": pa.array([r[2] for r in rows], pa.large_string()),
        })
        pq.write_table(tbl, str(d / f"p{i}.parquet"))
    return str(d)


def _rollup(path, fast, with_hash=True):
    from epstein_pipeline_ray.sources.turns import rollup_convs

    os.environ["EPR_ROLLUP_LOCAL"] = "1" if fast else "0"
    try:
        df = rollup_convs(rd.read_parquet(path), with_hash=with_hash).to_pandas()
    finally:
        os.environ.pop("EPR_ROLLUP_LOCAL", None)
    return df.sort_values("conv_id").reset_index(drop=True)


def test_local_rollup_matches_exchange_with_straddlers(ray_session, tmp_path):
    import pandas as pd

    extras = [
        # conv c9000 straddles files 0+1 with out-of-order turn indices,
        # c9001 straddles files 1+2
        (0, "c9000", 0, "strad zero t0"), (0, "c9000", 2, "strad zero t2"),
        (1, "c9000", 1, "strad zero t1"), (1, "c9001", 1, "strad one t1"),
        (2, "c9001", 0, "strad one t0"),
    ]
    path = _write_corpus(tmp_path, [range(0, 60), range(60, 120),
                                    range(120, 180)], extras)
    fast = _rollup(path, fast=True)
    classic = _rollup(path, fast=False)
    pd.testing.assert_frame_equal(fast, classic)
    row = fast[fast.conv_id == "c9000"].iloc[0]
    assert row["text"] == "strad zero t0\nstrad zero t1\nstrad zero t2"
    assert row["n_turns"] == 3


def test_local_rollup_engages_only_on_bare_reads(ray_session, tmp_path):
    from epstein_pipeline_ray.sources.turns import rollup_convs_local

    path = _write_corpus(tmp_path, [range(0, 40), range(40, 80)])
    assert rollup_convs_local(rd.read_parquet(path), with_hash=False) is not None
    # any upstream transform disqualifies (rows != file rows)
    filtered = rd.read_parquet(path).filter(lambda r: r["turn_idx"] > 0)
    assert rollup_convs_local(filtered, with_hash=False) is None
    # a read-level row filter disqualifies too
    import pyarrow.compute as pc

    fread = rd.read_parquet(path, filter=pc.field("turn_idx") > 0)
    assert rollup_convs_local(fread, with_hash=False) is None
    # non-file datasets disqualify
    tbl = pa.table({"conv_id": pa.array(["a"], pa.string()),
                    "turn_idx": pa.array([0], pa.int32()),
                    "text": pa.array(["t"], pa.large_string())})
    assert rollup_convs_local(rd.from_arrow(tbl), with_hash=False) is None


def test_local_rollup_bails_on_adversarial_layout(ray_session, tmp_path):
    """Round-robin layout: every conv straddles → the fast path must
    refuse (double read would cost more than the classic exchange) and
    the classic path must still produce the right answer."""
    import pandas as pd

    from epstein_pipeline_ray.sources.turns import rollup_convs_local

    rng = np.random.default_rng(3)
    rows = [(f"c{c:03d}", t, f"w {c} {t}") for c in range(50)
            for t in range(4)]
    rng.shuffle(rows)
    d = tmp_path / "rr"
    d.mkdir()
    for i in range(3):
        chunk = rows[i::3]
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in chunk], pa.string()),
            "turn_idx": pa.array([r[1] for r in chunk], pa.int32()),
            "text": pa.array([r[2] for r in chunk], pa.large_string()),
        })
        pq.write_table(tbl, str(d / f"p{i}.parquet"))
    assert rollup_convs_local(rd.read_parquet(str(d)), with_hash=False) is None
    fast = _rollup(str(d), fast=True)   # falls back internally
    classic = _rollup(str(d), fast=False)
    pd.testing.assert_frame_equal(fast, classic)
    assert (fast["n_turns"] == 4).all()
