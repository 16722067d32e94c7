"""Checkpoint/lineage resume semantics (north rule: a killed run resumes
from the last complete stage)."""

import json
import os
import shutil

import pyarrow as pa
import pytest

from epstein_pipeline_ray.config import DedupConfig, RunConfig
from epstein_pipeline_ray.pipelines.dedup import dedup_turns
from epstein_pipeline_ray.state.lineage import read_manifest, run_stage, stage_is_complete


def test_run_stage_skips_complete_stage(ray_session, tmp_path):
    import ray.data as rd

    calls = {"n": 0}

    def builder():
        calls["n"] += 1
        return rd.range(10)

    run_dir = str(tmp_path)
    ds1 = run_stage("s1", run_dir, "fp-a", builder)
    assert calls["n"] == 1 and ds1.count() == 10
    m = read_manifest(run_dir, "s1")
    assert m["rows"] == 10 and m["complete"] and m["partitions"]

    # same fingerprint → resume, builder NOT called again
    ds2 = run_stage("s1", run_dir, "fp-a", builder)
    assert calls["n"] == 1 and ds2.count() == 10

    # changed fingerprint (config/input changed) → invalidated, rebuilt
    run_stage("s1", run_dir, "fp-b", builder)
    assert calls["n"] == 2


def test_killed_run_resumes_from_last_complete_stage(ray_session, tmp_path, tiny_turns):
    import pyarrow.parquet as pq
    import ray.data as rd

    cfg = DedupConfig()
    run_dir = str(tmp_path / "run")
    run = RunConfig(run_dir=run_dir, resume=True, write_checkpoints=True)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pq.write_table(tiny_turns, str(in_dir / "turns.parquet"))

    res1 = dedup_turns(rd.read_parquet(str(in_dir)), cfg, run)
    want_pairs = res1.pairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    want_clusters = (
        res1.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    conv_manifest1 = read_manifest(run_dir, "conv_docs")

    # simulate a crash after the minhash stage: later stages' checkpoints lost
    for stage in ("pairs", "clusters"):
        shutil.rmtree(os.path.join(run_dir, stage), ignore_errors=True)
        mp = os.path.join(run_dir, f"{stage}._manifest.json")
        if os.path.exists(mp):
            os.remove(mp)

    # same input, same config → early stages resumed (manifest untouched),
    # result identical
    res2 = dedup_turns(rd.read_parquet(str(in_dir)), cfg, run)
    got_pairs = res2.pairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    got_clusters = (
        res2.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    assert got_pairs.equals(want_pairs)
    assert got_clusters.equals(want_clusters)
    assert read_manifest(run_dir, "conv_docs") == conv_manifest1

    # metrics sidecar exists
    with open(os.path.join(run_dir, "metrics.json")) as f:
        json.load(f)


def test_changed_input_invalidates_checkpoints(ray_session, tmp_path, tiny_turns):
    """ADVICE r1: the fingerprint must capture input identity — a resumed
    run over DIFFERENT input must not silently reuse stale checkpoints."""
    import pyarrow.parquet as pq
    import ray.data as rd

    cfg = DedupConfig()
    run_dir = str(tmp_path / "run")
    run = RunConfig(run_dir=run_dir, resume=True, write_checkpoints=True)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pq.write_table(tiny_turns, str(in_dir / "turns.parquet"))

    res1 = dedup_turns(rd.read_parquet(str(in_dir)), cfg, run)
    n_docs1 = res1.docs.count()

    # rewrite the input with half the conversations → must recompute
    half_ids = sorted(set(tiny_turns["conv_id"].to_pylist()))[:2]
    import pyarrow.compute as pc

    half = tiny_turns.filter(pc.is_in(tiny_turns["conv_id"], pa.array(half_ids)))
    pq.write_table(half, str(in_dir / "turns.parquet"))

    res2 = dedup_turns(rd.read_parquet(str(in_dir)), cfg, run)
    assert res2.docs.count() == 2 != n_docs1


def test_mode_flags_invalidate_checkpoints(ray_session, tmp_path, tiny_turns):
    """Toggling minhash_on_reps relative to the prior run must not reuse
    the prior run's pair checkpoints (it changes the physical plan)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    cfg = DedupConfig()
    run_dir = str(tmp_path / "run")
    run = RunConfig(run_dir=run_dir, resume=True, write_checkpoints=True)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pq.write_table(tiny_turns, str(in_dir / "turns.parquet"))

    dedup_turns(rd.read_parquet(str(in_dir)), cfg, run)
    m1 = read_manifest(run_dir, "pairs_minhash_raw")
    dedup_turns(rd.read_parquet(str(in_dir)), cfg, run, minhash_on_reps=True)
    m2 = read_manifest(run_dir, "pairs_minhash_raw")
    assert m1["fingerprint"] != m2["fingerprint"]


def test_manifest_missing_partition_invalidates(tmp_path, ray_session):
    import ray.data as rd

    run_dir = str(tmp_path)
    run_stage("s2", run_dir, "fp", lambda: rd.range(5))
    m = read_manifest(run_dir, "s2")
    os.remove(os.path.join(run_dir, "s2", m["partitions"][0]["file"]))
    assert not stage_is_complete(run_dir, "s2", "fp")
