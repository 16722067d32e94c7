"""Checkpoint/lineage resume semantics (north rule: a killed run resumes
from the last complete stage)."""

import json
import os
import shutil

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
    import ray.data as rd

    cfg = DedupConfig()
    run_dir = str(tmp_path / "run")
    run = RunConfig(run_dir=run_dir, resume=True, write_checkpoints=True)

    res1 = dedup_turns(rd.from_arrow(tiny_turns), cfg, run)
    want_pairs = res1.pairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    want_clusters = (
        res1.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    )

    # simulate a crash after the minhash stage: later stages' checkpoints lost
    for stage in ("pairs", "clusters"):
        shutil.rmtree(os.path.join(run_dir, stage), ignore_errors=True)
        mp = os.path.join(run_dir, f"{stage}._manifest.json")
        if os.path.exists(mp):
            os.remove(mp)
    assert stage_is_complete(run_dir, "conv_docs", cfg.fingerprint())
    assert stage_is_complete(run_dir, "pairs_minhash_raw", cfg.fingerprint())

    # poison-pill check that early stages are NOT recomputed: corrupt the
    # raw input; a resume that re-read it would differ
    res2 = dedup_turns(rd.from_arrow(tiny_turns.slice(0, 0)), cfg, run)
    got_pairs = res2.pairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    got_clusters = (
        res2.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    assert got_pairs.equals(want_pairs)
    assert got_clusters.equals(want_clusters)

    # metrics sidecar exists
    with open(os.path.join(run_dir, "metrics.json")) as f:
        json.load(f)


def test_manifest_missing_partition_invalidates(tmp_path, ray_session):
    import ray.data as rd

    run_dir = str(tmp_path)
    run_stage("s2", run_dir, "fp", lambda: rd.range(5))
    m = read_manifest(run_dir, "s2")
    os.remove(os.path.join(run_dir, "s2", m["partitions"][0]["file"]))
    assert not stage_is_complete(run_dir, "s2", "fp")
