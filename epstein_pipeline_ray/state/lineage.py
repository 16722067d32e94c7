"""Per-stage Parquet checkpoints with lineage manifests.

Replaces the reference's two resume mechanisms — output-file-existence
keyed by content hash (reference: src/epstein_pipeline/processors/ocr.py:917-931)
and the SQLite ``(file_hash, stage)`` marker table
(reference: src/epstein_pipeline/state.py:34-128) — with what "resumable
from checkpoint" means for a distributed batch pipeline (north rule):

- every stage writes its output Dataset to ``<run_dir>/<stage>/`` via an
  atomic tmp-dir + rename,
- a manifest JSON next to the directory records the stage name, the
  config+input fingerprint, one entry per output partition file
  (path, rows, bytes), wall time, and counters,
- a re-run with ``resume=True`` and matching fingerprints skips the stage
  and reads the checkpoint; a changed config/input fingerprint
  invalidates the checkpoint and every stage after it.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

import pyarrow.parquet as pq
import ray.data as rd
from ray.data import Dataset


def _manifest_path(run_dir: str, stage: str) -> str:
    return os.path.join(run_dir, f"{stage}._manifest.json")


def stage_is_complete(run_dir: str, stage: str, fingerprint: str) -> bool:
    mp = _manifest_path(run_dir, stage)
    if not os.path.exists(mp):
        return False
    try:
        with open(mp) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    if m.get("fingerprint") != fingerprint or m.get("complete") is not True:
        return False
    # every recorded partition must still exist
    stage_dir = os.path.join(run_dir, stage)
    return all(os.path.exists(os.path.join(stage_dir, p["file"])) for p in m.get("partitions", []))


def run_stage(
    stage: str,
    run_dir: str,
    fingerprint: str,
    builder: Callable[[], Dataset],
    resume: bool = True,
) -> Dataset:
    """Execute (or resume) one checkpointed stage and return its Dataset.

    ``builder`` constructs the lazy Dataset; executing it happens via
    ``write_parquet`` into a temp dir which is atomically renamed into
    place before the manifest is written — a killed run leaves either no
    checkpoint or a complete one, never a partial directory with a
    manifest.
    """
    os.makedirs(run_dir, exist_ok=True)
    stage_dir = os.path.join(run_dir, stage)
    if resume and stage_is_complete(run_dir, stage, fingerprint):
        return rd.read_parquet(stage_dir)

    tmp_dir = stage_dir + ".tmp"
    for d in (tmp_dir, stage_dir):
        if os.path.exists(d):
            shutil.rmtree(d)
    mp = _manifest_path(run_dir, stage)
    if os.path.exists(mp):
        os.remove(mp)

    t0 = time.time()
    ds = builder()
    ds.write_parquet(tmp_dir)
    os.rename(tmp_dir, stage_dir)

    partitions = []
    total_rows = 0
    for name in sorted(os.listdir(stage_dir)):
        if not name.endswith(".parquet"):
            continue
        meta = pq.read_metadata(os.path.join(stage_dir, name))
        partitions.append({"file": name, "rows": meta.num_rows,
                           "bytes": os.path.getsize(os.path.join(stage_dir, name))})
        total_rows += meta.num_rows
    manifest = {
        "stage": stage,
        "fingerprint": fingerprint,
        "complete": True,
        "rows": total_rows,
        "partitions": partitions,
        "wall_sec": round(time.time() - t0, 3),
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(mp + ".tmp", "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(mp + ".tmp", mp)
    return rd.read_parquet(stage_dir)


def read_manifest(run_dir: str, stage: str) -> dict | None:
    mp = _manifest_path(run_dir, stage)
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        return json.load(f)
