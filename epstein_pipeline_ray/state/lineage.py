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


def input_fingerprint(ds: Dataset) -> str:
    """Cheap input-identity digest for checkpoint invalidation.

    File-backed datasets: sorted (path, size, mtime_ns) of every input
    file — a rewritten/added file invalidates downstream checkpoints.
    In-memory datasets (``from_arrow``/``from_items``): row count + schema
    as a proxy (already materialized, so both are metadata-cheap). We never
    call ``count()`` on a file-backed lazy dataset — that could execute the
    pipeline just to fingerprint it.
    """
    import hashlib

    h = hashlib.sha256()
    try:
        files = list(ds.input_files() or [])
    except Exception:
        files = []
    if files:
        for f in sorted(files):
            try:
                st = os.stat(f)
                h.update(f"{f}:{st.st_size}:{st.st_mtime_ns};".encode())
            except OSError:
                h.update(f"{f}:?;".encode())
    else:
        try:
            h.update(str(ds.schema()).encode())
            h.update(str(ds.count()).encode())
        except Exception:
            h.update(b"opaque-input")
    return h.hexdigest()[:16]


class FingerprintChain:
    """Per-stage fingerprints chained in execution order: each stage's
    fingerprint folds in every upstream stage's, so invalidating any stage
    (config, input, or mode change) invalidates everything after it."""

    def __init__(self, base: str):
        import hashlib

        self._hashlib = hashlib
        self.cur = base

    def next(self, stage: str) -> str:
        self.cur = self._hashlib.sha256(
            f"{self.cur}|{stage}".encode()
        ).hexdigest()[:16]
        return self.cur


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
        return _read_stage(stage_dir)

    tmp_dir = stage_dir + ".tmp"
    for d in (tmp_dir, stage_dir):
        if os.path.exists(d):
            shutil.rmtree(d)
    mp = _manifest_path(run_dir, stage)
    if os.path.exists(mp):
        os.remove(mp)

    t0 = time.time()
    ds = builder()
    # pre-create: an empty Dataset writes no files and would otherwise
    # leave no directory to rename
    os.makedirs(tmp_dir, exist_ok=True)
    ds.write_parquet(tmp_dir)
    if not any(n.endswith(".parquet") for n in os.listdir(tmp_dir)):
        # empty stage output: persist an explicit empty file so the
        # checkpoint round-trips with its schema intact
        import pyarrow as pa

        sch = ds.schema()
        if sch is not None:
            pa_schema = getattr(sch, "base_schema", None)
            if not isinstance(pa_schema, pa.Schema):
                pa_schema = pa.schema(list(zip(sch.names, sch.types)))
            pq.write_table(pa_schema.empty_table(), os.path.join(tmp_dir, "empty.parquet"))
        # schema-less empty output (e.g. every exchange block dropped):
        # leave the directory empty; resume returns an empty dataset
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
    return _read_stage(stage_dir)


def _read_stage(stage_dir: str) -> Dataset:
    if any(n.endswith(".parquet") for n in os.listdir(stage_dir)):
        return rd.read_parquet(stage_dir)
    return rd.from_items([])


def read_manifest(run_dir: str, stage: str) -> dict | None:
    mp = _manifest_path(run_dir, stage)
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        return json.load(f)
