#!/usr/bin/env python
"""Beyond-RAM-pressure validation (VERDICT r4 item 7): run the flagship
over a ~100M-turn (~22 GB parquet) corpus at 32 CPUs with a CAPPED
object store, and record throughput + spill counters — evidence that
the streaming executor + partitioned-file exchange hold when the
working set exceeds the store, with zero driver materialization.

Usage:
  python scripts/bench_big.py [--convs 14000000] [--store-gb 16]
Prints one JSON line. Generate the corpus first (sources/synth
.write_turns_parquet) — this script only reads it.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _spill_stats() -> dict:
    """Parse spill/restore counters out of Ray's memory summary."""
    try:
        from ray._private.internal_api import memory_summary

        txt = memory_summary(stats_only=True)
    except Exception as e:  # noqa: BLE001 - diagnostic only
        return {"memory_summary_error": str(e)[:200]}
    out = {}
    m = re.search(r"Spilled (\d+) MiB, (\d+) objects", txt)
    if m:
        out["spilled_mib"] = int(m.group(1))
        out["spilled_objects"] = int(m.group(2))
    m = re.search(r"Restored (\d+) MiB, (\d+) objects", txt)
    if m:
        out["restored_mib"] = int(m.group(1))
        out["restored_objects"] = int(m.group(2))
    m = re.search(r"Plasma memory usage (\d+) MiB", txt)
    if m:
        out["plasma_now_mib"] = int(m.group(1))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=14_000_000)
    ap.add_argument("--store-gb", type=float, default=16.0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--fs-threshold", type=float, default=0.95)
    ap.add_argument("--sig-broadcast-limit", type=int, default=None,
                    help="override DedupConfig.broadcast_sig_rows_limit. "
                         "On ONE node the broadcast confirm plan is "
                         "correct far beyond the multi-node default: "
                         "plasma holds a single zero-copy sig matrix, "
                         "where the beyond-broadcast plan would ship "
                         "bands x the sig corpus (~310 GB here) through "
                         "the exchange — a trade that pays only when a "
                         "CLUSTER's aggregate shard storage absorbs it "
                         "(validated separately at 17.2M turns).")
    ap.add_argument("--checkpoints", action="store_true",
                    help="write per-stage parquet checkpoints (the "
                         "100-TB posture: stage outputs live on "
                         "persistent storage, the object store holds "
                         "only in-flight blocks — required once "
                         "conv_docs alone outgrows the store)")
    args = ap.parse_args()
    path = f"/tmp/epr_big/turns_{args.convs}_42"
    if not os.path.exists(os.path.join(path, "_DONE")):
        print(json.dumps({"error": f"corpus missing: {path}"}))
        return 1

    import ray

    # NOTE this sandbox's root fs is thin-provisioned: statvfs reports
    # 252 GB capacity but only ~93 GB is real, so Ray's 95%-of-nominal
    # spill guard fires with ~40 GB of ACTUAL free space left — that
    # (corpus + spill <= real free space) bounds the corpus size this
    # sandbox can run, not the engine. --fs-threshold raises the guard
    # at the operator's risk (0.97 was measured to wedge the sandbox at
    # 4 GB true free).
    ray.init(address="local", num_cpus=args.cpus,
             object_store_memory=int(args.store_gb * (1 << 30)),
             include_dashboard=False, logging_level="ERROR",
             _system_config={
                 "local_fs_capacity_threshold": args.fs_threshold})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from epstein_pipeline_ray.config import DedupConfig, RunConfig
    from epstein_pipeline_ray.pipelines.dedup import dedup_turns

    import shutil

    shutil.rmtree("/dev/shm/epr_exchange", ignore_errors=True)
    run_cfg = None
    if args.checkpoints:
        run_dir = "/tmp/epr_big/run"
        shutil.rmtree(run_dir, ignore_errors=True)
        run_cfg = RunConfig(run_dir=run_dir, resume=False,
                            write_checkpoints=True)
    corpus_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet"))
    turns = rd.read_parquet(path)
    n_turns = turns.count()  # metadata-only

    t0 = time.time()
    cfg = DedupConfig()
    if args.sig_broadcast_limit is not None:
        cfg = DedupConfig(broadcast_sig_rows_limit=args.sig_broadcast_limit)
    res = dedup_turns(rd.read_parquet(path), cfg, run_cfg,
                      minhash_on_reps=True)
    n_pairs = res.pairs.count()
    n_clustered = res.clusters.count()
    elapsed = time.time() - t0

    out = {
        "bench": "beyond_ram_pressure",
        "turns": n_turns,
        "corpus_gb": round(corpus_bytes / (1 << 30), 2),
        "object_store_gb": args.store_gb,
        "num_cpus": args.cpus,
        "wall_sec": round(elapsed, 1),
        "turns_per_sec": round(n_turns / elapsed, 1),
        "pairs": n_pairs,
        "clustered_convs": n_clustered,
        "checkpoints": bool(args.checkpoints),
    }
    out.update(_spill_stats())
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
