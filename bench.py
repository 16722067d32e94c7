#!/usr/bin/env python
"""Benchmark harness.

Headline: flagship transcript dedup (rollup → exact + MinHash/LSH →
union-find clusters) over a deterministic synthetic turn corpus sized to
the sf under test. Prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "turns": T, "turns_per_sec": R}

``--scaling`` runs the headline twice in fresh processes at num_cpus=8
and num_cpus=32 on the SAME input and reports both throughputs plus the
scaling efficiency (the sandbox proxy for the north rule's N vs 4N
cluster-size criterion — see BASELINE.md).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# corpus size scales with the sf tables: sf0.1 → 30k convs (~220k turns)
_SF_CONVS = {"sf0.001": 1000, "sf0.01": 4000, "sf0.1": 120000}
N_CONVS = int(
    os.environ.get("EPR_BENCH_CONVS", _SF_CONVS.get(os.path.basename(SF_DIR.rstrip("/")), 30000))
)
SEED = 42


def _corpus_path() -> str:
    return f"/tmp/epr_bench/turns_{N_CONVS}_{SEED}"


def _probe_worker(q, secs: float) -> None:
    """One pure-compute probe process: tight vectorized LCG over an
    L2-resident 1 MB buffer (so the probe measures CPU cycles, not shared
    memory bandwidth — an 8 MB buffer x32 procs saturates DRAM and reads
    as false steal) — no I/O, no Ray, no allocation in the loop."""
    import time as _t

    import numpy as np

    a = np.arange(1 << 17, dtype=np.uint64)
    m = np.uint64(6364136223846793005)
    c = np.uint64(1442695040888963407)
    n = 0
    t0 = _t.time()
    while _t.time() - t0 < secs:
        a = ((a * m + c) * m + c) * m + c
        n += 1
    q.put(n)


def compute_probe(lo: int, hi: int, secs: float = 3.0) -> dict:
    """Pure-compute scaling ceiling of THIS HOST right now: aggregate
    probe throughput at ``lo`` vs ``hi`` concurrent processes. On a
    healthy machine the ratio ≈ hi/lo (efficiency ≈ 1); CPU steal or
    saturation shows up here before it shows up in any pipeline — run
    next to every scaling measurement so a degraded-host number is
    self-interpreting (VERDICT r3 item 7)."""
    import multiprocessing as mp

    def run(nproc: int) -> float:
        ctx = mp.get_context("spawn")
        q = ctx.Queue()
        ps = [ctx.Process(target=_probe_worker, args=(q, secs))
              for _ in range(nproc)]
        for p in ps:
            p.start()
        tot = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        return tot / secs

    thr_lo, thr_hi = run(lo), run(hi)
    return {
        "probe_iters_per_sec_lo": round(thr_lo, 1),
        "probe_iters_per_sec_hi": round(thr_hi, 1),
        "probe_efficiency": round((thr_hi / thr_lo) / (hi / lo), 3),
    }


def _clean_exchange() -> None:
    try:
        from epstein_pipeline_ray.stages.exchange import cleanup_exchange_root

        cleanup_exchange_root()
    except Exception:
        pass


def _ensure_corpus() -> str:
    """Generate (once) the deterministic synthetic corpus; untimed."""
    path = _corpus_path()
    done = os.path.join(path, "_DONE")
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        from epstein_pipeline_ray.sources.synth import write_turns_parquet

        write_turns_parquet(path, N_CONVS, SEED)
        open(done, "w").close()
    return path


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from epstein_pipeline_ray.config import DedupConfig
    from epstein_pipeline_ray.pipelines.dedup import dedup_turns

    _clean_exchange()
    path = _ensure_corpus()

    # warm the page cache so we measure compute + shuffle, not cold disk.
    # count() alone is metadata-only and reads no data bytes — actually
    # touch the files (cold-disk rollup reads were measured to cap the
    # rollup stage at 1.5x speedup from 4x CPUs, poisoning the scaling
    # measurement whenever the corpus had been evicted)
    for root, _dirs, files in os.walk(path) if os.path.isdir(path) else [(os.path.dirname(path), None, [os.path.basename(path)])]:
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "rb") as fh:
                    while fh.read(1 << 24):
                        pass
    turns = rd.read_parquet(path)
    n_turns = turns.count()

    # best-of-2: this host shows ±40%+ run-to-run CPU-steal variance; the
    # min is the stable statistic (same convention as --scaling)
    headline = None
    for _ in range(int(os.environ.get("EPR_BENCH_REPS", "2"))):
        _clean_exchange()
        t0 = time.time()
        res = dedup_turns(rd.read_parquet(path), DedupConfig(), minhash_on_reps=True)
        n_pairs = res.pairs.count()
        n_clustered = res.clusters.count()
        elapsed = time.time() - t0
        headline = elapsed if headline is None else min(headline, elapsed)

    queries: dict[str, float] = {"dedup_pipeline": round(headline, 3)}

    import __ray_entry__ as entrymod

    for name in (
        "lineitem_pricing",
        "events_hourly",
        "events_sessions",
        "doc_stats",
        "ann_topk",
        "doc_chunks",
        "wordset_jaccard",
        "token_counts",
        "gopher_quality",
        "person_audit",
        "decontaminate",
        "c4_filter",
        "substring_pairs",
        "turn_dedup_global",
        "self_repetition",
        "pack_sequences",
        "cross_snapshot",
        "line_dedup",
        "repetition",
        "triangles",
        "label_prop",
        "context_windows",
        "connected_components",
        "kcore",
        "clustering_coef",
        "dup_rate",
        "rolling_wau",
        "cohort_retention",
        # round-3 session-5 additions (the exchange-bearing ones)
        "gap_fill",
        "cdc_merge",
        "psi_drift",
        "ewma",
        "event_paths",
        "url_dedup",
        "distinctive_terms",
        "events_hopping",
        # round-3 session-6 additions
        "shipping_priority",
        "local_supplier_volume",
        "quality_auc",
        "scd2",
        "bucketed_join",
        "zorder_layout",
        "event_throttle",
        "embed_quantize",
        # round-4 additions (static-edge-shard-cached loops + new ops)
        "pagerank",
        "hits",
        "bloom_semi_join",
        "golden_records",
        "unpivot_metrics",
    ):
        q = entrymod.queries()[name]
        best = None
        for _ in range(int(os.environ.get("EPR_BENCH_REPS", "2"))):
            t0 = time.time()
            out = q(SF_DIR)
            # consume to force execution
            if hasattr(out, "count"):
                out.count()
            else:
                len(out)
            best = min(time.time() - t0, best) if best is not None else time.time() - t0
            # free this query's exchange shards: tmpfs leftovers evict page
            # cache and poison every later measurement
            from epstein_pipeline_ray.stages.exchange import gc_exchange_dirs

            gc_exchange_dirs()
        queries[name] = round(best, 3)

    result = {
        "metric": "transcript dedup wall time (synthetic corpus, exact+minhash+cluster)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(SF_DIR.rstrip("/")),
        "num_cpus": NUM_CPUS,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1),
        "pairs": n_pairs,
        "clustered_convs": n_clustered,
        "n_convs": N_CONVS,
    }
    ray.shutdown()
    # host-health context: 1 → NUM_CPUS pure-compute ceiling measured the
    # same minute — a low probe_efficiency means the HOST (steal /
    # saturation) capped the headline, not the code. Brief settle so Ray
    # worker teardown doesn't read as steal (measured: probing 2 s after
    # shutdown still reads ~0.62 vs ~0.82 standalone).
    time.sleep(6.0)
    result.update(compute_probe(1, NUM_CPUS, secs=2.0))
    return result


def run_scaling() -> dict:
    """Same job, fresh processes, num_cpus=8 then 32 → scaling efficiency."""

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=SF_DIR,
            EPR_BENCH_CONVS=str(N_CONVS),
            EPR_BENCH_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("EPR_SCALING_LO", "2"))
    hi = int(os.environ.get("EPR_SCALING_HI", "8"))
    # scaling needs a corpus where signature compute dominates the fixed
    # per-stage orchestration cost; default to a bigger one than the plain
    # bench (generated once, cached)
    global N_CONVS
    N_CONVS = int(os.environ.get("EPR_SCALING_CONVS", "1200000"))
    # pre-generate the corpus at full parallelism so neither timed
    # subprocess pays generation cost
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    _ensure_corpus()
    ray.shutdown()
    # best-of-reps per point: this sandbox VM shows ±40% run-to-run
    # variance (shared host, page cache); min is the stable statistic
    reps = int(os.environ.get("EPR_SCALING_REPS", "2"))
    r_lo = min((run(lo) for _ in range(reps)), key=lambda r: r["value"])
    r_hi = min((run(hi) for _ in range(reps)), key=lambda r: r["value"])
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    # same-minute pure-compute ceiling at the same lo/hi: eff can never
    # beat what the host delivers, so report eff relative to the ceiling
    probe = compute_probe(lo, hi, secs=3.0)
    return {
        "metric": f"scaling efficiency (N={lo} vs {hi // lo}N={hi} CPUs, fresh ray.init each)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "turns_per_sec_8": r_lo["turns_per_sec"],
        "turns_per_sec_32": r_hi["turns_per_sec"],
        "turns": r_hi["turns"],
        "sf": r_hi["sf"],
        **probe,
        "efficiency_vs_probe": round(eff / probe["probe_efficiency"], 3)
        if probe["probe_efficiency"] else None,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        if os.environ.get("EPR_BENCH_HEADLINE_ONLY"):
            # scaling subprocess: skip the secondary query timings
            import ray

            ray.init(
                address="local",
                num_cpus=NUM_CPUS,
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
            from ray.data import DataContext

            DataContext.get_current().enable_progress_bars = False
            import ray.data as rd

            from epstein_pipeline_ray.config import DedupConfig
            from epstein_pipeline_ray.pipelines.dedup import dedup_turns

            _clean_exchange()
            path = _ensure_corpus()
            turns = rd.read_parquet(path)
            n_turns = turns.count()
            t0 = time.time()
            res = dedup_turns(rd.read_parquet(path), DedupConfig(), minhash_on_reps=True)
            res.pairs.count()
            res.clusters.count()
            headline = time.time() - t0
            print(
                json.dumps(
                    {
                        "metric": "dedup headline",
                        "value": round(headline, 3),
                        "unit": "sec",
                        "turns": n_turns,
                        "turns_per_sec": round(n_turns / headline, 1),
                        "num_cpus": NUM_CPUS,
                        "sf": os.path.basename(SF_DIR.rstrip("/")),
                    }
                )
            )
            ray.shutdown()
        else:
            print(json.dumps(run_bench()))
