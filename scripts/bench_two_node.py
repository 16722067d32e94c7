#!/usr/bin/env python
"""Two-node cluster BENCHMARK (VERDICT r4 item 1) — not just a smoke.

Starts a real Ray head + worker (16 CPUs each = the single-node bench's
32) as separate ``ray start --block`` processes on localhost, then runs
the sf0.1 flagship dedup plus the three heaviest bench queries
(connected_components, pagerank, substring_pairs) as cluster drivers —
once under the probed-shared disk exchange and once under
``EPR_SHUFFLE=sort`` — and prints one JSON line with wall times and
counts for every leg. Counts must be identical across legs and equal to
the single-node bench (69,914 pairs / 41,134 clustered at the default
120k-conv bench size).

This is the ``ray job submit``-shaped evidence that the engine's wide
stages run correctly AND comparably through a real multi-node object
store + raylet topology; absolute times are NOT comparable node-for-node
with the single-node bench (same physical CPUs, plus cross-raylet
object transfer) — the deliverable is parity + same order of magnitude.

Usage: python scripts/bench_two_node.py   (~5-8 min; one JSON line)
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

PORT = 6393
ADDR = f"127.0.0.1:{PORT}"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CONVS = int(os.environ.get("EPR_BENCH_CONVS", "120000"))
CORPUS = f"/tmp/epr_bench/turns_{N_CONVS}_42"
CPUS_PER_NODE = int(os.environ.get("EPR_TWO_NODE_CPUS", "16"))
REPS = int(os.environ.get("EPR_BENCH_REPS", "2"))
QUERIES = ["connected_components", "pagerank", "substring_pairs"]


def _start_node(args: list[str]) -> subprocess.Popen:
    return subprocess.Popen(
        ["ray", "start", "--block", "--disable-usage-stats",
         "--object-store-memory", str(4 << 30), *args],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )


def _wait_for_nodes(n: int, budget: float = 90.0) -> None:
    check = (
        "import ray; ray.init(address='%s', logging_level='ERROR');"
        "import sys; sys.exit(0 if sum(1 for x in ray.nodes() "
        "if x.get('Alive')) >= %d else 1)" % (ADDR, n)
    )
    t0 = time.time()
    while time.time() - t0 < budget:
        if subprocess.run([sys.executable, "-c", check],
                          stdout=subprocess.DEVNULL,
                          stderr=subprocess.DEVNULL).returncode == 0:
            return
        time.sleep(2.0)
    raise TimeoutError(f"cluster did not reach {n} alive nodes")


_DRIVER_CODE = """
import json, os, sys, time
import ray
ray.init(address=os.environ["RAY_ADDRESS"], logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
sys.path.insert(0, {repo!r})
from epstein_pipeline_ray.config import DedupConfig
from epstein_pipeline_ray.pipelines.dedup import dedup_turns
from epstein_pipeline_ray.stages.exchange import gc_exchange_dirs

# page-warm the corpus (cold-disk reads poison the first rep)
for root, _d, files in os.walk({corpus!r}):
    for f in files:
        if f.endswith(".parquet"):
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass

out = {{"nodes": sum(1 for x in ray.nodes() if x.get("Alive"))}}
best = None
for _ in range({reps}):
    import shutil; shutil.rmtree("/dev/shm/epr_exchange", ignore_errors=True)
    t0 = time.time()
    res = dedup_turns(rd.read_parquet({corpus!r}), DedupConfig(),
                      minhash_on_reps=True)
    out["pairs"] = res.pairs.count()
    out["clustered"] = res.clusters.count()
    el = time.time() - t0
    best = el if best is None else min(best, el)
out["dedup_pipeline"] = round(best, 3)

import __ray_entry__ as entrymod
for name in {queries!r}:
    q = entrymod.queries()[name]
    best = rows = None
    for _ in range({reps}):
        t0 = time.time()
        r = q({sf_dir!r})
        rows = r.count() if hasattr(r, "count") else len(r)
        el = time.time() - t0
        best = el if best is None else min(best, el)
        gc_exchange_dirs()
    out[name] = round(best, 3)
    out[name + "_rows"] = rows
print("BENCH_JSON " + json.dumps(out))
ray.shutdown()
"""


def _leg(env_extra: dict[str, str]) -> dict:
    env = dict(os.environ, RAY_ADDRESS=ADDR, GRAFT_SF_DIR=SF_DIR,
               **env_extra)
    code = _DRIVER_CODE.format(repo=REPO, corpus=CORPUS, reps=REPS,
                               queries=QUERIES, sf_dir=SF_DIR)
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(
            f"driver failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("BENCH_JSON ")][-1]
    return json.loads(line[len("BENCH_JSON "):])


def main() -> int:
    t0 = time.time()
    if not os.path.exists(os.path.join(CORPUS, "_DONE")):
        # generate via a LOCAL session (no cluster yet)
        code = (
            "import ray; ray.init(address='local', num_cpus=16,"
            "include_dashboard=False, logging_level='ERROR');"
            "from epstein_pipeline_ray.sources.synth import write_turns_parquet;"
            f"write_turns_parquet({CORPUS!r}, {N_CONVS}, 42);"
            f"open({CORPUS!r} + '/_DONE', 'w').close(); ray.shutdown()"
        )
        subprocess.run([sys.executable, "-c", code], cwd=REPO, check=True)
    head = _start_node(["--head", f"--port={PORT}",
                        f"--num-cpus={CPUS_PER_NODE}"])
    worker = None
    try:
        _wait_for_nodes(1)
        worker = _start_node([f"--address={ADDR}",
                              f"--num-cpus={CPUS_PER_NODE}"])
        _wait_for_nodes(2)
        legs = {
            "disk_probed": _leg({}),
            "sort": _leg({"EPR_SHUFFLE": "sort"}),
        }
        sig = {k: (v["pairs"], v["clustered"],
                   tuple(v[q + "_rows"] for q in QUERIES))
               for k, v in legs.items()}
        ok = len(set(sig.values())) == 1 and legs["sort"]["pairs"] > 0
        print(json.dumps({
            "bench": "two_node_cluster",
            "ok": ok,
            "nodes": 2,
            "cpus_per_node": CPUS_PER_NODE,
            "n_convs": N_CONVS,
            "sf": os.path.basename(SF_DIR.rstrip("/")),
            "legs": legs,
            "wall_sec": round(time.time() - t0, 1),
        }))
        return 0 if ok else 1
    finally:
        for p in (worker, head):
            if p is not None:
                try:
                    os.killpg(os.getpgid(p.pid), signal.SIGTERM)
                except (ProcessLookupError, PermissionError):
                    pass
        deadline = time.time() + 15
        for p in (worker, head):
            if p is not None:
                try:
                    p.wait(timeout=max(0.1, deadline - time.time()))
                except subprocess.TimeoutExpired:
                    try:
                        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
                    except (ProcessLookupError, PermissionError):
                        pass


if __name__ == "__main__":
    sys.exit(main())
