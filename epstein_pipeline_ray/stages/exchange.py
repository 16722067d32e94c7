"""Partitioned-file exchange: the engine's high-throughput keyed shuffle.

Both of Ray Data's built-in all-to-all exchanges measured poorly on the
keyed whole-group workloads this engine runs (sort ~11-27 MB/s;
hash-shuffle ~100 MB/s but bottlenecked on a fixed aggregator-actor
accept path that does NOT speed up with more CPUs). This module
implements the classic external shuffle instead (cf. PAPERS.md, Hyper
Dimension Shuffle, VLDB 2019 — map-side partitioned spill files):

    map side:  map_batches(write_shards)   # split each block by
                                           # hash(key) % P, append one
                                           # Parquet shard per partition
    reduce:    one task per partition      # read its shards, sort by key,
                                           # apply the block fn

Everything runs as plain Ray tasks on both sides — throughput scales with
the cluster, there are no shuffle actors to spawn per stage, and the
shard directories are on-disk artifacts: a caller that passes an explicit
``exchange_dir`` gets a ``_SUCCESS``-marked, manifest-backed directory
that a later invocation RE-READS instead of recomputing the map side
(``tests/test_shuffle_backends.py::test_exchange_resume_rereads_shards``).

SHARED-FILESYSTEM REQUIREMENT: the reduce task opens shard files by path,
so on a multi-node cluster ``EPR_EXCHANGE_DIR`` must point at storage
every node can read (NFS / FSx / a fuse-mounted bucket) and the operator
must assert that with ``EPR_EXCHANGE_SHARED=1``. When the cluster has
more than one alive node and the directory is not asserted (or probed)
shared, ``disk_exchange_is_safe`` returns False and
``groupblock.map_key_blocks`` FAILS OVER to the multi-node-correct
``sort`` backend with a logged warning — node-local tmpfs shards written
on node A are unreadable from node B, which would otherwise silently
drop every row of those partitions.

Empty partitions are handled by construction: the map side records the
schema once, and partitions with no shards produce a correctly-typed
empty table — no schema-less-block corner cases.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data import Dataset

# default to the RAM-backed tmpfs when present (this sandbox's stand-in
# for node-local NVMe shuffle disks; /tmp here is a ~300 MB/s virtual disk)
_DEFAULT_ROOT = "/dev/shm/epr_exchange" if os.path.isdir("/dev/shm") else "/tmp/epr_exchange"
_EXCHANGE_ROOT = os.environ.get("EPR_EXCHANGE_DIR", _DEFAULT_ROOT)

# memoized verdicts of disk_exchange_is_safe, keyed by root dir
_SAFETY_CHECKED: dict[str, bool] = {}


def _alive_node_count() -> int:
    """Alive Ray nodes; ``EPR_FAKE_MULTINODE=<n>`` overrides for tests
    (this sandbox cannot start a real second node)."""
    fake = os.environ.get("EPR_FAKE_MULTINODE")
    if fake:
        return max(2, int(fake)) if fake not in ("0", "false") else 1
    if not ray.is_initialized():
        return 1
    try:
        return sum(1 for n in ray.nodes() if n.get("Alive"))
    except Exception:
        return 1


def _probe_shared_dir(root: str) -> bool:
    """Write a probe file from the driver and try to stat it from a task
    pinned to each OTHER alive node. True only if every node sees it —
    the operational definition of 'shared storage'."""
    from ray.util.scheduling_strategies import NodeAffinitySchedulingStrategy

    os.makedirs(root, exist_ok=True)
    probe = os.path.join(root, f"_probe_{uuid.uuid4().hex[:8]}")
    with open(probe, "w") as f:
        f.write("x")
    try:
        me = ray.get_runtime_context().get_node_id()

        @ray.remote(num_cpus=0)
        def _sees(path: str) -> bool:
            return os.path.exists(path)

        futs = [
            _sees.options(
                scheduling_strategy=NodeAffinitySchedulingStrategy(
                    node_id=n["NodeID"], soft=False)
            ).remote(probe)
            for n in ray.nodes()
            if n.get("Alive") and n["NodeID"] != me
        ]
        return all(ray.get(futs)) if futs else True
    except Exception:
        return False
    finally:
        try:
            os.remove(probe)
        except OSError:
            pass


def disk_exchange_is_safe(root: str | None = None) -> bool:
    """True when reduce tasks on every alive node can read shard files
    written under ``root``. Single-node: always true. Multi-node:
    true iff the operator asserts shared storage (``EPR_EXCHANGE_SHARED=1``)
    or a cross-node stat probe confirms it. Memoized per root —
    ``groupblock.map_key_blocks`` calls this on every disk-backend
    dispatch."""
    root = root or _EXCHANGE_ROOT
    cached = _SAFETY_CHECKED.get(root)
    if cached is not None:
        return cached
    if _alive_node_count() <= 1:
        safe = True
    elif os.environ.get("EPR_EXCHANGE_SHARED", "").lower() in ("1", "true"):
        safe = True
    elif os.environ.get("EPR_FAKE_MULTINODE"):
        # faked multi-node has no second node to probe from — the fake
        # asserts the unsafe combination so tests can drive the failover
        safe = False
    else:
        safe = _probe_shared_dir(root)
    _SAFETY_CHECKED[root] = safe
    return safe


_DISPATCH_PAD = 8192  # rows per reduce-dispatch block; > any fused batch_size


def hash64_column(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic 64-bit hash of one column. ``pd.util.hash_array``
    is a fixed-key vectorized hash — identical across processes and
    runs, which the resume story (and every consumer claiming hash
    identity with the partitioner, e.g. joins.bloom_semi_join) depends
    on. NOTE: the hash is dtype-sensitive (int32 −5 and int64 −5 hash
    differently) — callers comparing hashes across two columns must
    cast them to a common type first."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    npcol = col.to_numpy(zero_copy_only=False)
    if npcol.dtype == object:
        return pd.util.hash_array(npcol).astype(np.uint64)
    return pd.util.hash_array(
        np.ascontiguousarray(npcol)).astype(np.uint64)


def _part_codes(batch: pa.Table, keys: list[str], p: int) -> np.ndarray:
    """Deterministic partition id per row: stable hash of the key
    columns (:func:`hash64_column` per column, FNV-mixed)."""
    acc = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        acc = acc * np.uint64(0x100000001B3) + hash64_column(batch[k])
    return (acc % np.uint64(p)).astype(np.int64)


def _size_is_metadata(ds: Dataset) -> bool:
    """True when ``ds.size_bytes()`` is answerable from metadata alone:
    already-materialized datasets and bare ``Read`` plans (parquet footer
    estimates). Anything with upstream compute would have to EXECUTE to
    answer — callers must not pay that just to pick a shuffle width."""
    try:
        if ds._plan.has_computed_output():
            return True
        dag = ds._logical_plan.dag
        return type(dag).__name__ == "Read" and not dag.input_dependencies
    except Exception:
        return False


def auto_partitions_from(ds: Dataset, default: int) -> int:
    """Width from input size. Below ``default``: one reduce partition per
    ~8 MB, floored at 4 — a 2 MB correctness-gate input gets 4
    partitions instead of 32 (32 reduce tasks on 500 rows is ~0.5 s of
    pure scheduling; the floor keeps compute-heavy whole-partition fns —
    true-Jaccard confirm, DP panels — from serializing on one task).
    ABOVE ``default``: one partition per ~32 MB, capped at 4096 — the
    width must GROW with the input or a big exchange violates the
    "one partition fits a worker heap" contract: a 43M-turn corpus's
    ~10 GB semi-join exchange at the old fixed 32-wide cap produced
    ~1 GB text partitions whose fused reduce+signature tasks ran 20+
    minutes each as stragglers (measured, round 5); at 32 MB/partition
    the same exchange is ~300 well-parallelized tasks. ``size_bytes``
    is metadata-only on materialized datasets and bare parquet reads
    (the two shapes that reach here)."""
    try:
        nbytes = ds.size_bytes()
    except Exception:
        return default
    if not nbytes or nbytes < 0:
        return default
    small = -(-nbytes // (8 << 20))
    if small <= default:
        return max(min(4, default), small)
    return min(4096, max(default, -(-nbytes // (32 << 20))))


def exchange_key_blocks(
    ds: Dataset,
    keys: list[str],
    fn: Callable[[pa.Table], pa.Table],
    num_partitions: int | None,
    exchange_dir: str | None = None,
    schema: pa.Schema | None = None,
    materialize_input: bool = True,
    sort_blocks: bool = True,
) -> Dataset:
    """Keyed exchange + whole-partition apply.

    ``fn`` receives one key-sorted table per partition, containing every
    row of every key hashed to that partition (the whole-group guarantee).
    ``num_partitions`` is the explicit width: one partition must fit a
    worker's heap — size it to the data, not the cluster. ``None``
    auto-sizes from the input's byte size (:func:`auto_partitions_from`).

    Returns a Dataset of ``fn``'s outputs (one block per non-trivial
    partition). The shard directory is left on disk for resume/debug;
    callers own cleanup of ``exchange_dir``.

    Resume: a completed exchange writes ``_MANIFEST.parquet`` +
    ``_SUCCESS`` into its directory. Calling again with the same
    explicit ``exchange_dir`` re-reads the shards from the manifest and
    SKIPS the entire map side — the input dataset is never executed.
    """
    exch = exchange_dir or os.path.join(_EXCHANGE_ROOT, uuid.uuid4().hex[:12])
    success_path = os.path.join(exch, "_SUCCESS")
    if exchange_dir and os.path.exists(success_path):
        mdf = pq.read_table(os.path.join(exch, "_MANIFEST.parquet")).to_pandas()
        if num_partitions is None:
            # cover every partition id the original run hashed to
            num_partitions = int(mdf["part"].max()) + 1 if len(mdf) else 1
        return _consume_exchange(mdf, fn, num_partitions, schema,
                                 keys, sort_blocks)
    # materialize HERE (not only inside write_exchange_shards) so the
    # empty-input schema fetch in _consume_exchange reads metadata from
    # the materialized handle instead of re-executing a lazy upstream
    if materialize_input:
        ds = ds.materialize()
    mdf, p, _ = write_exchange_shards(
        ds, keys, num_partitions, exchange_dir=exch,
        materialize_input=materialize_input)
    return _consume_exchange(mdf, fn, p, schema, keys, sort_blocks, ds)


def write_exchange_shards(
    ds: Dataset,
    keys: list[str],
    num_partitions: int | None,
    exchange_dir: str | None = None,
    materialize_input: bool = True,
) -> tuple[pd.DataFrame, int, str]:
    """Map side of the exchange alone: hash-partition ``ds`` by ``keys``
    into shard files and publish the manifest. Returns
    ``(manifest_df, num_partitions, dir)``.

    Exposed separately so ITERATIVE loops can partition a static side
    ONCE and co-group per-round deltas against the cached shards
    (:func:`consume_exchange_manifests`) — e.g. a graph loop's edge
    table is written once and only the label table moves per round.
    Partition assignment is a pure function of the key values
    (:func:`_part_codes`), so two exchanges with the same keys and the
    same width are co-partitioned by construction.
    """
    exch = exchange_dir or os.path.join(_EXCHANGE_ROOT, uuid.uuid4().hex[:12])
    manifest_path = os.path.join(exch, "_MANIFEST.parquet")
    success_path = os.path.join(exch, "_SUCCESS")
    os.makedirs(exch, exist_ok=True)
    _CREATED_DIRS.append(exch)
    # Materialize the input: without this barrier Ray fuses the (possibly
    # compute-heavy) upstream maps into the shard-writer's coarse write
    # batches, collapsing upstream parallelism to a handful of fat tasks
    # (measured 2x slower end-to-end at 32 CPUs). Callers whose input is a
    # bare read (no upstream compute to protect) pass
    # ``materialize_input=False`` — the barrier would only double memory
    # traffic through the object store.
    if materialize_input:
        ds = ds.materialize()
    if num_partitions is None:
        from epstein_pipeline_ray.stages.groupblock import default_partitions

        if materialize_input or _size_is_metadata(ds):
            num_partitions = auto_partitions_from(ds, default_partitions())
        else:
            # lazy derived input (materialize_input=False): size_bytes()
            # would EXECUTE the upstream compute once just to pick a
            # width, then write_shards would execute it again
            num_partitions = default_partitions()
    p = num_partitions

    def write_shards(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"part": pa.array([], pa.int64()),
                             "path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        codes = _part_codes(batch, keys, p)
        order = np.argsort(codes, kind="stable")
        sorted_codes = codes[order]
        starts = np.concatenate([[0], np.nonzero(sorted_codes[1:] != sorted_codes[:-1])[0] + 1])
        ends = np.concatenate([starts[1:], [len(order)]]).astype(np.int64)
        shard_id = uuid.uuid4().hex[:16]
        parts, paths, rows = [], [], []
        for s, e in zip(starts, ends):
            part = int(sorted_codes[s])
            sub = batch.take(pa.array(order[s:e], pa.int64()))
            d = os.path.join(exch, f"part={part}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"{shard_id}.parquet")
            pq.write_table(sub, path, compression="lz4")
            parts.append(part)
            paths.append(path)
            rows.append(sub.num_rows)
        return pa.table({"part": pa.array(parts, pa.int64()),
                         "path": pa.array(paths, pa.string()),
                         "rows": pa.array(rows, pa.int64())})

    # generous write batch: bundles small upstream blocks so each map task
    # writes a few fat shards instead of thousands of KB-sized files
    # (measured: per-batch-sized blocks → ~50k shard files → 5x slower)
    import time

    t0 = time.time()
    manifest = ds.map_batches(
        write_shards, batch_size=131072, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if os.environ.get("EPR_TIMING"):
        print(f"[epr-exchange] write {time.time() - t0:.1f}s dir={exch}", flush=True)
    mdf = manifest.to_pandas()
    if "part" not in mdf.columns:  # all input blocks empty → UDF skipped
        mdf = pd.DataFrame({"part": [], "path": []})
    # persist the manifest so a rerun with the same explicit dir can
    # re-read this exchange without executing the input again
    pq.write_table(
        pa.table({"part": pa.array(mdf["part"], pa.int64()),
                  "path": pa.array(mdf["path"], pa.string())}),
        manifest_path)
    with open(success_path, "w"):
        pass
    return mdf, p, exch


def consume_exchange_manifests(
    manifests: list[pd.DataFrame],
    fn: Callable[[pa.Table], pa.Table],
    num_partitions: int,
    keys: list[str],
    sort_blocks: bool = True,
    schema: pa.Schema | None = None,
) -> Dataset:
    """Reduce side over the UNION of several same-key same-width
    exchanges: partition i of the output reads partition-i shards from
    EVERY manifest (co-partitioned because :func:`_part_codes` is a pure
    function of the key values), concatenates them, and applies ``fn``.
    The static-side-caching primitive for iterative loops."""
    mdf = pd.concat(manifests, ignore_index=True) if manifests else \
        pd.DataFrame({"part": [], "path": []})
    return _consume_exchange(mdf, fn, num_partitions, schema, keys,
                             sort_blocks)


def _consume_exchange(
    mdf: pd.DataFrame,
    fn: Callable[[pa.Table], pa.Table],
    p: int,
    schema: pa.Schema | None,
    keys: list[str],
    sort_blocks: bool,
    ds: Dataset | None = None,
) -> Dataset:
    part_paths: dict[int, list[str]] = {}
    for part, path in zip(mdf["part"], mdf["path"]):
        part_paths.setdefault(int(part), []).append(path)
    if schema is None:
        if len(mdf):
            # cheapest authoritative source: any shard file's footer
            schema = pq.read_schema(mdf["path"].iloc[0])
        else:
            # input had no rows at all: infer from the (cheap) empty input
            # (resumed exchanges have no input dataset → schema-less empty)
            schema = _dataset_schema(ds) if ds is not None else None
    paths_ref = ray.put(part_paths)
    schema_ref = ray.put(schema.serialize().to_pybytes() if schema is not None else None)
    sort_keys = [(k, "ascending") for k in keys]

    def consume(batch: pa.Table) -> pa.Table:
        import time as _time

        timing = os.environ.get("EPR_TIMING_CONSUME")
        pp = ray.get(paths_ref)
        out: list[pa.Table] = []
        # rows are PADDED repeats of one part id (see below) — dedup
        for part in dict.fromkeys(batch["part"].to_pylist()):
            paths = pp.get(int(part))
            if paths:
                t0 = _time.time()
                tbl = pa.concat_tables([pq.read_table(pth) for pth in sorted(paths)])
                t1 = _time.time()
                # combine first: sort_by's take on a many-chunk (one per
                # shard) large_string column measured ~70s/partition at
                # 17M-turn scale vs ~2s contiguous
                if sort_blocks:
                    tbl = tbl.combine_chunks().sort_by(sort_keys)
                t2 = _time.time()
            else:
                blob = ray.get(schema_ref)
                if blob is None:
                    continue
                tbl = pa.ipc.read_schema(pa.py_buffer(blob)).empty_table()
                t0 = t1 = t2 = _time.time()
            out.append(fn(tbl))
            if timing:
                t3 = _time.time()
                print(
                    f"[epr-consume] part={part} rows={tbl.num_rows} "
                    f"read={t1 - t0:.2f} sort={t2 - t1:.2f} fn={t3 - t2:.2f}",
                    flush=True,
                )
        if not out:
            return pa.table({})
        return pa.concat_tables(out, promote_options="default")

    consume.__name__ = getattr(fn, "__name__", "exchange_consume")
    # ONE TASK PER PARTITION — defensively. Two observed failure modes
    # (round 5, 43M turns, p=649) collapsed the whole reduce onto one
    # core: (a) from_items(...).repartition(p) handing one task a batch
    # of many part ids, and (b) Ray's task bundler merging the one-row
    # dispatch blocks because a DOWNSTREAM map fused behind the consume
    # carried an explicit batch_size, which becomes min-rows-per-bundle
    # (operator log: num_tasks_submitted=1, rows_inputs_of_submitted_
    # tasks=649). override_num_blocks pins the block layout AND each
    # block is padded to _DISPATCH_PAD identical part-id rows so no
    # realistic fused batch_size can ever bundle two partitions into
    # one task; consume dedups the ids.
    tasks = rd.from_arrow([
        pa.table({"part": pa.array(
            np.full(_DISPATCH_PAD, i, np.int64), pa.int64())})
        for i in range(p)
    ])  # from_arrow: exactly one block per table, no re-splitting
    out = tasks.map_batches(consume, batch_size=None, batch_format="pyarrow")
    return out


def _dataset_schema(ds: Dataset) -> pa.Schema | None:
    schema = ds.schema(fetch_if_missing=True)
    if schema is None or not schema.names:
        return None
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(schema.names, schema.types)))


_CREATED_DIRS: list[str] = []


def gc_exchange_dirs() -> None:
    """Remove shard dirs created so far by THIS process. Call only at a
    stage barrier (after ``materialize()``): every exchange built before
    the barrier has been fully consumed, and leaving shards on the
    RAM-backed tmpfs measured a 2x whole-pipeline slowdown (tmpfs pages
    evict the page cache)."""
    import shutil

    while _CREATED_DIRS:
        shutil.rmtree(_CREATED_DIRS.pop(), ignore_errors=True)


def cleanup_exchange_root() -> None:
    import shutil

    _CREATED_DIRS.clear()
    shutil.rmtree(_EXCHANGE_ROOT, ignore_errors=True)
