"""Vectorized group-block processing: the engine's replacement for
per-group ``map_groups`` on hot paths.

``GroupedData.map_groups`` costs one Python UDF call + one batch
construction per group (~ms each) — fatal when groups number in the
millions (one per conversation / LSH bucket). Instead:

    ds.sort(KEYS)                           # range shuffle, task-only
      .map_batches(fn, batch_size=None)     # fn sees WHOLE blocks

Ray's sort range-partitions on sampled key boundaries, so every key
group lands complete and contiguous inside exactly one block (equal keys
never straddle a boundary — verified: 200k rows / 5 keys → exactly 5
output blocks); ``fn`` then processes thousands of groups per call with
numpy group-boundary arithmetic.

Why sort and not Ray's hash shuffle (``repartition(p, keys=...)``): the
hash path funnels every shard through a small pool of aggregator ACTORS
whose accept path is the serial bottleneck — measured on this engine, the
same keyed exchange ran ~3x SLOWER at 32 CPUs than at 8 (more producers
contending on the same actors), while the sort path is pure tasks and
scales with the cluster. ``ensure_hash_shuffle``/_tune remain for callers
that do want the hash path (e.g. streaming repartition experiments).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset


def _tune(ctx) -> None:
    import os

    from ray.data.context import ShuffleStrategy

    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Ray reserves min(1, CPUs/2/partitions) CPUs per shuffle partition when
    # a cluster config is visible — with several concurrent shuffle stages
    # that over-reserves the node. Pin the per-partition budget and the
    # partition count independent of cluster size; let the AGGREGATOR pool
    # (the accept-path parallelism) scale with CPUs.
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.0625
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.0625
    ctx.default_hash_shuffle_parallelism = 32
    ncpu = int(ray.cluster_resources().get("CPU", 8)) or 8
    ctx.max_hash_shuffle_aggregators = int(
        os.environ.get("EPR_MAX_AGGREGATORS", max(4, ncpu // 2))
    )


def ensure_hash_shuffle(ds: Dataset | None = None) -> None:
    """Flip the process DataContext (and a dataset's captured copy) to
    tuned hash shuffling — only for callers that explicitly want Ray's
    hash-shuffle path; the engine's own keyed stages use sort."""
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        _tune(ctx)
    if ds is not None and ds.context.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        _tune(ds.context)


_DISK_UNSAFE_WARNED = False


def _warn_disk_unsafe_once() -> None:
    global _DISK_UNSAFE_WARNED
    if _DISK_UNSAFE_WARNED:
        return
    _DISK_UNSAFE_WARNED = True
    import logging

    logging.getLogger(__name__).warning(
        "EPR_SHUFFLE=disk on a multi-node cluster with a non-shared "
        "exchange dir — failing over to the sort backend. Point "
        "EPR_EXCHANGE_DIR at shared storage and set EPR_EXCHANGE_SHARED=1 "
        "to use the disk exchange across nodes.")


def default_partitions() -> int:
    """Default keyed-shuffle width hint. A fixed constant, NOT a function
    of the cluster: partitioning is a data-layout decision, and tying it to
    CPU count makes the same job do more shuffle bookkeeping on a bigger
    cluster for zero gain."""
    return 32


def map_key_blocks(
    ds: Dataset,
    keys: list[str],
    fn: Callable[[pa.Table], pa.Table],
    num_partitions: int | None = None,
    coalesce: bool = True,
    materialize_input: bool = True,
    sort_blocks: bool = True,
) -> Dataset:
    """Co-locate key groups, then apply ``fn`` to whole key-sorted blocks.
    ``fn`` must handle a block containing many complete key groups and may
    rely on rows being sorted by ``keys``.

    ``num_partitions`` is the explicit exchange width (disk/hash backends);
    size it so one partition fits a worker heap.

    ``coalesce`` (Ray-native backends only): empty shuffle partitions skip
    ``fn`` and surface as zero-COLUMN blocks (Ray skips UDFs on empty
    blocks — see the TODO in ray.data's plan_udf_map_op);
    ``drop_empty_blocks`` removes them so they cannot poison a later
    shuffle's schema handling.
    """
    import os

    backend = os.environ.get("EPR_SHUFFLE", "disk")
    # None flows through to the disk exchange, which auto-sizes the width
    # from the input's byte size (exchange.auto_partitions_from); the hash
    # backend below still needs a concrete count.
    p = num_partitions
    if backend == "disk":
        # partitioned-file exchange (stages.exchange): task-parallel on both
        # sides, no shuffle actors, shard dirs double as resume artifacts —
        # the default because both Ray-native exchanges measured
        # CPU-count-invariant on this workload (see exchange.py docstring).
        # No input materialization and no empty-block laundering needed:
        # the exchange derives schemas from its own shard files, so Ray's
        # schema-less empty blocks can't poison anything.
        from epstein_pipeline_ray.stages.exchange import (
            disk_exchange_is_safe, exchange_key_blocks)

        if disk_exchange_is_safe():
            return exchange_key_blocks(ds, keys, fn, p,
                                       materialize_input=materialize_input,
                                       sort_blocks=sort_blocks)
        # >1 alive node and the shard dir is not shared storage: reduce
        # tasks on other nodes could not open the map side's shards, so
        # the disk exchange would silently drop rows. Fail over to the
        # multi-node-correct sort backend (result-equivalent — see
        # tests/test_shuffle_backends.py).
        _warn_disk_unsafe_once()
        backend = "sort"
    # Ray-native backends need the input materialized + cleaned: schema-less
    # empty blocks crash their shuffles, and an all-empty dataset can't be
    # sorted usefully.
    ds = drop_empty_blocks(ds)
    if ds.count() == 0:
        import ray.data as rd

        schema = ds.schema(fetch_if_missing=True)
        if schema is not None and schema.names:
            arrow_schema = getattr(schema, "base_schema", None) or pa.schema(
                list(zip(schema.names, schema.types))
            )
            return rd.from_arrow(fn(arrow_schema.empty_table()))
        return ds
    if backend == "sort":
        out = ds.sort(keys).map_batches(
            fn, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    else:  # "hash"
        if p is None:
            p = default_partitions()
        ensure_hash_shuffle(ds)
        sort_keys = [(k, "ascending") for k in keys]
        inner = fn

        def hash_fn(batch: pa.Table) -> pa.Table:
            if batch.num_rows:
                batch = batch.sort_by(sort_keys)
            return inner(batch)

        hash_fn.__name__ = getattr(inner, "__name__", "key_block_fn")
        out = ds.repartition(p, keys=keys, sort=False).map_batches(
            hash_fn, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    if coalesce:
        out = drop_empty_blocks(out)
    return out


def concat_datasets(parts: list[Dataset]) -> Dataset:
    """Ref-level concatenation of (small, materialized) datasets.

    ``Dataset.union`` upstream of a keyed shuffle trips Ray's schema
    handling on empty partitions; materializing each part and re-assembling
    from the non-empty block refs sidesteps the union operator entirely.
    Intended for pair tables and other outputs far smaller than the corpus."""
    import ray.data as rd

    mats = [p.materialize() for p in parts]
    refs = []
    fallback = None
    for mat in mats:
        for bundle in mat.iter_internal_ref_bundles():
            for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
                if meta.num_rows is None or meta.num_rows > 0:
                    refs.append(block_ref)
        if fallback is None:
            schema = mat.schema(fetch_if_missing=True)
            if schema is not None and schema.names:
                fallback = mat
    if refs:
        return rd.from_arrow_refs(refs)
    return fallback if fallback is not None else mats[0]


def drop_empty_blocks(ds: Dataset) -> Dataset:
    """Materialize and rebuild the dataset from its non-empty blocks only.

    Ray's all-to-all operators emit schema-less (zero-COLUMN) blocks for
    empty partitions; if such a block reaches a later shuffle's schema
    handling, that shuffle crashes. Blocks move nowhere here — only refs +
    metadata are touched on the driver.
    """
    import ray.data as rd

    mat = ds.materialize()
    refs = []
    n_dropped = 0
    for bundle in mat.iter_internal_ref_bundles():
        for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(block_ref)
            else:
                n_dropped += 1
    if n_dropped == 0:
        return mat
    if not refs:
        # fully empty output: synthesize a typed empty dataset (the blocks
        # that carried the schema were all zero-row and just got dropped)
        schema = mat.schema(fetch_if_missing=True)
        import pyarrow as pa

        if schema is not None and schema.names:
            arrow_schema = getattr(schema, "base_schema", None) or pa.schema(
                list(zip(schema.names, schema.types))
            )
            return rd.from_arrow(arrow_schema.empty_table())
        return mat
    return rd.from_arrow_refs(refs)


def group_starts(sorted_codes: np.ndarray) -> np.ndarray:
    """Start offsets of each group run in a sorted code array (incl. 0)."""
    if sorted_codes.shape[0] == 0:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate(
        [[0], np.nonzero(sorted_codes[1:] != sorted_codes[:-1])[0] + 1]
    ).astype(np.int64)


def encode_groups(batch: pa.Table, key: str) -> np.ndarray:
    """Integer group codes for a key-sorted block (monotonic by run)."""
    arr = batch[key]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return np.asarray(arr.dictionary_encode().indices)
