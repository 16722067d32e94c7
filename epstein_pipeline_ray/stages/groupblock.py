"""Vectorized group-block processing: the engine's replacement for
per-group ``map_groups`` on hot paths.

``GroupedData.map_groups`` costs one Python UDF call + one batch
construction per group (~ms each) — fatal when groups number in the
millions (one per conversation / LSH bucket). Instead:

    ds.repartition(P, keys=KEYS, sort=True)   # hash shuffle, key-sorted blocks
      .map_batches(fn, batch_size=None)        # fn sees WHOLE blocks

guarantees every key group lands complete and contiguous inside exactly
one block, so ``fn`` can process thousands of groups per call with numpy
group-boundary arithmetic. This is the explicit partition-count shuffle
the north rule asks for: P is a real knob, not an implementation detail.

Requires ``DataContext.shuffle_strategy = HASH_SHUFFLE`` (Ray's
sort-based default rejects keyed repartition); ``ensure_hash_shuffle``
flips it once per process.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset


def _tune(ctx) -> None:
    from ray.data.context import ShuffleStrategy

    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Ray reserves min(1, CPUs/2/partitions) CPUs per shuffle partition when
    # a cluster config is visible — with several concurrent shuffle stages in
    # one DAG (this pipeline has 4+) that over-reserves the node and stages
    # starve each other. Pin the per-partition budget to Ray's single-node
    # default so each shuffle op reserves ~2 CPUs and the pool stays shared.
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.0625
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.0625
    # Ray's default hash parallelism (200 partitions / up to 64 aggregators)
    # would reserve 16 CPUs for a bare groupby().aggregate — a deadlock on a
    # small session. Scale both to the actual cluster.
    ncpu = int(ray.cluster_resources().get("CPU", 8)) or 8
    ctx.default_hash_shuffle_parallelism = max(8, ncpu)
    ctx.max_hash_shuffle_aggregators = max(4, ncpu // 2)


def ensure_hash_shuffle(ds: Dataset | None = None) -> None:
    """Flip the process DataContext (and a dataset's captured copy) to
    tuned hash shuffling. Datasets snapshot the context at creation, so the
    captured copy must be patched too when the dataset pre-dates the flip."""
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        _tune(ctx)
    if ds is not None and ds.context.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        _tune(ds.context)


def default_partitions() -> int:
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(8, ncpu)


def map_key_blocks(
    ds: Dataset,
    keys: list[str],
    fn: Callable[[pa.Table], pa.Table],
    num_partitions: int | None = None,
    coalesce: bool = True,
) -> Dataset:
    """Hash-partition by ``keys`` (sorted within block) then apply ``fn``
    to whole blocks. ``fn`` must handle a block containing many complete
    key groups and may rely on rows being sorted by ``keys``.

    ``coalesce``: empty shuffle partitions skip ``fn`` and surface as
    zero-COLUMN blocks (Ray skips the UDF on empty blocks), which poison
    any later keyed shuffle's schema broadcast. The trailing plain
    ``repartition`` merges them away. Disable only when the output is
    terminal or goes through a Parquet checkpoint (which launders schemas
    anyway).
    """
    ensure_hash_shuffle(ds)
    p = num_partitions or default_partitions()
    # Materialize + clean the input first: Ray's hash shuffle crashes in
    # aggregator finalize (sorting a schema-less block) when fed an
    # all-empty dataset, and empty-partition outputs of an earlier shuffle
    # poison the schema broadcast. Cleaning needs materialization, which
    # matches the engine's stage-sequential execution model anyway.
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
    out = ds.repartition(p, keys=keys, sort=True).map_batches(
        fn, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    if coalesce:
        out = drop_empty_blocks(out)
    return out


def concat_datasets(parts: list[Dataset]) -> Dataset:
    """Ref-level concatenation of (small, materialized) datasets.

    ``Dataset.union`` upstream of a keyed hash-shuffle trips Ray's
    schema-broadcast on empty partitions (aggregator finalize sorts a
    schema-less block); materializing each part and re-assembling from the
    non-empty block refs sidesteps the union operator entirely. Intended
    for pair tables and other outputs far smaller than the corpus."""
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

    Ray's hash shuffle emits schema-less (zero-COLUMN) blocks for empty
    partitions (see the TODO in ray.data plan_udf_map_op: "some all-to-all
    operators output empty blocks with no schema"); if such a block is used
    for a later shuffle's schema broadcast, that shuffle crashes. Blocks
    move nowhere here — only refs + metadata are touched on the driver.
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
