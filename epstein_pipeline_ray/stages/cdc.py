"""Changelog application (CDC merge / upsert) — the lakehouse MERGE INTO.

A snapshot table plus a stream of keyed change rows (upsert/delete with a
monotone version) collapses to the post-merge snapshot: per key the
highest-version row wins; a winning ``delete`` removes the key. This is
the incremental-ingest primitive every snapshot-diff / compaction flow
builds on (Delta/Hudi/Iceberg MERGE semantics, re-expressed as one keyed
exchange).

Plan: tag both inputs with (version, op), union, ONE key-keyed exchange,
then a vectorized last-write-wins pick per key-sorted block (sort +
keep-last, no per-group Python). The exchange moves only the projected
merge columns; at 10^12 rows the reduce is bounded by rows-per-key, and
skewed keys are just big blocks, not driver state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from epstein_pipeline_ray.stages.groupblock import map_key_blocks

OP_UPSERT = "upsert"
OP_DELETE = "delete"


def apply_changelog(
    snapshot: Dataset,
    changes: Dataset,
    key: str,
    value_cols: list[str],
    version_col: str = "version",
    op_col: str = "op",
    snapshot_version: int = 0,
    num_partitions: int | None = None,
) -> Dataset:
    """Merge ``changes`` (columns: key, version_col, op_col, value_cols)
    into ``snapshot`` (columns: key, value_cols — implicit version
    ``snapshot_version``, op upsert). Winner per key = the max version
    row ((version, is-change) tie: a change beats the snapshot at equal
    version); a winning delete drops the key. Output: (key, version_col,
    *value_cols) of surviving winners."""
    ktype = dict(zip(snapshot.schema().names, snapshot.schema().types))[key]
    vtypes = dict(zip(snapshot.schema().names, snapshot.schema().types))
    UNION = pa.schema(
        [(key, ktype), (version_col, pa.int64()), (op_col, pa.string()),
         ("__src", pa.int8())] + [(c, vtypes[c]) for c in value_cols])

    def tag_snapshot(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            key: batch[key],
            version_col: pa.array(np.full(n, snapshot_version, np.int64),
                                  pa.int64()),
            op_col: pa.array([OP_UPSERT] * n, pa.string()),
            "__src": pa.array(np.zeros(n, np.int8), pa.int8()),
            **{c: batch[c] for c in value_cols},
        }, schema=UNION)

    def tag_changes(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            key: batch[key],
            version_col: batch[version_col].cast(pa.int64()),
            op_col: batch[op_col],
            "__src": pa.array(np.ones(n, np.int8), pa.int8()),
            **{c: batch[c] for c in value_cols},
        }, schema=UNION)

    tagged = snapshot.select_columns([key] + value_cols).map_batches(
        tag_snapshot, batch_format="pyarrow", zero_copy_batch=True).union(
        changes.select_columns(
            [key, version_col, op_col] + value_cols).map_batches(
            tag_changes, batch_format="pyarrow", zero_copy_batch=True))

    OUT = pa.schema([(key, ktype), (version_col, pa.int64())]
                    + [(c, vtypes[c]) for c in value_cols])

    def pick_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        # full deterministic order: duplicate (key, version, src) rows —
        # legal in real changelogs — resolve on (op, value_cols), so both
        # engines pick the same winner (rows equal on ALL of these are
        # output-identical and the pick is immaterial)
        df = (block.to_pandas()
              .sort_values([key, version_col, "__src", op_col]
                           + value_cols, kind="mergesort")
              .drop_duplicates([key], keep="last"))
        df = df[df[op_col] == OP_UPSERT]
        return pa.table(
            {key: pa.array(df[key], ktype, from_pandas=True),
             version_col: pa.array(df[version_col].to_numpy(np.int64),
                                   pa.int64())}
            | {c: pa.array(df[c], vtypes[c], from_pandas=True)
               for c in value_cols},
            schema=OUT)

    return map_key_blocks(tagged, [key], pick_block, num_partitions)


def scd2_intervals(
    changes: Dataset,
    key: str,
    version_col: str,
    value_col: str,
    num_partitions: int | None = None,
) -> Dataset:
    """Slowly-changing-dimension type-2 history: each keyed change row
    becomes a validity interval [version, next version) under the
    per-key version order, the latest row staying open (NULL
    valid_to). The warehouse-history twin of :func:`apply_changelog` —
    MERGE keeps only the winner, SCD2 keeps every version with its
    reign. One keyed exchange; per key-sorted block the valid_to
    column is one vectorized shift (next row's version where the next
    row is the same key). Duplicate (key, version) rows are collapsed
    to one, keeping the maximum value (deterministic tie rule, shared
    with the twin). Output: (key, valid_from, valid_to, value)."""
    sch = dict(zip(changes.schema().names, changes.schema().types))
    ktype, vtype, valt = sch[key], sch[version_col], sch[value_col]
    OUT = pa.schema([(key, ktype), ("valid_from", vtype),
                     ("valid_to", vtype), (value_col, valt)])

    def block(block_: pa.Table) -> pa.Table:
        if block_.num_rows == 0:
            return OUT.empty_table()
        df = block_.to_pandas()
        # dedup (key, version) keeping max value — deterministic
        df = (df.groupby([key, version_col], sort=True)[value_col]
              .max().reset_index())
        k = df[key].to_numpy()
        ver = df[version_col].to_numpy()
        nxt = np.empty(len(df), dtype=object)
        nxt[:-1] = ver[1:]
        nxt[-1] = None
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[:-1] = k[:-1] == k[1:]
        valid_to = np.where(same, nxt, None)
        return pa.table({
            key: pa.array(df[key], ktype, from_pandas=True),
            "valid_from": pa.array(df[version_col], vtype, from_pandas=True),
            "valid_to": pa.array(valid_to, vtype, from_pandas=True),
            value_col: pa.array(df[value_col], valt, from_pandas=True),
        }, schema=OUT)

    return map_key_blocks(
        changes.select_columns([key, version_col, value_col]),
        [key], block, num_partitions, sort_blocks=False)


def field_diff(
    old: Dataset,
    new: Dataset,
    key: str,
    value_cols: list[str],
    num_partitions: int | None = None,
) -> Dataset:
    """Field-level snapshot diff — the CDC 'explain' report: for every
    key present in BOTH snapshots, one row per value column whose value
    changed (NULL-aware: NULL→value and value→NULL count as changes,
    NULL→NULL does not). Keys on one side only are out of scope here
    (dataset_diff reports those). One keyed exchange; per key-sorted
    block both sides align by position and every column compares
    vectorized. Duplicate keys per side collapse to the first row in
    (side, key) order — the deterministic snapshot convention. Output:
    (key, col, old_value:string, new_value:string)."""
    ktype = dict(zip(old.schema().names, old.schema().types))[key]
    OUT = pa.schema([(key, ktype), ("col", pa.string()),
                     ("old_value", pa.string()),
                     ("new_value", pa.string())])
    cols = [key] + value_cols

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(cols)
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, np.int8)))
        return fn

    unioned = (old.map_batches(tag(0), batch_format="pyarrow",
                               zero_copy_batch=True)
               .union(new.map_batches(tag(1), batch_format="pyarrow",
                                      zero_copy_batch=True)))

    def block(block_: pa.Table) -> pa.Table:
        if block_.num_rows == 0:
            return OUT.empty_table()
        df = block_.to_pandas()
        df = df.drop_duplicates(subset=[key, "__side"], keep="first")
        o = df[df["__side"] == 0].set_index(key)
        n = df[df["__side"] == 1].set_index(key)
        both = o.index.intersection(n.index)
        o, n = o.loc[both], n.loc[both]
        rows = {"k": [], "c": [], "ov": [], "nv": []}
        for c in value_cols:
            ov, nv = o[c], n[c]
            changed = ~((ov.isna() & nv.isna())
                        | (ov.notna() & nv.notna() & (ov == nv)))
            idx = both[changed.to_numpy()]
            rows["k"].extend(idx.tolist())
            rows["c"].extend([c] * len(idx))
            rows["ov"].extend(["" if pd.isna(v) else str(v)
                               for v in ov[changed]])
            rows["nv"].extend(["" if pd.isna(v) else str(v)
                               for v in nv[changed]])
        return pa.table({
            key: pa.array(rows["k"], ktype),
            "col": pa.array(rows["c"], pa.string()),
            "old_value": pa.array(rows["ov"], pa.string()),
            "new_value": pa.array(rows["nv"], pa.string()),
        }, schema=OUT)

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    return map_key_blocks(unioned, [key], block, num_partitions,
                          sort_blocks=False)
