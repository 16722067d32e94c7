"""Relational operators: grouped aggregates with partial pre-aggregation,
broadcast joins, top-k, windowed/sessionized event aggregation.

These carry the reference's stats/sort/join capabilities
(SURVEY.md §2.4-2.6: G9 stats, O1/O2 sort+top-k, J1/J6 broadcast lookups)
onto Ray Data, with the scale idioms baked in: pre-aggregate inside
``map_batches`` before the groupby shuffle, broadcast the small join side,
express windows as vectorized key derivation + groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from epstein_pipeline_ray.functions.rounding import sql_round
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def grouped_stats(
    ds: Dataset,
    keys: list[str],
    sum_cols: list[str] | None = None,
    mean_cols: list[str] | None = None,
    count_alias: str = "n",
) -> Dataset:
    """groupby(keys) count/sum/mean with *partial pre-aggregation*: each
    batch collapses to one row per key before the shuffle, so the all-to-all
    exchange moves per-key partials, not raw rows."""
    sum_cols = sum_cols or []
    mean_cols = mean_cols or []
    value_cols = sorted(set(sum_cols) | set(mean_cols))

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native hash aggregation (pa.TableGroupBy) — zero pandas
        # conversion in the hot partial (VERDICT r2 item 8). Semantics
        # match the pandas version it replaced: null keys form their own
        # group, sum skips null values, count counts rows.
        t = batch.select(keys + value_cols)
        specs = [(c, "sum") for c in value_cols] + [([], "count_all")]
        g = pa.TableGroupBy(t, keys).aggregate(specs)
        cols = {k: g[k] for k in keys}
        for c in value_cols:
            cols[f"__sum_{c}"] = g[f"{c}_sum"]
        cols["__cnt"] = g["count_all"]
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    aggs = [Sum("__cnt", alias_name=count_alias)]
    for c in value_cols:
        aggs.append(Sum(f"__sum_{c}", alias_name=f"__total_{c}"))
    out = partials.groupby(keys).aggregate(*aggs)

    def finalize(batch: pa.Table) -> pa.Table:
        # round with numpy, not pc.round: pyarrow's scale-multiply rounding
        # lands on different low bits than DuckDB/numpy for values like 62.8,
        # and the oracle comparison is bit-exact on rounded doubles
        t = batch
        n = np.asarray(t[count_alias].to_numpy(zero_copy_only=False), dtype=np.float64)
        for c in sum_cols:
            total = np.asarray(t[f"__total_{c}"].to_numpy(zero_copy_only=False), dtype=np.float64)
            t = t.append_column(f"sum_{c}", pa.array(sql_round(total, 4), pa.float64()))
        for c in mean_cols:
            total = np.asarray(t[f"__total_{c}"].to_numpy(zero_copy_only=False), dtype=np.float64)
            t = t.append_column(f"avg_{c}", pa.array(sql_round(total / n, 4), pa.float64()))
        drop = [f"__total_{c}" for c in value_cols]
        return t.drop_columns(drop)

    return out.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_join(
    left: Dataset, right_df: pd.DataFrame, on: str, how: str = "inner"
) -> Dataset:
    """Join a Dataset against a small pandas side: ``ray.put`` once, pandas
    merge per batch (reference J1/J6 broadcast-lookup pattern)."""
    ref = ray.put(right_df)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), on=on, how=how)

    return left.map_batches(join, batch_format="pandas")


def top_k(ds: Dataset, col: str, k: int, descending: bool = True,
          tie_cols: list[str] | None = None) -> Dataset:
    """Global top-k: per-batch partial top-k → tiny global sort+limit.

    Avoids a full distributed sort of the input (reference O1/O2 sorts the
    whole pair list driver-side). With ``tie_cols`` the boundary is
    deterministic: the partial keeps EVERY row tied at the k-th value and
    truncates by (col, *tie_cols ascending), and the final limit sorts by
    the same keys — so the result row SET is batching-invariant (the SQL
    ``ORDER BY col DESC, tie LIMIT k`` convention). Without it, rows tied
    at the boundary are kept arbitrarily (plain ``ORDER BY col LIMIT k``
    semantics — only safe when ``col`` is duplicate-free)."""
    direction = "descending" if descending else "ascending"

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.select_k_unstable(batch, k=k, sort_keys=[(col, direction)])
        if not tie_cols:
            return batch.take(idx)
        # widen the arbitrary boundary-tie subset to every tie, then cut
        # deterministically by (col, *tie_cols)
        taken = batch.take(idx)
        thresh = (pc.min(taken[col]) if descending
                  else pc.max(taken[col]))
        mask = (pc.greater_equal(batch[col], thresh) if descending
                else pc.less_equal(batch[col], thresh))
        sub = batch.filter(mask).sort_by(
            [(col, direction)] + [(c, "ascending") for c in tie_cols])
        return sub.slice(0, k)

    pruned = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
    if tie_cols:
        return pruned.sort([col] + tie_cols,
                           descending=[descending]
                           + [False] * len(tie_cols)).limit(k)
    return pruned.sort(col, descending=descending).limit(k)


def events_tumbling_window(
    events: Dataset, window: str = "hour",
    keys: list[str] | None = None, value_col: str = "value",
) -> Dataset:
    """Tumbling event-time window: floor ts to the window (vectorized),
    then grouped_stats on (window_start, *keys). Batch semantics — Ray Data
    has no watermarks; the input is a finite log (SURVEY.md §2.9)."""
    keys = keys or ["event_type"]

    def add_window(batch: pa.Table) -> pa.Table:
        return batch.append_column("window_start", pc.floor_temporal(batch["ts"], unit=window))

    windowed = events.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_stats(windowed, ["window_start"] + keys, sum_cols=[value_col])


def sessionize(events: Dataset, gap_minutes: int = 30,
               num_partitions: int | None = None) -> Dataset:
    """Per-user session stats with a 30-min inactivity gap.

    One keyed exchange on user_id co-locates each user's events, then ONE
    vectorized pass per block handles every user in it: sort by
    (user_id, ts), session boundaries = user change OR gap exceeded,
    per-session aggregates via ``np.add.reduceat`` over the boundary runs.
    No per-group Python dispatch (``map_groups`` costs ~ms per user —
    the engine's own groupblock.py rationale; re-plumbed per VERDICT r1)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    gap_us = np.int64(gap_minutes) * 60 * 1_000_000
    out_schema = pa.schema(
        [("user_id", pa.int64()), ("session_idx", pa.int64()),
         ("n_events", pa.int64()), ("sum_value", pa.float64()),
         ("duration_sec", pa.float64())]
    )

    def per_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        df = block.to_pandas().sort_values(["user_id", "ts"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy()
        val = df["value"].to_numpy()
        n = len(df)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new_sess)
        ends = np.concatenate([starts[1:], [n]])
        # session_idx: global session ordinal minus the user's first ordinal
        gsid = np.cumsum(new_sess) - 1
        user_first_gsid = gsid[np.flatnonzero(new_user)]
        user_ord = np.cumsum(new_user) - 1
        session_idx = (gsid - user_first_gsid[user_ord])[starts]
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_idx": pa.array(session_idx, pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "sum_value": pa.array(
                    sql_round(np.add.reduceat(val, starts), 4), pa.float64()),
                "duration_sec": pa.array(
                    sql_round((ts[ends - 1] - ts[starts]) / 1e6, 4), pa.float64()),
            },
            schema=out_schema,
        )

    pruned = events.select_columns(["user_id", "ts", "value"])
    return map_key_blocks(pruned, ["user_id"], per_block, num_partitions,
                          sort_blocks=False)


def props_key_sum(events: Dataset) -> Dataset:
    """JSON side-data extraction: pull integer ``k`` out of the props JSON
    string (vectorized regex) and sum per event_type — the reference's
    metadata-parse-then-aggregate shape (importers + G9)."""

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["props"], pattern=r"\"k\":\s*(?P<k>\d+)")
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": batch["event_type"], "k": k})

    extracted = events.select_columns(["event_type", "props"]).map_batches(
        extract, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_stats(extracted, ["event_type"], sum_cols=["k"])


def asof_join(
    left: Dataset,
    right: Dataset,
    by: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_col: str | None = None,
) -> Dataset:
    """Inner as-of join: for each left row, attach the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``by`` key (ties
    on right_ts broken by the greatest ``tie_col``). Left rows with no
    match are dropped.

    Ray Data has no asof join; this is the composition pattern: align both
    sides to one schema (typed nulls for the other side's columns), ONE
    keyed exchange on ``by`` co-locates each key's rows, then a vectorized
    ``pandas.merge_asof`` per key-partition block. The partitioning
    assumption: one ``by`` key's rows fit one block (same assumption every
    keyed window here makes); keys are hash-spread across partitions."""
    import pandas as pd

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    left_schema = left.schema()
    right_schema = right.schema()
    left_out = list(left_schema.names)
    r_keep = [right_ts] + right_cols
    rtypes = {n: t for n, t in zip(right_schema.names, right_schema.types)}
    ltypes = {n: t for n, t in zip(left_schema.names, left_schema.types)}
    unified = left_out + r_keep + ["__side"]

    def nulls(n: int, typ) -> pa.Array:
        return pa.nulls(n, typ)

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in left_out}
        for c in r_keep:
            cols[c] = nulls(batch.num_rows, rtypes[c])
        cols["__side"] = pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        return pa.table({c: cols[c] for c in unified})

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in left_out:
            cols[c] = batch[c] if c == by else nulls(batch.num_rows, ltypes[c])
        for c in r_keep:
            cols[c] = batch[c]
        cols["__side"] = pa.array(np.ones(batch.num_rows, dtype=np.int8))
        return pa.table({c: cols[c] for c in unified})

    lt = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.select_columns(sorted(set([by] + r_keep))).map_batches(
        tag_right, batch_format="pyarrow", zero_copy_batch=True
    )
    unioned = lt.union(rt)
    out_schema = pa.schema(
        [(c, ltypes[c]) for c in left_out] + [(c, rtypes[c]) for c in right_cols]
    )

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        l = df[df["__side"] == 0][left_out].sort_values(left_ts, kind="mergesort")
        r = df[df["__side"] == 1][[by] + r_keep]
        sort_keys = [right_ts] + ([tie_col] if tie_col else [])
        r = r.sort_values(sort_keys, kind="mergesort").reset_index(drop=True)
        if not len(l) or not len(r):
            return out_schema.empty_table()
        # Match detection rides an always-non-null right row index, NOT a
        # user data column (ADVICE r1: a matched right row whose first
        # requested column is NULL must survive); the requested right
        # columns are re-attached by row-index take, so int64 columns never
        # pass through merge_asof's NaN float promotion.
        r["__ridx"] = np.arange(len(r), dtype=np.int64)
        merged = pd.merge_asof(
            l, r[[by, right_ts, "__ridx"]], left_on=left_ts, right_on=right_ts,
            by=by, direction="backward", allow_exact_matches=True,
        )
        matched = merged["__ridx"].notna().to_numpy()
        ridx = merged.loc[matched, "__ridx"].to_numpy().astype(np.int64)
        out = merged.loc[matched, left_out].reset_index(drop=True)
        for c in right_cols:
            out[c] = r[c].to_numpy()[ridx]
        return pa.Table.from_pandas(
            out.reset_index(drop=True), preserve_index=False
        ).cast(out_schema)

    return map_key_blocks(unioned, [by], per_block)


def events_dedup(events: Dataset, num_partitions: int | None = None) -> Dataset:
    """Cross-partition event dedup (reference G12: temporal_extractor.py
    :281-323 — key (date, event_type), keep the highest-confidence record).

    Here: one surviving event per (user_id, event_type, hour) — the row
    with max ``value`` (ties → min event_id, deterministic). One keyed
    exchange, then a vectorized per-block groupby-idxmax."""
    import pyarrow.compute as pc

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    def add_hour(batch: pa.Table) -> pa.Table:
        return batch.append_column("hour", pc.floor_temporal(batch["ts"], unit="hour"))

    keyed = events.select_columns(["event_id", "ts", "user_id", "event_type", "value"]).map_batches(
        add_hour, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.schema(
                [("user_id", pa.int64()), ("event_type", pa.string()),
                 ("hour", pa.timestamp("us")), ("event_id", pa.int64()),
                 ("value", pa.float64())]
            ).empty_table()
        df = df.sort_values(["user_id", "event_type", "hour", "value", "event_id"],
                            ascending=[True, True, True, False, True], kind="mergesort")
        out = df.drop_duplicates(["user_id", "event_type", "hour"], keep="first")
        return pa.Table.from_pandas(
            out[["user_id", "event_type", "hour", "event_id", "value"]].reset_index(drop=True),
            preserve_index=False,
        )

    return map_key_blocks(keyed, ["user_id", "event_type"], per_block, num_partitions)


def sample_per_group(ds: Dataset, key: str, order_col: str, k: int,
                     num_partitions: int | None = None) -> Dataset:
    """Deterministic per-group sample: the first ``k`` rows of each group
    by ``order_col`` (reference O6's bounded per-entity sampling,
    config.py:203 auditor_max_doc_chunks). One keyed exchange + a
    vectorized block pass — SQL twin: row_number() OVER (PARTITION BY key
    ORDER BY order_col) <= k."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    cols = ds.schema().names

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return block
        df = df.sort_values([key, order_col], kind="mergesort")
        out = df.groupby(key, sort=False).head(k)
        return pa.Table.from_pandas(out[cols].reset_index(drop=True),
                                    preserve_index=False)

    return map_key_blocks(ds, [key], per_block, num_partitions)


# the reference's EFTA-number → DOJ dataset-release ranges (public data;
# reference importers/sea_doughnut.py:58-74)
EFTA_DATASET_RANGES: list[tuple[int, int, int]] = [
    (1, 1, 3158), (2, 3159, 3857), (3, 3858, 5586), (4, 5705, 8320),
    (5, 8409, 8528), (6, 8529, 8998), (7, 9016, 9664), (8, 9676, 39023),
    (9, 39025, 1262781), (10, 1262782, 2212882), (11, 2212883, 2730262),
    (12, 2730265, 2731783),
]


def range_bucket_lookup(
    ds: Dataset,
    col: str,
    ranges: list[tuple[int, int, int]],
    out_col: str = "bucket",
) -> Dataset:
    """Assign each row the bucket whose [lo, hi] range contains ``col``
    (NULL in the gaps) — the reference's EFTA→dataset provenance mapping
    (importers/sea_doughnut.py:97-107), generalized.

    The range table is a static constant compiled into the stage closure
    (a dozen rows — no broadcast needed); the per-batch lookup is one
    ``np.searchsorted`` against the sorted range starts plus an upper-bound
    check, never a per-row scan of the ranges.
    """
    srt = sorted(ranges, key=lambda r: r[1])
    starts = np.array([lo for _, lo, _ in srt], dtype=np.int64)
    ends = np.array([hi for _, _, hi in srt], dtype=np.int64)
    buckets = np.array([b for b, _, _ in srt], dtype=np.int64)

    def add(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        null_mask = np.asarray(pc.is_null(c))
        v = np.asarray(pc.fill_null(c, 0).cast(pa.int64()))
        idx = np.searchsorted(starts, v, side="right") - 1
        safe = np.clip(idx, 0, len(starts) - 1)
        ok = (idx >= 0) & (v <= ends[safe]) & ~null_mask
        vals = pa.array(buckets[safe], pa.int64())
        out = pc.if_else(pa.array(ok), vals, pa.nulls(len(v), pa.int64()))
        return batch.append_column(out_col, out)

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def topk_per_group(ds: Dataset, key: str, value_col: str, k: int,
                   tie_col: str, num_partitions: int | None = None) -> Dataset:
    """Top-``k`` rows per group by ``value_col`` descending (ties broken by
    ``tie_col`` ascending, so membership is deterministic) — the per-entity
    variant of O2's top-k (reference keeps the N highest-confidence
    links/chunks per person, person_linker.py).

    Scale shape: a map-side combiner prunes every batch to its local
    top-k per key BEFORE the exchange, so the keyed shuffle moves at most
    k rows per (key, batch) instead of the full table; the reduce side is
    one vectorized sort+head per key-sorted block.
    """
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    cols = ds.schema().names

    def local_prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if len(df) <= k:
            return batch
        df = df.sort_values([key, value_col, tie_col], kind="mergesort",
                            ascending=[True, False, True])
        out = df.groupby(key, sort=False).head(k)
        return pa.Table.from_pandas(out[cols].reset_index(drop=True),
                                    preserve_index=False)

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return block
        df = df.sort_values([key, value_col, tie_col], kind="mergesort",
                            ascending=[True, False, True])
        out = df.groupby(key, sort=False).head(k)
        return pa.Table.from_pandas(out[cols].reset_index(drop=True),
                                    preserve_index=False)

    pruned = ds.map_batches(local_prune, batch_format="pyarrow", zero_copy_batch=True)
    return map_key_blocks(pruned, [key], per_block, num_partitions)


def with_prev_delta(ds: Dataset, key: str, ts_col: str, tie_col: str,
                    out_col: str = "delta_us",
                    num_partitions: int | None = None) -> Dataset:
    """LAG window: microseconds since the previous row of the same group
    in (ts, tie) order; NULL for each group's first row. One keyed
    exchange + a vectorized diff per key-sorted block (never a per-group
    Python call) — SQL twin:
    ``date_diff('microsecond', lag(ts) OVER (PARTITION BY key ORDER BY
    ts, tie), ts)``.
    """
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    cols = ds.schema().names

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.Table.from_pandas(df.assign(**{out_col: pd.Series([], dtype="float64")}),
                                        preserve_index=False)
        df = df.sort_values([key, ts_col, tie_col], kind="mergesort").reset_index(drop=True)
        ts_us = df[ts_col].astype("int64")  # datetime64[us] → microseconds
        delta = ts_us.diff()  # float64, first row NaN
        same = df[key].eq(df[key].shift())
        # float64 (NaN = no previous row): nullable ints don't survive the
        # driver's column canonicalization
        df[out_col] = delta.where(same)
        return pa.Table.from_pandas(df[cols + [out_col]], preserve_index=False)

    return map_key_blocks(ds, [key], per_block, num_partitions)


def grouped_median(ds: Dataset, key: str, value_col: str,
                   out_col: str = "median_value",
                   num_partitions: int | None = None) -> Dataset:
    """Exact per-group median. Unlike count/sum/mean (grouped_stats),
    a median is not decomposable into map-side partials — it genuinely
    needs every group member co-located, so this is one keyed exchange
    (values only, pruned columns) + a vectorized pandas groupby.median
    per key-sorted block. Even-sized groups interpolate the middle two
    (same convention as the SQL ``median``)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    pruned = ds.select_columns([key, value_col])

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.table({key: block[key],
                             out_col: pa.array([], pa.float64())})
        med = df.groupby(key, sort=True)[value_col].median().reset_index()
        med.columns = [key, out_col]
        med[out_col] = sql_round(med[out_col].to_numpy(np.float64), 6)
        return pa.Table.from_pandas(med, preserve_index=False)

    return map_key_blocks(pruned, [key], per_block, num_partitions)


def with_running_sum(ds: Dataset, key: str, order_col: str, tie_col: str,
                     value_col: str, out_col: str = "running_sum",
                     num_partitions: int | None = None) -> Dataset:
    """Cumulative-sum window per group in (order, tie) order — one keyed
    exchange + a vectorized groupby.cumsum per block. SQL twin:
    ``sum(v) OVER (PARTITION BY key ORDER BY order_col, tie_col)``."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    cols = ds.schema().names

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.Table.from_pandas(
                df.assign(**{out_col: pd.Series([], dtype="float64")}),
                preserve_index=False)
        df = df.sort_values([key, order_col, tie_col], kind="mergesort").reset_index(drop=True)
        df[out_col] = sql_round(
            df.groupby(key, sort=False)[value_col].cumsum().to_numpy(np.float64), 6)
        return pa.Table.from_pandas(df[cols + [out_col]], preserve_index=False)

    return map_key_blocks(ds, [key], per_block, num_partitions)


def grouped_count_distinct(ds: Dataset, key: str, value_col: str,
                           out_col: str = "n_distinct",
                           num_partitions: int | None = None) -> Dataset:
    """Exact COUNT(DISTINCT value) per group, two-phase: every batch
    first collapses to its distinct (key, value) pairs (map-side dedup —
    the shuffle then moves at most one row per distinct pair per batch,
    not the raw table), then one keyed exchange + a vectorized nunique
    per key-sorted block."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    pruned = ds.select_columns([key, value_col])

    def local_distinct(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.table({key: block[key], out_col: pa.array([], pa.int64())})
        out = df.groupby(key, sort=True)[value_col].nunique().reset_index()
        out.columns = [key, out_col]
        out[out_col] = out[out_col].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    deduped = pruned.map_batches(local_distinct, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return map_key_blocks(deduped, [key], per_block, num_partitions)


def kmv_distinct_per_group(ds: Dataset, key: str, value_col: str, k: int = 256,
                           out_col: str = "n_distinct_est",
                           num_partitions: int | None = None) -> Dataset:
    """Approximate COUNT(DISTINCT) per group via a K-Minimum-Values
    sketch (Bar-Yossef et al. 2002): keep the k smallest distinct 64-bit
    value hashes per group; estimate (k-1)·2^64/kth_min once the sketch
    is full, exact below k. KMV partials are mergeable (union, re-trim),
    so each batch ships at most k rows per key through the exchange no
    matter how many raw rows it held — the sketch twin of
    ``grouped_count_distinct`` for when even distinct pairs are too many.
    Exact-sibling query: user_event_types★; accuracy property test in
    tests/test_queries-adjacent suite."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    pruned = ds.select_columns([key, value_col])
    TWO64 = float(2 ** 64)

    def _hash(df):
        return pd.util.hash_array(df[value_col].to_numpy(), categorize=False)

    def local_sketch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return pa.table({key: batch[key], "__h": pa.array([], pa.uint64())})
        df = df.assign(__h=_hash(df)).drop(columns=[value_col]).drop_duplicates()
        df = df.sort_values([key, "__h"], kind="mergesort")
        df = df.groupby(key, sort=False).head(k)
        return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.table({key: block[key], out_col: pa.array([], pa.float64())})
        df = df.drop_duplicates().sort_values([key, "__h"], kind="mergesort")
        df["__rank"] = df.groupby(key, sort=False).cumcount()
        sizes = df.groupby(key, sort=True).size()
        est = sizes.astype("float64")
        kth = df[df["__rank"] == k - 1].set_index(key)["__h"]  # full sketches only
        if len(kth):
            est.loc[kth.index] = (k - 1) * TWO64 / kth.astype("float64")
        out = est.reset_index()
        out.columns = [key, out_col]
        out[out_col] = sql_round(out[out_col].to_numpy(np.float64), 1)
        return pa.Table.from_pandas(out, preserve_index=False)

    sk = pruned.map_batches(local_sketch, batch_format="pyarrow", zero_copy_batch=True)
    return map_key_blocks(sk, [key], per_block, num_partitions)


def hll_distinct_per_group(ds: Dataset, key: str, value_col: str, p: int = 12,
                           out_col: str = "n_distinct_est",
                           num_partitions: int | None = None) -> Dataset:
    """Approximate COUNT(DISTINCT) per group via HyperLogLog (Flajolet et
    al. 2007): 2^p uint8 registers per key. Each batch collapses to ONE
    fixed-size register blob per key (4 KiB at p=12) regardless of raw
    row count — the exchange moves sketch rows, never values — and the
    reduce side merges blobs by elementwise max before the standard
    bias-corrected harmonic estimate (linear counting below 2.5m).
    Standard error ~1.04/sqrt(2^p) (~1.6% at p=12); the mergeable sibling
    of ``kmv_distinct_per_group`` with O(1)-size partials per key."""
    from epstein_pipeline_ray.stages.groupblock import group_starts, map_key_blocks

    m = 1 << p
    rem_bits = 64 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    pruned = ds.select_columns([key, value_col])
    SKETCH = None  # derived per batch (key type varies)

    def local_sketch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        ktype = batch[key].type if not isinstance(batch[key], pa.ChunkedArray) \
            else batch[key].combine_chunks().type
        if not len(df):
            return pa.table({key: pa.array([], ktype),
                             "__regs": pa.array([], pa.large_binary())})
        h = pd.util.hash_array(df[value_col].to_numpy(), categorize=False)
        bucket = (h >> np.uint64(rem_bits)).astype(np.int64)
        rem = h & np.uint64((1 << rem_bits) - 1)
        # rank = leading zeros within rem_bits + 1; frexp exponent is the
        # bit length of rem (exact: rem < 2^52 <= float64 mantissa)
        _, e = np.frexp(rem.astype(np.float64))
        rank = np.where(rem > 0, rem_bits - e + 1, rem_bits + 1).astype(np.uint8)
        codes, uniques = pd.factorize(df[key], use_na_sentinel=False)
        regs = np.zeros((len(uniques), m), dtype=np.uint8)
        np.maximum.at(regs, (codes, bucket), rank)
        return pa.table({
            key: pa.array(uniques, ktype),
            "__regs": pa.array([r.tobytes() for r in regs], pa.large_binary()),
        })

    def per_block(block: pa.Table) -> pa.Table:
        ktype = block.schema.field(key).type
        if block.num_rows == 0:
            return pa.table({key: pa.array([], ktype),
                             out_col: pa.array([], pa.float64())})
        block = block.combine_chunks().sort_by([(key, "ascending")])
        karr = block[key]
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        codes = np.asarray(karr.dictionary_encode().indices)
        starts = group_starts(codes)
        blobs = block["__regs"].to_pylist()
        all_regs = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(-1, m)
        ends = np.concatenate([starts[1:], [len(codes)]])
        ests = np.empty(len(starts), dtype=np.float64)
        for g, (s, e) in enumerate(zip(starts, ends)):
            regs = all_regs[s:e].max(axis=0) if e - s > 1 else all_regs[s]
            est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
            if est <= 2.5 * m:
                zeros = int(np.count_nonzero(regs == 0))
                if zeros:
                    est = m * np.log(m / zeros)
            ests[g] = est
        return pa.table({
            key: karr.take(pa.array(starts)),
            out_col: pa.array(sql_round(ests, 1), pa.float64()),
        })

    sk = pruned.map_batches(local_sketch, batch_format="pyarrow", zero_copy_batch=True)
    return map_key_blocks(sk, [key], per_block, num_partitions, sort_blocks=False)


def sampled_quantile_per_group(
    ds: Dataset, key: str, value_col: str, id_col: str, q: float,
    k: int = 1024, out_col: str = "quantile_est",
    num_partitions: int | None = None,
) -> Dataset:
    """Approximate per-group quantile from a DETERMINISTIC uniform row
    sample: keep the k rows with the smallest 64-bit ``hash(id)`` per
    group (bottom-k-by-hash — the row-sampling analog of the KMV distinct
    sketch). Bottom-k of a union is the bottom-k of per-part bottom-ks,
    so partials are mergeable and the result is EXACTLY invariant to how
    rows are batched; groups with <= k rows return the exact
    ``quantile_cont`` value. Rank-space standard error sqrt(q(1-q)/k)
    (~1% at k=1024). The exact sibling is ``grouped_quantile`` (one
    values-only exchange of EVERY row); this is for groups too large to
    co-locate."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    pruned = ds.select_columns([key, id_col, value_col])

    def local_sample(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return pa.table({key: batch[key],
                             "__h": pa.array([], pa.uint64()),
                             value_col: batch[value_col]})
        df = df.assign(__h=pd.util.hash_array(df[id_col].to_numpy(),
                                              categorize=False))
        df = df.drop(columns=[id_col]).sort_values([key, "__h"],
                                                   kind="mergesort")
        df = df.groupby(key, sort=False).head(k)
        return pa.Table.from_pandas(df[[key, "__h", value_col]].reset_index(drop=True),
                                    preserve_index=False)

    def per_block(block: pa.Table) -> pa.Table:
        ktype = block.schema.field(key).type
        if block.num_rows == 0:
            return pa.table({key: pa.array([], ktype),
                             out_col: pa.array([], pa.float64())})
        df = block.to_pandas().sort_values([key, "__h"], kind="mergesort")
        df = df.groupby(key, sort=False).head(k)
        g = df.groupby(key, sort=True)[value_col].quantile(q, interpolation="linear")
        return pa.table({key: pa.array(g.index, ktype),
                         out_col: pa.array(sql_round(g.to_numpy(np.float64), 6),
                                           pa.float64())})

    sk = pruned.map_batches(local_sample, batch_format="pyarrow",
                            zero_copy_batch=True)
    return map_key_blocks(sk, [key], per_block, num_partitions)


def misra_gries_topk_per_group(
    ds: Dataset, key: str, value_col: str, k: int = 10, capacity: int = 256,
    num_partitions: int | None = None,
) -> Dataset:
    """Approximate heavy hitters per group via Misra–Gries summaries
    (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
    Summaries", PODS'12): each batch keeps at most ``capacity`` counters
    per key; the reduce side sums matching counters and subtracts the
    (capacity+1)-th largest.

    Guarantees (per group, N = group row count): every value with true
    frequency > N/capacity is present, and each reported ``count_est``
    undercounts its true frequency by at most N/capacity. Estimates
    depend on merge order (NOT batching-invariant — the bound is).
    Output: top ``k`` surviving counters per group,
    (key, value, count_est), count desc / value asc. The exact sibling is
    ``grouped_stats`` + ``topk_per_group`` (top_events_per_user★); this
    is for value domains too wide to exchange exactly."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    pruned = ds.select_columns([key, value_col])

    def _trim(df: pd.DataFrame) -> pd.DataFrame:
        """Misra-Gries trim: per key keep `capacity` counters, subtracting
        the (capacity+1)-th count from survivors (vectorized per key)."""
        df = df.sort_values([key, "__cnt"], ascending=[True, False],
                            kind="mergesort")
        pos = df.groupby(key, sort=False).cumcount()
        kth = df[pos == capacity].set_index(key)["__cnt"]  # (cap+1)-th largest
        if len(kth):
            sub = df[key].map(kth).fillna(0).astype(np.int64)
            df = df.assign(__cnt=df["__cnt"] - sub)
            df = df[df["__cnt"] > 0]
        return df

    def local_summary(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return pa.table({key: batch[key], value_col: batch[value_col],
                             "__cnt": pa.array([], pa.int64())})
        g = (df.groupby([key, value_col], sort=False).size()
             .rename("__cnt").reset_index())
        return pa.Table.from_pandas(_trim(g), preserve_index=False)

    def per_block(block: pa.Table) -> pa.Table:
        ktype = block.schema.field(key).type
        vtype = block.schema.field(value_col).type
        if block.num_rows == 0:
            return pa.table({key: pa.array([], ktype),
                             value_col: pa.array([], vtype),
                             "count_est": pa.array([], pa.int64())})
        df = block.to_pandas()
        merged = (df.groupby([key, value_col], sort=False)["__cnt"].sum()
                  .reset_index())
        merged = _trim(merged)
        merged = merged.sort_values([key, "__cnt", value_col],
                                    ascending=[True, False, True],
                                    kind="mergesort")
        top = merged[merged.groupby(key, sort=False).cumcount() < k]
        top = top.rename(columns={"__cnt": "count_est"})
        return pa.Table.from_pandas(top.reset_index(drop=True),
                                    preserve_index=False)

    sk = pruned.map_batches(local_summary, batch_format="pyarrow",
                            zero_copy_batch=True)
    return map_key_blocks(sk, [key], per_block, num_partitions)


def grouped_quantile(ds: Dataset, key: str, value_col: str, q: float,
                     out_col: str = "quantile_value",
                     num_partitions: int | None = None) -> Dataset:
    """Exact per-group continuous quantile (linear interpolation — the
    SQL ``quantile_cont`` convention; grouped_median is the q=0.5 case).
    Like the median this is non-decomposable, so: one values-only keyed
    exchange + a vectorized groupby.quantile per block."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    pruned = ds.select_columns([key, value_col])

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.table({key: block[key], out_col: pa.array([], pa.float64())})
        # dropna=False: SQL GROUP BY keeps a single NULL-key group;
        # pandas' quantile already ignores NaN values (quantile_cont).
        out = (df.groupby(key, sort=True, dropna=False)[value_col]
                 .quantile(q, interpolation="linear").reset_index())
        out.columns = [key, out_col]
        out[out_col] = sql_round(out[out_col].to_numpy(np.float64), 6)
        return pa.Table.from_pandas(out, preserve_index=False)

    return map_key_blocks(pruned, [key], per_block, num_partitions)


def grouped_quantile_disc(ds: Dataset, key: str, value_col: str, q: float,
                          out_col: str = "quantile_value",
                          num_partitions: int | None = None) -> Dataset:
    """Exact per-group DISCRETE quantile — returns an actual element of
    the group, never an interpolation (the SQL ``quantile_disc``
    convention, empirically pinned: rank = max(ceil(q·n), 1), 1-indexed
    over the sorted values; NOT pandas' interpolation='lower', which
    disagrees at e.g. n=10, q=0.31). Float-free selection, so the twin
    matches hash-exactly with no rounding pin. Null keys form a single
    group (SQL GROUP BY) and null VALUES are excluded from the rank (the
    quantile_disc convention; an all-null group yields NULL). One
    values-only keyed exchange + a vectorized rank take per block (no
    per-group Python)."""
    import math

    from epstein_pipeline_ray.stages.groupblock import (
        group_starts,
        map_key_blocks,
    )

    types = dict(zip(ds.schema().names, ds.schema().types))
    OUT = pa.schema([(key, types[key]), (out_col, types[value_col])])
    pruned = ds.select_columns([key, value_col])

    def per_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        block = block.combine_chunks().sort_by(
            [(key, "ascending"), (value_col, "ascending")])
        kcol = block[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        enc = kcol.dictionary_encode()
        idx = enc.indices
        if idx.null_count:
            # null keys form ONE group (SQL GROUP BY semantics) — raw
            # null indices become NaN under np.asarray and NaN != NaN
            # would split every null row into its own group. sort_by
            # put them contiguous at the end; give them a fresh code.
            idx = pc.fill_null(idx, len(enc.dictionary))
        codes = np.asarray(idx)
        starts = group_starts(codes)
        vcol = block[value_col]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        # quantile_disc ignores NULL values: sort_by placed them at the
        # end of each group, so the valid run is the group prefix —
        # rank over the per-group VALID count, not the raw count.
        valid = np.asarray(pc.is_valid(vcol)).astype(np.int64)
        ends = np.concatenate([starts[1:], [len(codes)]])
        n_valid = np.add.reduceat(valid, starts)
        n_valid[starts == ends] = 0  # reduceat quirk on empty runs
        # rank = max(ceil(q*n), 1), 1-indexed → 0-indexed offset
        ranks = np.maximum(np.ceil(q * n_valid).astype(np.int64), 1) - 1
        pos = starts + np.minimum(ranks, np.maximum(n_valid - 1, 0))
        empty = n_valid == 0  # all-null group → NULL quantile
        take = pa.array(np.where(empty, 0, pos), pa.int64(), mask=empty)
        return pa.table({key: kcol.take(pa.array(starts)),
                         out_col: vcol.take(take)}, schema=OUT)

    return map_key_blocks(pruned, [key], per_block, num_partitions,
                          sort_blocks=False)


def assign_split(ds: Dataset, id_col: str = "doc_id",
                 val_pct: int = 5, test_pct: int = 5,
                 out_col: str = "split") -> Dataset:
    """Deterministic leakage-free train/val/test assignment by integer
    key: bucket = ((id % 2^31) * 1103515245 + 12345) % 2^31 % 100 (LCG
    mixing, pure int64 arithmetic — overflow-free in both numpy and a
    SQL BIGINT, unlike a 2654435761 multiply at 10^12-scale ids), then
    val for bucket < val_pct, test for the next test_pct, train
    otherwise. Splitting on the GROUP key (conv/doc id, not row id)
    keeps every turn of a conversation on one side — the leakage rule a
    transcript pipeline needs. Embarrassingly parallel map_batches; the
    mixing step decorrelates the split from id order so range-partitioned
    corpora don't put one shard entirely in val.

    String keys need a pre-hash to int (not SQL-mirrorable here); the
    driver query runs on integer doc ids.
    """

    def add(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        h = ((ids % 2147483648) * 1103515245 + 12345) % 2147483648
        b = h % 100
        split = np.where(b < val_pct, "val",
                         np.where(b < val_pct + test_pct, "test",
                                  "train")).astype(object)
        return batch.append_column(out_col, pa.array(split, pa.string()))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def with_trailing_window_agg(ds: Dataset, key: str, ts_col: str,
                             value_col: str, window_us: int,
                             num_partitions: int | None = None) -> Dataset:
    """RANGE-frame sliding window: for every event, the count and sum of
    the same entity's events in the trailing ``window_us`` microseconds
    (inclusive of the current row and of ties at the boundary) — the
    rate-limit / burst-detection window the ROWS-frame family
    (with_running_sum, with_prev_delta) cannot express. One keyed
    exchange + a vectorized two-pointer per key-sorted block: the left
    edge per row is a searchsorted over the same block (O(n log n),
    no per-row Python). SQL twin:
    ``count(*)/sum(v) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN
    <window> PRECEDING AND CURRENT ROW)``.

    Output: input columns + w_count:int64 + w_sum:float64 (rounded 6).
    Rows tied on ts within a key get identical frame results, matching
    the SQL RANGE peer-row convention.
    """
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    cols = ds.schema().names

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.Table.from_pandas(
                df.assign(w_count=pd.Series([], dtype="int64"),
                          w_sum=pd.Series([], dtype="float64")),
                preserve_index=False)
        df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        keys = df[key].to_numpy()
        ts = df[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        val = df[value_col].to_numpy(np.float64)
        new = np.concatenate([[True], keys[1:] != keys[:-1]])
        gstart = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        csum = np.concatenate([[0.0], np.cumsum(val)])
        n = len(df)
        # RANGE frame: identical ts rows are peers — every row's frame
        # ends at the LAST row of its ts run and starts at the first row
        # with ts >= ts - window (within the key group). Vectorized as ONE
        # searchsorted over a collision-free (group, ts-offset) encoding;
        # if the encoding cannot fit int64 (huge ts span x many groups),
        # fall back to a per-group loop.
        rel = ts - ts.min()
        k_enc = int(rel.max()) + window_us + 2
        n_groups = int(gid[-1]) + 1
        if k_enc > 0 and n_groups < (2**62) // k_enc:
            enc = gid * k_enc + rel
            left = np.searchsorted(enc, enc - window_us, side="left")
            right = np.searchsorted(enc, enc, side="right")
        else:
            left = np.empty(n, dtype=np.int64)
            right = np.empty(n, dtype=np.int64)
            for s, e in zip(gstart, np.concatenate([gstart[1:], [n]])):
                seg = ts[s:e]
                left[s:e] = s + np.searchsorted(seg, seg - window_us, "left")
                right[s:e] = s + np.searchsorted(seg, seg, side="right")
        df["w_count"] = (right - left).astype(np.int64)
        df["w_sum"] = sql_round(csum[right] - csum[left], 6)
        return pa.Table.from_pandas(df[cols + ["w_count", "w_sum"]],
                                    preserve_index=False)

    return map_key_blocks(ds, [key], per_block, num_partitions)


def deterministic_sample(ds: Dataset, k: int, id_col: str = "doc_id") -> Dataset:
    """Global deterministic k-row sample: keep the k rows with the
    smallest LCG-mixed key (the same overflow-safe mixing as
    assign_split) — a reproducible corpus sample for eval/debug that
    every engine can re-derive (SQL: ORDER BY mixed LIMIT k with id
    tie-break). Rides top_k's partial-prune plan: each batch keeps its
    own k candidates, then one tiny global sort."""

    def add_key(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        h = ((ids % 2147483648) * 1103515245 + 12345) % 2147483648
        return batch.append_column("__mix", pa.array(h, pa.int64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.select_k_unstable(
            batch, k=k, sort_keys=[("__mix", "ascending"), (id_col, "ascending")])
        return batch.take(idx)

    pruned = keyed.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    out = pruned.sort(["__mix", id_col]).limit(k)
    return out.drop_columns(["__mix"])


def weighted_sample(
    ds: Dataset,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> Dataset:
    """Deterministic weighted sample WITHOUT replacement
    (Efraimidis–Spirakis 2006, the exponential-race form): keep the k
    rows with the smallest ``-ln(u) / w`` where ``u`` is the
    overflow-safe LCG uniform of the id (deterministic_sample /
    assign_split mixing) and ``w = weight_col`` — inclusion probability
    proportional to weight, reproducible on any engine. Rows with
    ``w <= 0`` are excluded. The key is ROUNDED to 9 digits before
    ranking (house rank-by-rounded convention; id tie-break) so the
    DuckDB ``ORDER BY key, id LIMIT k`` twin agrees exactly. Rides the
    partial top-k prune: each batch keeps its own k candidates, then
    one tiny global sort."""
    from epstein_pipeline_ray.functions.rounding import sql_round

    def add_key(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        w = np.asarray(batch[weight_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        mix = ((ids % 2147483648) * 1103515245 + 12345) % 2147483648
        u = (mix.astype(np.float64) + 0.5) / 2147483648.0
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.where(w > 0, -np.log(u) / np.where(w > 0, w, 1.0), np.nan)
        batch = batch.append_column("es_key", pa.array(sql_round(key, 9),
                                                       pa.float64()))
        return batch.filter(pc.is_finite(batch["es_key"]))

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.select_k_unstable(
            batch, k=k,
            sort_keys=[("es_key", "ascending"), (id_col, "ascending")])
        return batch.take(idx)

    pruned = keyed.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    return pruned.sort(["es_key", id_col]).limit(k)


def rollup_stats(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    num_partitions: int | None = None,
) -> pa.Table:
    """OLAP ROLLUP over the key hierarchy: one row per leaf group PLUS
    every prefix level with the trailing keys NULLed, up to the grand
    total — ``GROUP BY ROLLUP(k1, k2, ...)`` semantics. Emits
    ``(*keys, n_rows, sum_value)``.

    One exchange builds the leaf table (map-side partial groupby, keyed
    sum — decomposable aggregates only); every super-aggregate level is
    then derived from the LEAF table, which is groups-bounded, on the
    driver (the documented small-side exception — never from the input).
    """
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    partial_schema = pa.schema(
        [(k, pa.string()) for k in keys]
        + [("n_rows", pa.int64()), ("sum_value", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + [value_col]).to_pandas()
        g = (df.groupby(keys, sort=True)[value_col]
             .agg(["size", "sum"]).reset_index())
        cols = {k: pa.array(g[k].astype(str), pa.string()) for k in keys}
        cols["n_rows"] = pa.array(g["size"].to_numpy(np.int64), pa.int64())
        cols["sum_value"] = pa.array(g["sum"].to_numpy(np.int64), pa.int64())
        return pa.table(cols, schema=partial_schema)

    partials = ds.select_columns(keys + [value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return partial_schema.empty_table()
        g = (block.to_pandas().groupby(keys, sort=True)
             .agg(n_rows=("n_rows", "sum"), sum_value=("sum_value", "sum"))
             .reset_index())
        cols = {k: pa.array(g[k], pa.string()) for k in keys}
        cols["n_rows"] = pa.array(g["n_rows"].to_numpy(np.int64), pa.int64())
        cols["sum_value"] = pa.array(g["sum_value"].to_numpy(np.int64),
                                     pa.int64())
        return pa.table(cols, schema=partial_schema)

    leaf = (map_key_blocks(partials, keys, sum_block, num_partitions,
                           sort_blocks=False)
            .to_pandas().sort_values(keys).reset_index(drop=True))

    levels = [leaf]
    for depth in range(len(keys) - 1, -1, -1):
        kept = keys[:depth]
        if kept:
            up = (leaf.groupby(kept, sort=True)
                  .agg(n_rows=("n_rows", "sum"), sum_value=("sum_value", "sum"))
                  .reset_index())
        else:
            up = pd.DataFrame({"n_rows": [leaf["n_rows"].sum()],
                               "sum_value": [leaf["sum_value"].sum()]})
        for k in keys[depth:]:
            up[k] = None
        levels.append(up[keys + ["n_rows", "sum_value"]])

    out = pd.concat(levels, ignore_index=True)
    cols = {k: pa.array(out[k], pa.string()) for k in keys}
    cols["n_rows"] = pa.array(out["n_rows"].to_numpy(np.int64), pa.int64())
    cols["sum_value"] = pa.array(out["sum_value"].to_numpy(np.int64),
                                 pa.int64())
    return pa.table(cols)


def with_group_rank(
    ds: Dataset,
    key: str,
    value_col: str,
    tie_col: str,
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> Dataset:
    """ROW_NUMBER per group ordered by ``value_col`` DESC with
    ``tie_col`` ASC ties — the unlimited sibling of topk_per_group
    (full ranking, not membership). One keyed exchange; ranks assigned
    by a single vectorized pass per key-sorted block. SQL twin:
    ``row_number() OVER (PARTITION BY key ORDER BY value DESC, tie)``.
    """
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    names = ds.schema().names
    types = dict(zip(names, ds.schema().types))
    out_schema = pa.schema([(c, types[c]) for c in names]
                           + [(out_col, pa.int64())])

    def rank_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        df = (block.to_pandas()
              .sort_values([key, value_col, tie_col],
                           ascending=[True, False, True], kind="mergesort")
              .reset_index(drop=True))
        kv = df[key].to_numpy()
        new_grp = np.r_[True, kv[1:] != kv[:-1]]
        starts = np.flatnonzero(new_grp)
        run_len = np.diff(np.r_[starts, len(df)])
        rank = np.arange(len(df)) - np.repeat(starts, run_len) + 1
        df[out_col] = rank.astype(np.int64)
        arrays = [pa.array(df[c], type=out_schema.field(c).type,
                           from_pandas=True) for c in out_schema.names]
        return pa.table(dict(zip(out_schema.names, arrays)),
                        schema=out_schema)

    return map_key_blocks(ds, [key], rank_block, num_partitions,
                          sort_blocks=False)


def grouped_mode(
    ds: Dataset,
    key: str,
    value_col: str,
    out_col: str = "mode_value",
    num_partitions: int | None = None,
) -> Dataset:
    """Most frequent value per group, ties to the SMALLEST value (SQL
    ``mode()`` leaves ties unspecified — this pins them, and the DuckDB
    twin uses an explicit row_number instead). Map-side per-batch
    (key, value) count partials → one key-keyed exchange → per-key
    argmax over summed counts."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    vtype = dict(zip(ds.schema().names, ds.schema().types))[value_col]
    partial_schema = pa.schema([(key, ktype), (value_col, vtype),
                                ("cnt", pa.int64())])
    out_schema = pa.schema([(key, ktype), (out_col, vtype)])

    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select([key, value_col]).to_pandas()
             .groupby([key, value_col], sort=True).size()
             .reset_index(name="cnt"))
        return pa.table({
            key: pa.array(g[key], type=ktype, from_pandas=True),
            value_col: pa.array(g[value_col], type=vtype, from_pandas=True),
            "cnt": pa.array(g["cnt"].to_numpy(np.int64), pa.int64()),
        }, schema=partial_schema)

    partials = ds.select_columns([key, value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)

    def pick_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        df = (block.to_pandas()
              .groupby([key, value_col], sort=False)["cnt"].sum()
              .reset_index()
              .sort_values([key, "cnt", value_col],
                           ascending=[True, False, True], kind="mergesort")
              .drop_duplicates(key))
        return pa.table({
            key: pa.array(df[key], type=ktype, from_pandas=True),
            out_col: pa.array(df[value_col], type=vtype, from_pandas=True),
        }, schema=out_schema)

    return map_key_blocks(partials, [key], pick_block, num_partitions,
                          sort_blocks=False)


def budget_select(
    ds: Dataset,
    score_col: str,
    weight_col: str,
    budget: float,
    id_col: str = "doc_id",
    id_bucket_width: int = 65536,
    num_partitions: int | None = None,
) -> Dataset:
    """Highest-quality subset under a weight budget: keep the maximal
    prefix of the global (score DESC, id ASC) order whose running
    weight (including the row's own) stays <= ``budget`` — the "select
    the best X tokens" curation cut. SQL twin:
    ``sum(w) OVER (ORDER BY score DESC, id ROWS UNBOUNDED PRECEDING)
    <= budget``.

    No global sort: (1) one score-keyed exchange builds per-score
    weight subtotals (bounded by DISTINCT rounded scores — callers pass
    6-digit-rounded scores, so <= ~2M buckets for a unit-range signal);
    the driver cumsums them score-descending to find the boundary
    score. Scores strictly above it are kept outright. (2) Rows AT the
    boundary score go through the two-phase prefix-sum pattern
    (packing.py): id-bucket subtotals → driver offsets → per-bucket
    vectorized cumsum against the remaining budget. Output: the kept
    rows (id, score, weight)."""
    import pyarrow.compute as pc_

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    pruned = ds.select_columns([id_col, score_col, weight_col])

    SUB = pa.schema([(score_col, pa.float64()), ("w", pa.float64())])

    def score_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            score_col: np.asarray(batch[score_col].to_numpy(
                zero_copy_only=False), np.float64),
            "w": np.asarray(batch[weight_col].to_numpy(
                zero_copy_only=False), np.float64),
        })
        g = df.groupby(score_col, sort=True)["w"].sum()
        return pa.table({score_col: pa.array(g.index.to_numpy(np.float64),
                                             pa.float64()),
                         "w": pa.array(g.to_numpy(np.float64),
                                       pa.float64())}, schema=SUB)

    def score_sum(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return SUB.empty_table()
        g = block.to_pandas().groupby(score_col, sort=True)["w"].sum()
        return pa.table({score_col: pa.array(g.index.to_numpy(np.float64),
                                             pa.float64()),
                         "w": pa.array(g.to_numpy(np.float64),
                                       pa.float64())}, schema=SUB)

    buckets = (map_key_blocks(
        pruned.map_batches(score_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        [score_col], score_sum, num_partitions, sort_blocks=False)
        .to_pandas().sort_values(score_col, ascending=False)
        .reset_index(drop=True))
    if not len(buckets):
        return pruned.limit(0)
    cum = buckets["w"].cumsum()
    over = cum > budget
    if not over.any():
        return pruned  # everything fits
    bidx = int(np.argmax(over.to_numpy()))
    s_star = float(buckets[score_col].iloc[bidx])
    cum_before = float(cum.iloc[bidx - 1]) if bidx else 0.0
    remaining = budget - cum_before

    def above_batch(batch: pa.Table) -> pa.Table:
        return batch.filter(pc_.greater(batch[score_col],
                                        pa.scalar(s_star)))

    def at_batch(batch: pa.Table) -> pa.Table:
        return batch.filter(pc_.equal(batch[score_col],
                                      pa.scalar(s_star)))

    keep_above = pruned.map_batches(above_batch, batch_format="pyarrow",
                                    zero_copy_batch=True)
    at = pruned.map_batches(at_batch, batch_format="pyarrow",
                            zero_copy_batch=True)

    # two-phase prefix over id buckets within the boundary score
    IDS = pa.schema([("bucket", pa.int64()), ("w", pa.float64())])

    def id_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                         np.int64)
        w = np.asarray(batch[weight_col].to_numpy(zero_copy_only=False),
                       np.float64)
        g = pd.DataFrame({"bucket": ids // id_bucket_width, "w": w}) \
            .groupby("bucket", sort=True)["w"].sum()
        return pa.table({"bucket": pa.array(g.index.to_numpy(np.int64),
                                            pa.int64()),
                         "w": pa.array(g.to_numpy(np.float64),
                                       pa.float64())}, schema=IDS)

    def id_sum(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return IDS.empty_table()
        g = block.to_pandas().groupby("bucket", sort=True)["w"].sum()
        return pa.table({"bucket": pa.array(g.index.to_numpy(np.int64),
                                            pa.int64()),
                         "w": pa.array(g.to_numpy(np.float64),
                                       pa.float64())}, schema=IDS)

    bsub = (map_key_blocks(
        at.map_batches(id_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["bucket"], id_sum, num_partitions, sort_blocks=False)
        .to_pandas().sort_values("bucket").reset_index(drop=True))
    offsets = {int(b): float(o) for b, o in zip(
        bsub["bucket"], np.concatenate([[0.0],
                                        bsub["w"].cumsum().to_numpy()[:-1]]))}
    import ray as _ray
    off_ref = _ray.put(offsets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                         np.int64)
        return batch.append_column(
            "bucket", pa.array(ids // id_bucket_width, pa.int64()))

    def boundary_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block.drop_columns(["bucket"])
        off = _ray.get(off_ref)
        df = (block.to_pandas().sort_values(id_col, kind="mergesort")
              .reset_index(drop=True))
        w = df[weight_col].to_numpy(np.float64)
        b = df["bucket"].to_numpy(np.int64)
        # per-bucket running sum + the bucket's global offset
        start = np.r_[True, b[1:] != b[:-1]]
        # cumsum reset at bucket starts
        cw = np.cumsum(w)
        base = np.repeat(cw[np.flatnonzero(start)] - w[np.flatnonzero(start)],
                         np.diff(np.r_[np.flatnonzero(start), len(w)]))
        run = cw - base
        glob = run + np.array([off[int(x)] for x in b[np.flatnonzero(start)]
                               ]).repeat(np.diff(np.r_[np.flatnonzero(start),
                                                       len(w)]))
        keep = glob <= remaining
        out = df.loc[keep, [id_col, score_col, weight_col]]
        return pa.Table.from_pandas(out, preserve_index=False)

    kept_at = map_key_blocks(
        at.map_batches(add_bucket, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["bucket"], boundary_block, num_partitions, sort_blocks=False)
    return keep_above.union(kept_at)


def cube_stats(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    num_partitions: int | None = None,
) -> pa.Table:
    """OLAP CUBE over the keys: one row per leaf group plus EVERY key
    subset with the omitted keys NULLed, down to the grand total —
    ``GROUP BY CUBE(k1, k2, ...)`` semantics; the lattice sibling of
    :func:`rollup_stats` (which walks only prefix levels). Same plan:
    one keyed exchange for the leaf table, every coarser level derived
    from the groups-bounded leaf driver-side."""
    import itertools

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    partial_schema = pa.schema(
        [(k, pa.string()) for k in keys]
        + [("n_rows", pa.int64()), ("sum_value", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + [value_col]).to_pandas()
        g = (df.groupby(keys, sort=True)[value_col]
             .agg(["size", "sum"]).reset_index())
        cols = {k: pa.array(g[k].astype(str), pa.string()) for k in keys}
        cols["n_rows"] = pa.array(g["size"].to_numpy(np.int64), pa.int64())
        cols["sum_value"] = pa.array(g["sum"].to_numpy(np.int64), pa.int64())
        return pa.table(cols, schema=partial_schema)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return partial_schema.empty_table()
        g = (block.to_pandas().groupby(keys, sort=True)
             .agg(n_rows=("n_rows", "sum"), sum_value=("sum_value", "sum"))
             .reset_index())
        cols = {k: pa.array(g[k], pa.string()) for k in keys}
        cols["n_rows"] = pa.array(g["n_rows"].to_numpy(np.int64), pa.int64())
        cols["sum_value"] = pa.array(g["sum_value"].to_numpy(np.int64),
                                     pa.int64())
        return pa.table(cols, schema=partial_schema)

    leaf = (map_key_blocks(
        ds.select_columns(keys + [value_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        keys, sum_block, num_partitions, sort_blocks=False)
        .to_pandas().sort_values(keys).reset_index(drop=True))

    levels = []
    for r in range(len(keys), -1, -1):
        for kept in itertools.combinations(keys, r):
            if len(kept) == len(keys):
                levels.append(leaf)
                continue
            if kept:
                up = (leaf.groupby(list(kept), sort=True)
                      .agg(n_rows=("n_rows", "sum"),
                           sum_value=("sum_value", "sum"))
                      .reset_index())
            else:
                up = pd.DataFrame({"n_rows": [leaf["n_rows"].sum()],
                                   "sum_value": [leaf["sum_value"].sum()]})
            for k in keys:
                if k not in kept:
                    up[k] = None
            levels.append(up[keys + ["n_rows", "sum_value"]])

    out = pd.concat(levels, ignore_index=True)
    cols = {k: pa.array(out[k], pa.string()) for k in keys}
    cols["n_rows"] = pa.array(out["n_rows"].to_numpy(np.int64), pa.int64())
    cols["sum_value"] = pa.array(out["sum_value"].to_numpy(np.int64),
                                 pa.int64())
    return pa.table(cols)


def value_histogram(
    ds: Dataset,
    value_col: str,
    bins: int = 20,
    num_partitions: int | None = None,
) -> pa.Table:
    """Equi-width histogram: exact global min/max (two cheap
    aggregates), then bin ``floor((x - min) * bins / (max - min))``
    clamped to ``bins - 1`` — identical double arithmetic on the SQL
    side, so edge landings agree. One pass of map-side bincount
    partials summed over a bins-bounded table driver-side. Output:
    (bin, lo, hi, n)."""
    vmin = ds.min(value_col)
    vmax = ds.max(value_col)
    if vmin is None or vmax == vmin:
        n = ds.count()
        return pa.table({
            "bin": pa.array([0], pa.int64()),
            "lo": pa.array([float(vmin or 0)], pa.float64()),
            "hi": pa.array([float(vmax or 0)], pa.float64()),
            "n": pa.array([n], pa.int64()),
        })
    span = float(vmax) - float(vmin)

    def part(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch[value_col].to_numpy(zero_copy_only=False),
                       np.float64)
        b = np.floor((x - float(vmin)) * bins / span).astype(np.int64)
        np.clip(b, 0, bins - 1, out=b)
        counts = np.bincount(b, minlength=bins)
        return pa.table({"bin": pa.array(np.arange(bins), pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    tot = (ds.select_columns([value_col])
           .map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
           .to_pandas().groupby("bin", sort=True)["n"].sum())
    edges = np.array([float(vmin) + span * i / bins for i in range(bins + 1)])
    n = tot.reindex(range(bins), fill_value=0).to_numpy(np.int64)
    keep = n > 0
    idx = np.arange(bins)[keep]
    return pa.table({
        "bin": pa.array(idx, pa.int64()),
        "lo": pa.array(edges[:-1][keep], pa.float64()),
        "hi": pa.array(edges[1:][keep], pa.float64()),
        "n": pa.array(n[keep], pa.int64()),
    })


def grouped_corr(
    ds: Dataset,
    key: str,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> Dataset:
    """Per-group Pearson correlation from decomposable moment sums
    (n, Σx, Σy, Σxy, Σx², Σy² — the classic one-pass MapReduce
    statistic): ``(n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))``,
    6-digit rounded. The DuckDB twin computes the IDENTICAL closed form
    from its own moment sums (not corr(), whose Welford accumulation
    would differ in low-order bits). Groups with zero variance on
    either side yield NULL. Map-side partial moments per batch, one
    keyed exchange of six numbers per (batch, group)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    M = pa.schema([(key, ktype), ("n", pa.int64()), ("sx", pa.float64()),
                   ("sy", pa.float64()), ("sxy", pa.float64()),
                   ("sxx", pa.float64()), ("syy", pa.float64())])

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: batch[key].to_pandas(),
            "x": np.asarray(batch[x_col].to_numpy(zero_copy_only=False),
                            np.float64),
            "y": np.asarray(batch[y_col].to_numpy(zero_copy_only=False),
                            np.float64),
        })
        df["xy"] = df.x * df.y
        df["xx"] = df.x * df.x
        df["yy"] = df.y * df.y
        g = df.groupby(key, sort=True).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"), syy=("yy", "sum"),
        ).reset_index()
        return pa.table({
            key: pa.array(g[key], type=ktype, from_pandas=True),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "sx": pa.array(g["sx"].to_numpy(np.float64), pa.float64()),
            "sy": pa.array(g["sy"].to_numpy(np.float64), pa.float64()),
            "sxy": pa.array(g["sxy"].to_numpy(np.float64), pa.float64()),
            "sxx": pa.array(g["sxx"].to_numpy(np.float64), pa.float64()),
            "syy": pa.array(g["syy"].to_numpy(np.float64), pa.float64()),
        }, schema=M)

    partials = ds.select_columns([key, x_col, y_col]).map_batches(
        part, batch_format="pyarrow", zero_copy_batch=True)

    OUT = pa.schema([(key, ktype), ("n", pa.int64()),
                     ("corr", pa.float64())])

    def reduce_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        g = block.to_pandas().groupby(key, sort=True).agg(
            n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxy=("sxy", "sum"), sxx=("sxx", "sum"), syy=("syy", "sum"),
        ).reset_index()
        n = g["n"].to_numpy(np.float64)
        num = n * g["sxy"].to_numpy() - g["sx"].to_numpy() * g["sy"].to_numpy()
        vx = n * g["sxx"].to_numpy() - np.square(g["sx"].to_numpy())
        vy = n * g["syy"].to_numpy() - np.square(g["sy"].to_numpy())
        with np.errstate(invalid="ignore", divide="ignore"):
            r = num / (np.sqrt(vx) * np.sqrt(vy))
        r = np.where((vx > 0) & (vy > 0), sql_round(r, 6), np.nan)
        return pa.table({
            key: pa.array(g[key], type=ktype, from_pandas=True),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "corr": pa.array(r, pa.float64(), from_pandas=True),
        }, schema=OUT)

    return map_key_blocks(partials, [key], reduce_block, num_partitions,
                          sort_blocks=False)


def with_group_zscore(
    ds: Dataset,
    key: str,
    value_col: str,
    out_col: str = "z",
    num_partitions: int | None = None,
) -> Dataset:
    """Per-group z-normalization ``(x − mean) / stddev_pop`` (the
    per-domain score standardization step before mixing quality signals
    across domains): group moments via one keyed exchange of partials,
    then a size-switched attach of the 6-digit-rounded mean/std back to
    every row; z itself is also rounded 6. Zero-variance groups yield
    NULL z."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    M = pa.schema([(key, ktype), ("n", pa.int64()), ("sx", pa.float64()),
                   ("sxx", pa.float64())])

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: batch[key].to_pandas(),
            "x": np.asarray(batch[value_col].to_numpy(zero_copy_only=False),
                            np.float64),
        })
        df["xx"] = df.x * df.x
        g = df.groupby(key, sort=True).agg(
            n=("x", "size"), sx=("x", "sum"), sxx=("xx", "sum")).reset_index()
        return pa.table({
            key: pa.array(g[key], type=ktype, from_pandas=True),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "sx": pa.array(g["sx"].to_numpy(np.float64), pa.float64()),
            "sxx": pa.array(g["sxx"].to_numpy(np.float64), pa.float64()),
        }, schema=M)

    STATS = pa.schema([(key, ktype), ("mu", pa.float64()),
                       ("sigma", pa.float64())])

    def reduce_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return STATS.empty_table()
        g = block.to_pandas().groupby(key, sort=True).agg(
            n=("n", "sum"), sx=("sx", "sum"), sxx=("sxx", "sum")).reset_index()
        n = g["n"].to_numpy(np.float64)
        mu = g["sx"].to_numpy() / n
        var = g["sxx"].to_numpy() / n - np.square(mu)
        sigma = np.sqrt(np.maximum(var, 0.0))
        return pa.table({
            key: pa.array(g[key], type=ktype, from_pandas=True),
            "mu": pa.array(sql_round(mu, 6), pa.float64()),
            "sigma": pa.array(sql_round(sigma, 6), pa.float64()),
        }, schema=STATS)

    stats = map_key_blocks(
        ds.select_columns([key, value_col]).map_batches(
            part, batch_format="pyarrow", zero_copy_batch=True),
        [key], reduce_block, num_partitions, sort_blocks=False)

    withmu = attach_column(ds, stats, key, key, "mu", "__mu",
                           num_partitions=num_partitions)
    both = attach_column(withmu, stats, key, key, "sigma", "__sigma",
                         num_partitions=num_partitions)

    def zed(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch[value_col].to_numpy(zero_copy_only=False),
                       np.float64)
        mu = np.asarray(batch["__mu"].to_numpy(zero_copy_only=False),
                        np.float64)
        sg = np.asarray(batch["__sigma"].to_numpy(zero_copy_only=False),
                        np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(sg > 0, sql_round((x - mu) / sg, 6), np.nan)
        out = batch.drop_columns(["__mu", "__sigma"])
        return out.append_column(out_col, pa.array(z, pa.float64(),
                                                   from_pandas=True))

    return both.map_batches(zed, batch_format="pyarrow", zero_copy_batch=True)


def with_group_ntile(
    ds: Dataset,
    key: str,
    value_col: str,
    tie_col: str,
    n_tiles: int = 4,
    out_col: str = "tile",
    num_partitions: int | None = None,
) -> Dataset:
    """NTILE(n) per group over the (value ASC, tie ASC) order — SQL
    NTILE semantics exactly: the first ``n_rows % n`` tiles hold
    ``ceil(n_rows / n)`` rows, the rest ``floor(n_rows / n)``; tiles
    are 1-based. One keyed exchange, vectorized position arithmetic
    per key-sorted block."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    names = ds.schema().names
    types = dict(zip(names, ds.schema().types))
    out_schema = pa.schema([(c, types[c]) for c in names]
                           + [(out_col, pa.int64())])

    def tile_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        df = (block.to_pandas()
              .sort_values([key, value_col, tie_col], kind="mergesort")
              .reset_index(drop=True))
        kv = df[key].to_numpy()
        new_grp = np.r_[True, kv[1:] != kv[:-1]]
        starts = np.flatnonzero(new_grp)
        run_len = np.diff(np.r_[starts, len(df)])
        pos = np.arange(len(df)) - np.repeat(starts, run_len)
        n = np.repeat(run_len, run_len)
        big = n // n_tiles + 1
        r = n % n_tiles
        cut = r * big
        small = np.maximum(n // n_tiles, 1)
        tile = np.where(pos < cut, pos // big,
                        r + (pos - cut) // small) + 1
        df[out_col] = tile.astype(np.int64)
        arrays = [pa.array(df[c], type=out_schema.field(c).type,
                           from_pandas=True) for c in out_schema.names]
        return pa.table(dict(zip(out_schema.names, arrays)),
                        schema=out_schema)

    return map_key_blocks(ds, [key], tile_block, num_partitions,
                          sort_blocks=False)


_CMS_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def cms_params(d: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) hash-row parameters for the Count-Min
    sketch — pinned LCG-derived constants so the DuckDB twin can inline
    the exact same values (:func:`cms_sql`)."""
    return [((1103515245 * (j + 1) + 12345) % _CMS_P,
             (22695477 * (j + 1) + 1) % _CMS_P) for j in range(d)]


def cms_counter(ds: Dataset, value_col: str, d: int = 4, w: int = 512,
                num_partitions: int | None = None) -> np.ndarray:
    """Build the d*w Count-Min counter matrix (flattened, row-major)
    for a non-negative int64 column: vectorized per-batch bincount
    partials (nonzero cells only) summed through one cell-keyed
    exchange. The result is FIXED SIZE — pulling it to the driver is
    sketch-sized, never corpus-sized."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    params = cms_params(d)
    CELL = pa.schema([("cell", pa.int64()), ("c", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        cells = []
        counts = []
        for j, (a, b) in enumerate(params):
            idx = ((a * v + b) % _CMS_P) % w
            bc = np.bincount(idx, minlength=w)
            nz = np.nonzero(bc)[0]
            cells.append(nz + j * w)
            counts.append(bc[nz])
        return pa.table({
            "cell": pa.array(np.concatenate(cells), pa.int64()),
            "c": pa.array(np.concatenate(counts).astype(np.int64),
                          pa.int64())}, schema=CELL)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return CELL.empty_table()
        cell = np.asarray(block["cell"].to_numpy(zero_copy_only=False),
                          np.int64)
        c = np.asarray(block["c"].to_numpy(zero_copy_only=False), np.int64)
        u, inv = np.unique(cell, return_inverse=True)
        s = np.bincount(inv, weights=c).astype(np.int64)
        return pa.table({"cell": pa.array(u, pa.int64()),
                         "c": pa.array(s, pa.int64())}, schema=CELL)

    sk = map_key_blocks(
        ds.select_columns([value_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        ["cell"], sum_block, num_partitions, sort_blocks=False).to_pandas()
    counter = np.zeros(d * w, dtype=np.int64)
    counter[sk["cell"].to_numpy(np.int64)] = sk["c"].to_numpy(np.int64)
    return counter


def cms_join_size(left: Dataset, right: Dataset, left_key: str,
                  right_key: str, d: int = 4, w: int = 512,
                  num_partitions: int | None = None) -> Dataset:
    """Equi-join cardinality estimate from two Count-Min sketches
    (Cormode & Muthukrishnan 2005 §4.2 inner-product estimate):
    ``est = min_j sum_w A[j][w] * B[j][w]`` — always >= the true join
    size, within eps*|A||B| with prob 1-delta. The shuffle-planning
    primitive: both sides reduce to fixed d*w matrices, so the
    estimate costs two sketch passes and NO join. Deterministic given
    the pinned hash rows — the DuckDB twin recomputes both sketches
    and the same min-over-rows dot product. Output: one row
    (est_join_rows)."""
    a = cms_counter(left, left_key, d, w, num_partitions) \
        .reshape(d, w).astype(np.float64)
    b = cms_counter(right, right_key, d, w, num_partitions) \
        .reshape(d, w).astype(np.float64)
    est = int((a * b).sum(axis=1).min())

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "est_join_rows": pa.array([est], pa.int64())}))


def cms_count_per_key(ds: Dataset, value_col: str, d: int = 4, w: int = 512,
                      num_partitions: int | None = None) -> Dataset:
    """Count-Min sketch point estimates (Cormode & Muthukrishnan 2005)
    over a NON-NEGATIVE int64 key column (< 2^32; bucket first):
    ``est(v) = min_j counter[j][h_j(v)]`` with
    ``h_j(v) = ((a_j*v + b_j) mod P) mod w`` — always >= the true count,
    within eps*N with prob 1-delta at w=ceil(e/eps), d=ceil(ln 1/delta).

    Unlike KMV/HLL this sketch is FULLY deterministic given the pinned
    hash rows (:func:`cms_params`), so the DuckDB twin (:func:`cms_sql`)
    matches hash-exactly — the oracle covers the sketch itself, not just
    a rows-only shape. Mergeability = counter addition, which IS the
    exchange sum below.

    Plan: vectorized per-batch bincount partials (nonzero cells only,
    <= d*w rows per batch) -> one cell-keyed exchange sum -> the d*w
    counter matrix (FIXED SIZE — the driver pull is sketch-sized, never
    corpus-sized) broadcast over a distinct-key exchange for the min-
    over-rows estimate. Output: (value_col, est) per distinct key."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    params = cms_params(d)
    pruned = ds.select_columns([value_col])
    counter = cms_counter(pruned, value_col, d, w, num_partitions)

    KEY = pa.schema([(value_col, pa.int64())])

    def key_rows(batch: pa.Table) -> pa.Table:
        v = np.unique(np.asarray(
            batch[value_col].to_numpy(zero_copy_only=False), np.int64))
        return pa.table({value_col: pa.array(v, pa.int64())}, schema=KEY)

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return KEY.empty_table()
        v = np.unique(np.asarray(
            block[value_col].to_numpy(zero_copy_only=False), np.int64))
        return pa.table({value_col: pa.array(v, pa.int64())}, schema=KEY)

    keys = map_key_blocks(
        pruned.map_batches(key_rows, batch_format="pyarrow",
                           zero_copy_batch=True),
        [value_col], distinct_block, num_partitions, sort_blocks=False)

    def estimate(batch: pa.Table, counter=counter) -> pa.Table:
        v = np.asarray(batch[value_col].to_numpy(zero_copy_only=False),
                       np.int64)
        est = np.full(v.size, np.iinfo(np.int64).max, dtype=np.int64)
        for j, (a, b) in enumerate(params):
            idx = ((a * v + b) % _CMS_P) % w
            np.minimum(est, counter[idx + j * w], out=est)
        return pa.table({value_col: pa.array(v, pa.int64()),
                         "est": pa.array(est, pa.int64())})

    return keys.map_batches(estimate, batch_format="pyarrow",
                            zero_copy_batch=True)


def cms_sql(values_cte: str, value_col: str = "v", d: int = 4,
            w: int = 512) -> str:
    """Exact DuckDB twin of :func:`cms_count_per_key` — identical pinned
    hash rows, bucket sums, and min-over-rows estimate. ``values_cte``
    must define ``t(v)`` (non-negative int keys)."""
    rows = ", ".join(f"({j}, {a}, {b})"
                     for j, (a, b) in enumerate(cms_params(d)))
    return f"""WITH {values_cte},
        params(j, a, b) AS (VALUES {rows}),
        sk AS MATERIALIZED (
            SELECT p.j, ((p.a * t.v::BIGINT + p.b) % {_CMS_P}) % {w} AS bucket,
                   count(*) AS c
            FROM t CROSS JOIN params p GROUP BY 1, 2),
        keys AS (SELECT DISTINCT v FROM t)
        SELECT k.v AS {value_col}, min(sk.c)::BIGINT AS est
        FROM keys k CROSS JOIN params p
        JOIN sk ON sk.j = p.j
               AND sk.bucket = ((p.a * k.v::BIGINT + p.b) % {_CMS_P}) % {w}
        GROUP BY k.v"""


def pivot_counts(ds: Dataset, row_key: str, col_key: str,
                 col_values: list[str],
                 num_partitions: int | None = None) -> Dataset:
    """Wide pivot aggregate: one output row per ``row_key`` with a
    ``n_<v>`` count column per value in the FIXED ``col_values`` domain
    (SQL PIVOT requires the domain up front too; values outside it are
    ignored). Map-side partials go straight to wide form — per batch a
    (row_key x domain) count matrix via vectorized dictionary codes —
    so the single keyed exchange ships one already-wide row per
    (batch, key), never the raw rows.

    Twin shape: ``SELECT row, sum(CASE WHEN col='v' THEN 1 ELSE 0 END)
    AS n_v, ... GROUP BY row``."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    cols = [f"n_{v}" for v in col_values]
    val_idx = {v: i for i, v in enumerate(col_values)}
    key_type = dict(zip(ds.schema().names, ds.schema().types))[row_key]
    OUT = pa.schema([(row_key, key_type)]
                    + [(c, pa.int64()) for c in cols])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return OUT.empty_table()
        df = pd.DataFrame({
            "k": batch[row_key].to_pandas(),
            "c": batch[col_key].to_pandas().map(val_idx),
        })
        df = df.dropna(subset=["c"])
        if not len(df):
            return OUT.empty_table()
        keys, kinv = np.unique(df["k"].to_numpy(), return_inverse=True)
        ci = df["c"].to_numpy(dtype=np.int64)
        m = np.zeros((keys.size, len(col_values)), dtype=np.int64)
        np.add.at(m, (kinv, ci), 1)
        out = {row_key: pa.array(keys, key_type)}
        for i, c in enumerate(cols):
            out[c] = pa.array(m[:, i], pa.int64())
        return pa.table(out, schema=OUT)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = block.to_pandas()
        g = df.groupby(row_key, sort=True, as_index=False)[cols].sum()
        out = {row_key: pa.array(g[row_key], key_type)}
        for c in cols:
            out[c] = pa.array(g[c].to_numpy(np.int64), pa.int64())
        return pa.table(out, schema=OUT)

    parts = ds.select_columns([row_key, col_key]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return map_key_blocks(parts, [row_key], sum_block, num_partitions,
                          sort_blocks=False)


def unpivot(
    ds: Dataset,
    id_cols: list[str],
    value_cols: list[str],
    metric_col: str = "metric",
    value_col: str = "value",
) -> Dataset:
    """UNPIVOT / melt: wide → long, the inverse schema transform of
    :func:`pivot_counts`. Each input row becomes ``len(value_cols)``
    output rows ``(id_cols..., metric, value)`` with every measure cast
    to float64 (the SQL UNION ALL convention — one SELECT per measure
    column needs a common value type). Embarrassingly parallel: one
    ``map_batches`` pass, zero exchange — each batch emits its own long
    form by column slicing (no row loop; the metric column is a
    constant-per-slice Arrow array).

    Twin shape: ``SELECT id..., 'c' AS metric, c::DOUBLE AS value FROM t
    UNION ALL ...`` (one arm per value column)."""
    names = ds.schema().names
    types = dict(zip(names, ds.schema().types))
    OUT = pa.schema([(c, types[c]) for c in id_cols]
                    + [(metric_col, pa.string()),
                       (value_col, pa.float64())])

    def melt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return OUT.empty_table()
        n = batch.num_rows
        parts = []
        for vc in value_cols:
            cols = {c: batch[c] for c in id_cols}
            # n copies of one interned Python string → one O(n) C build
            cols[metric_col] = pa.array([vc] * n, pa.string())
            v = batch[vc]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            cols[value_col] = v.cast(pa.float64())
            parts.append(pa.table(cols, schema=OUT))
        return pa.concat_tables(parts)

    return ds.select_columns(
        list(dict.fromkeys(id_cols + value_cols))).map_batches(
        melt, batch_format="pyarrow", zero_copy_batch=True)


def with_group_rank_stats(
    ds: Dataset,
    key: str,
    value_col: str,
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """The tie-aware window-rank family in one keyed exchange: RANK
    (gaps), DENSE_RANK, PERCENT_RANK and CUME_DIST per row, ordered by
    ``value_col`` DESC within ``key`` — ties share ranks on the order
    value alone (the SQL semantics; ROW_NUMBER's tie_col sibling is
    :func:`with_group_rank`). Fractions are rounded to ``round_digits``
    (the house convention) so the twin
    ``rank()/dense_rank()/round(percent_rank(),9)/round(cume_dist(),9)
    OVER (PARTITION BY key ORDER BY value DESC)`` matches hash-exactly.
    One vectorized pass per key-sorted block."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    names = ds.schema().names
    types = dict(zip(names, ds.schema().types))
    out_schema = pa.schema(
        [(c, types[c]) for c in names]
        + [("rnk", pa.int64()), ("drnk", pa.int64()),
           ("prank", pa.float64()), ("cdist", pa.float64())])

    def stats_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        df = (block.to_pandas()
              .sort_values([key, value_col], ascending=[True, False],
                           kind="mergesort")
              .reset_index(drop=True))
        n = len(df)
        kv = df[key].to_numpy()
        vv = df[value_col].to_numpy()
        new_grp = np.r_[True, kv[1:] != kv[:-1]]
        new_val = new_grp | np.r_[True, vv[1:] != vv[:-1]]
        gstarts = np.flatnonzero(new_grp)
        glen = np.diff(np.r_[gstarts, n])
        gstart_of = np.repeat(gstarts, glen)          # group start index
        gsize_of = np.repeat(glen, glen).astype(np.float64)
        vstarts = np.flatnonzero(new_val)
        vlen = np.diff(np.r_[vstarts, n])
        vstart_of = np.repeat(vstarts, vlen)          # tie-run start
        vend_of = np.repeat(vstarts + vlen, vlen)     # one past tie-run end
        rnk = (vstart_of - gstart_of + 1).astype(np.int64)
        # dense rank = # of tie-runs from group start through this run
        run_in_grp = (np.cumsum(new_val)
                      - np.repeat(np.cumsum(new_val)[gstarts], glen))
        drnk = (run_in_grp + 1).astype(np.int64)
        with np.errstate(invalid="ignore"):
            prank = np.where(gsize_of > 1,
                             (rnk - 1) / np.maximum(gsize_of - 1, 1), 0.0)
        cdist = (vend_of - gstart_of) / gsize_of
        df["rnk"] = rnk
        df["drnk"] = drnk
        df["prank"] = sql_round(prank, round_digits)
        df["cdist"] = sql_round(cdist, round_digits)
        arrays = [pa.array(df[c], type=out_schema.field(c).type,
                           from_pandas=True) for c in out_schema.names]
        return pa.table(dict(zip(out_schema.names, arrays)),
                        schema=out_schema)

    return map_key_blocks(ds, [key], stats_block, num_partitions,
                          sort_blocks=False)


def cohort_retention(
    ds: Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_s: int = 604800,
    num_partitions: int | None = None,
) -> Dataset:
    """Cohort retention matrix: cohort(user) = the user's first activity
    period (``floor(epoch_seconds / period_s)``, default weekly), and
    per (cohort, period offset) the count of DISTINCT active users.

    Three stages, all user/period proportional: (1) map-side per-batch
    min + one user-keyed exchange -> first period per user; (2)
    size-switched cohort attach back onto the period rows; (3) map-side
    distinct (cohort, offset, user) triples + one (cohort, offset)-keyed
    exchange with a per-block nunique. Twin: ``count(DISTINCT user)
    GROUP BY cohort, offset`` over the identical integer period
    arithmetic. Output: (cohort_period, period_offset, n_users)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    utype = dict(zip(ds.schema().names, ds.schema().types))[user_col]
    W = pa.schema([(user_col, utype), ("wk", pa.int64())])

    def to_periods(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = np.asarray(ts.cast(pa.int64()).to_numpy(zero_copy_only=False),
                        np.int64)
        wk = (us // 1_000_000) // period_s
        return pa.table({user_col: batch[user_col],
                         "wk": pa.array(wk, pa.int64())}, schema=W)

    weeks = ds.select_columns([user_col, ts_col]).map_batches(
        to_periods, batch_format="pyarrow", zero_copy_batch=True)

    F = pa.schema([(user_col, utype), ("cw", pa.int64())])

    def min_partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, [user_col]).aggregate([("wk", "min")])
        return pa.table({user_col: g[user_col], "cw": g["wk_min"]},
                        schema=F)

    def min_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return F.empty_table()
        g = pa.TableGroupBy(block, [user_col]).aggregate([("cw", "min")])
        return pa.table({user_col: g[user_col], "cw": g["cw_min"]},
                        schema=F)

    first = map_key_blocks(
        weeks.map_batches(min_partial, batch_format="pyarrow",
                          zero_copy_batch=True),
        [user_col], min_block, num_partitions, sort_blocks=False)

    tagged = attach_column(weeks, first, user_col, user_col, "cw", "cw",
                           num_partitions=num_partitions)

    T = pa.schema([("cohort_period", pa.int64()),
                   ("period_offset", pa.int64()), (user_col, utype)])

    def triples(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["period_offset"] = df["wk"] - df["cw"]
        df = df.rename(columns={"cw": "cohort_period"})
        df = df[["cohort_period", "period_offset", user_col]].drop_duplicates()
        arrays = [pa.array(df[c], type=T.field(c).type, from_pandas=True)
                  for c in T.names]
        return pa.table(dict(zip(T.names, arrays)), schema=T)

    OUT = pa.schema([("cohort_period", pa.int64()),
                     ("period_offset", pa.int64()),
                     ("n_users", pa.int64())])

    def count_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = block.to_pandas().drop_duplicates()
        g = (df.groupby(["cohort_period", "period_offset"], sort=True)
             [user_col].nunique().rename("n_users").reset_index())
        return pa.table({
            "cohort_period": pa.array(g["cohort_period"].to_numpy(np.int64),
                                      pa.int64()),
            "period_offset": pa.array(g["period_offset"].to_numpy(np.int64),
                                      pa.int64()),
            "n_users": pa.array(g["n_users"].to_numpy(np.int64), pa.int64()),
        }, schema=OUT)

    trip = tagged.map_batches(triples, batch_format="pyarrow",
                              zero_copy_batch=True)
    return map_key_blocks(trip, ["cohort_period", "period_offset"],
                          count_block, num_partitions, sort_blocks=False)


def funnel_steps(
    ds: Dataset,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_partitions: int | None = None,
) -> Dataset:
    """Ordered min-ts funnel: per user, step 1 is reached at the min ts
    of a ``steps[0]`` event; step k at the min ts of a ``steps[k-1]``
    event AT OR AFTER the step k-1 timestamp. Output: (user_col,
    max_step) for every user with at least one step-1 event — the
    per-user table, so downstream conversion aggregates stay
    composable. Equal timestamps count (>=, the inclusive convention).

    ONE user-keyed exchange over only the step-typed rows (map-side
    filter), then a vectorized per-block pass: for the fixed small step
    list, per-user thresholds advance via groupby-min per step. Twin:
    the chained ``min(ts) .. WHERE ts >= prev`` CTE ladder."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    utype = dict(zip(ds.schema().names, ds.schema().types))[user_col]
    step_idx = {s: i for i, s in enumerate(steps)}
    ROW = pa.schema([(user_col, utype), ("__s", pa.int8()),
                     ("__ts", pa.int64())])

    def prune(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": batch[user_col].to_pandas(),
            "s": batch[type_col].to_pandas().map(step_idx),
            "t": np.asarray(batch[ts_col].combine_chunks().cast(pa.int64())
                            .to_numpy(zero_copy_only=False)
                            if isinstance(batch[ts_col], pa.ChunkedArray)
                            else batch[ts_col].cast(pa.int64())
                            .to_numpy(zero_copy_only=False), np.int64),
        }).dropna(subset=["s"])
        return pa.table({
            user_col: pa.array(df["u"], utype, from_pandas=True),
            "__s": pa.array(df["s"].to_numpy(np.int8), pa.int8()),
            "__ts": pa.array(df["t"].to_numpy(np.int64), pa.int64()),
        }, schema=ROW)

    rows = ds.select_columns([user_col, type_col, ts_col]).map_batches(
        prune, batch_format="pyarrow", zero_copy_batch=True)

    OUT = pa.schema([(user_col, utype), ("max_step", pa.int64())])

    def funnel_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = block.to_pandas()
        thr = (df[df["__s"] == 0].groupby(user_col)["__ts"].min())
        reached = pd.Series(np.int64(1), index=thr.index)
        for k in range(1, len(steps)):
            dk = df[df["__s"] == k]
            dk = dk[dk[user_col].isin(thr.index)]
            if not len(dk):
                break
            ok = dk[dk["__ts"].to_numpy()
                    >= thr.reindex(dk[user_col]).to_numpy()]
            if not len(ok):
                break
            thr = ok.groupby(user_col)["__ts"].min()
            reached.loc[thr.index] = k + 1
        out = reached.sort_index()
        return pa.table({
            user_col: pa.array(out.index.to_numpy(), utype,
                               from_pandas=True),
            "max_step": pa.array(out.to_numpy(np.int64), pa.int64()),
        }, schema=OUT)

    return map_key_blocks(rows, [user_col], funnel_block, num_partitions,
                          sort_blocks=False)


def grouped_gini(ds: Dataset, key: str, value_col: str,
                 round_digits: int = 9,
                 num_partitions: int | None = None) -> Dataset:
    """Gini coefficient per group over NON-NEGATIVE values:
    ``G = 2*sum(i*x_(i)) / (n*sum(x)) - (n+1)/n`` with 1-based ranks
    over the ascending sort — tie order does not matter (equal values
    make ``i*x`` rank-invariant), so the twin's ``row_number() OVER
    (ORDER BY v)`` matches regardless of tie placement. One keyed
    exchange, per-block vectorized sort + closed form. Groups with
    ``sum(x)=0`` emit NULL (the SQL division convention is an error;
    both engines drop them -- we filter those groups out)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    OUT = pa.schema([(key, ktype), ("gini", pa.float64())])

    def gini_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = (block.to_pandas()
              .sort_values([key, value_col], kind="mergesort")
              .reset_index(drop=True))
        kv = df[key].to_numpy()
        x = df[value_col].to_numpy(dtype=np.float64)
        new_grp = np.r_[True, kv[1:] != kv[:-1]]
        starts = np.flatnonzero(new_grp)
        glen = np.diff(np.r_[starts, len(df)])
        i = (np.arange(len(df)) - np.repeat(starts, glen) + 1).astype(
            np.float64)
        ix = i * x
        csum_ix = np.r_[0.0, np.cumsum(ix)]
        csum_x = np.r_[0.0, np.cumsum(x)]
        ends = starts + glen
        sum_ix = csum_ix[ends] - csum_ix[starts]
        sum_x = csum_x[ends] - csum_x[starts]
        n = glen.astype(np.float64)
        keep = sum_x > 0
        g = 2.0 * sum_ix[keep] / (n[keep] * sum_x[keep]) \
            - (n[keep] + 1.0) / n[keep]
        return pa.table({
            key: pa.array(kv[starts][keep], ktype, from_pandas=True),
            "gini": pa.array(sql_round(g, round_digits), pa.float64()),
        }, schema=OUT)

    return map_key_blocks(ds.select_columns([key, value_col]), [key],
                          gini_block, num_partitions, sort_blocks=False)


def grouped_geomean(ds: Dataset, key: str, value_col: str,
                    round_digits: int = 9,
                    num_partitions: int | None = None) -> Dataset:
    """Geometric mean per group over POSITIVE values:
    ``exp(sum(ln x)/n)`` — decomposable log-sum partials per batch, one
    keyed exchange, identical closed form in the twin
    (``round(exp(sum(ln(v))/count(*)), 9)``). Non-positive values are
    dropped on both sides (ln domain)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    PART = pa.schema([(key, ktype), ("__ls", pa.float64()),
                      ("__n", pa.int64())])
    OUT = pa.schema([(key, ktype), ("geomean", pa.float64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": batch[key].to_pandas(),
            "x": np.asarray(batch[value_col].to_numpy(
                zero_copy_only=False), np.float64),
        })
        df = df[df["x"] > 0]
        if not len(df):
            return PART.empty_table()
        df["lx"] = np.log(df["x"].to_numpy())
        g = df.groupby("k", sort=False).agg(
            __ls=("lx", "sum"), __n=("lx", "size")).reset_index()
        return pa.table({
            key: pa.array(g["k"], ktype, from_pandas=True),
            "__ls": pa.array(g["__ls"].to_numpy(np.float64), pa.float64()),
            "__n": pa.array(g["__n"].to_numpy(np.int64), pa.int64()),
        }, schema=PART)

    def reduce_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        g = (block.to_pandas().groupby(key, sort=True)
             .agg(ls=("__ls", "sum"), n=("__n", "sum")).reset_index())
        gm = np.exp(g["ls"].to_numpy(np.float64)
                    / g["n"].to_numpy(np.float64))
        return pa.table({
            key: pa.array(g[key], ktype, from_pandas=True),
            "geomean": pa.array(sql_round(gm, round_digits), pa.float64()),
        }, schema=OUT)

    parts = ds.select_columns([key, value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return map_key_blocks(parts, [key], reduce_block, num_partitions,
                          sort_blocks=False)


def grouped_entropy(ds: Dataset, key: str, value_col: str,
                    round_digits: int = 9,
                    num_partitions: int | None = None) -> Dataset:
    """Shannon entropy (nats) of the categorical ``value_col``
    distribution per group: ``H = ln(n) - sum(c*ln(c))/n`` over the
    per-(group, value) counts ``c`` — (group, value)-count partials per
    batch, one keyed exchange, identical closed form in the twin."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    vtype = dict(zip(ds.schema().names, ds.schema().types))[value_col]
    PART = pa.schema([(key, ktype), (value_col, vtype),
                      ("__c", pa.int64())])
    OUT = pa.schema([(key, ktype), ("entropy", pa.float64())])

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select([key, value_col]),
                            [key, value_col]).aggregate([([], "count_all")])
        return pa.table({key: g[key], value_col: g[value_col],
                         "__c": g["count_all"]}, schema=PART)

    def reduce_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = (block.to_pandas()
              .groupby([key, value_col], sort=False, as_index=False)
              ["__c"].sum())
        g = df.groupby(key, sort=True)
        n = g["__c"].sum()
        clnc = df.assign(t=df["__c"] * np.log(df["__c"])) \
                 .groupby(key, sort=True)["t"].sum()
        h = np.log(n.to_numpy(np.float64)) \
            - clnc.to_numpy(np.float64) / n.to_numpy(np.float64)
        return pa.table({
            key: pa.array(n.index.to_numpy(), ktype, from_pandas=True),
            "entropy": pa.array(sql_round(h, round_digits), pa.float64()),
        }, schema=OUT)

    parts = ds.select_columns([key, value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return map_key_blocks(parts, [key], reduce_block, num_partitions,
                          sort_blocks=False)


def grouped_weighted_median(
    ds: Dataset, key: str, value_col: str, weight_col: str,
    num_partitions: int | None = None,
) -> Dataset:
    """Exact lower weighted median per group: the smallest value whose
    running weight (over the value-ascending sort) reaches half the
    group's total weight — ``min(v) WHERE cumsum(w) >= sum(w)/2``, the
    window-cumsum twin. Like the plain median it is not decomposable,
    so one values-only keyed exchange + a vectorized cumsum pass per
    key-sorted block. Non-positive weights are dropped on both sides.
    Output: (key, wmedian)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    OUT = pa.schema([(key, ktype), ("wmedian", pa.float64())])

    def med_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = (block.to_pandas()
              .query(f"{weight_col} > 0")
              .sort_values([key, value_col], kind="mergesort")
              .reset_index(drop=True))
        if not len(df):
            return OUT.empty_table()
        kv = df[key].to_numpy()
        v = df[value_col].to_numpy(dtype=np.float64)
        g = df.groupby(key, sort=False)[weight_col]
        # per-group cumsum (no cross-group float leak — matches the
        # twin's windowed running sum addition order)
        run_w = g.cumsum().to_numpy(dtype=np.float64)
        tot = g.transform("sum").to_numpy(dtype=np.float64)
        hit = run_w >= tot / 2.0
        # first hit per group = the lower weighted median (gid over hit
        # rows is nondecreasing, so unique's first-occurrence indices
        # ARE the per-group first hits)
        new_grp = np.r_[True, kv[1:] != kv[:-1]]
        starts = np.flatnonzero(new_grp)
        glen = np.diff(np.r_[starts, len(df)])
        gid = np.repeat(np.arange(starts.size), glen)
        idx = np.flatnonzero(hit)
        take = idx[np.unique(gid[idx], return_index=True)[1]]
        return pa.table({
            key: pa.array(kv[take], ktype, from_pandas=True),
            "wmedian": pa.array(v[take], pa.float64()),
        }, schema=OUT)

    return map_key_blocks(ds.select_columns([key, value_col, weight_col]),
                          [key], med_block, num_partitions,
                          sort_blocks=False)


def grouped_argmax(
    ds: Dataset, key: str, order_col: str, tie_col: str,
    num_partitions: int | None = None,
) -> Dataset:
    """Whole-row argmax per group: the row with the max ``order_col``
    (ties to the SMALLEST ``tie_col`` — pinned, SQL ``max_by`` leaves
    ties unspecified). One keyed exchange carrying the full payload,
    one vectorized first-of-run pass per key-sorted block. Twin:
    ``row_number() OVER (PARTITION BY key ORDER BY ord DESC, tie)
    = 1``."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    out_schema = pa.schema(list(zip(ds.schema().names, ds.schema().types)))

    def top_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        df = (block.to_pandas()
              .sort_values([key, order_col, tie_col],
                           ascending=[True, False, True], kind="mergesort"))
        top = df.drop_duplicates(subset=[key], keep="first")
        arrays = [pa.array(top[c], type=out_schema.field(c).type,
                           from_pandas=True) for c in out_schema.names]
        return pa.table(dict(zip(out_schema.names, arrays)),
                        schema=out_schema)

    return map_key_blocks(ds, [key], top_block, num_partitions,
                          sort_blocks=False)


def grouped_harmonic(ds: Dataset, key: str, value_col: str,
                     round_digits: int = 9,
                     num_partitions: int | None = None) -> Dataset:
    """Harmonic mean per group over POSITIVE values: ``n / sum(1/x)`` —
    the reciprocal-sum sibling of :func:`grouped_geomean` (decomposable
    partials, one keyed exchange, identical closed form in the twin:
    ``round(count(*) / sum(1.0/v), 9)``). Non-positive values dropped
    on both sides."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    PART = pa.schema([(key, ktype), ("__rs", pa.float64()),
                      ("__n", pa.int64())])
    OUT = pa.schema([(key, ktype), ("harmonic", pa.float64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": batch[key].to_pandas(),
            "x": np.asarray(batch[value_col].to_numpy(
                zero_copy_only=False), np.float64),
        })
        df = df[df["x"] > 0]
        if not len(df):
            return PART.empty_table()
        df["rx"] = 1.0 / df["x"].to_numpy()
        g = df.groupby("k", sort=False).agg(
            __rs=("rx", "sum"), __n=("rx", "size")).reset_index()
        return pa.table({
            key: pa.array(g["k"], ktype, from_pandas=True),
            "__rs": pa.array(g["__rs"].to_numpy(np.float64), pa.float64()),
            "__n": pa.array(g["__n"].to_numpy(np.int64), pa.int64()),
        }, schema=PART)

    def reduce_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        g = (block.to_pandas().groupby(key, sort=True)
             .agg(rs=("__rs", "sum"), n=("__n", "sum")).reset_index())
        hm = g["n"].to_numpy(np.float64) / g["rs"].to_numpy(np.float64)
        return pa.table({
            key: pa.array(g[key], ktype, from_pandas=True),
            "harmonic": pa.array(sql_round(hm, round_digits), pa.float64()),
        }, schema=OUT)

    parts = ds.select_columns([key, value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return map_key_blocks(parts, [key], reduce_block, num_partitions,
                          sort_blocks=False)


def rolling_active_users(
    ds: Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window: int = 7,
    period_s: int = 86400,
    num_partitions: int | None = None,
) -> Dataset:
    """Rolling window-distinct actives (the DAU/WAU family): for every
    period ``d``, the count of DISTINCT users active in the ``window``
    periods ending at ``d``. Exact sliding-window distinct without any
    window state: each distinct (user, period) pair contributes to
    exactly ``window`` report periods, so a bounded explode turns the
    sliding window into a plain groupby — distinct-pair exchange
    (map-side dedup) -> x``window`` explode -> period-keyed distinct
    count. Report periods run past the last active period (partial
    tail windows are reported; the twin does the same generate_series
    explode). Output: (period, n_users)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    utype = dict(zip(ds.schema().names, ds.schema().types))[user_col]
    PAIR = pa.schema([(user_col, utype), ("d", pa.int64())])

    def to_pairs(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = np.asarray(ts.cast(pa.int64()).to_numpy(zero_copy_only=False),
                        np.int64)
        df = pd.DataFrame({
            "u": batch[user_col].to_pandas(),
            "d": (us // 1_000_000) // period_s,
        }).drop_duplicates()
        return pa.table({user_col: pa.array(df["u"], utype,
                                            from_pandas=True),
                         "d": pa.array(df["d"].to_numpy(np.int64),
                                       pa.int64())}, schema=PAIR)

    def distinct_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return PAIR.empty_table()
        df = block.to_pandas().drop_duplicates()
        return pa.table({user_col: pa.array(df["u"] if "u" in df
                                            else df[user_col], utype,
                                            from_pandas=True),
                         "d": pa.array(df["d"].to_numpy(np.int64),
                                       pa.int64())}, schema=PAIR)

    pairs = map_key_blocks(
        ds.select_columns([user_col, ts_col]).map_batches(
            to_pairs, batch_format="pyarrow", zero_copy_batch=True),
        [user_col, "d"], distinct_block, num_partitions,
        sort_blocks=False)

    EXP = pa.schema([("period", pa.int64()), (user_col, utype)])

    def explode(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["d"].to_numpy(zero_copy_only=False), np.int64)
        n = d.size
        offs = np.tile(np.arange(window, dtype=np.int64), n)
        rep = pa.array(np.repeat(np.arange(n), window))
        u = batch[user_col]
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        return pa.table({
            "period": pa.array(np.repeat(d, window) + offs, pa.int64()),
            user_col: u.take(rep),
        }, schema=EXP)

    OUT = pa.schema([("period", pa.int64()), ("n_users", pa.int64())])

    def count_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        g = (block.to_pandas().groupby("period", sort=True)[user_col]
             .nunique().rename("n_users").reset_index())
        return pa.table({
            "period": pa.array(g["period"].to_numpy(np.int64), pa.int64()),
            "n_users": pa.array(g["n_users"].to_numpy(np.int64),
                                pa.int64()),
        }, schema=OUT)

    exploded = pairs.map_batches(explode, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return map_key_blocks(exploded, ["period"], count_block,
                          num_partitions, sort_blocks=False)


def grouped_trend(
    ds: Dataset, key: str, ts_col: str = "ts",
    period_s: int = 86400, round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Activity trend per group: the OLS slope (and intercept) of the
    per-period row count over the period index — two exchanges
    ((key, period) count partials, then per-key closed-form moments:
    ``slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)``). All moment inputs
    are integers, so the sums are exact doubles and the twin's
    identical closed form (NOT regr_slope, whose internal arithmetic is
    unspecified) matches hash-exactly. Groups with a single active
    period emit NULL slope on both sides. Output: (key, n_periods,
    slope, intercept)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    CNT = pa.schema([(key, ktype), ("d", pa.int64()), ("c", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = np.asarray(ts.cast(pa.int64()).to_numpy(zero_copy_only=False),
                        np.int64)
        df = pd.DataFrame({"k": batch[key].to_pandas(),
                           "d": (us // 1_000_000) // period_s})
        g = df.groupby(["k", "d"], sort=False).size().rename("c") \
              .reset_index()
        return pa.table({
            key: pa.array(g["k"], ktype, from_pandas=True),
            "d": pa.array(g["d"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }, schema=CNT)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return CNT.empty_table()
        g = (block.to_pandas()
             .groupby([key, "d"], sort=False, as_index=False)["c"].sum())
        return pa.table({
            key: pa.array(g[key], ktype, from_pandas=True),
            "d": pa.array(g["d"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }, schema=CNT)

    counts = map_key_blocks(
        ds.select_columns([key, ts_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        [key, "d"], sum_block, num_partitions, sort_blocks=False)

    OUT = pa.schema([(key, ktype), ("n_periods", pa.int64()),
                     ("slope", pa.float64()),
                     ("intercept", pa.float64())])

    def trend_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = block.to_pandas()
        df["x"] = df["d"].astype(np.float64)
        df["y"] = df["c"].astype(np.float64)
        df["xy"] = df["x"] * df["y"]
        df["xx"] = df["x"] * df["x"]
        g = df.groupby(key, sort=True).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum")).reset_index()
        n = g["n"].to_numpy(np.float64)
        sx = g["sx"].to_numpy(np.float64)
        sy = g["sy"].to_numpy(np.float64)
        sxy = g["sxy"].to_numpy(np.float64)
        sxx = g["sxx"].to_numpy(np.float64)
        den = n * sxx - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(den != 0, (n * sxy - sx * sy) / den, np.nan)
            intercept = np.where(den != 0, (sy - slope * sx) / n, np.nan)
        return pa.table({
            key: pa.array(g[key], ktype, from_pandas=True),
            "n_periods": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "slope": pa.array(sql_round(slope, round_digits),
                              pa.float64(), from_pandas=True),
            "intercept": pa.array(sql_round(intercept, round_digits),
                                  pa.float64(), from_pandas=True),
        }, schema=OUT)

    return map_key_blocks(counts, [key], trend_block, num_partitions,
                          sort_blocks=False)


def markov_transitions(
    ds: Dataset, key: str, state_col: str, ts_col: str, tie_col: str,
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """First-order Markov transition matrix over per-``key`` state
    sequences ordered by (``ts_col``, ``tie_col``): counts and
    row-normalized probabilities per (from_state, to_state). Two
    exchanges — key-sorted blocks emit consecutive state pairs
    (vectorized shift within key runs), then a from_state-keyed
    exchange sums counts and normalizes within the block (every row of
    one from_state lands together). Twin: lag window + count + a
    sum-over-partition ratio, rounded identically. Output:
    (from_state, to_state, n, p)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    stype = dict(zip(ds.schema().names, ds.schema().types))[state_col]
    PAIR = pa.schema([("from_state", stype), ("to_state", stype),
                      ("n", pa.int64())])

    def pair_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return PAIR.empty_table()
        df = (block.to_pandas()
              .sort_values([key, ts_col, tie_col], kind="mergesort")
              .reset_index(drop=True))
        kv = df[key].to_numpy()
        same = np.r_[False, kv[1:] == kv[:-1]]
        frm = df[state_col].shift(1)
        sub = pd.DataFrame({"from_state": frm[same],
                            "to_state": df[state_col][same]})
        if not len(sub):
            return PAIR.empty_table()
        g = (sub.groupby(["from_state", "to_state"], sort=False)
             .size().rename("n").reset_index())
        return pa.table({
            "from_state": pa.array(g["from_state"], stype,
                                   from_pandas=True),
            "to_state": pa.array(g["to_state"], stype, from_pandas=True),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        }, schema=PAIR)

    pairs = map_key_blocks(
        ds.select_columns([key, state_col, ts_col, tie_col]),
        [key], pair_block, num_partitions, sort_blocks=False)

    OUT = pa.schema([("from_state", stype), ("to_state", stype),
                     ("n", pa.int64()), ("p", pa.float64())])

    def norm_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = (block.to_pandas()
              .groupby(["from_state", "to_state"], sort=True,
                       as_index=False)["n"].sum())
        tot = df.groupby("from_state")["n"].transform("sum") \
                .to_numpy(np.float64)
        n = df["n"].to_numpy(np.float64)
        return pa.table({
            "from_state": pa.array(df["from_state"], stype,
                                   from_pandas=True),
            "to_state": pa.array(df["to_state"], stype, from_pandas=True),
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "p": pa.array(sql_round(n / tot, round_digits), pa.float64()),
        }, schema=OUT)

    return map_key_blocks(pairs, ["from_state"], norm_block,
                          num_partitions, sort_blocks=False)


def key_skew_report(ds: Dataset, key: str, round_digits: int = 9,
                    num_partitions: int | None = None) -> Dataset:
    """Shuffle-planning skew report for a prospective exchange key: key
    cardinality, total rows, the heaviest key's frequency and share,
    and the Herfindahl concentration index ``sum(c^2)/n^2`` (1/HHI is
    the effective key count a shuffle actually spreads over). Every
    statistic is DECOMPOSABLE — per-key counts from one keyed exchange,
    then fixed-size per-block partials (count/sum/max/sum-of-squares)
    combined on the driver; no global sort, no single-block gather.
    Output: one row (n_keys, n_rows, max_freq, top1_share, hhi)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    CNT = pa.schema([("c", pa.int64())])

    def count_partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select([key]), [key]).aggregate(
            [([], "count_all")])
        return pa.table({key: g[key], "c": g["count_all"]})

    def count_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return CNT.empty_table()
        g = (block.to_pandas().groupby(key, sort=False)["c"].sum())
        return pa.table({"c": pa.array(g.to_numpy(np.int64), pa.int64())},
                        schema=CNT)

    counts = map_key_blocks(
        ds.select_columns([key]).map_batches(
            count_partial, batch_format="pyarrow", zero_copy_batch=True),
        [key], count_block, num_partitions, sort_blocks=False)

    PART = pa.schema([("k", pa.int64()), ("s", pa.int64()),
                      ("m", pa.int64()), ("ss", pa.float64())])

    def moments(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["c"].to_numpy(zero_copy_only=False),
                       np.int64).astype(np.float64)
        return pa.table({
            "k": pa.array([c.size], pa.int64()),
            "s": pa.array([int(c.sum())], pa.int64()),
            "m": pa.array([int(c.max()) if c.size else 0], pa.int64()),
            "ss": pa.array([float((c * c).sum())], pa.float64()),
        }, schema=PART)

    import ray
    import ray.data as rd

    tabs = [t for t in ray.get(
        counts.map_batches(moments, batch_format="pyarrow",
                           zero_copy_batch=True).to_arrow_refs())
        if t.num_rows]
    k = sum(int(t["k"].to_pandas().sum()) for t in tabs)
    s = sum(int(t["s"].to_pandas().sum()) for t in tabs)
    m = max((int(t["m"].to_pandas().max()) for t in tabs), default=0)
    ss = sum(float(t["ss"].to_pandas().sum()) for t in tabs)
    top1 = float(sql_round(np.array([m / s if s else 0.0]),
                           round_digits)[0])
    hhi = float(sql_round(np.array([ss / (s * s) if s else 0.0]),
                          round_digits)[0])
    return rd.from_arrow(pa.table({
        "n_keys": pa.array([k], pa.int64()),
        "n_rows": pa.array([s], pa.int64()),
        "max_freq": pa.array([m], pa.int64()),
        "top1_share": pa.array([top1], pa.float64()),
        "hhi": pa.array([hhi], pa.float64()),
    }))


def winsorize_per_group(
    ds: Dataset, key: str, value_col: str,
    lo: float = 0.05, hi: float = 0.95,
    num_partitions: int | None = None,
) -> Dataset:
    """Per-group winsorization: clip ``value_col`` to the group's exact
    [lo, hi] continuous quantiles (ROUNDED to 6 digits — the
    grouped_quantile convention, so the clip boundaries are identical
    in both engines). Two quantile exchanges + two size-switched
    boundary attaches + a vectorized clip; all input columns survive,
    plus ``<value_col>_w``. Twin: per-group quantile_cont CTE + CASE
    clip."""
    from epstein_pipeline_ray.stages.joins import attach_column

    qlo = grouped_quantile(ds, key, value_col, lo, out_col="__qlo",
                           num_partitions=num_partitions)
    qhi = grouped_quantile(ds, key, value_col, hi, out_col="__qhi",
                           num_partitions=num_partitions)
    tagged = attach_column(ds, qlo, key, key, "__qlo", "__qlo",
                           num_partitions=num_partitions)
    tagged = attach_column(tagged, qhi, key, key, "__qhi", "__qhi",
                           num_partitions=num_partitions)
    out_names = list(ds.schema().names) + [f"{value_col}_w"]

    def clip(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col].to_numpy(zero_copy_only=False),
                       np.float64)
        ql = np.asarray(batch["__qlo"].to_numpy(zero_copy_only=False),
                        np.float64)
        qh = np.asarray(batch["__qhi"].to_numpy(zero_copy_only=False),
                        np.float64)
        w = np.clip(v, ql, qh)
        cols = {c: batch[c] for c in batch.schema.names
                if c not in ("__qlo", "__qhi")}
        cols[f"{value_col}_w"] = pa.array(w, pa.float64())
        return pa.table({c: cols[c] for c in out_names})

    return tagged.map_batches(clip, batch_format="pyarrow",
                              zero_copy_batch=True)


def time_weighted_avg(
    ds: Dataset, key: str, value_col: str, ts_col: str, tie_col: str,
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Time-weighted average per key (the streaming-metrics TWA: each
    value holds until the NEXT event): ``sum(v_i * dt_i) / sum(dt_i)``
    with ``dt_i`` the microseconds to the next event in (ts, tie)
    order; the last event has no holding interval and drops out, and
    equal-timestamp runs contribute dt=0 (tie order cannot matter).
    Keys with zero total duration emit nothing. One keyed exchange +
    vectorized shifted-diff pass. Twin: ``lead(ts) OVER`` + the same
    ratio."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    OUT = pa.schema([(key, ktype), ("twa", pa.float64())])

    def twa_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = block.to_pandas()
        df["__us"] = df[ts_col].astype("int64")
        df = (df.sort_values([key, "__us", tie_col], kind="mergesort")
              .reset_index(drop=True))
        kv = df[key].to_numpy()
        us = df["__us"].to_numpy(np.int64)
        v = df[value_col].to_numpy(dtype=np.float64)
        same_next = np.r_[kv[1:] == kv[:-1], False]
        dt = np.where(same_next, np.r_[np.diff(us), 0], 0).astype(
            np.float64)
        df["__wd"] = v * dt
        df["__dt"] = dt
        g = df[same_next].groupby(key, sort=True)[["__wd", "__dt"]].sum()
        g = g[g["__dt"] > 0]
        twa = g["__wd"].to_numpy(np.float64) / g["__dt"].to_numpy(
            np.float64)
        return pa.table({
            key: pa.array(g.index.to_numpy(), ktype, from_pandas=True),
            "twa": pa.array(sql_round(twa, round_digits), pa.float64()),
        }, schema=OUT)

    return map_key_blocks(
        ds.select_columns([key, value_col, ts_col, tie_col]),
        [key], twa_block, num_partitions, sort_blocks=False)


def mutual_information(
    ds: Dataset, col_a: str, col_b: str,
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Mutual information (nats) between two categorical columns —
    the feature-dependence primitive:
    ``MI = sum_ab p(a,b) * ln(p(a,b) / (p(a)p(b)))`` computed from the
    (a, b) contingency counts in the EXACT closed form
    ``(sum c*ln(c) - sum_a ca*ln(ca) - sum_b cb*ln(cb)) / N + ln(N)``
    — every term a decomposable sum over the (pair/marginal) count
    tables, no floating p's until the final expression, so the twin's
    identical arithmetic matches hash-exactly. Map-side pair-count
    partials -> one keyed exchange -> marginals re-aggregated from the
    pair table (bounded). Output: one row (n, mi)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    PAIR = pa.schema([("a", pa.string()), ("b", pa.string()),
                      ("c", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "a": batch[col_a].to_pandas().astype(str),
            "b": batch[col_b].to_pandas().astype(str),
        })
        g = df.groupby(["a", "b"], sort=False).size().rename("c") \
              .reset_index()
        return pa.table({
            "a": pa.array(g["a"], pa.string()),
            "b": pa.array(g["b"], pa.string()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }, schema=PAIR)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return PAIR.empty_table()
        g = (block.to_pandas()
             .groupby(["a", "b"], sort=True, as_index=False)["c"].sum())
        return pa.table({
            "a": pa.array(g["a"], pa.string()),
            "b": pa.array(g["b"], pa.string()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }, schema=PAIR)

    pairs = map_key_blocks(
        ds.select_columns([col_a, col_b]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], sum_block, num_partitions,
        sort_blocks=False).to_pandas()
    # the contingency table is (|A| x |B|)-bounded — driver math is
    # category-proportional, never row-proportional
    c = pairs["c"].to_numpy(np.float64)
    n = float(c.sum())
    ca = pairs.groupby("a")["c"].sum().to_numpy(np.float64)
    cb = pairs.groupby("b")["c"].sum().to_numpy(np.float64)
    mi = ((c * np.log(c)).sum() - (ca * np.log(ca)).sum()
          - (cb * np.log(cb)).sum()) / n + np.log(n) if n else 0.0

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "n": pa.array([int(n)], pa.int64()),
        "mi": pa.array([float(sql_round(np.array([mi]),
                                        round_digits)[0])], pa.float64()),
    }))


def chi_square(
    ds: Dataset, col_a: str, col_b: str,
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Pearson chi-square independence statistic + Cramér's V for two
    categorical columns: ``chi2 = sum (o - e)^2 / e`` with
    ``e = ca*cb/N`` over the contingency counts, ``V = sqrt(chi2 /
    (N * (min(|A|,|B|) - 1)))``. Same plan as mutual_information —
    pair-count exchange, category-bounded driver math; the twin
    recomputes the identical expectation arithmetic. Output: one row
    (n, dof, chi2, cramers_v)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    PAIR = pa.schema([("a", pa.string()), ("b", pa.string()),
                      ("c", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "a": batch[col_a].to_pandas().astype(str),
            "b": batch[col_b].to_pandas().astype(str),
        })
        g = df.groupby(["a", "b"], sort=False).size().rename("c") \
              .reset_index()
        return pa.table({
            "a": pa.array(g["a"], pa.string()),
            "b": pa.array(g["b"], pa.string()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }, schema=PAIR)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return PAIR.empty_table()
        g = (block.to_pandas()
             .groupby(["a", "b"], sort=True, as_index=False)["c"].sum())
        return pa.table({
            "a": pa.array(g["a"], pa.string()),
            "b": pa.array(g["b"], pa.string()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }, schema=PAIR)

    pairs = map_key_blocks(
        ds.select_columns([col_a, col_b]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"], sum_block, num_partitions,
        sort_blocks=False).to_pandas()

    n = float(pairs["c"].sum())
    ca = pairs.groupby("a")["c"].sum()
    cb = pairs.groupby("b")["c"].sum()
    ka, kb = len(ca), len(cb)
    # chi2 over ALL cells incl. zero observed: sum o^2/e - N (the
    # algebraic identity that needs only the NONZERO cells — zero cells
    # contribute o^2/e = 0, so sum (o-e)^2/e = sum o^2/e - 2N + N)
    e = (ca.reindex(pairs["a"]).to_numpy(np.float64)
         * cb.reindex(pairs["b"]).to_numpy(np.float64)) / n
    chi2 = float((pairs["c"].to_numpy(np.float64) ** 2 / e).sum() - n)
    dof = (ka - 1) * (kb - 1)
    v = float(np.sqrt(chi2 / (n * (min(ka, kb) - 1)))) \
        if min(ka, kb) > 1 and n > 0 else 0.0

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "n": pa.array([int(n)], pa.int64()),
        "dof": pa.array([dof], pa.int64()),
        "chi2": pa.array([float(sql_round(np.array([chi2]),
                                          round_digits)[0])],
                         pa.float64()),
        "cramers_v": pa.array([float(sql_round(np.array([v]),
                                               round_digits)[0])],
                              pa.float64()),
    }))


def grouped_spearman(
    ds: Dataset, key: str, col_x: str, col_y: str,
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Spearman rank correlation per group: Pearson correlation of the
    AVERAGE ranks (ties share the mean of their positions — the
    fractional-rank convention) of the two value columns. One keyed
    exchange; per block: two tie-aware average-rank passes + exact
    moment sums. Average ranks are halves (exact doubles), so the
    twin's ``(2*rank() + ties - 1) / 2`` arithmetic matches. Groups
    with zero rank variance on either side emit NULL. Output:
    (key, n, spearman)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    OUT = pa.schema([(key, ktype), ("n", pa.int64()),
                     ("spearman", pa.float64())])

    def avg_ranks(df: pd.DataFrame, col: str) -> np.ndarray:
        # fractional (average) rank within each key group
        return (df.groupby(key, sort=False)[col]
                .rank(method="average").to_numpy(np.float64))

    def block(block_: pa.Table) -> pa.Table:
        if block_.num_rows == 0:
            return OUT.empty_table()
        df = block_.to_pandas()
        df["__rx"] = avg_ranks(df, col_x)
        df["__ry"] = avg_ranks(df, col_y)
        df["__xy"] = df["__rx"] * df["__ry"]
        df["__xx"] = df["__rx"] * df["__rx"]
        df["__yy"] = df["__ry"] * df["__ry"]
        g = df.groupby(key, sort=True).agg(
            n=("__rx", "size"), sx=("__rx", "sum"), sy=("__ry", "sum"),
            sxy=("__xy", "sum"), sxx=("__xx", "sum"),
            syy=("__yy", "sum")).reset_index()
        n = g["n"].to_numpy(np.float64)
        sx = g["sx"].to_numpy(np.float64)
        sy = g["sy"].to_numpy(np.float64)
        cov = g["sxy"].to_numpy(np.float64) - sx * sy / n
        vx = g["sxx"].to_numpy(np.float64) - sx * sx / n
        vy = g["syy"].to_numpy(np.float64) - sy * sy / n
        with np.errstate(divide="ignore", invalid="ignore"):
            rho = np.where((vx > 0) & (vy > 0),
                           cov / np.sqrt(vx * vy), np.nan)
        return pa.table({
            key: pa.array(g[key], ktype, from_pandas=True),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "spearman": pa.array(sql_round(rho, round_digits),
                                 pa.float64(), from_pandas=True),
        }, schema=OUT)

    return map_key_blocks(ds.select_columns([key, col_x, col_y]),
                          [key], block, num_partitions,
                          sort_blocks=False)


def daily_anomaly(
    ds: Dataset, key: str, ts_col: str = "ts",
    period_s: int = 86400, z_threshold: float = 2.0,
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Volume-anomaly flags per (key, period): the z-score of each
    period's row count against the key's own mean/std over its ACTIVE
    periods (population std — the monitoring convention), flagged when
    |z| > threshold. Two exchanges: (key, period) count partials, then
    per-key moment sums with the z computed in the same block (all
    periods of a key co-locate). Keys with a single active period or
    zero variance emit NULL z / false flag on both sides. Output:
    (key, period, n, z, is_anomaly)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    CNT = pa.schema([(key, ktype), ("d", pa.int64()), ("c", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = np.asarray(ts.cast(pa.int64()).to_numpy(zero_copy_only=False),
                        np.int64)
        df = pd.DataFrame({"k": batch[key].to_pandas(),
                           "d": (us // 1_000_000) // period_s})
        g = df.groupby(["k", "d"], sort=False).size().rename("c") \
              .reset_index()
        return pa.table({
            key: pa.array(g["k"], ktype, from_pandas=True),
            "d": pa.array(g["d"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }, schema=CNT)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return CNT.empty_table()
        g = (block.to_pandas()
             .groupby([key, "d"], sort=False, as_index=False)["c"].sum())
        return pa.table({
            key: pa.array(g[key], ktype, from_pandas=True),
            "d": pa.array(g["d"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }, schema=CNT)

    counts = map_key_blocks(
        ds.select_columns([key, ts_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        [key, "d"], sum_block, num_partitions, sort_blocks=False)

    OUT = pa.schema([(key, ktype), ("period", pa.int64()),
                     ("n", pa.int64()), ("z", pa.float64()),
                     ("is_anomaly", pa.bool_())])

    def z_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = block.to_pandas()
        g = df.groupby(key, sort=False)["c"]
        mu = g.transform("mean").to_numpy(np.float64)
        # population std: sqrt(E[x^2] - mu^2) — the twin's closed form
        ex2 = (df.assign(c2=df["c"].astype(np.float64) ** 2)
               .groupby(key, sort=False)["c2"].transform("mean")
               .to_numpy(np.float64))
        var = ex2 - mu * mu
        sd = np.sqrt(np.maximum(var, 0.0))
        c = df["c"].to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sd > 0, (c - mu) / sd, np.nan)
        z = sql_round(z, round_digits)   # flag on the ROUNDED z so a
        flag = np.where(np.isnan(z), False,   # half-ulp can't flip it
                        np.abs(z) > z_threshold)
        return pa.table({
            key: pa.array(df[key], ktype, from_pandas=True),
            "period": pa.array(df["d"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(df["c"].to_numpy(np.int64), pa.int64()),
            "z": pa.array(z, pa.float64(), from_pandas=True),
            "is_anomaly": pa.array(flag, pa.bool_()),
        }, schema=OUT)

    return map_key_blocks(counts, [key], z_block, num_partitions,
                          sort_blocks=False)


def gap_fill_daily(
    ds: Dataset, key: str, ts_col: str = "ts", value_col: str = "value",
    tie_col: str = "event_id",
    num_partitions: int | None = None,
) -> Dataset:
    """Daily gap-fill / forward-fill resample per key — the time-series
    densification every monitoring join needs before aligning sparse
    event streams. Conventions (shared with the SQL twin):

      day     = epoch-microseconds // 1e6 // 86400 (integer epoch days)
      closing = the value of the (ts, tie) max row of each (key, day)
      output  = one row per day from the key's min to max observed day,
                closing value forward-filled across unobserved days

    Map-side: each batch collapses to per-(key, day) closing partials,
    so the single keyed exchange moves at most one row per (key, day)
    per batch. The reduce is fully vectorized across keys (repeat/cumsum
    dense-range construction + one composite searchsorted for the fill);
    per-key output size is bounded by the calendar span, never by rows.
    Output: (key, day:int64, value, is_observed:bool)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    vtype = dict(zip(ds.schema().names, ds.schema().types))[value_col]
    PART = pa.schema([(key, ktype), ("d", pa.int64()), ("us", pa.int64()),
                      ("tie", pa.int64()), ("v", vtype)])
    OUT = pa.schema([(key, ktype), ("day", pa.int64()), ("value", vtype),
                     ("is_observed", pa.bool_())])

    def _closing(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["k", "d", "us", "tie"], kind="mergesort")
        return df.drop_duplicates(["k", "d"], keep="last")

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = np.asarray(ts.cast(pa.int64()).to_numpy(zero_copy_only=False),
                        np.int64)
        df = _closing(pd.DataFrame({
            "k": batch[key].to_pandas(),
            "d": (us // 1_000_000) // 86_400,
            "us": us,
            "tie": np.asarray(batch[tie_col].to_numpy(
                zero_copy_only=False), np.int64),
            "v": batch[value_col].to_pandas(),
        }))
        return pa.table({
            key: pa.array(df["k"], ktype, from_pandas=True),
            "d": pa.array(df["d"].to_numpy(np.int64), pa.int64()),
            "us": pa.array(df["us"].to_numpy(np.int64), pa.int64()),
            "tie": pa.array(df["tie"].to_numpy(np.int64), pa.int64()),
            "v": pa.array(df["v"], vtype, from_pandas=True),
        }, schema=PART)

    def fill_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        obs = _closing(pd.DataFrame({
            "k": block[key].to_pandas(),
            "d": block["d"].to_numpy(zero_copy_only=False),
            "us": block["us"].to_numpy(zero_copy_only=False),
            "tie": block["tie"].to_numpy(zero_copy_only=False),
            "v": block["v"].to_pandas(),
        }))
        d = obs["d"].to_numpy(np.int64)
        # key-group boundaries on the (k, d)-sorted obs table
        k_codes, _ = pd.factorize(obs["k"], sort=False)
        starts = np.flatnonzero(np.r_[True, k_codes[1:] != k_codes[:-1]])
        ends = np.r_[starts[1:], len(obs)]
        lo, hi = d[starts], d[ends - 1]
        counts = hi - lo + 1
        offsets = np.r_[0, np.cumsum(counts)]
        key_idx = np.repeat(np.arange(len(starts)), counts)
        days = (np.arange(offsets[-1]) - offsets[key_idx]) + lo[key_idx]
        # composite-key ffill: one searchsorted over (key, day) codes
        g_lo, g_hi = d.min(), d.max()
        span = (g_hi - g_lo) + 1
        obs_comp = k_codes.astype(np.int64) * span + (d - g_lo)
        out_comp = key_idx.astype(np.int64) * span + (days - g_lo)
        fi = np.searchsorted(obs_comp, out_comp, side="right") - 1
        vals = obs["v"].to_numpy()[fi]
        observed = obs_comp[fi] == out_comp
        out_keys = obs["k"].iloc[starts].to_numpy()[key_idx]
        return pa.table({
            key: pa.array(out_keys, ktype, from_pandas=True),
            "day": pa.array(days, pa.int64()),
            "value": pa.array(vals, vtype, from_pandas=True),
            "is_observed": pa.array(observed, pa.bool_()),
        }, schema=OUT)

    partials = ds.select_columns([key, ts_col, tie_col, value_col]) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return map_key_blocks(partials, [key], fill_block, num_partitions)


def event_path_ngrams(
    ds: Dataset, key: str, state_col: str, ts_col: str, tie_col: str,
    n: int = 3, min_count: int = 1,
    num_partitions: int | None = None,
) -> Dataset:
    """Frequent n-step event paths: every run of ``n`` CONSECUTIVE
    states inside one ``key``'s (ts, tie)-ordered sequence, counted
    corpus-wide — the sequence-mining generalization of
    ``markov_transitions`` (its n=2 case). Two exchanges: key-sorted
    blocks emit per-path count partials (vectorized shift/compare, no
    per-row loop), then a path-keyed exchange sums partials and prunes
    below ``min_count``. Twin: chained lead() windows. Output:
    (s1..sN, n_paths)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    stype = dict(zip(ds.schema().names, ds.schema().types))[state_col]
    cols = [f"s{i + 1}" for i in range(n)]
    PART = pa.schema([(c, stype) for c in cols] + [("c", pa.int64())])

    def path_block(block: pa.Table) -> pa.Table:
        if block.num_rows < n:
            return PART.empty_table()
        df = (block.to_pandas()
              .sort_values([key, ts_col, tie_col], kind="mergesort")
              .reset_index(drop=True))
        kv = df[key].to_numpy()
        states = df[state_col].to_numpy()
        m = len(df) - (n - 1)
        valid = np.ones(m, dtype=bool)
        for j in range(1, n):
            valid &= kv[j:m + j] == kv[:m]
        if not valid.any():
            return PART.empty_table()
        sub = pd.DataFrame({cols[j]: states[j:m + j][valid]
                            for j in range(n)})
        g = sub.groupby(cols, sort=False).size().rename("c").reset_index()
        return pa.table(
            {c: pa.array(g[c], stype, from_pandas=True) for c in cols}
            | {"c": pa.array(g["c"].to_numpy(np.int64), pa.int64())},
            schema=PART)

    partials = map_key_blocks(
        ds.select_columns([key, state_col, ts_col, tie_col]),
        [key], path_block, num_partitions, sort_blocks=False)

    OUT = pa.schema([(c, stype) for c in cols] + [("n_paths", pa.int64())])

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        g = (block.to_pandas()
             .groupby(cols, sort=True, as_index=False)["c"].sum())
        g = g[g["c"] >= min_count]
        return pa.table(
            {c: pa.array(g[c], stype, from_pandas=True) for c in cols}
            | {"n_paths": pa.array(g["c"].to_numpy(np.int64), pa.int64())},
            schema=OUT)

    return map_key_blocks(partials, cols, sum_block, num_partitions,
                          sort_blocks=False)


def grouped_autocorr1(
    ds: Dataset, key: str, value_col: str, ts_col: str, tie_col: str,
    scale: int = 100, round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Lag-1 autocorrelation of the per-``key`` value sequence ordered
    by (ts, tie) — the burst/mean-reversion diagnostic:

        r1 = sum((x_t - m)(x_{t-1} - m)) / sum((x - m)^2)

    Exactness: values are pinned to integers first (half-up at
    ``scale``, the benford convention — autocorrelation is
    scale-invariant), every moment (S, Q, lagged product P, run ends)
    is an exact int64 sum, and the final closed form is one fixed float
    expression shared verbatim with the twin — so the float-sum
    order-dependence that breaks naive avg()-based twins cannot occur.
    One keyed exchange of (key, ts, tie, scaled-value) rows; the reduce
    is a vectorized shift within key runs. NULL when n < 2 or zero
    variance. Output: (key, n, r1)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]

    def scale_batch(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col].to_numpy(zero_copy_only=False),
                       np.float64)
        s = np.floor(v * scale + 0.5).astype(np.int64)
        return pa.table({
            key: batch[key],
            ts_col: batch[ts_col],
            tie_col: batch[tie_col],
            "s": pa.array(s, pa.int64()),
        })

    OUT = pa.schema([(key, ktype), ("n", pa.int64()),
                     ("r1", pa.float64())])

    def corr_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = (block.to_pandas()
              .sort_values([key, ts_col, tie_col], kind="mergesort")
              .reset_index(drop=True))
        kv = df[key].to_numpy()
        s = df["s"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]])
        ends = np.r_[starts[1:], len(df)]
        same = np.r_[False, kv[1:] == kv[:-1]]
        prod = np.zeros(len(df), np.int64)
        prod[same] = s[same] * np.roll(s, 1)[same]
        cs = np.cumsum(s)
        cq = np.cumsum(s * s)
        cp = np.cumsum(prod)
        def seg(c):  # exact per-segment sums from cumsums (ints)
            return c[ends - 1] - np.where(starts > 0, c[starts - 1], 0)
        n = (ends - starts).astype(np.float64)
        S = seg(cs).astype(np.float64)
        Q = seg(cq).astype(np.float64)
        P = seg(cp).astype(np.float64)
        first = s[starts].astype(np.float64)
        last = s[ends - 1].astype(np.float64)
        m = S / n
        num = P - m * (S - first) - m * (S - last) + (n - 1) * m * m
        den = Q - S * m
        with np.errstate(divide="ignore", invalid="ignore"):
            r1 = np.where((n >= 2) & (den > 0), num / den, np.nan)
        return pa.table({
            key: pa.array(df[key].iloc[starts], ktype, from_pandas=True),
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "r1": pa.array(sql_round(r1, round_digits), pa.float64(),
                           from_pandas=True),
        }, schema=OUT)

    scaled = ds.select_columns([key, value_col, ts_col, tie_col]) \
        .map_batches(scale_batch, batch_format="pyarrow",
                     zero_copy_batch=True)
    return map_key_blocks(scaled, [key], corr_block, num_partitions)


def iqr_outliers(
    ds: Dataset, key: str, value_col: str, k: float = 1.5,
    round_digits: int = 6,
    num_partitions: int | None = None,
) -> Dataset:
    """Tukey IQR fences per group: q1/q3 (the rounded grouped_quantile
    convention), fences q1 - k*IQR / q3 + k*IQR computed once per group
    (one fixed float expression, rounded — shared with the twin), and
    per-group outlier counts from one count-partial pass against the
    attached fences. Output: (key, q1, q3, lo_fence, hi_fence,
    n_outliers, n)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    q1 = grouped_quantile(ds, key, value_col, 0.25, out_col="q1",
                          num_partitions=num_partitions)
    q3 = grouped_quantile(ds, key, value_col, 0.75, out_col="q3",
                          num_partitions=num_partitions)
    pruned = ds.select_columns([key, value_col])
    tagged = attach_column(pruned, q1, key, key, "q1", "q1",
                           num_partitions=num_partitions)
    tagged = attach_column(tagged, q3, key, key, "q3", "q3",
                           num_partitions=num_partitions)

    PART = pa.schema([(key, ktype), ("q1", pa.float64()),
                      ("q3", pa.float64()), ("o", pa.int64()),
                      ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col].to_numpy(zero_copy_only=False),
                       np.float64)
        ql = np.asarray(batch["q1"].to_numpy(zero_copy_only=False),
                        np.float64)
        qh = np.asarray(batch["q3"].to_numpy(zero_copy_only=False),
                        np.float64)
        lo = sql_round(ql - k * (qh - ql), round_digits)
        hi = sql_round(qh + k * (qh - ql), round_digits)
        out = (v < lo) | (v > hi)
        df = pd.DataFrame({"k": batch[key].to_pandas(), "q1": ql,
                           "q3": qh, "o": out.astype(np.int64)})
        g = df.groupby("k", sort=False).agg(
            q1=("q1", "first"), q3=("q3", "first"), o=("o", "sum"),
            n=("o", "size")).reset_index()
        return pa.table({
            key: pa.array(g["k"], ktype, from_pandas=True),
            "q1": pa.array(g["q1"].to_numpy(np.float64), pa.float64()),
            "q3": pa.array(g["q3"].to_numpy(np.float64), pa.float64()),
            "o": pa.array(g["o"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        }, schema=PART)

    OUT = pa.schema([(key, ktype), ("q1", pa.float64()),
                     ("q3", pa.float64()), ("lo_fence", pa.float64()),
                     ("hi_fence", pa.float64()),
                     ("n_outliers", pa.int64()), ("n", pa.int64())])

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        g = (block.to_pandas()
             .groupby(key, sort=True, as_index=False)
             .agg(q1=("q1", "first"), q3=("q3", "first"),
                  o=("o", "sum"), n=("n", "sum")))
        ql = g["q1"].to_numpy(np.float64)
        qh = g["q3"].to_numpy(np.float64)
        return pa.table({
            key: pa.array(g[key], ktype, from_pandas=True),
            "q1": pa.array(ql, pa.float64()),
            "q3": pa.array(qh, pa.float64()),
            "lo_fence": pa.array(sql_round(ql - k * (qh - ql),
                                           round_digits), pa.float64()),
            "hi_fence": pa.array(sql_round(qh + k * (qh - ql),
                                           round_digits), pa.float64()),
            "n_outliers": pa.array(g["o"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        }, schema=OUT)

    partials = tagged.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return map_key_blocks(partials, [key], sum_block, num_partitions,
                          sort_blocks=False)


def stratified_fold_assign(
    ds: Dataset, stratum_col: str, id_col: str, k: int = 5,
    num_partitions: int | None = None,
) -> Dataset:
    """Stratified k-fold assignment: within each stratum, rows ranked by
    ``id_col`` take fold ``(rank - 1) % k`` — every fold gets an equal
    (+-1) share of EVERY stratum, the leakage-free eval-split prep a
    plain hash split (assign_split) cannot guarantee on skewed strata.
    One keyed exchange (stratum-sorted blocks), vectorized segment
    ranks. Output: (id, stratum, fold)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    stype = dict(zip(ds.schema().names, ds.schema().types))[stratum_col]
    itype = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    OUT = pa.schema([(id_col, itype), (stratum_col, stype),
                     ("fold", pa.int64())])

    def rank_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = (block.to_pandas()
              .sort_values([stratum_col, id_col], kind="mergesort")
              .reset_index(drop=True))
        kv = df[stratum_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]])
        ends = np.r_[starts[1:], len(df)]
        rank = np.arange(len(df), dtype=np.int64) \
            - np.repeat(starts, ends - starts)
        return pa.table({
            id_col: pa.array(df[id_col], itype, from_pandas=True),
            stratum_col: pa.array(df[stratum_col], stype,
                                  from_pandas=True),
            "fold": pa.array(rank % k, pa.int64()),
        }, schema=OUT)

    return map_key_blocks(ds.select_columns([stratum_col, id_col]),
                          [stratum_col], rank_block, num_partitions,
                          sort_blocks=False)


def impute_group_median(
    ds: Dataset, key: str, value_col: str, id_col: str,
    num_partitions: int | None = None,
) -> Dataset:
    """Null imputation with the group median (the standard numeric
    cleaning step): the exact rounded per-group median of the NON-NULL
    values (grouped_median convention) fills every null via a
    size-switched attach — no driver pull. Groups that are all-null
    stay null. Output: (id, key, value_filled, was_null)."""
    from epstein_pipeline_ray.stages.joins import attach_column

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    itype = dict(zip(ds.schema().names, ds.schema().types))[id_col]

    def drop_nulls(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch[value_col]))

    med = grouped_median(
        ds.select_columns([key, value_col]).map_batches(
            drop_nulls, batch_format="pyarrow", zero_copy_batch=True),
        key, value_col, out_col="__med", num_partitions=num_partitions)
    tagged = attach_column(ds.select_columns([id_col, key, value_col]),
                           med, key, key, "__med", "__med",
                           num_partitions=num_partitions)

    OUT = pa.schema([(id_col, itype), (key, ktype),
                     ("value_filled", pa.float64()),
                     ("was_null", pa.bool_())])

    def fill(batch: pa.Table) -> pa.Table:
        v = batch[value_col].cast(pa.float64())
        m = batch["__med"].cast(pa.float64())
        nulls = pc.is_null(v)
        return pa.table({
            id_col: batch[id_col],
            key: batch[key],
            "value_filled": pc.if_else(nulls, m, v),
            "was_null": nulls,
        }, schema=OUT)

    return tagged.map_batches(fill, batch_format="pyarrow",
                              zero_copy_batch=True)


def events_hopping_window(
    ds: Dataset, key: str, ts_col: str = "ts",
    size_s: int = 7200, hop_s: int = 1800,
    num_partitions: int | None = None,
) -> Dataset:
    """Hopping (sliding) window counts per key — the streaming-window
    family member tumbling windows can't express: every event lands in
    ``size_s / hop_s`` overlapping windows (hop must divide size), so
    the map side EXPLODES each batch with one vectorized repeat/tile
    (no per-row loop), collapses to (key, window_start) count partials,
    and one keyed exchange sums them. Window starts are epoch-second
    multiples of ``hop_s``. Output: (key, window_start:int64, n)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    if size_s % hop_s:
        raise ValueError("hop_s must divide size_s")
    m = size_s // hop_s
    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    CNT = pa.schema([(key, ktype), ("window_start", pa.int64()),
                     ("c", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        s = np.asarray(ts.cast(pa.int64()).to_numpy(zero_copy_only=False),
                       np.int64) // 1_000_000
        base = (s // hop_s) * hop_s
        starts = (np.repeat(base, m)
                  - np.tile(np.arange(m, dtype=np.int64) * hop_s, len(s)))
        df = pd.DataFrame({
            "k": batch[key].to_pandas().repeat(m).reset_index(drop=True),
            "w": starts,
        })
        g = df.groupby(["k", "w"], sort=False).size().rename("c") \
              .reset_index()
        return pa.table({
            key: pa.array(g["k"], ktype, from_pandas=True),
            "window_start": pa.array(g["w"].to_numpy(np.int64),
                                     pa.int64()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }, schema=CNT)

    OUT = pa.schema([(key, ktype), ("window_start", pa.int64()),
                     ("n", pa.int64())])

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        g = (block.to_pandas()
             .groupby([key, "window_start"], sort=True,
                      as_index=False)["c"].sum())
        return pa.table({
            key: pa.array(g[key], ktype, from_pandas=True),
            "window_start": pa.array(
                g["window_start"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }, schema=OUT)

    partials = ds.select_columns([key, ts_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return map_key_blocks(partials, [key, "window_start"], sum_block,
                          num_partitions, sort_blocks=False)


def psi_drift(
    ds: Dataset, key: str, value_col: str, split_col: str,
    ref_value, n_buckets: int = 10, round_digits: int = 6,
    num_partitions: int | None = None,
) -> Dataset:
    """Population Stability Index per key between a reference split and
    everything else — THE train/serve drift gate. Conventions (shared
    verbatim with the twin):

      edges   = rounded-6 linear-interp quantiles of the REFERENCE
                values at 1/n .. (n-1)/n
      bucket  = number of edges strictly below the value (0..n-1)
      shares  = (count + 0.5) / (split_total + n/2)  — half-count
                smoothing so empty cells stay finite
      psi     = sum over ALL n buckets of (p - q) * ln(p / q)

    One keyed exchange (values only): each key's block computes its own
    reference deciles, buckets both splits with one searchsorted, and
    emits a single PSI row — rows per key bound the block, the output
    is keys-sized. Output: (key, n_ref, n_cur, psi)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    OUT = pa.schema([(key, ktype), ("n_ref", pa.int64()),
                     ("n_cur", pa.int64()), ("psi", pa.float64())])
    qs = [(i + 1) / n_buckets for i in range(n_buckets - 1)]

    def psi_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = block.to_pandas()
        keys_out, nref_out, ncur_out, psi_out = [], [], [], []
        for k, sub in df.groupby(key, sort=True):
            is_ref = (sub[split_col] == ref_value).to_numpy()
            v = sub[value_col].to_numpy(np.float64)
            ref_v, cur_v = v[is_ref], v[~is_ref]
            edges = sql_round(
                np.quantile(ref_v, qs, method="linear"), round_digits) \
                if len(ref_v) else np.array([])
            n = n_buckets
            if len(ref_v) and len(cur_v):
                rb = np.searchsorted(edges, ref_v, side="left")
                cb = np.searchsorted(edges, cur_v, side="left")
                cr = np.bincount(rb, minlength=n).astype(np.float64)
                cc = np.bincount(cb, minlength=n).astype(np.float64)
                p = (cr + 0.5) / (len(ref_v) + n / 2.0)
                q = (cc + 0.5) / (len(cur_v) + n / 2.0)
                psi = float(sql_round(((p - q) * np.log(p / q)).sum(),
                                      round_digits))
            else:
                psi = None
            keys_out.append(k)
            nref_out.append(len(ref_v))
            ncur_out.append(len(cur_v))
            psi_out.append(psi)
        return pa.table({
            key: pa.array(keys_out, ktype),
            "n_ref": pa.array(nref_out, pa.int64()),
            "n_cur": pa.array(ncur_out, pa.int64()),
            "psi": pa.array(psi_out, pa.float64()),
        }, schema=OUT)

    return map_key_blocks(
        ds.select_columns([key, value_col, split_col]),
        [key], psi_block, num_partitions)


def ewma_trailing(
    ds: Dataset, key: str, value_col: str, ts_col: str, tie_col: str,
    alpha: float = 0.5, depth: int = 8, round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Trailing EWMA per key with a FIXED unroll depth — the smoothing
    every monitoring chart applies, made engine-exact: the infinite
    recursion is truncated at ``depth`` lags and renormalized over the
    terms that exist, so both engines evaluate the SAME finite
    expression (the twin unrolls the identical lag chain; with
    alpha = 0.5 every weight 2^-(j+1) is an exact binary fraction).
    Terms accumulate in fixed j = 0..depth-1 order on both sides. One
    keyed exchange; the reduce is ``depth`` vectorized shifted adds.
    Output: (tie, key, ewma)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    ttype = dict(zip(ds.schema().names, ds.schema().types))[tie_col]
    OUT = pa.schema([(tie_col, ttype), (key, ktype),
                     ("ewma", pa.float64())])
    weights = [alpha * (1.0 - alpha) ** j for j in range(depth)]

    def ewma_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = (block.to_pandas()
              .sort_values([key, ts_col, tie_col], kind="mergesort")
              .reset_index(drop=True))
        kv = df[key].to_numpy()
        x = df[value_col].to_numpy(np.float64)
        starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]])
        ends = np.r_[starts[1:], len(df)]
        row_start = np.repeat(starts, ends - starts)
        pos = np.arange(len(df)) - row_start
        num = np.zeros(len(df))
        den = np.zeros(len(df))
        for j, w in enumerate(weights):
            valid = pos >= j
            jj = min(j, len(df))
            shifted = np.r_[np.zeros(jj), x[:len(df) - jj]] if jj else x
            num = num + np.where(valid, w * shifted, 0.0)
            den = den + np.where(valid, w, 0.0)
        return pa.table({
            tie_col: pa.array(df[tie_col], ttype, from_pandas=True),
            key: pa.array(df[key], ktype, from_pandas=True),
            "ewma": pa.array(sql_round(num / den, round_digits),
                             pa.float64()),
        }, schema=OUT)

    return map_key_blocks(
        ds.select_columns([key, value_col, ts_col, tie_col]),
        [key], ewma_block, num_partitions)


def event_throttle(
    ds: Dataset,
    keys: list[str],
    ts_col: str,
    tie_col: str,
    min_gap_s: int = 60,
    num_partitions: int | None = None,
) -> Dataset:
    """Debounce / throttle dedup: within each key group (ordered by
    ``ts_col`` then ``tie_col``) keep a row only when it arrives at
    least ``min_gap_s`` after the PREVIOUS row of the group (the first
    row always survives). The telemetry retry-squash — one keyed
    exchange, one vectorized lag per key-sorted block; integer
    microsecond timestamps so the gap comparison is exact on both
    engines."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    sch = dict(zip(ds.schema().names, ds.schema().types))
    out_schema = pa.schema([(c, sch[c]) for c in ds.schema().names])

    def block(block_: pa.Table) -> pa.Table:
        if block_.num_rows == 0:
            return out_schema.empty_table()
        block_ = block_.sort_by(
            [(k, "ascending") for k in keys]
            + [(ts_col, "ascending"), (tie_col, "ascending")])
        ts = np.asarray(
            block_[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False),
            np.int64)
        kid = np.zeros(block_.num_rows, dtype=np.int64)
        for k in keys:
            col = block_[k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            codes = np.asarray(col.dictionary_encode().indices)
            kid = kid * (codes.max() + 1 if len(codes) else 1) + codes
        same_key = np.zeros(block_.num_rows, dtype=bool)
        same_key[1:] = kid[1:] == kid[:-1]
        gap_ok = np.ones(block_.num_rows, dtype=bool)
        gap_ok[1:] = (ts[1:] - ts[:-1]) >= min_gap_s * 1_000_000
        keep = ~same_key | gap_ok
        return block_.filter(pa.array(keep)).cast(out_schema)

    return map_key_blocks(ds, keys, block, num_partitions,
                          sort_blocks=False)


def grouped_string_agg(
    ds: Dataset,
    key: str,
    value_col: str,
    order_col: str,
    k: int = 5,
    sep: str = ",",
    num_partitions: int | None = None,
) -> Dataset:
    """Ordered string aggregation per group: the first ``k`` values
    under (order_col ASC, value ASC) joined with ``sep`` — SQL
    string_agg(... ORDER BY ...) over a row_number()<=k subset. One
    keyed exchange; the concat is a vectorized pandas head(k) + join
    per key-sorted block. Output: (key, n, agg)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    OUT = pa.schema([(key, ktype), ("n", pa.int64()),
                     ("agg", pa.string())])

    def block(block_: pa.Table) -> pa.Table:
        if block_.num_rows == 0:
            return OUT.empty_table()
        df = block_.to_pandas()
        df["__v"] = df[value_col].astype(str)
        df = df.sort_values([key, order_col, "__v"])
        sizes = df.groupby(key, sort=True)["__v"].size()
        heads = (df.groupby(key, sort=True).head(k)
                 .groupby(key, sort=True)["__v"]
                 .agg(lambda s: sep.join(s)))
        return pa.table({
            key: pa.array(sizes.index.to_numpy(), ktype, from_pandas=True),
            "n": pa.array(sizes.to_numpy(np.int64), pa.int64()),
            "agg": pa.array(heads.to_numpy(), pa.string()),
        }, schema=OUT)

    return map_key_blocks(ds.select_columns([key, value_col, order_col]),
                          [key], block, num_partitions, sort_blocks=False)


def peak_concurrency(
    intervals: Dataset,
    start_us_col: str,
    end_us_col: str,
) -> pa.Table:
    """Maximum number of simultaneously-open intervals (peak
    concurrency) and the first microsecond timestamp achieving it —
    the capacity-planning sweep. Half-open [s, e) semantics: an end at
    t closes before a start at t opens (delta −1 sorts before +1).

    Physical plan — a DISTRIBUTED PREFIX SCAN, the one pattern the
    Dataset API can't express as a single pass: boundaries (+1/−1)
    range-sort on (t, delta); the sorted run is pinned once
    (materialize) so both passes see identical blocks; pass 1 computes
    per-block delta sums in parallel tasks; the driver folds the
    block-count-sized sum list into prefix offsets; pass 2 re-scans
    each block in parallel with its offset and reports the block-local
    (max, first-t). Only per-block scalars ever reach the driver.
    Output: one row (peak, at_us)."""

    def boundaries(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[start_us_col].to_numpy(zero_copy_only=False),
                       np.int64)
        e = np.asarray(batch[end_us_col].to_numpy(zero_copy_only=False),
                       np.int64)
        return pa.table({
            "t": pa.array(np.concatenate([s, e]), pa.int64()),
            "d": pa.array(np.concatenate([
                np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]),
                pa.int64()),
        })

    b = intervals.select_columns([start_us_col, end_us_col]).map_batches(
        boundaries, batch_format="pyarrow", zero_copy_batch=True)
    sorted_b = b.sort(["t", "d"]).materialize()
    refs = sorted_b.to_arrow_refs()

    @ray.remote
    def block_sum(tbl: pa.Table) -> int:
        return int(np.asarray(tbl["d"].to_numpy(zero_copy_only=False),
                              np.int64).sum()) if tbl.num_rows else 0

    sums = ray.get([block_sum.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)

    @ray.remote
    def block_peak(tbl: pa.Table, offset: int):
        if tbl.num_rows == 0:
            return None
        d = np.asarray(tbl["d"].to_numpy(zero_copy_only=False), np.int64)
        t = np.asarray(tbl["t"].to_numpy(zero_copy_only=False), np.int64)
        run = offset + np.cumsum(d)
        i = int(np.argmax(run))  # first occurrence of the block max
        return int(run[i]), int(t[i])

    results = [r for r in ray.get(
        [block_peak.remote(ref, int(off))
         for ref, off in zip(refs, offsets)]) if r is not None]
    if not results:
        return pa.table({"peak": pa.array([0], pa.int64()),
                         "at_us": pa.array([None], pa.int64())})
    peak = max(r[0] for r in results)
    at_us = min(t for p, t in results if p == peak)
    return pa.table({"peak": pa.array([peak], pa.int64()),
                     "at_us": pa.array([at_us], pa.int64())})


def prefix_compression(
    ds: Dataset,
    text_col: str,
    cap: int = 64,
) -> pa.Table:
    """Prefix-compression estimate for a sorted string column: total
    and mean longest-common-prefix (capped at ``cap`` code points)
    between ADJACENT rows under binary sort order — what a
    prefix-encoded string page would save. Second cross-block pattern
    after peak_concurrency: range-sort, pin once, per-block tasks
    compute internal adjacent LCP sums and hand back only (count, sum,
    first-cap, last-cap) scalars; the driver stitches the block-count
    boundary pairs. Output: one row (n_pairs, total_lcp, avg_lcp)."""

    def _lcp(a: str, b: str) -> int:
        a, b = a[:cap], b[:cap]
        n = min(len(a), len(b))
        i = 0
        while i < n and a[i] == b[i]:
            i += 1
        return i

    sorted_ds = (ds.select_columns([text_col])
                 .sort(text_col).materialize())
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def block_stats(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        vals = tbl[text_col].to_pylist()
        total = 0
        for a, b in zip(vals, vals[1:]):
            total += _lcp(a or "", b or "")
        return len(vals) - 1, total, (vals[0] or "")[:cap], \
            (vals[-1] or "")[:cap]

    stats = [s for s in ray.get([block_stats.remote(r) for r in refs])
             if s is not None]
    n_pairs = sum(s[0] for s in stats)
    total = sum(s[1] for s in stats)
    for prev, nxt in zip(stats, stats[1:]):
        n_pairs += 1
        total += _lcp(prev[3], nxt[2])
    from epstein_pipeline_ray.functions.rounding import sql_round

    avg = (sql_round(np.array([total / n_pairs]), 6)[0]
           if n_pairs else None)
    return pa.table({
        "n_pairs": pa.array([n_pairs], pa.int64()),
        "total_lcp": pa.array([total], pa.int64()),
        "avg_lcp": pa.array([avg], pa.float64()),
    })


def exact_median_select(
    ds: Dataset,
    col: str,
    buckets: int = 512,
    gather_limit: int = 65_536,
    round_digits: int = 6,
) -> pa.Table:
    """EXACT global median via distributed k-selection — the 100-TB
    path for a single order statistic: no sort, no value ever reaches
    the driver until the candidate range holds <= ``gather_limit``
    values. Each round is one histogram scan (bucket-count partials
    summed through Ray's aggregate); the driver narrows [lo, hi] to
    the bucket span containing both middle ranks and tracks the
    below-range count. The final bounded candidate set is gathered,
    sorted locally and indexed by exact rank, so float bucket-edge
    ties can't corrupt the result — buckets only ever NARROW.
    Median convention = quantile_cont(0.5): mean of the two middle
    order stats for even n. Output: one row (n, median)."""
    from ray.data.aggregate import Count, Max, Min

    from epstein_pipeline_ray.functions.rounding import sql_round

    # stays LAZY on purpose: each round re-executes the single-column
    # pruned read rather than pinning an 8-bytes-a-row column of the
    # whole corpus in the object store — selection trades a few extra
    # column scans for zero resident state
    pruned = ds.select_columns([col])
    stats = pruned.aggregate(Count(col, alias_name="n"),
                             Min(col, alias_name="mn"),
                             Max(col, alias_name="mx"))
    n, lo, hi = int(stats["n"]), float(stats["mn"]), float(stats["mx"])
    if n == 0:
        return pa.table({"n": pa.array([0], pa.int64()),
                         "median": pa.array([None], pa.float64())})
    k1, k2 = (n - 1) // 2, n // 2
    below = 0

    def hist_round(lo_, hi_):
        edges = np.linspace(lo_, hi_, buckets + 1)

        def partial(batch: pa.Table) -> pa.Table:
            v = np.asarray(batch[col].to_numpy(zero_copy_only=False),
                           np.float64)
            v = v[(v >= lo_) & (v <= hi_)]
            idx = np.minimum(np.searchsorted(edges, v, side="right") - 1,
                             buckets - 1)
            cnt = np.bincount(idx, minlength=buckets)
            return pa.table({
                "b": pa.array(np.arange(buckets, dtype=np.int64),
                              pa.int64()),
                "__c": pa.array(cnt.astype(np.int64), pa.int64()),
            })

        from ray.data.aggregate import Sum as AggSum

        agg = pruned.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).groupby("b").aggregate(AggSum("__c", alias_name="c")).to_pandas()
        counts = np.zeros(buckets, np.int64)
        counts[agg["b"].to_numpy()] = agg["c"].to_numpy()
        return edges, counts

    in_range = n
    for _ in range(64):
        if in_range <= gather_limit or lo == hi:
            break
        edges, counts = hist_round(lo, hi)
        cum = np.cumsum(counts)
        b1 = int(np.searchsorted(cum, k1 - below + 1))
        b2 = int(np.searchsorted(cum, k2 - below + 1))
        below += int(cum[b1 - 1]) if b1 > 0 else 0
        new_lo, new_hi = float(edges[b1]), float(edges[b2 + 1])
        new_in_range = int(cum[b2] - (cum[b1 - 1] if b1 > 0 else 0))
        if new_in_range == in_range and new_lo == lo and new_hi == hi:
            break  # mass concentrated on one float value span
        lo, hi, in_range = new_lo, new_hi, new_in_range

    def gather(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[col].to_numpy(zero_copy_only=False),
                       np.float64)
        keep = (v >= lo) & (v <= hi)
        return pa.table({col: pa.array(v[keep], pa.float64())})

    cand = np.sort(np.concatenate([
        np.asarray(t[col].to_numpy(zero_copy_only=False), np.float64)
        for t in ray.get(pruned.map_batches(
            gather, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()) if t.num_rows] or [np.zeros(0)]))
    # exact-rank bookkeeping: candidates hold ranks [below, below+len)
    m1 = float(cand[k1 - below])
    m2 = float(cand[k2 - below])
    med = sql_round(np.array([(m1 + m2) / 2.0]), round_digits)[0]
    return pa.table({"n": pa.array([n], pa.int64()),
                     "median": pa.array([med], pa.float64())})
