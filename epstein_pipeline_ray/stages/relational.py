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
        df = batch.select(keys + value_cols).to_pandas()
        agg = {c: "sum" for c in value_cols}
        g = df.groupby(keys, sort=False, dropna=False).agg(**{
            f"__sum_{c}": (c, "sum") for c in value_cols
        } | {"__cnt": (keys[0], "size")}).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

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
            t = t.append_column(f"sum_{c}", pa.array(np.round(total, 4), pa.float64()))
        for c in mean_cols:
            total = np.asarray(t[f"__total_{c}"].to_numpy(zero_copy_only=False), dtype=np.float64)
            t = t.append_column(f"avg_{c}", pa.array(np.round(total / n, 4), pa.float64()))
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


def top_k(ds: Dataset, col: str, k: int, descending: bool = True) -> Dataset:
    """Global top-k: per-batch partial top-k → tiny global sort+limit.

    Avoids a full distributed sort of the input (reference O1/O2 sorts the
    whole pair list driver-side)."""

    def partial(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(batch, k=min(k, batch.num_rows),
                                   sort_keys=[(col, "descending" if descending else "ascending")])
        return batch.take(idx)

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).sort(
        col, descending=descending
    ).limit(k)


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


def sessionize(events: Dataset, gap_minutes: int = 30) -> Dataset:
    """Per-user session stats with a 30-min inactivity gap: groupby(user)
    → sort within group → vectorized gap/cumsum session ids → one row per
    session. The groupby shuffle co-locates each user's events; ordering is
    restored inside the group, never assumed."""
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        ts = g["ts"].astype("int64").to_numpy()
        new_session = np.ones(len(ts), dtype=bool)
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new_session) - 1
        out = (
            pd.DataFrame({"sid": sid, "ts": ts, "value": g["value"].to_numpy()})
            .groupby("sid")
            .agg(n_events=("ts", "size"), sum_value=("value", "sum"),
                 start_us=("ts", "min"), end_us=("ts", "max"))
            .reset_index()
        )
        out["user_id"] = g["user_id"].iloc[0]
        out["session_idx"] = out.pop("sid").astype("int64")
        out["sum_value"] = out["sum_value"].round(4)
        out["duration_sec"] = ((out["end_us"] - out["start_us"]) / 1e6).round(4)
        return out[["user_id", "session_idx", "n_events", "sum_value", "duration_sec"]]

    pruned = events.select_columns(["user_id", "ts", "value"])
    return pruned.groupby("user_id").map_groups(per_user, batch_format="pandas")


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
