"""Transcript-hygiene operators over the canonical turn table
(conv_id, turn_idx, role, text, tool, ts) — the payload-native cleanup a
training-data pipeline runs BEFORE dedup: conversation well-formedness
validation, consecutive-repeat collapse, context-window truncation, and
tool-usage flow analytics.

These are the transcript analogs of the reference's document validators
(reference src/epstein_pipeline/validators/schema.py — row-level rule
report) and its keyed event dedup, re-expressed over per-conversation
ordered windows. All four ride ONE keyed exchange on conv_id (the same
`map_key_blocks` machinery as the window family in stages/relational.py)
with map-side column pruning / filtering so the shuffle never moves
bytes the block function does not read; the per-block math is entirely
vectorized numpy/pandas over key-sorted runs — no per-group Python call.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

__all__ = [
    "conv_health",
    "collapse_repeat_turns",
    "with_token_counts",
    "truncate_to_token_budget",
    "tool_transitions",
]


def conv_health(ds: Dataset, key: str = "conv_id",
                order_col: str = "turn_idx",
                num_partitions: int | None = None) -> Dataset:
    """Per-conversation well-formedness report: in ``order_col`` order,
    count role-alternation violations (a turn whose role equals the
    previous turn's role), timestamp regressions (ts strictly below the
    previous turn's ts), turn-index gaps (order jump > 1), and
    tool-bearing turns. One keyed exchange over the NON-TEXT columns
    only (text never ships). SQL twin: lag() windows + count FILTER.

    Output: (conv_id, n_turns:int64, n_role_repeats:int64,
    n_ts_regressions:int64, n_idx_gaps:int64, n_tool_turns:int64).
    """
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    pruned = ds.select_columns([key, order_col, "role", "tool", "ts"])
    out_cols = [key, "n_turns", "n_role_repeats", "n_ts_regressions",
                "n_idx_gaps", "n_tool_turns"]

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.table({key: block[key],
                             **{c: pa.array([], pa.int64())
                                for c in out_cols[1:]}})
        df = df.sort_values([key, order_col], kind="mergesort").reset_index(drop=True)
        conv = df[key].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        same[1:] = conv[1:] == conv[:-1]
        role = df["role"].to_numpy()
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        idx = df[order_col].to_numpy(np.int64)
        rep = np.zeros(len(df), dtype=bool)
        rep[1:] = same[1:] & (role[1:] == role[:-1])
        reg = np.zeros(len(df), dtype=bool)
        reg[1:] = same[1:] & (ts[1:] < ts[:-1])
        gap = np.zeros(len(df), dtype=bool)
        gap[1:] = same[1:] & (idx[1:] - idx[:-1] > 1)
        agg = pd.DataFrame({
            key: df[key],
            "n_role_repeats": rep.astype(np.int64),
            "n_ts_regressions": reg.astype(np.int64),
            "n_idx_gaps": gap.astype(np.int64),
            "n_tool_turns": (df["tool"].to_numpy() != "").astype(np.int64),
        })
        out = agg.groupby(key, sort=True).sum().reset_index()
        sizes = df.groupby(key, sort=True).size().reset_index(name="n_turns")
        out.insert(1, "n_turns", sizes["n_turns"].astype("int64"))
        for c in out_cols[1:]:
            out[c] = out[c].astype("int64")
        return pa.Table.from_pandas(out[out_cols], preserve_index=False)

    return map_key_blocks(pruned, [key], per_block, num_partitions)


def collapse_repeat_turns(ds: Dataset, key: str = "conv_id",
                          order_col: str = "turn_idx",
                          num_partitions: int | None = None) -> Dataset:
    """Drop each turn whose (role, text) exactly equals the previous
    turn's in ``order_col`` order within its conversation — the turn-level
    analog of the reference's keyed event dedup (G12) for stutter noise
    (retried generations, duplicated tool echoes). Keeps every group's
    first row; only consecutive repeats vanish, non-adjacent duplicates
    survive. SQL twin: lag(role)/lag(text) + a WHERE on inequality.

    Output: the input turn columns, repeats removed.
    """
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    cols = ds.schema().names

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.Table.from_pandas(df, preserve_index=False)
        df = df.sort_values([key, order_col], kind="mergesort").reset_index(drop=True)
        conv = df[key].to_numpy()
        role = df["role"].to_numpy()
        text = df["text"].to_numpy()
        drop = np.zeros(len(df), dtype=bool)
        drop[1:] = ((conv[1:] == conv[:-1]) & (role[1:] == role[:-1])
                    & (text[1:] == text[:-1]))
        return pa.Table.from_pandas(df.loc[~drop, cols], preserve_index=False)

    return map_key_blocks(ds, [key], per_block, num_partitions)


def with_token_counts(ds: Dataset, text_col: str = "text",
                      out_col: str = "n_tokens") -> Dataset:
    """Append a whitespace token count (split on single spaces; empty
    text counts 0) — one Arrow split_pattern + list_value_length kernel
    per batch, no exchange. SQL twin:
    ``CASE WHEN text = '' THEN 0 ELSE len(string_split(text, ' ')) END``.
    """

    def add(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(batch[text_col], " "))
        n = pc.if_else(pc.equal(batch[text_col], ""),
                       pa.scalar(0, pa.int32()), n)
        return batch.append_column(out_col, pc.cast(n, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def truncate_to_token_budget(ds: Dataset, budget: int,
                             key: str = "conv_id",
                             order_col: str = "turn_idx",
                             text_col: str = "text",
                             num_partitions: int | None = None) -> Dataset:
    """Keep each conversation's prefix of turns whose cumulative token
    count stays within ``budget`` — context-window truncation for
    training-sample assembly. Token counts are computed map-side
    (with_token_counts), the cumulative sum is the running-sum window
    (one keyed exchange), and the filter is a vectorized comparison.
    A turn that would push the running total past the budget is dropped
    along with everything after it (cum_tokens is monotone per conv, so
    the per-row filter IS the prefix rule). SQL twin:
    ``sum(n_tokens) OVER (PARTITION BY conv ORDER BY turn_idx)`` + WHERE.

    Output: (conv_id, turn_idx, n_tokens:int64, cum_tokens:float64
    rounded 6) for kept turns.
    """
    from epstein_pipeline_ray.stages.relational import with_running_sum

    counted = with_token_counts(ds.select_columns([key, order_col, text_col]))
    counted = counted.select_columns([key, order_col, "n_tokens"])
    summed = with_running_sum(counted, key, order_col, order_col,
                              "n_tokens", out_col="cum_tokens",
                              num_partitions=num_partitions)

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch["cum_tokens"],
                                          pa.scalar(float(budget))))

    return summed.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def tool_transitions(ds: Dataset, key: str = "conv_id",
                     order_col: str = "turn_idx",
                     num_partitions: int | None = None) -> Dataset:
    """Global tool-flow bigram counts: within each conversation, take
    the subsequence of tool-bearing turns in ``order_col`` order and
    count (previous tool → tool) transitions across the corpus — which
    tool follows which in agent traces. The tool != '' filter runs
    MAP-SIDE so only annotated turns (a small fraction) enter the keyed
    exchange; the bigram count then collapses through grouped_stats'
    partial pre-aggregation (at most |tools|² rows per batch cross the
    second, tiny exchange). SQL twin: lag(tool) over the filtered
    subsequence + GROUP BY.

    Output: (tool_from, tool_to, n:int64).
    """
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.relational import grouped_stats

    pruned = ds.select_columns([key, order_col, "tool"])

    def only_tools(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch["tool"], ""))

    tooled = pruned.map_batches(only_tools, batch_format="pyarrow",
                                zero_copy_batch=True)

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.table({"tool_from": pa.array([], pa.string()),
                             "tool_to": pa.array([], pa.string())})
        df = df.sort_values([key, order_col], kind="mergesort").reset_index(drop=True)
        conv = df[key].to_numpy()
        tool = df["tool"].to_numpy()
        inner = np.zeros(len(df), dtype=bool)
        inner[1:] = conv[1:] == conv[:-1]
        return pa.table({
            "tool_from": pa.array(tool[:-1][inner[1:]], pa.string()),
            "tool_to": pa.array(tool[1:][inner[1:]], pa.string()),
        })

    trans = map_key_blocks(tooled, [key], per_block, num_partitions)
    return grouped_stats(trans, ["tool_from", "tool_to"], count_alias="n")


def global_turn_dedup(ds: Dataset, key: str = "conv_id",
                      order_col: str = "turn_idx",
                      text_col: str = "text",
                      num_partitions: int | None = None) -> Dataset:
    """Corpus-wide turn-level exact dedup, keep-first: a turn survives
    iff no lexicographically earlier (conv_id, turn_idx) carries the
    same text — sub-document exact dedup (the C4 three-sentence-span /
    SlimPajama line-dedup idea, Raffel 2020 §2.2) at transcript-turn
    granularity, catching repeated system prompts, boilerplate tool
    echoes and template turns across conversations.

    One keyed exchange hash-partitioned on the text value (every copy of
    a text lands in one partition); per block: sort by (text, conv,
    order), vectorized first-of-run keep. Adds ``n_dups`` — how many
    copies were dropped in favor of this keeper. SQL twin: row_number()
    and count(*) windows over PARTITION BY text.
    """
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    cols = ds.schema().names

    def per_block(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.Table.from_pandas(
                df.assign(n_dups=pd.Series([], dtype="int64")),
                preserve_index=False)
        df = df.sort_values([text_col, key, order_col],
                            kind="mergesort").reset_index(drop=True)
        text = df[text_col].to_numpy()
        first = np.zeros(len(df), dtype=bool)
        first[0] = True
        first[1:] = text[1:] != text[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.concatenate([starts, [len(df)]]))
        out = df.loc[first, cols].reset_index(drop=True)
        out["n_dups"] = (lens - 1).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return map_key_blocks(ds, [text_col], per_block, num_partitions,
                          sort_blocks=False)
