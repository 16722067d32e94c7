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


def _sorted(block: pa.Table, cols: list[str]) -> pa.Table:
    """Arrow-native multi-key sort of a whole block (replaces the pandas
    round-trip the r3 review flagged on corpus-proportional blocks)."""
    return block.combine_chunks().sort_by([(c, "ascending") for c in cols])


def _codes(block: pa.Table, col: str) -> np.ndarray:
    """Integer equality codes for one column (dictionary indices) —
    adjacent-row comparisons on strings without leaving Arrow."""
    arr = block[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return np.asarray(arr.dictionary_encode().indices)


def _same_prev(codes: np.ndarray) -> np.ndarray:
    """mask[i] = row i has the same code as row i-1 (mask[0] = False)."""
    m = np.zeros(codes.size, dtype=bool)
    if codes.size > 1:
        m[1:] = codes[1:] == codes[:-1]
    return m


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
        if block.num_rows == 0:
            return pa.table({key: block[key],
                             **{c: pa.array([], pa.int64())
                                for c in out_cols[1:]}})
        block = _sorted(block, [key, order_col])
        n = block.num_rows
        same = _same_prev(_codes(block, key))
        role_same = _same_prev(_codes(block, "role"))
        ts = np.asarray(block["ts"].combine_chunks()
                        .cast(pa.timestamp("us")).to_numpy(
                            zero_copy_only=False)).astype(np.int64)
        idx = np.asarray(block[order_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        rep = same & role_same
        reg = np.zeros(n, dtype=bool)
        reg[1:] = same[1:] & (ts[1:] < ts[:-1])
        gap = np.zeros(n, dtype=bool)
        gap[1:] = same[1:] & (idx[1:] - idx[:-1] > 1)
        tool = np.asarray(pc.not_equal(block["tool"], "").combine_chunks()
                          .to_numpy(zero_copy_only=False))
        starts = np.flatnonzero(~same)
        return pa.table({
            key: block[key].take(pa.array(starts, pa.int64())),
            "n_turns": pa.array(np.diff(np.r_[starts, n]), pa.int64()),
            "n_role_repeats": pa.array(
                np.add.reduceat(rep.astype(np.int64), starts), pa.int64()),
            "n_ts_regressions": pa.array(
                np.add.reduceat(reg.astype(np.int64), starts), pa.int64()),
            "n_idx_gaps": pa.array(
                np.add.reduceat(gap.astype(np.int64), starts), pa.int64()),
            "n_tool_turns": pa.array(
                np.add.reduceat(tool.astype(np.int64), starts), pa.int64()),
        })

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
        if block.num_rows == 0:
            return block.select(cols)
        block = _sorted(block, [key, order_col])
        drop = (_same_prev(_codes(block, key))
                & _same_prev(_codes(block, "role"))
                & _same_prev(_codes(block, "text")))
        return block.filter(pa.array(~drop)).select(cols)

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


def context_windows(ds: Dataset, budget: int,
                    key: str = "conv_id",
                    order_col: str = "turn_idx",
                    text_col: str = "text",
                    num_partitions: int | None = None) -> Dataset:
    """Split each conversation into consecutive context windows at TURN
    granularity: turn t joins window ``floor(prefix_tokens(t) / budget)``
    where prefix_tokens is the EXCLUSIVE cumulative whitespace-token
    count — the prefix-sum bucketing used to shard long transcripts
    into near-budget training windows without splitting a turn
    (pack_sequences is the split-anywhere alternative; a window may
    overshoot by at most one turn's tokens, the documented trade for a
    windowless-scan-free plan). Token counts map-side, ONE keyed
    exchange for the running sum, then pure arithmetic.

    Output: (conv_id, turn_idx, n_tokens:int64, window_id:int64).
    SQL twin: the running-sum window minus own count, integer-divided
    by the budget.
    """
    from epstein_pipeline_ray.stages.relational import with_running_sum

    counted = with_token_counts(ds.select_columns([key, order_col, text_col]))
    counted = counted.select_columns([key, order_col, "n_tokens"])
    summed = with_running_sum(counted, key, order_col, order_col,
                              "n_tokens", out_col="cum_tokens",
                              num_partitions=num_partitions)

    def assign(batch: pa.Table) -> pa.Table:
        cum = np.asarray(batch["cum_tokens"].to_numpy(zero_copy_only=False))
        own = np.asarray(batch["n_tokens"].to_numpy(zero_copy_only=False),
                         dtype=np.float64)
        before = np.rint(cum - own).astype(np.int64)
        wid = before // int(budget)
        return pa.table({
            key: batch[key],
            order_col: batch[order_col],
            "n_tokens": batch["n_tokens"],
            "window_id": pa.array(wid, pa.int64()),
        })

    return summed.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)


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
        if block.num_rows == 0:
            return pa.table({"tool_from": pa.array([], pa.string()),
                             "tool_to": pa.array([], pa.string())})
        block = _sorted(block, [key, order_col])
        n = block.num_rows
        inner = pa.array(_same_prev(_codes(block, key))[1:])
        tool = block["tool"]
        if isinstance(tool, pa.ChunkedArray):
            tool = tool.combine_chunks()
        return pa.table({
            "tool_from": tool.slice(0, n - 1).filter(inner),
            "tool_to": tool.slice(1).filter(inner),
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
        if block.num_rows == 0:
            return block.select(cols).append_column(
                "n_dups", pa.array([], pa.int64()))
        block = _sorted(block, [text_col, key, order_col])
        first = ~_same_prev(_codes(block, text_col))
        starts = np.flatnonzero(first)
        lens = np.diff(np.concatenate([starts, [block.num_rows]]))
        return block.select(cols).take(
            pa.array(starts, pa.int64())).append_column(
            "n_dups", pa.array((lens - 1).astype(np.int64), pa.int64()))

    return map_key_blocks(ds, [text_col], per_block, num_partitions,
                          sort_blocks=False)


_PFX_ROWS_SCHEMA = pa.schema([
    ("pfx", pa.large_string()),
    ("conv_id", pa.string()),
    ("k", pa.int32()),
])

_PFX_SHARED_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("k", pa.int32()),
])

_PFX_MAX_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("shared_prefix_len", pa.int32()),
])


def conv_prefix_dedup(ds: Dataset, key: str = "conv_id",
                      order_col: str = "turn_idx",
                      text_col: str = "text",
                      num_partitions: int | None = None) -> Dataset:
    """Conversation PREFIX dedup — the branched-agent-trace case: many
    logged conversations share an identical leading turn sequence (same
    system prompt + same opening exchange, then diverge), so turn-level
    and whole-conversation dedup both miss them. For every conversation
    report ``(conv_id, n_turns, shared_prefix_len, full_prefix_dup)``:
    ``shared_prefix_len`` = the longest k such that >= 2 DISTINCT
    conversations share this conversation's first-k turn-text sequence
    (0 when even the opening turn is unique); ``full_prefix_dup`` =
    the conversation's ENTIRE turn sequence is such a shared prefix,
    i.e. it duplicates the head of some other conversation (or an exact
    whole-conversation twin) — the rows a first-wins trace dedup drops.

    Plan: one conv-keyed exchange builds each conversation's cumulative
    prefix strings (k = position among the conversation's kept turns in
    ``order_col`` order, texts joined by US 0x1f); a prefix-keyed
    exchange counts distinct conversations per EXACT prefix string (the
    string itself is the key — no hash-collision caveat); a tiny
    conv-keyed max + a size-switched attach assemble the report.
    Prefix strings are O(turns²) bytes per conversation through one
    exchange — fine for chat-length convs; for very long traces swap
    the cumulative strings for a chained rolling hash (documented
    trade, minhash_true_jaccard carries the analogous exact payload).
    """
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column
    from epstein_pipeline_ray.stages.relational import grouped_stats

    pruned = ds.select_columns([key, order_col, text_col])

    def per_conv(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _PFX_ROWS_SCHEMA.empty_table()
        df = block.to_pandas().sort_values([key, order_col],
                                           kind="mergesort")
        convs = df[key].to_numpy()
        texts = df[text_col].to_numpy()
        out_p: list[str] = []
        out_c: list[str] = []
        out_k: list[int] = []
        cur = None
        acc = ""
        k = 0
        for c, t in zip(convs, texts):
            if c != cur:
                cur, acc, k = c, "", 0
            acc = t if k == 0 else acc + "\x1f" + str(t)
            k += 1
            out_p.append(acc)
            out_c.append(str(c))
            out_k.append(k)
        return pa.table({
            "pfx": pa.array(out_p, pa.large_string()),
            "conv_id": pa.array(out_c, pa.string()),
            "k": pa.array(out_k, pa.int32()),
        }, schema=_PFX_ROWS_SCHEMA)

    prefix_rows = map_key_blocks(pruned, [key], per_conv, num_partitions,
                                 sort_blocks=False)

    def shared_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _PFX_SHARED_SCHEMA.empty_table()
        df = block.to_pandas().sort_values(["pfx", "conv_id"],
                                           kind="mergesort")
        pfx = df["pfx"].to_numpy()
        conv = df["conv_id"].to_numpy()
        new_run = np.r_[True, pfx[1:] != pfx[:-1]]
        new_conv = new_run | np.r_[True, conv[1:] != conv[:-1]]
        run_id = np.cumsum(new_run) - 1
        ndist = np.bincount(run_id, weights=new_conv.astype(np.int64))
        keep = ndist[run_id] >= 2
        return pa.table({
            "conv_id": pa.array(conv[keep], pa.string()),
            "k": pa.array(df["k"].to_numpy()[keep], pa.int32()),
        }, schema=_PFX_SHARED_SCHEMA)

    shared = map_key_blocks(prefix_rows, ["pfx"], shared_block,
                            num_partitions, sort_blocks=False)

    def max_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _PFX_MAX_SCHEMA.empty_table()
        g = (block.to_pandas().groupby("conv_id", sort=True)["k"].max()
             .reset_index())
        return pa.table({
            "conv_id": pa.array(g["conv_id"], pa.string()),
            "shared_prefix_len": pa.array(g["k"].to_numpy(np.int32),
                                          pa.int32()),
        }, schema=_PFX_MAX_SCHEMA)

    shared_max = map_key_blocks(shared, ["conv_id"], max_block,
                                num_partitions, sort_blocks=False)

    base = grouped_stats(pruned.select_columns([key]), [key])
    joined = attach_column(base, shared_max, key, "conv_id",
                           "shared_prefix_len", "shared_prefix_len")

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch["n"], pa.int32())
        spl = pc.cast(pc.coalesce(batch["shared_prefix_len"],
                                  pa.scalar(0, pa.int32())), pa.int32())
        return pa.table({
            "conv_id": batch[key],
            "n_turns": n,
            "shared_prefix_len": spl,
            "full_prefix_dup": pc.equal(spl, n),
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


_RENDER_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("n_turns", pa.int32()),
    ("text", pa.large_string()),
])


def render_conversations(ds: Dataset, key: str = "conv_id",
                         order_col: str = "turn_idx",
                         role_col: str = "role",
                         text_col: str = "text",
                         sep: str = "\n",
                         num_partitions: int | None = None) -> Dataset:
    """Chat-template rendering: flatten each conversation's ordered
    turns into ONE training text (``role: text`` lines joined by
    ``sep``) — the SFT formatting step between transcript hygiene and
    sequence packing (pack_sequences consumes per-doc texts, this
    produces them from turn tables). One conv-keyed exchange; the
    per-block concat is a vectorized pandas join over key-sorted runs.
    Returns ``(conv_id, n_turns, text)``."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    pruned = ds.select_columns([key, order_col, role_col, text_col])

    def render_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _RENDER_SCHEMA.empty_table()
        df = block.to_pandas().sort_values([key, order_col],
                                           kind="mergesort")
        line = df[role_col].astype(str) + ": " + df[text_col].astype(str)
        g = (pd.DataFrame({key: df[key].to_numpy(), "line": line.to_numpy()})
             .groupby(key, sort=True)["line"]
             .agg(["size", sep.join]).reset_index())
        return pa.table({
            "conv_id": pa.array(g[key].astype(str), pa.string()),
            "n_turns": pa.array(g["size"].to_numpy(np.int32), pa.int32()),
            "text": pa.array(g["join"], pa.large_string()),
        }, schema=_RENDER_SCHEMA)

    return map_key_blocks(pruned, [key], render_block, num_partitions,
                          sort_blocks=False)


def frequent_item_pairs(ds: Dataset, min_support: int = 2,
                        key: str = "conv_id", item_col: str = "tool",
                        max_basket: int = 1024,
                        num_partitions: int | None = None) -> Dataset:
    """Frequent item PAIRS by basket support — the 2-itemset core of
    Apriori/SON market-basket mining over tool co-usage: a basket is
    the DISTINCT non-empty ``item_col`` set of one ``key`` group, and a
    pair (a < b) is emitted with ``support`` = number of baskets
    containing BOTH, kept when ``support >= min_support``. The
    tool-pair analog of tool_transitions' bigrams (co-usage anywhere in
    the conversation, not adjacency).

    Empty items are dropped map-side; one key-keyed exchange builds
    per-basket distinct items and emits its C(t,2) pairs with a
    map-side pair-count combiner (baskets are |tools|-bounded; capped
    at ``max_basket`` with metrics accounting); one pair-keyed exchange
    sums support. Output: (item_a, item_b, support:int64)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    PAIR = pa.schema([("item_a", pa.string()), ("item_b", pa.string()),
                      ("support", pa.int64())])

    def only_items(batch: pa.Table) -> pa.Table:
        b = batch.select([key, item_col])
        return b.filter(pc.not_equal(b[item_col], ""))

    pruned = ds.map_batches(only_items, batch_format="pyarrow",
                            zero_copy_batch=True)

    def basket_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return PAIR.empty_table()
        block = _sorted(block, [key, item_col])
        kc = _codes(block, key)
        ic = _codes(block, item_col)
        sel = np.flatnonzero(~(_same_prev(kc) & _same_prev(ic)))
        kc, ic = kc[sel], ic[sel]
        run_id = np.cumsum(np.r_[True, kc[1:] != kc[:-1]]) - 1
        run_len = np.bincount(run_id)
        over = run_len > max_basket
        if over.any():
            from epstein_pipeline_ray.state import metrics
            starts0 = np.flatnonzero(np.r_[True, kc[1:] != kc[:-1]])
            pos = np.arange(kc.size) - np.repeat(starts0, run_len)
            keep = pos < max_basket
            metrics.inc("freqpairs.baskets_capped", int(over.sum()))
            sel, ic, run_id = sel[keep], ic[keep], run_id[keep]
        from epstein_pipeline_ray.stages.corpus_dedup import _run_pairs
        I, J = _run_pairs(run_id)
        if I.size == 0:
            return PAIR.empty_table()
        # group the pairs by their item CODES (1:1 with strings within a
        # block), then take representative strings once per unique pair
        ca, cb = ic[I], ic[J]
        order = np.lexsort((cb, ca))
        ca, cb = ca[order], cb[order]
        first = np.r_[True, (ca[1:] != ca[:-1]) | (cb[1:] != cb[:-1])]
        starts = np.flatnonzero(first)
        items_kept = block[item_col].combine_chunks().take(
            pa.array(sel, pa.int64()))
        return pa.table({
            "item_a": items_kept.take(pa.array(I[order][starts], pa.int64())),
            "item_b": items_kept.take(pa.array(J[order][starts], pa.int64())),
            "support": pa.array(np.diff(np.r_[starts, ca.size]), pa.int64()),
        }, schema=PAIR)

    partials = map_key_blocks(pruned, [key], basket_block, num_partitions,
                              sort_blocks=False)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return PAIR.empty_table()
        block = _sorted(block, ["item_a", "item_b"])
        first = ~(_same_prev(_codes(block, "item_a"))
                  & _same_prev(_codes(block, "item_b")))
        starts = np.flatnonzero(first)
        sup = np.asarray(block["support"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        sums = np.add.reduceat(sup, starts)
        keep = sums >= min_support
        take_idx = pa.array(starts[keep], pa.int64())
        return pa.table({
            "item_a": block["item_a"].take(take_idx),
            "item_b": block["item_b"].take(take_idx),
            "support": pa.array(sums[keep], pa.int64()),
        }, schema=PAIR)

    return map_key_blocks(partials, ["item_a", "item_b"], sum_block,
                          num_partitions, sort_blocks=False)


def turn_latency(ds: Dataset, key: str = "conv_id",
                 idx_col: str = "turn_idx", ts_col: str = "ts",
                 round_digits: int = 9,
                 num_partitions: int | None = None) -> Dataset:
    """Inter-turn latency report per conversation: count of turns plus
    the mean and max gap in SECONDS between consecutive turns in
    ``idx_col`` order (timestamp regressions show up as negative gaps —
    they are data, not errors; conv_health flags them). Only
    conversations with >= 2 turns emit a row (a single turn has no
    gap). One ids+ts keyed exchange — text never ships. Twin:
    ``lag(ts) OVER (PARTITION BY conv ORDER BY idx)`` + avg/max with
    the identical /1e6 second arithmetic."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    OUT = pa.schema([(key, pa.string()), ("n_turns", pa.int64()),
                     ("mean_gap_s", pa.float64()),
                     ("max_gap_s", pa.float64())])

    def to_rows(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        return pa.table({
            key: batch[key],
            idx_col: batch[idx_col],
            "__us": ts.cast(pa.int64()),
        })

    def lat_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = (block.to_pandas()
              .sort_values([key, idx_col], kind="mergesort")
              .reset_index(drop=True))
        kv = df[key].to_numpy()
        us = df["__us"].to_numpy(dtype=np.int64)
        same = np.r_[False, kv[1:] == kv[:-1]]
        gap = np.where(same, np.r_[0, np.diff(us)] / 1e6, np.nan)
        df["__gap"] = gap
        g = df.groupby(key, sort=True)
        n = g.size()
        mean_g = g["__gap"].mean()
        max_g = g["__gap"].max()
        keep = n >= 2
        return pa.table({
            key: pa.array(n.index.to_numpy()[keep.to_numpy()],
                          pa.string(), from_pandas=True),
            "n_turns": pa.array(n[keep].to_numpy(np.int64), pa.int64()),
            "mean_gap_s": pa.array(
                sql_round(mean_g[keep].to_numpy(np.float64), round_digits),
                pa.float64()),
            "max_gap_s": pa.array(
                sql_round(max_g[keep].to_numpy(np.float64), round_digits),
                pa.float64()),
        }, schema=OUT)

    rows = ds.select_columns([key, idx_col, ts_col]).map_batches(
        to_rows, batch_format="pyarrow", zero_copy_batch=True)
    return map_key_blocks(rows, [key], lat_block, num_partitions,
                          sort_blocks=False)
