"""Distributed BPE tokenizer training + encoding (Sennrich ACL'16
subword-nmt semantics) — the tokenizer-construction stage of a
training-data pipeline, absent from the reference (its token counts are
char//4 estimates, reference processors/chunker.py:141-145).

Training operates on the DISTINCT-WORD frequency table, never the
corpus: one word-keyed exchange builds ``(word, cnt)``, then each merge
round is a pair-count partial + a block-local argmax over the pair
exchange — a rounds-deep driver-orchestrated loop in the
kmeans_fit/pagerank house convention. Below ``driver_limit_words`` the
word table is pulled to the driver and the loop runs locally (the
size-switch convention, joins.py; forced-limit-0 test pins the two
plans equal).

Semantics pinned by tests against a pure-dict reference trainer:

* symbols start as characters plus a ``</w>`` end-of-word marker;
* pair counts weight every ADJACENT POSITION by word frequency
  (overlapping occurrences count, subword-nmt ``get_stats``);
* best pair = highest count, ties to the lexicographically smallest
  ``(left, right)``;
* a merge rewrites each word greedily left-to-right (non-overlapping);
* training stops at ``num_merges``, or earlier when no pair reaches
  ``min_count``.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from epstein_pipeline_ray.stages.groupblock import map_key_blocks

MERGES_SCHEMA = pa.schema([
    ("rank", pa.int32()),
    ("left", pa.string()),
    ("right", pa.string()),
])

_WORD_SCHEMA = pa.schema([
    ("word", pa.string()),
    ("cnt", pa.int64()),
])


def _merge_pair(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (left, right)."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _pair_counts(seqs: list[list[str]], cnts) -> Counter:
    pc: Counter = Counter()
    for syms, c in zip(seqs, cnts):
        for j in range(len(syms) - 1):
            pc[(syms[j], syms[j + 1])] += int(c)
    return pc


def _best_pair(pc: Counter, min_count: int):
    """(count desc, pair asc)-best pair, or None below min_count."""
    if not pc:
        return None
    negc, pair = min((-c, p) for p, c in pc.items())
    if -negc < min_count:
        return None
    return pair


def bpe_word_counts(
    docs: Dataset,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> Dataset:
    """``(word, cnt)`` over lower().split() tokens — map-side Counter
    combiner, one word-keyed exchange."""

    def explode(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for t in batch[text_col].to_pylist():
            cnt.update(str(t or "").lower().split())
        words = sorted(cnt)
        return pa.table({
            "word": pa.array(words, pa.string()),
            "cnt": pa.array([cnt[w] for w in words], pa.int64()),
        }, schema=_WORD_SCHEMA)

    partials = docs.select_columns([text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _WORD_SCHEMA.empty_table()
        g = block.to_pandas().groupby("word", sort=True)["cnt"].sum()
        return pa.table({
            "word": pa.array(g.index, pa.string()),
            "cnt": pa.array(g.to_numpy(np.int64), pa.int64()),
        }, schema=_WORD_SCHEMA)

    return map_key_blocks(partials, ["word"], sum_block, num_partitions,
                          sort_blocks=False)


def _train_local(freqs: pd.DataFrame, num_merges: int,
                 min_count: int) -> list[tuple[str, str]]:
    seqs = [list(w) + ["</w>"] for w in freqs["word"]]
    cnts = freqs["cnt"].to_numpy(np.int64)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = _best_pair(_pair_counts(seqs, cnts), min_count)
        if best is None:
            break
        merges.append(best)
        seqs = [_merge_pair(s, *best) if best[0] in s else s for s in seqs]
    return merges


def bpe_train(
    docs: Dataset,
    num_merges: int = 40,
    min_count: int = 2,
    text_col: str = "text",
    num_partitions: int | None = None,
    driver_limit_words: int = 200_000,
) -> pa.Table:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    merge table ``(rank, left, right)`` — the tokenizer artifact.

    Distributed plan (above ``driver_limit_words`` distinct words):
    the symbolized word table stays a Dataset; each round runs a
    map-side pair-count partial, one pair-keyed exchange, a block-local
    (count desc, pair asc) argmax (one row per partition to the
    driver — partitions-bounded, never pair-space-bounded), then a
    broadcast merge rewrite. Word-table rows only ever cross the wire
    at symbolize time; rounds exchange pair PARTIALS.
    """
    words = bpe_word_counts(docs, text_col, num_partitions)
    n_words = words.count()

    if n_words <= driver_limit_words:
        freqs = words.to_pandas().sort_values("word").reset_index(drop=True)
        merges = _train_local(freqs, num_merges, min_count)
        return pa.table({
            "rank": pa.array(range(len(merges)), pa.int32()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
        }, schema=MERGES_SCHEMA)

    def symbolize(batch: pa.Table) -> pa.Table:
        ws = batch["word"].to_pylist()
        return pa.table({
            "syms": pa.array([" ".join(list(w) + ["</w>"]) for w in ws],
                             pa.large_string()),
            "cnt": batch["cnt"],
        })

    table = words.map_batches(symbolize, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    pair_partial_schema = pa.schema([
        ("left", pa.string()), ("right", pa.string()), ("cnt", pa.int64()),
    ])

    def pair_partials(batch: pa.Table) -> pa.Table:
        seqs = [s.split(" ") for s in batch["syms"].to_pylist()]
        pc = _pair_counts(seqs, batch["cnt"].to_pylist())
        pairs = sorted(pc)
        return pa.table({
            "left": pa.array([p[0] for p in pairs], pa.string()),
            "right": pa.array([p[1] for p in pairs], pa.string()),
            "cnt": pa.array([pc[p] for p in pairs], pa.int64()),
        }, schema=pair_partial_schema)

    def block_best(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pair_partial_schema.empty_table()
        df = block.to_pandas()
        g = (df.groupby(["left", "right"], sort=False)["cnt"].sum()
             .reset_index()
             .sort_values(["cnt", "left", "right"],
                          ascending=[False, True, True], kind="mergesort"))
        return pa.Table.from_pandas(g.head(1), schema=pair_partial_schema,
                                    preserve_index=False)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        partials = table.map_batches(pair_partials, batch_format="pyarrow",
                                     zero_copy_batch=True)
        bests = map_key_blocks(partials, ["left", "right"], block_best,
                               num_partitions, sort_blocks=False).to_pandas()
        if len(bests) == 0:
            break
        bests = bests.sort_values(["cnt", "left", "right"],
                                  ascending=[False, True, True],
                                  kind="mergesort")
        top = bests.iloc[0]
        if int(top["cnt"]) < min_count:
            break
        best = (str(top["left"]), str(top["right"]))
        merges.append(best)
        l, r = best

        def apply(batch: pa.Table, l=l, r=r) -> pa.Table:
            out = []
            for s in batch["syms"].to_pylist():
                syms = s.split(" ")
                out.append(" ".join(_merge_pair(syms, l, r))
                           if l in syms else s)
            return pa.table({
                "syms": pa.array(out, pa.large_string()),
                "cnt": batch["cnt"],
            })

        table = table.map_batches(apply, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()

    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int32()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
    }, schema=MERGES_SCHEMA)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic BPE application: repeatedly merge the LOWEST-RANK
    applicable pair until none applies."""
    syms = list(word) + ["</w>"]
    while len(syms) > 1:
        best_rank = None
        best = None
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best = (syms[j], syms[j + 1])
        if best is None:
            break
        syms = _merge_pair(syms, *best)
    return syms


class BpeEncoder:
    """Actor-pool encoder: ranks dict built once per actor from the
    broadcast merge table; per-word encodings memoized across batches."""

    def __init__(self, merges_ref):
        merges = ray.get(merges_ref) if not isinstance(merges_ref, pa.Table) \
            else merges_ref
        self.ranks = {
            (l, r): int(k)
            for k, l, r in zip(merges["rank"].to_pylist(),
                               merges["left"].to_pylist(),
                               merges["right"].to_pylist())
        }
        self.memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_words = []
        n_tokens = []
        for t in batch["text"].to_pylist():
            words = str(t or "").lower().split()
            tot = 0
            for w in words:
                k = self.memo.get(w)
                if k is None:
                    k = len(encode_word(w, self.ranks))
                    self.memo[w] = k
                tot += k
            n_words.append(len(words))
            n_tokens.append(tot)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
        })


def bpe_encode_counts(
    docs: Dataset,
    merges: pa.Table,
    concurrency: int | tuple[int, int] | None = None,
) -> Dataset:
    """Per-doc BPE token counts under a trained merge table:
    ``(doc_id, n_words, n_tokens)``. Each actor builds its ranks dict
    once in ``__init__`` from the merge table shipped in the actor spec
    (vocab-sized, not corpus-sized — ray.put a ref instead only if the
    merge list grows past a few MB, at the cost of Ray's
    constructor-arg restart hazard, ray issue #53727). Autoscaling
    (1, ncpu//2) pool by default — a FIXED pool sized to every CPU
    deadlocks against the upstream read on small hosts (multimodal.py
    convention)."""
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, ncpu // 2))
    return docs.select_columns(["doc_id", "text"]).map_batches(
        BpeEncoder, fn_constructor_args=(merges,),
        concurrency=concurrency, batch_format="pyarrow")
