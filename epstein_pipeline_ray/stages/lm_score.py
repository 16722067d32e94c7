"""CCNet-style n-gram language-model quality scoring: train add-one
bigram statistics over a corpus, score every document by its mean
negative log-likelihood (the "perplexity filter" of Wenzek et al. 2020,
CCNet — low NLL ≈ fluent/templated, high NLL ≈ noise), with the whole
thing expressed as exchanges so neither the model nor the corpus ever
sits in one process:

  tokens/bigram rows (map-side Arrow split)
    → unigram + bigram count tables via grouped_stats partials
    → counts attached back to the bigram rows by two size-switched
      attach_column joins (broadcast below the limit, keyed exchange
      above — the model IS a table, not a driver dict)
    → per-doc NLL through one keyed exchange on doc_id.

P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)  (Laplace), and the score is
nll = -avg(ln P) over the doc's bigrams. Docs with < 2 tokens have no
bigrams and are dropped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from epstein_pipeline_ray.functions.rounding import sql_round

_SEP = "\x01"  # never appears in single-space tokenized text


def _bigram_rows(docs: Dataset, id_col: str, text_col: str) -> Dataset:
    def explode(batch: pa.Table) -> pa.Table:
        lst = pc.split_pattern(batch[text_col], " ")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        n = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(lst)
        flat = pc.list_flatten(lst)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # bigram (w1, w2) = consecutive flat tokens with the same parent
        w_all = flat.to_numpy(zero_copy_only=False)
        p_all = parents.to_numpy(zero_copy_only=False)
        if len(w_all) < 2:
            return pa.table({id_col: ids.slice(0, 0),
                             "w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string())})
        same = p_all[1:] == p_all[:-1]
        return pa.table({
            id_col: ids.take(pa.array(p_all[:-1][same], pa.int64())),
            "w1": pa.array(w_all[:-1][same], pa.string()),
            "w2": pa.array(w_all[1:][same], pa.string()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)


def ngram_lm_nll(docs: Dataset, id_col: str = "doc_id",
                 text_col: str = "text",
                 num_partitions: int | None = None,
                 broadcast_rows_limit: int = 2_000_000) -> Dataset:
    """Per-doc mean negative log-likelihood under the corpus's own
    add-one bigram model (see module doc). Output:
    (id, n_bigrams:int64, nll:float64 rounded 6)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column
    from epstein_pipeline_ray.stages.relational import grouped_stats

    big = _bigram_rows(docs, id_col, text_col)

    def tok_rows(batch: pa.Table) -> pa.Table:
        lst = pc.split_pattern(batch[text_col], " ")
        return pa.table({"w": pc.list_flatten(lst)})

    toks = docs.select_columns([id_col, text_col]).map_batches(
        tok_rows, batch_format="pyarrow", zero_copy_batch=True)
    uni = grouped_stats(toks, ["w"], count_alias="c1")
    vocab_size = uni.count()

    def with_bkey(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bkey", pc.binary_join_element_wise(batch["w1"], batch["w2"], _SEP))

    big = big.map_batches(with_bkey, batch_format="pyarrow", zero_copy_batch=True)
    bc = grouped_stats(big.select_columns(["bkey"]), ["bkey"], count_alias="c2")

    joined = attach_column(big, bc, "bkey", "bkey", "c2", "c2",
                           broadcast_rows_limit=broadcast_rows_limit,
                           num_partitions=num_partitions)
    joined = attach_column(joined, uni, "w1", "w", "c1", "c1",
                           broadcast_rows_limit=broadcast_rows_limit,
                           num_partitions=num_partitions)

    def to_lp(batch: pa.Table) -> pa.Table:
        c2 = np.asarray(batch["c2"].to_numpy(zero_copy_only=False), np.float64)
        c1 = np.asarray(batch["c1"].to_numpy(zero_copy_only=False), np.float64)
        lp = np.log((c2 + 1.0) / (c1 + float(vocab_size)))
        return pa.table({id_col: batch[id_col],
                         "lp": pa.array(lp, pa.float64())})

    lps = joined.map_batches(to_lp, batch_format="pyarrow", zero_copy_batch=True)

    def per_doc(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.table({id_col: block[id_col],
                             "n_bigrams": pa.array([], pa.int64()),
                             "nll": pa.array([], pa.float64())})
        g = df.groupby(id_col, sort=True)["lp"].agg(["count", "mean"]).reset_index()
        return pa.table({
            id_col: pa.Array.from_pandas(g[id_col]),
            "n_bigrams": pa.array(g["count"].to_numpy(np.int64), pa.int64()),
            "nll": pa.array(sql_round(-g["mean"].to_numpy(np.float64), 6),
                            pa.float64()),
        })

    return map_key_blocks(lps, [id_col], per_doc, num_partitions,
                          sort_blocks=False)


def dsir_log_ratio(docs: Dataset, target_docs: Dataset,
                   id_col: str = "doc_id", text_col: str = "text",
                   num_partitions: int | None = None,
                   broadcast_rows_limit: int = 2_000_000) -> Dataset:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per doc, the mean
    log-ratio of an add-one bigram model trained on a TARGET domain
    sample vs one trained on the raw corpus —
    avg( ln P_target(w2|w1) - ln P_raw(w2|w1) ) over the doc's bigrams.
    High values read "looks like the target domain"; resample
    proportionally to exp(weight). Bigrams unseen by the target model
    coalesce to count 0 (pure Laplace mass). Same exchange-join plan as
    ngram_lm_nll, with both models attached to one bigram-row stream so
    the ratio is a single rounded aggregate (no double rounding).
    Output: (id, n_bigrams:int64, log_importance:float64 rounded 6);
    docs with < 2 tokens are dropped."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column
    from epstein_pipeline_ray.stages.relational import grouped_stats

    def tok_rows(batch: pa.Table) -> pa.Table:
        lst = pc.split_pattern(batch[text_col], " ")
        return pa.table({"w": pc.list_flatten(lst)})

    def with_bkey(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bkey", pc.binary_join_element_wise(batch["w1"], batch["w2"], _SEP))

    big = _bigram_rows(docs, id_col, text_col).map_batches(
        with_bkey, batch_format="pyarrow", zero_copy_batch=True)
    big_t = _bigram_rows(target_docs, id_col, text_col).map_batches(
        with_bkey, batch_format="pyarrow", zero_copy_batch=True)

    uni_r = grouped_stats(docs.select_columns([id_col, text_col]).map_batches(
        tok_rows, batch_format="pyarrow", zero_copy_batch=True), ["w"],
        count_alias="c")
    uni_t = grouped_stats(target_docs.select_columns([id_col, text_col]).map_batches(
        tok_rows, batch_format="pyarrow", zero_copy_batch=True), ["w"],
        count_alias="c")
    v_r, v_t = uni_r.count(), uni_t.count()
    bc_r = grouped_stats(big.select_columns(["bkey"]), ["bkey"], count_alias="c")
    bc_t = grouped_stats(big_t.select_columns(["bkey"]), ["bkey"], count_alias="c")

    j = big
    for right, lkey, rkey, out in ((bc_r, "bkey", "bkey", "c2r"),
                                   (bc_t, "bkey", "bkey", "c2t"),
                                   (uni_r, "w1", "w", "c1r"),
                                   (uni_t, "w1", "w", "c1t")):
        j = attach_column(j, right, lkey, rkey, "c", out,
                          broadcast_rows_limit=broadcast_rows_limit,
                          num_partitions=num_partitions)

    def to_dlp(batch: pa.Table) -> pa.Table:
        def col(n):
            a = np.asarray(batch[n].to_pandas().to_numpy(), np.float64)
            return np.nan_to_num(a, nan=0.0)
        dlp = (np.log((col("c2t") + 1.0) / (col("c1t") + float(v_t)))
               - np.log((col("c2r") + 1.0) / (col("c1r") + float(v_r))))
        return pa.table({id_col: batch[id_col],
                         "dlp": pa.array(dlp, pa.float64())})

    dlps = j.map_batches(to_dlp, batch_format="pyarrow", zero_copy_batch=True)

    def per_doc(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.table({id_col: block[id_col],
                             "n_bigrams": pa.array([], pa.int64()),
                             "log_importance": pa.array([], pa.float64())})
        g = df.groupby(id_col, sort=True)["dlp"].agg(["count", "mean"]).reset_index()
        return pa.table({
            id_col: pa.Array.from_pandas(g[id_col]),
            "n_bigrams": pa.array(g["count"].to_numpy(np.int64), pa.int64()),
            "log_importance": pa.array(
                sql_round(g["mean"].to_numpy(np.float64), 6), pa.float64()),
        })

    return map_key_blocks(dlps, [id_col], per_doc, num_partitions,
                          sort_blocks=False)
