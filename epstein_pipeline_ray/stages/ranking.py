"""Term-weighting / ranking stages (TF, DF, smoothed TF-IDF) over documents.

Reference analog: the reference ranks person/chunk links by relevance
heuristics (src/epstein_pipeline/processors/person_linker.py) and ships a
BM25-backed FTS5 search index (exporters/sqlite_export.py:88-117); this
module provides the engine-native term-weighting primitive those features
sit on — per-doc term frequency, corpus document frequency, and the
smoothed TF-IDF ``tf * ln((1+N)/(1+df))`` (the sklearn-popularized variant
of Salton & Buckley 1988) — as exchange-shaped Ray stages.

Scale shape (100 TB): the TF explode is embarrassingly parallel and
per-doc-bounded; DF is a map-side pre-aggregated groupby over the
(doc, term)-distinct TF table (grouped_stats partials, so the exchange
moves per-term counts, not raw token rows); DF attaches back to the TF
rows through joins.attach_column's size switch (vocabulary broadcast
below the limit, keyed exchange above); the final per-doc top-k rides
relational.topk_per_group's combiner-pruned exchange. No stage holds the
corpus, the vocabulary, or the posting table in one process on the
exchange plans.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from epstein_pipeline_ray.functions.rounding import sql_round

# ASCII word tokens only, lowercased AFTER extraction: `[a-zA-Z0-9]+`
# matches are pure ASCII, so Python str.lower() and DuckDB lower() agree
# byte-for-byte (unicode lower() edge cases can't arise).
WORD_RE = re.compile(r"[a-zA-Z0-9]+")


def term_frequencies(docs: Dataset, id_col: str = "doc_id",
                     text_col: str = "text") -> Dataset:
    """Explode each document into one row per distinct token:
    ``(id, term, tf)``. SQL twin: ``SELECT id, term, count(*) FROM
    (unnest(regexp_extract_all(text,'[a-zA-Z0-9]+')) with lower())
    GROUP BY 1, 2``.

    The per-doc Counter is Python but per-doc-bounded inside a batch
    task (same trade as the other text analyzers — tokenizing is
    inherently per-string); output is one Arrow table per batch.
    """
    def explode(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        ids_in = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_ids: list = []
        out_terms: list[str] = []
        out_tf: list[int] = []
        for i, t in zip(ids_in, texts):
            if not t:
                continue
            c = Counter(m.group(0).lower() for m in WORD_RE.finditer(t))
            out_ids.extend([i] * len(c))
            out_terms.extend(c.keys())
            out_tf.extend(c.values())
        return pa.table({
            id_col: pa.array(out_ids, id_type),
            "term": pa.array(out_terms, pa.string()),
            "tf": pa.array(out_tf, pa.int64()),
        })

    return docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def document_frequencies(tf: Dataset, term_col: str = "term",
                         num_partitions: int | None = None) -> Dataset:
    """``(term, df)`` — documents containing each term. The TF table is
    already (doc, term)-distinct, so DF is a plain pre-aggregated row
    count per term."""
    from epstein_pipeline_ray.stages.relational import grouped_stats

    return grouped_stats(tf.select_columns([term_col]), [term_col],
                         count_alias="df")


def distinct_ngrams(docs: Dataset, n: int = 5, id_col: str = "doc_id",
                    text_col: str = "text") -> Dataset:
    """Explode each document into its DISTINCT word ``n``-grams:
    ``(id, gram)`` with grams as space-joined lowercased ASCII tokens.
    Documents with fewer than ``n`` tokens emit nothing (same as the SQL
    twin's empty comprehension)."""
    def explode(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        ids_in = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_ids: list = []
        out_grams: list[str] = []
        for i, t in zip(ids_in, texts):
            if not t:
                continue
            toks = [m.group(0).lower() for m in WORD_RE.finditer(t)]
            if len(toks) < n:
                continue
            grams = {" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)}
            out_ids.extend([i] * len(grams))
            out_grams.extend(grams)
        return pa.table({
            id_col: pa.array(out_ids, id_type),
            "gram": pa.array(out_grams, pa.string()),
        })

    return docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def dup_ngram_stats(docs: Dataset, n: int = 5, min_df: int = 2,
                    id_col: str = "doc_id", text_col: str = "text",
                    broadcast_rows_limit: int = 2_000_000,
                    num_partitions: int | None = None) -> Dataset:
    """Cross-document duplicated-span signal: for each document, how many
    of its distinct word ``n``-grams also occur in at least ``min_df``
    documents corpus-wide — the hash-counting approximation (CCNet/Gopher
    family) of Lee et al. 2022's suffix-array exact-substring dedup.
    Output: ``(id, n_grams, n_dup, dup_ratio)``.

    Scale shape: gram DF is a pre-aggregated groupby over the
    (doc, gram)-distinct explode; DF rides back to the gram rows through
    attach_column's size switch; the per-doc rollup is two-phase
    (pa.TableGroupBy partials per batch, then a tiny keyed aggregate) so
    the final exchange moves one partial row per (doc, batch), never raw
    gram rows."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from epstein_pipeline_ray.stages.joins import attach_column

    grams = distinct_ngrams(docs, n, id_col, text_col)
    df = document_frequencies(grams, term_col="gram",
                              num_partitions=num_partitions)
    tagged = attach_column(grams, df, "gram", "gram", "df", "df",
                           broadcast_rows_limit=broadcast_rows_limit,
                           num_partitions=num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        dup = pc.cast(pc.greater_equal(batch["df"], min_df), pa.int64())
        t = pa.table({
            id_col: batch[id_col],
            "__g": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "__d": dup,
        })
        g = pa.TableGroupBy(t, [id_col]).aggregate([("__g", "sum"), ("__d", "sum")])
        return g

    partials = tagged.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
    out = partials.groupby(id_col).aggregate(
        Sum("__g_sum", alias_name="n_grams"), Sum("__d_sum", alias_name="n_dup"))

    def finalize(batch: pa.Table) -> pa.Table:
        ng = np.asarray(batch["n_grams"].to_numpy(zero_copy_only=False),
                        dtype=np.float64)
        nd = np.asarray(batch["n_dup"].to_numpy(zero_copy_only=False),
                        dtype=np.float64)
        return pa.table({
            id_col: batch[id_col],
            "n_grams": pc.cast(batch["n_grams"], pa.int64()),
            "n_dup": pc.cast(batch["n_dup"], pa.int64()),
            "dup_ratio": pa.array(sql_round(nd / ng, 6), pa.float64()),
        })

    return out.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_top_terms(docs: Dataset, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text",
                    broadcast_rows_limit: int = 2_000_000,
                    num_partitions: int | None = None) -> Dataset:
    """Top-``k`` terms per document by smoothed TF-IDF
    ``round(tf * ln((1+N)/(1+df)), 6)``, ties broken by term ascending
    so membership and ordering are deterministic. Ranking uses the
    ROUNDED score on both the engine and the SQL-twin side, so a
    half-ulp ln() divergence cannot flip a rank."""
    from epstein_pipeline_ray.stages.joins import attach_column
    from epstein_pipeline_ray.stages.relational import topk_per_group

    tf = term_frequencies(docs, id_col, text_col)
    n_docs = float(docs.count())
    df = document_frequencies(tf, num_partitions=num_partitions)
    scored = attach_column(tf, df, "term", "term", "df", "df",
                           broadcast_rows_limit=broadcast_rows_limit,
                           num_partitions=num_partitions)

    def score(batch: pa.Table) -> pa.Table:
        tfv = np.asarray(batch["tf"], dtype=np.float64)
        dfv = np.asarray(batch["df"], dtype=np.float64)
        s = sql_round(tfv * np.log((1.0 + n_docs) / (1.0 + dfv)), 6)
        return batch.append_column("tfidf", pa.array(s, pa.float64()))

    scored = scored.map_batches(score, batch_format="pyarrow",
                                zero_copy_batch=True)
    return topk_per_group(
        scored.select_columns([id_col, "term", "tf", "tfidf"]),
        id_col, "tfidf", k, tie_col="term", num_partitions=num_partitions)


def bm25_scores(docs: Dataset, query_terms: list[str],
                k1: float = 1.2, b: float = 0.75,
                id_col: str = "doc_id", text_col: str = "text",
                num_partitions: int | None = None,
                broadcast_rows_limit: int = 2_000_000) -> Dataset:
    """Okapi BM25 scores of every matching doc against a query term set
    — the engine-native version of the reference's BM25-backed FTS5
    search (exporters/sqlite_export.py:88-117), Lucene IDF convention
    ln((N - df + 0.5)/(df + 0.5) + 1).

    Plan: TF explode (per-doc-bounded) → doc lengths via grouped_stats
    partials, attached back by the size-switched join → map-side filter
    to query-term rows ONLY (the tiny query set rides the task closure)
    → per-row partial scores with the |query|-bounded IDF dict broadcast
    → per-doc sum through one keyed exchange, rounded once. Output:
    (id, bm25:float64 rounded 6) for docs containing >= 1 query term.
    """
    import pyarrow.compute as pc
    import ray

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column
    from epstein_pipeline_ray.stages.relational import grouped_stats

    qset = sorted(set(query_terms))
    tf = term_frequencies(docs, id_col=id_col, text_col=text_col)
    dl = grouped_stats(tf.select_columns([id_col, "tf"]), [id_col],
                       sum_cols=["tf"])  # sum_tf (ints; round-4 no-op)
    n_docs = float(docs.count())
    total_tokens = float(tf.sum("tf") or 0)
    avgdl = total_tokens / n_docs if n_docs else 1.0

    def only_query_terms(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["term"],
                                     value_set=pa.array(qset, pa.string())))

    tfq = tf.map_batches(only_query_terms, batch_format="pyarrow",
                         zero_copy_batch=True)
    # per-query-term document frequency: <= |query| rows, driver-bounded
    dfq = grouped_stats(tfq.select_columns(["term"]), ["term"],
                        count_alias="df").to_pandas()
    idf = {t: float(np.log((n_docs - d + 0.5) / (d + 0.5) + 1.0))
           for t, d in zip(dfq["term"], dfq["df"])}
    idf_ref = ray.put(idf)

    scored = attach_column(tfq, dl, id_col, id_col, "sum_tf", "__dl",
                           broadcast_rows_limit=broadcast_rows_limit,
                           num_partitions=num_partitions)

    def part(batch: pa.Table) -> pa.Table:
        w = ray.get(idf_ref)
        tfv = np.asarray(batch["tf"].to_numpy(zero_copy_only=False), np.float64)
        dlv = np.asarray(batch["__dl"].to_numpy(zero_copy_only=False), np.float64)
        iv = np.array([w[t] for t in batch["term"].to_pylist()], np.float64)
        s = iv * (tfv * (k1 + 1.0)) / (tfv + k1 * (1.0 - b + b * dlv / avgdl))
        return pa.table({id_col: batch[id_col],
                         "part": pa.array(s, pa.float64())})

    parts = scored.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)

    def per_doc(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return pa.table({id_col: block[id_col],
                             "bm25": pa.array([], pa.float64())})
        g = df.groupby(id_col, sort=True)["part"].sum().reset_index()
        return pa.table({
            id_col: pa.Array.from_pandas(g[id_col]),
            "bm25": pa.array(sql_round(g["part"].to_numpy(np.float64), 6),
                             pa.float64()),
        })

    return map_key_blocks(parts, [id_col], per_doc, num_partitions,
                          sort_blocks=False)
