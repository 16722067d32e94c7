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


_COS_PARTIAL_SCHEMA = pa.schema([
    ("id_a", pa.int64()),
    ("id_b", pa.int64()),
    ("dot", pa.float64()),
])

_COS_PAIR_SCHEMA = pa.schema([
    ("id_a", pa.int64()),
    ("id_b", pa.int64()),
    ("cosine", pa.float64()),
])


def tfidf_cosine_pairs(
    docs: Dataset,
    threshold: float = 0.5,
    max_df_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    max_posting: int = 8192,
) -> Dataset:
    """All-pairs cosine similarity join over sparse TF-IDF vectors
    (the Bayardo/Ma/Srikant WWW'07 all-pairs problem, exact
    count-then-filter formulation): unordered doc pairs with
    ``cos(a, b) >= threshold`` where the vector weight is the house
    smoothed TF-IDF ``round(tf * ln((1+N)/(1+df)), 6)`` (rounded FIRST
    so both engines weigh identical vectors).

    Stopword-style pruning: terms with ``df > max_df_frac * N`` are
    dropped from every vector BEFORE norms — the standard all-pairs
    high-frequency-dimension cut; the SQL twin applies the identical
    rule, so parity holds by construction (not by luck). Postings
    longer than ``max_posting`` truncate with metrics accounting
    (``cosine_join.postings_capped``).

    Plan: TF explode → DF exchange + size-switched attach → weighted
    postings; per-doc squared norms via one keyed exchange; term-keyed
    postings exchange emits per-pair partial dot products (map-side
    pair combiner); pair-keyed exchange sums exact dots; two attaches
    bring the norms to the pair rows and the rounded cosine filters.
    Output: (id_a, id_b, cosine:float64 rounded 6), id_a < id_b.
    """
    import pandas as pd

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    n_docs = float(docs.count())
    df_cap = max_df_frac * n_docs
    tf = term_frequencies(docs, id_col=id_col, text_col=text_col)
    dfd = document_frequencies(tf, num_partitions=num_partitions)
    joined = attach_column(tf, dfd, "term", "term", "df", "df",
                           num_partitions=num_partitions)

    def weigh(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.less_equal(batch["df"], pa.scalar(df_cap))
        batch = batch.filter(keep)
        tfv = np.asarray(batch["tf"].to_numpy(zero_copy_only=False),
                         np.float64)
        dfv = np.asarray(batch["df"].to_numpy(zero_copy_only=False),
                         np.float64)
        w = sql_round(tfv * np.log((1.0 + n_docs) / (1.0 + dfv)), 6)
        return pa.table({
            "term": batch["term"],
            "__id": batch[id_col].cast(pa.int64()),
            "w": pa.array(w, pa.float64()),
        })

    postings = joined.map_batches(weigh, batch_format="pyarrow",
                                  zero_copy_batch=True)

    NORM = pa.schema([("__id", pa.int64()), ("norm2", pa.float64())])

    def norm_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return NORM.empty_table()
        df_ = pd.DataFrame({
            "__id": block["__id"].to_pandas(),
            "w2": np.square(np.asarray(
                block["w"].to_numpy(zero_copy_only=False), np.float64)),
        })
        g = df_.groupby("__id", sort=True)["w2"].sum()
        return pa.table({"__id": pa.array(g.index.to_numpy(np.int64),
                                          pa.int64()),
                         "norm2": pa.array(g.to_numpy(np.float64),
                                           pa.float64())}, schema=NORM)

    norms = map_key_blocks(postings.select_columns(["__id", "w"]),
                           ["__id"], norm_block, num_partitions,
                           sort_blocks=False)

    def pair_block(block: pa.Table) -> pa.Table:
        if block.num_rows < 2:
            return _COS_PARTIAL_SCHEMA.empty_table()
        df_ = (block.to_pandas()
               .sort_values(["term", "__id"], kind="mergesort")
               .reset_index(drop=True))
        term = df_["term"].to_numpy()
        ids = df_["__id"].to_numpy(np.int64)
        w = df_["w"].to_numpy(np.float64)
        new_run = np.r_[True, term[1:] != term[:-1]]
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        over = run_len > max_posting
        if over.any():
            from epstein_pipeline_ray.state import metrics
            pos = np.arange(ids.size) - np.repeat(np.flatnonzero(new_run),
                                                  run_len)
            keep = pos < max_posting
            metrics.inc("cosine_join.postings_capped", int(over.sum()))
            metrics.inc("cosine_join.rows_capped", int((~keep).sum()))
            ids, w, run_id = ids[keep], w[keep], run_id[keep]
        from epstein_pipeline_ray.stages.corpus_dedup import _run_pairs
        I, J = _run_pairs(run_id)
        if I.size == 0:
            return _COS_PARTIAL_SCHEMA.empty_table()
        ia, ib = ids[I], ids[J]
        swap = ia > ib
        ia2 = np.where(swap, ib, ia)
        ib2 = np.where(swap, ia, ib)
        g = (pd.DataFrame({"id_a": ia2, "id_b": ib2, "p": w[I] * w[J]})
             .groupby(["id_a", "id_b"], sort=False)["p"].sum()
             .reset_index())
        return pa.table({
            "id_a": pa.array(g["id_a"].to_numpy(np.int64), pa.int64()),
            "id_b": pa.array(g["id_b"].to_numpy(np.int64), pa.int64()),
            "dot": pa.array(g["p"].to_numpy(np.float64), pa.float64()),
        }, schema=_COS_PARTIAL_SCHEMA)

    partials = map_key_blocks(postings, ["term"], pair_block,
                              num_partitions, sort_blocks=False)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _COS_PARTIAL_SCHEMA.empty_table()
        g = (block.to_pandas().groupby(["id_a", "id_b"], sort=True)["dot"]
             .sum().reset_index())
        return pa.table({
            "id_a": pa.array(g["id_a"].to_numpy(np.int64), pa.int64()),
            "id_b": pa.array(g["id_b"].to_numpy(np.int64), pa.int64()),
            "dot": pa.array(g["dot"].to_numpy(np.float64), pa.float64()),
        }, schema=_COS_PARTIAL_SCHEMA)

    dots = map_key_blocks(partials, ["id_a", "id_b"], sum_block,
                          num_partitions, sort_blocks=False)
    dots = attach_column(dots, norms, "id_a", "__id", "norm2", "na2",
                         num_partitions=num_partitions)
    dots = attach_column(dots, norms, "id_b", "__id", "norm2", "nb2",
                         num_partitions=num_partitions)
    t = float(threshold)

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _COS_PAIR_SCHEMA.empty_table()
        dot = np.asarray(batch["dot"].to_numpy(zero_copy_only=False),
                         np.float64)
        na2 = np.asarray(batch["na2"].to_numpy(zero_copy_only=False),
                         np.float64)
        nb2 = np.asarray(batch["nb2"].to_numpy(zero_copy_only=False),
                         np.float64)
        cos = sql_round(dot / np.sqrt(na2 * nb2), 6)
        m = cos >= t
        return pa.table({
            "id_a": pa.array(np.asarray(
                batch["id_a"].to_numpy(zero_copy_only=False))[m], pa.int64()),
            "id_b": pa.array(np.asarray(
                batch["id_b"].to_numpy(zero_copy_only=False))[m], pa.int64()),
            "cosine": pa.array(cos[m], pa.float64()),
        }, schema=_COS_PAIR_SCHEMA)

    return dots.map_batches(finish, batch_format="pyarrow",
                            zero_copy_batch=True)


def phrase_positions(
    docs: Dataset,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> Dataset:
    """Exact phrase search through a POSITIONAL POSTING exchange (the
    proximity-query primitive of an inverted index): every occurrence
    of phrase term i at token position p emits an ``anchor = p - i``
    posting, and a (doc, anchor) keyed exchange confirms anchors where
    ALL phrase indices landed — full text never ships, only postings of
    the phrase's own terms (map-side filtered). Tokens follow the
    WORD_RE convention (`[a-zA-Z0-9]+`, lowercased). Repeated phrase
    terms work naturally (one posting per (position, phrase index)).
    Output: (id_col, anchor) — the 0-based token position where the
    phrase starts. Twin: k-way positional self-join on pos offsets."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    itype = dict(zip(docs.schema().names, docs.schema().types))[id_col]
    terms = [t.lower() for t in phrase]
    k = len(terms)
    POST = pa.schema([(id_col, itype), ("anchor", pa.int64()),
                      ("i", pa.int8())])

    def postings(batch: pa.Table) -> pa.Table:
        ids_out, anchors, idxs = [], [], []
        for did, tx in zip(batch[id_col].to_pylist(),
                           batch[text_col].to_pylist()):
            toks = [m.lower() for m in WORD_RE.findall(tx or "")]
            for p, tok in enumerate(toks):
                for i, term in enumerate(terms):
                    if tok == term and p - i >= 0:
                        ids_out.append(did)
                        anchors.append(p - i)
                        idxs.append(i)
        return pa.table({
            id_col: pa.array(ids_out, itype),
            "anchor": pa.array(anchors, pa.int64()),
            "i": pa.array(idxs, pa.int8()),
        }, schema=POST)

    posts = docs.select_columns([id_col, text_col]).map_batches(
        postings, batch_format="pyarrow", zero_copy_batch=True)

    OUT = pa.schema([(id_col, itype), ("anchor", pa.int64())])

    def confirm(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = block.to_pandas().drop_duplicates()
        g = df.groupby([id_col, "anchor"], sort=True)["i"].nunique()
        hit = g[g == k].reset_index()
        return pa.table({
            id_col: pa.array(hit[id_col], itype, from_pandas=True),
            "anchor": pa.array(hit["anchor"].to_numpy(np.int64),
                               pa.int64()),
        }, schema=OUT)

    return map_key_blocks(posts, [id_col, "anchor"], confirm,
                          num_partitions, sort_blocks=False)


def bigram_pmi(
    docs: Dataset,
    text_col: str = "text",
    min_count: int = 5,
    round_digits: int = 9,
    num_partitions: int | None = None,
) -> Dataset:
    """Collocation mining via pointwise mutual information (Church &
    Hanks 1990) over ADJACENT word pairs:
    ``pmi(a,b) = ln(N * c(ab) / (c(a) * c(b)))`` with N = total bigram
    count and unigram counts over bigram slots (first-token counts over
    all bigrams = tokens except each doc's last — the convention that
    keeps the twin a pure lag-window rebuild). All counts are
    decomposable map-side partials; one bigram-keyed exchange + two
    size-switched unigram attaches. Pairs below ``min_count`` are cut
    BEFORE the attaches. Output: (w1, w2, n, pmi). Tokens: WORD_RE,
    lowercased."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    BI = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                    ("n", pa.int64())])
    UNI1 = pa.schema([("w", pa.string()), ("c1", pa.int64())])
    UNI2 = pa.schema([("w", pa.string()), ("c2", pa.int64())])

    def bigram_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for tx in batch[text_col].to_pylist():
            toks = [m.lower() for m in WORD_RE.findall(tx or "")]
            for a, b in zip(toks, toks[1:]):
                cnt[(a, b)] += 1
        items = sorted(cnt.items())
        return pa.table({
            "w1": pa.array([k[0] for k, _ in items], pa.string()),
            "w2": pa.array([k[1] for k, _ in items], pa.string()),
            "n": pa.array([v for _, v in items], pa.int64()),
        }, schema=BI)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return BI.empty_table()
        g = (block.to_pandas()
             .groupby(["w1", "w2"], sort=True, as_index=False)["n"].sum())
        return pa.table({
            "w1": pa.array(g["w1"], pa.string()),
            "w2": pa.array(g["w2"], pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        }, schema=BI)

    bigrams = map_key_blocks(
        docs.select_columns([text_col]).map_batches(
            bigram_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["w1", "w2"], sum_block, num_partitions,
        sort_blocks=False).materialize()

    total = int(bigrams.sum("n") or 0)

    def uni(col: str, out: str, schema: pa.Schema) -> Dataset:
        def part(batch: pa.Table) -> pa.Table:
            df = (batch.select([col, "n"]).to_pandas()
                  .groupby(col, sort=False, as_index=False)["n"].sum())
            return pa.table({"w": pa.array(df[col], pa.string()),
                             out: pa.array(df["n"].to_numpy(np.int64),
                                           pa.int64())}, schema=schema)

        def red(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return schema.empty_table()
            g = (block.to_pandas()
                 .groupby("w", sort=False, as_index=False)[out].sum())
            return pa.table({"w": pa.array(g["w"], pa.string()),
                             out: pa.array(g[out].to_numpy(np.int64),
                                           pa.int64())}, schema=schema)

        return map_key_blocks(
            bigrams.map_batches(part, batch_format="pyarrow",
                                zero_copy_batch=True),
            ["w"], red, num_partitions, sort_blocks=False)

    u1 = uni("w1", "c1", UNI1)
    u2 = uni("w2", "c2", UNI2)

    frequent = bigrams.filter(expr=f"n >= {int(min_count)}")
    tagged = attach_column(frequent, u1, "w1", "w", "c1", "c1",
                           num_partitions=num_partitions)
    tagged = attach_column(tagged, u2, "w2", "w", "c2", "c2",
                           num_partitions=num_partitions)

    def score(batch: pa.Table, N=float(total)) -> pa.Table:
        n = np.asarray(batch["n"].to_numpy(zero_copy_only=False),
                       np.float64)
        c1 = np.asarray(batch["c1"].to_numpy(zero_copy_only=False),
                        np.float64)
        c2 = np.asarray(batch["c2"].to_numpy(zero_copy_only=False),
                        np.float64)
        pmi = np.log(N * n / (c1 * c2))
        return pa.table({
            "w1": batch["w1"], "w2": batch["w2"],
            "n": batch["n"],
            "pmi": pa.array(sql_round(pmi, round_digits), pa.float64()),
        })

    return tagged.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)


def rrf_fusion(
    ds: Dataset,
    key: str,
    score_a: str,
    score_b: str,
    tie_col: str,
    k: int = 60,
    top: int = 3,
    round_digits: int = 6,
    num_partitions: int | None = None,
) -> Dataset:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two score
    columns per group — the hybrid-search merge (lexical rank × vector
    rank) reduced to its dataflow shape: within each key group compute
    both ROW_NUMBER rankings (score DESC, tie ASC — total orders, no
    tie ambiguity), fuse with ``1/(k+rank_a) + 1/(k+rank_b)`` and keep
    the top ``top`` rows by (fused DESC, tie ASC). One keyed exchange;
    ranks are small ints so the two divisions + one add are bit-equal
    to the twin. Output: (key, tie_col, rank_a, rank_b, rrf)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    sch = dict(zip(ds.schema().names, ds.schema().types))
    OUT = pa.schema([(key, sch[key]), (tie_col, sch[tie_col]),
                     ("rank_a", pa.int64()), ("rank_b", pa.int64()),
                     ("rrf", pa.float64())])

    def block(block_: pa.Table) -> pa.Table:
        if block_.num_rows == 0:
            return OUT.empty_table()
        df = block_.to_pandas()

        def ranks(col: str) -> np.ndarray:
            # ROW_NUMBER over (col DESC, tie ASC) within each key group
            order = df.sort_values([key, col, tie_col],
                                   ascending=[True, False, True]).index
            r = np.empty(len(df), np.int64)
            pos = df.loc[order].groupby(key, sort=False).cumcount() + 1
            r[order.to_numpy()] = pos.to_numpy()
            return r

        ra = ranks(score_a)
        rb = ranks(score_b)
        rrf = 1.0 / (k + ra) + 1.0 / (k + rb)
        df["__ra"], df["__rb"], df["__rrf"] = ra, rb, rrf
        df = (df.sort_values([key, "__rrf", tie_col],
                             ascending=[True, False, True])
              .groupby(key, sort=False).head(top))
        return pa.table({
            key: pa.array(df[key], sch[key], from_pandas=True),
            tie_col: pa.array(df[tie_col], sch[tie_col], from_pandas=True),
            "rank_a": pa.array(df["__ra"].to_numpy(np.int64), pa.int64()),
            "rank_b": pa.array(df["__rb"].to_numpy(np.int64), pa.int64()),
            "rrf": pa.array(sql_round(df["__rrf"].to_numpy(np.float64),
                                      round_digits), pa.float64()),
        }, schema=OUT)

    return map_key_blocks(
        ds.select_columns([key, score_a, score_b, tie_col]),
        [key], block, num_partitions, sort_blocks=False)
