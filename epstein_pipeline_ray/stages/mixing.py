"""Data-mixture allocation operators.

:func:`unimax_allocation` — UniMax sampling (Chung et al., "UniMax:
Fairer and More Effective Language Sampling for Large-Scale Multilingual
Pretraining", ICLR 2023): distribute a token/document budget across
languages so every language gets an equal share EXCEPT that no language
is repeated for more than ``n_epochs`` epochs of its own data. The
greedy ascending-by-size loop in the paper is exactly water-filling, so
the closed form used here (and by the window-function DuckDB twin) is:

  cap_l  = n_epochs * count_l           (most a language may supply)
  sort languages by (cap, lang) ascending; csum = running cap sum
  k      = the longest prefix fully servable at its cap:
           max rn with  cap_rn * (m - rn + 1) <= B - (csum_rn - cap_rn)
  level  = (B - csum_k) / (m - k)       (shared by the uncapped tail)
  quota_l = cap_l if rn <= k else level

The per-language count is a partial pre-aggregated groupby (tiny:
one row per language); the water-fill itself runs on that
languages-sized table on the driver — bounded by the language universe
(~10²), never by the corpus, the documented small-side exception.

Reference parity: the reference has no mixture allocator (its corpus is
monolingual); this is part of the engine's LLM-training-data operator
family alongside dedup/quality/decontamination.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from epstein_pipeline_ray.functions.rounding import sql_round


def _waterfill(langs: np.ndarray, c: np.ndarray, B: float, n_epochs: float):
    """The UniMax water-fill (see unimax_allocation): returns
    (langs_sorted, counts_sorted, caps_sorted, quotas) in ascending
    (cap, lang) order, quotas UNROUNDED."""
    cap = float(n_epochs) * c
    order = np.lexsort((langs, cap))
    cap_s, c_s, langs_s = cap[order], c[order], langs[order]
    m = cap_s.size
    csum = np.cumsum(cap_s)
    rn = np.arange(1, m + 1, dtype=np.float64)
    # position rn fully servable at its cap given the budget left after
    # fully serving everything before it, shared with everything after
    feasible = cap_s * (m - rn + 1) <= B - (csum - cap_s)
    # caps ascend, so feasibility is a prefix; k = first infeasible
    # position (0-based count of fully-capped languages) — the DuckDB
    # twin uses the identical first-False rule
    infeas = np.flatnonzero(~feasible)
    k = int(infeas[0]) if infeas.size else m
    served = csum[k - 1] if k > 0 else 0.0
    level = (B - served) / (m - k) if k < m else np.inf
    quota = np.where(rn <= k, cap_s, np.minimum(cap_s, level))
    return langs_s, c_s, cap_s, quota


def unimax_allocation(
    docs: Dataset,
    budget: float | None = None,
    budget_frac: float = 0.4,
    n_epochs: int = 2,
    lang_col: str = "lang",
) -> pa.Table:
    """Per-language UniMax quotas over ``docs``. Returns one row per
    language: ``(lang, n_docs, cap, quota, epochs)`` — ``quota`` is the
    (real-valued) number of documents the mixture draws from the
    language, ``epochs = quota / n_docs``; both rounded to 6 dp with
    SQL half-away-from-zero rounding so the DuckDB twin hashes equal.

    ``budget`` defaults to ``budget_frac * total_docs`` so the operator
    is self-scaling across sf dirs.
    """
    from epstein_pipeline_ray.stages.relational import grouped_stats

    counts = grouped_stats(docs.select_columns([lang_col]), [lang_col]).to_pandas()
    counts = counts.rename(columns={"n": "n_docs"})
    c = counts["n_docs"].to_numpy(np.float64)
    langs = counts[lang_col].astype(str).to_numpy()
    total = float(c.sum())
    B = float(budget) if budget is not None else budget_frac * total
    langs_s, c_s, cap_s, quota = _waterfill(langs, c, B, n_epochs)
    epochs = quota / c_s
    out = pd.DataFrame({
        "lang": langs_s,
        "n_docs": c_s.astype(np.int64),
        "cap": sql_round(cap_s, 6),
        "quota": sql_round(quota, 6),
        "epochs": sql_round(epochs, 6),
    }).sort_values("lang").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def domain_kl(
    docs: Dataset,
    group_col: str = "source",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> Dataset:
    """Per-domain unigram KL divergence KL(P_domain || P_corpus) — the
    domain-shift diagnostic behind importance-weighted data selection
    (Moore & Lewis ACL'10 cross-entropy difference; Xie 2023 DSIR uses
    the same distribution-ratio machinery): how far each ``group_col``
    value's word distribution sits from the corpus mixture. Returns
    ``(source, n_tokens, kl)``.

    Plan: map-side (source, token, cnt) partials pre-aggregated per
    batch → the per-source token totals are a tiny grouped_stats
    broadcast (one row per domain) → ONE exchange keyed on token (each
    token block holds every domain's count for that token, so the
    corpus total c_t is block-local) emitting per-block per-source
    partial KL sums → a final tiny grouped sum. Token counts, never
    text, cross the exchange.
    """
    import pandas as pd

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.relational import grouped_stats

    def explode_counts(batch: pa.Table) -> pa.Table:
        srcs = batch[group_col].to_pylist()
        texts = batch[text_col].to_pylist()
        cnt: dict[tuple[str, str], int] = {}
        for s, t in zip(srcs, texts):
            for w in str(t or "").lower().split():
                k = (str(s), w)
                cnt[k] = cnt.get(k, 0) + 1
        if not cnt:
            return pa.table({"source": pa.array([], pa.string()),
                             "tok": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        ks = list(cnt)
        return pa.table({
            "source": pa.array([k[0] for k in ks], pa.string()),
            "tok": pa.array([k[1] for k in ks], pa.string()),
            "cnt": pa.array([cnt[k] for k in ks], pa.int64()),
        })

    partials = docs.select_columns([group_col, text_col]).map_batches(
        explode_counts, batch_format="pyarrow", zero_copy_batch=True)
    # tiny: one row per domain — the documented bounded small side
    totals = grouped_stats(partials, ["source"], sum_cols=["cnt"]).to_pandas()
    n_s = dict(zip(totals["source"], totals["sum_cnt"].astype(np.float64)))
    n_total = float(totals["sum_cnt"].sum())
    ns_ref = ray.put((n_s, n_total))

    term_schema = pa.schema([("source", pa.string()), ("kl_part", pa.float64())])

    def kl_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return term_schema.empty_table()
        ns, n = ray.get(ns_ref)
        df = block.to_pandas()
        g = df.groupby(["tok", "source"], sort=True)["cnt"].sum().reset_index()
        ct = g.groupby("tok", sort=False)["cnt"].transform("sum").to_numpy(np.float64)
        c_st = g["cnt"].to_numpy(np.float64)
        nsv = g["source"].map(ns).to_numpy(np.float64)
        p = c_st / nsv
        term = p * np.log(p / (ct / n))
        out = pd.DataFrame({"source": g["source"], "term": term}) \
            .groupby("source", sort=True)["term"].sum().reset_index()
        return pa.table({
            "source": pa.array(out["source"], pa.string()),
            "kl_part": pa.array(out["term"].to_numpy(np.float64), pa.float64()),
        }, schema=term_schema)

    parts = map_key_blocks(partials, ["tok"], kl_block, num_partitions,
                           sort_blocks=False)
    # final reduce is a bounded table (exchange partitions × domains
    # rows) — sum it directly; grouped_stats is unsuitable here because
    # its sums round to 4 dp (the doc_stats convention)
    pdf = parts.to_pandas()
    out = (pdf.groupby("source", sort=True)["kl_part"].sum().reset_index()
           if len(pdf) else pd.DataFrame({"source": [], "kl_part": []}))
    out["n_tokens"] = out["source"].map(n_s).astype(np.int64)
    return pa.Table.from_pandas(pd.DataFrame({
        "source": out["source"].astype(str),
        "n_tokens": out["n_tokens"],
        "kl": sql_round(out["kl_part"].to_numpy(np.float64), 6),
    }), preserve_index=False)


def cluster_balanced_sample(
    vectors: Dataset,
    centroids: np.ndarray,
    centroid_ids: list,
    per_cluster: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_partitions: int | None = None,
) -> Dataset:
    """Diversity-capped sampling: assign every vector to its max-cosine
    centroid (embed.kmeans_assign), then keep at most ``per_cluster``
    vectors per cluster by deterministic LCG-mixed-id rank (the
    reproducible-sample convention of relational.deterministic_sample) —
    the cluster-balanced selection step of SemDeDup-style diversity
    pruning (Abbas 2023 §3: prune within embedding clusters so no
    region of the space dominates the kept set).

    Scale plan: each batch pre-prunes to ``per_cluster`` rows per
    cluster PRESENT IN THE BATCH (map-side combiner), so the keyed
    exchange moves at most per_cluster × clusters × batches rows; the
    final per-cluster rank runs on blocks bounded by
    per_cluster × upstream-batch-count, never the raw cluster size.
    """
    from epstein_pipeline_ray.stages.embed import kmeans_assign
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    assigned = kmeans_assign(vectors, centroids, centroid_ids,
                             id_col=id_col, emb_col=emb_col)

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([id_col, "centroid_id"])
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        cid = np.asarray(batch["centroid_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        mix = ((ids % 2147483648) * 1103515245 + 12345) % 2147483648
        order = np.lexsort((ids, mix, cid))
        cs = cid[order]
        new = np.r_[True, cs[1:] != cs[:-1]]
        starts = np.flatnonzero(new)
        pos = np.arange(cs.size) - starts[np.cumsum(new) - 1]
        keep = order[pos < per_cluster]
        return pa.table({
            id_col: pa.array(ids[keep], pa.int64()),
            "centroid_id": pa.array(cid[keep], pa.int64()),
        })

    pruned = assigned.map_batches(prune, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return map_key_blocks(pruned, ["centroid_id"], prune, num_partitions,
                          sort_blocks=False)


_REALIZE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("lang", pa.string()),
    ("n_copies", pa.int32()),
])


def unimax_realize(
    docs: Dataset,
    budget: float | None = None,
    budget_frac: float = 0.4,
    n_epochs: int = 2,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> Dataset:
    """Materialize the UniMax mixture: turn each language's real-valued
    quota into per-document integer repeat counts. The language's
    integer target is ``floor(quota + 0.5)``; every doc gets
    ``target // n_docs`` full epochs, and the ``target % n_docs``
    lowest-ranked docs (deterministic LCG-mixed-id rank, the
    corpus_sample convention) get one extra copy. Returns
    ``(doc_id, lang, n_copies)`` for docs with ``n_copies >= 1`` —
    the repeat plan a training loader consumes.

    The water-fill runs on the tiny language table; the per-doc rank is
    ONE exchange keyed on the language (each block = one language's
    docs, vectorized rank over (mix, id))."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.relational import grouped_stats

    counts = grouped_stats(docs.select_columns([lang_col]), [lang_col]).to_pandas()
    c = counts["n"].to_numpy(np.float64)
    langs = counts[lang_col].astype(str).to_numpy()
    B = float(budget) if budget is not None else budget_frac * float(c.sum())
    langs_s, c_s, _, quota = _waterfill(langs, c, B, n_epochs)
    target = np.floor(quota + 0.5)
    plan = {l: (int(t // n), int(t % n))
            for l, t, n in zip(langs_s, target, c_s)}
    plan_ref = ray.put(plan)

    pruned = docs.select_columns([id_col, lang_col])

    def rank_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _REALIZE_SCHEMA.empty_table()
        pl = ray.get(plan_ref)
        ids = np.asarray(block[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        lang = np.asarray(block[lang_col].to_pylist())
        mix = ((ids % 2147483648) * 1103515245 + 12345) % 2147483648
        order = np.lexsort((ids, mix, lang))
        ls = lang[order]
        new = np.r_[True, ls[1:] != ls[:-1]]
        starts = np.flatnonzero(new)
        pos = np.arange(ls.size) - starts[np.cumsum(new) - 1]
        # per-language plan lookup vectorized over the few distinct langs
        uls, inv = np.unique(ls, return_inverse=True)
        full_u = np.array([pl[l][0] for l in uls], dtype=np.int32)
        rem_u = np.array([pl[l][1] for l in uls], dtype=np.int64)
        full = full_u[inv]
        rem = rem_u[inv]
        copies = full + (pos < rem).astype(np.int32)
        keep = copies >= 1
        return pa.table({
            "doc_id": pa.array(ids[order][keep], pa.int64()),
            "lang": pa.array(ls[keep], pa.string()),
            "n_copies": pa.array(copies[keep], pa.int32()),
        }, schema=_REALIZE_SCHEMA)

    return map_key_blocks(pruned, [lang_col], rank_block, num_partitions,
                          sort_blocks=False)


def temperature_mixture(
    docs: Dataset,
    alpha: float = 0.7,
    group_col: str = "source",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> pa.Table:
    """Temperature-scaled mixture sampling weights (the mT5 / XLM-R
    ``p_i ∝ n_i^alpha`` convention, Xue 2021 §3.2 / Conneau 2020 §3):
    per group, whitespace-token mass and its alpha-flattened sampling
    weight ``n^alpha / Σ n^alpha`` — the softer-than-proportional
    mixture that up-samples small domains without UniMax's hard epoch
    cap (unimax_allocation is the budgeted alternative).

    Map-side per-batch token-count partials → one group-keyed exchange
    → the final normalization over a groups-bounded table driver-side
    (the documented small-side exception). Weights 6-digit rounded
    (sql_round) for the DuckDB twin."""
    from epstein_pipeline_ray.functions.textstats import token_count_array
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    partial_schema = pa.schema([
        (group_col, pa.string()), ("n_tokens", pa.int64()),
    ])

    def partial(batch: pa.Table) -> pa.Table:
        toks = np.asarray(token_count_array(batch[text_col]))
        g = (pd.DataFrame({group_col: batch[group_col].to_pandas(),
                           "n_tokens": toks})
             .groupby(group_col, sort=True)["n_tokens"].sum())
        return pa.table({
            group_col: pa.array(g.index, pa.string()),
            "n_tokens": pa.array(g.to_numpy(np.int64), pa.int64()),
        }, schema=partial_schema)

    partials = docs.select_columns([group_col, text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)

    def sum_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return partial_schema.empty_table()
        g = block.to_pandas().groupby(group_col, sort=True)["n_tokens"].sum()
        return pa.table({
            group_col: pa.array(g.index, pa.string()),
            "n_tokens": pa.array(g.to_numpy(np.int64), pa.int64()),
        }, schema=partial_schema)

    totals = (map_key_blocks(partials, [group_col], sum_block,
                             num_partitions, sort_blocks=False)
              .to_pandas().sort_values(group_col).reset_index(drop=True))
    n = totals["n_tokens"].to_numpy(np.float64)
    scaled = np.power(n, float(alpha))
    w = sql_round(scaled / scaled.sum(), 6) if len(totals) else scaled
    return pa.table({
        group_col: pa.array(totals[group_col], pa.string()),
        "n_tokens": pa.array(totals["n_tokens"].to_numpy(np.int64), pa.int64()),
        "weight": pa.array(w, pa.float64()),
    })


def contrastive_negatives(
    ds, id_col: str = "doc_id", k: int = 3,
    mult: int = 2654435761, step: int = 40503,
):
    """Deterministic negative sampling for contrastive training: for
    each row, ``k`` pseudo-random partner indices via the pinned Knuth
    multiplicative hash ``neg = (id*mult + j*step) mod n`` (j = 1..k),
    dropping self-collisions — reproducible across runs/engines with no
    RNG state, so the oracle can replay it exactly. Assumes dense
    0..n-1 ids (the training-shard convention after assign_split
    re-indexing); ``n`` is one metadata-only count. Output:
    (id, j, neg_id)."""
    import numpy as np
    import pyarrow as pa

    n = ds.count()

    def expand(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                         np.int64)
        rep = np.repeat(ids, k)
        j = np.tile(np.arange(1, k + 1, dtype=np.int64), len(ids))
        neg = (rep * mult + j * step) % n
        keep = neg != rep
        return pa.table({
            id_col: pa.array(rep[keep], pa.int64()),
            "j": pa.array(j[keep], pa.int64()),
            "neg_id": pa.array(neg[keep], pa.int64()),
        })

    return ds.select_columns([id_col]).map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True)
