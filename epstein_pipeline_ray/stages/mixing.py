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
from ray.data import Dataset

from epstein_pipeline_ray.functions.rounding import sql_round


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
    epochs = quota / c_s
    out = pd.DataFrame({
        "lang": langs_s,
        "n_docs": c_s.astype(np.int64),
        "cap": sql_round(cap_s, 6),
        "quota": sql_round(quota, 6),
        "epochs": sql_round(epochs, 6),
    }).sort_values("lang").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
