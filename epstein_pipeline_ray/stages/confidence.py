"""Tiered confidence matching of text mentions against a person/entity
registry (reference: src/epstein_pipeline/processors/confidence.py:30-119
``ConfidenceScorer.score_entity_match`` + models/registry.py A9).

The ladder, in order (first hit wins):

    exact canonical name   → 1.00  'exact'
    exact alias            → 0.95  'alias'
    token_sort_ratio ≥ .95 → 0.85  'fuzzy'
    token_sort_ratio ≥ .90 → 0.75  'fuzzy'
    registry name ⊂ mention→ 0.60  'substring'   (docstring tier; the
                                    reference scores it in its substring
                                    scan path — optional here)

Reference tie semantics preserved: duplicate normalized names in the
registry overwrite (LAST registry row wins) for exact/alias dicts; the
fuzzy scan keeps the FIRST maximum in registry[+alias] order.

Ray shape: the registry is the classic broadcast small side (``ray.put``
once, read per task — one plasma copy per node); the fuzzy tier runs the
batched-LCS panel from dedup_extra vectorized ACROSS (mention, name)
pairs with a conservative length prefilter, not a Python DP per pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

TIER_EXACT = 1.0
TIER_ALIAS = 0.95
TIER_FUZZY_95 = 0.85
TIER_FUZZY_90 = 0.75
TIER_SUBSTRING = 0.60


def _norm(s: str) -> str:
    return " ".join(s.lower().split())


def _token_sort(s: str) -> str:
    return " ".join(sorted(s.split()))


def build_registry_state(registry: pd.DataFrame) -> dict:
    """Precompute lookup state from (person_id, name[, aliases]) rows —
    done ONCE on the driver, shipped via ray.put."""
    exact: dict[str, object] = {}
    alias: dict[str, object] = {}
    all_names: list[tuple[str, object]] = []
    has_alias = "aliases" in registry.columns
    for row in registry.itertuples(index=False):
        pid = row.person_id
        n = _norm(str(row.name))
        exact[n] = pid
        all_names.append((n, pid))
        if has_alias and row.aliases is not None:
            aliases = row.aliases if isinstance(row.aliases, (list, tuple, np.ndarray)) else [row.aliases]
            for a in aliases:
                if a is None:
                    continue
                na = _norm(str(a))
                alias[na] = pid
                all_names.append((na, pid))
    # token-sorted forms for the fuzzy panel, in registry order
    ts_names = [_token_sort(n) for n, _ in all_names]
    return {
        "exact": exact,
        "alias": alias,
        "names": [n for n, _ in all_names],
        "pids": [p for _, p in all_names],
        "ts_names": ts_names,
    }


def _fuzzy_best(ts_mentions: list[str], ts_names: list[str],
                chunk: int = 256) -> tuple[np.ndarray, np.ndarray]:
    """Best token_sort_ratio of each mention against every name →
    (best_score, best_index first-max in name order). Vectorized via the
    batched LCS panel; pairs that cannot reach 0.90 are length-pruned."""
    from epstein_pipeline_ray.stages.dedup_extra import _batched_lcs

    n_m, n_n = len(ts_mentions), len(ts_names)
    best = np.zeros(n_m, dtype=np.float64)
    best_idx = np.zeros(n_m, dtype=np.int64)
    if n_m == 0 or n_n == 0:
        return best, best_idx
    all_strs = ts_mentions + ts_names
    lens = np.fromiter((len(s) for s in all_strs), dtype=np.int64)
    W = int(lens.max()) if len(all_strs) else 1
    codes = np.full((len(all_strs), max(W, 1)), 0xFFFFFFFF, dtype=np.uint32)
    for r, s in enumerate(all_strs):
        v = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
        codes[r, : v.size] = v
    name_idx = np.arange(n_n, dtype=np.int64) + n_m
    for lo in range(0, n_m, chunk):
        m_idx = np.arange(lo, min(lo + chunk, n_m), dtype=np.int64)
        I = np.repeat(m_idx, n_n)
        J = np.tile(name_idx, m_idx.size)
        la, lb = lens[I], lens[J]
        feasible = np.abs(la - lb) <= 0.10 * (la + lb)
        ratios = np.full(I.size, -1.0)
        if feasible.any():
            lcs = _batched_lcs(codes, lens, I[feasible], J[feasible])
            tot = la[feasible] + lb[feasible]
            with np.errstate(invalid="ignore"):
                ratios[feasible] = np.where(
                    tot > 0, 1.0 - (tot - 2 * lcs) / np.maximum(tot, 1), 1.0)
        panel = ratios.reshape(m_idx.size, n_n)
        best[m_idx] = panel.max(axis=1)
        best_idx[m_idx] = panel.argmax(axis=1)  # first max = registry order
    return best, best_idx


def match_mentions(
    mentions: Dataset,
    registry: pd.DataFrame,
    mention_col: str = "mention",
    enable_fuzzy: bool = True,
    enable_substring: bool = False,
) -> Dataset:
    """One output row per mention row with nullable match columns
    (person_id, confidence, match_type, matched_name)."""
    state_ref = ray.put(build_registry_state(registry))
    pid_type = pa.array(registry["person_id"].head(1)).type if len(registry) else pa.string()

    def score(batch: pa.Table) -> pa.Table:
        st = ray.get(state_ref)
        raw = batch[mention_col].to_pylist()
        n = len(raw)
        pid_out: list = [None] * n
        conf_out: list = [None] * n
        type_out: list = [None] * n
        name_out: list = [None] * n
        fuzzy_rows: list[int] = []
        fuzzy_norms: list[str] = []
        for i, m in enumerate(raw):
            norm = _norm(str(m)) if m is not None else ""
            if not norm or len(norm) < 3:
                continue
            pid = st["exact"].get(norm)
            if pid is not None:
                pid_out[i], conf_out[i], type_out[i], name_out[i] = (
                    pid, TIER_EXACT, "exact", norm)
                continue
            pid = st["alias"].get(norm)
            if pid is not None:
                pid_out[i], conf_out[i], type_out[i], name_out[i] = (
                    pid, TIER_ALIAS, "alias", norm)
                continue
            if enable_fuzzy:
                fuzzy_rows.append(i)
                fuzzy_norms.append(norm)
        if fuzzy_rows:
            best, best_idx = _fuzzy_best(
                [_token_sort(s) for s in fuzzy_norms], st["ts_names"])
            for k, i in enumerate(fuzzy_rows):
                if best[k] >= 0.95:
                    conf = TIER_FUZZY_95
                elif best[k] >= 0.90:
                    conf = TIER_FUZZY_90
                else:
                    continue
                j = int(best_idx[k])
                pid_out[i], conf_out[i], type_out[i], name_out[i] = (
                    st["pids"][j], conf, "fuzzy", st["names"][j])
        if enable_substring:
            for i, m in enumerate(raw):
                if pid_out[i] is not None or m is None:
                    continue
                norm = _norm(str(m))
                if not norm or len(norm) < 3:
                    continue
                for nm, pid in zip(st["names"], st["pids"]):
                    if nm and nm in norm:
                        pid_out[i], conf_out[i], type_out[i], name_out[i] = (
                            pid, TIER_SUBSTRING, "substring", nm)
                        break
        return batch.append_column(
            "person_id", pa.array(pid_out, pid_type)
        ).append_column(
            "confidence", pa.array(conf_out, pa.float64())
        ).append_column(
            "match_type", pa.array(type_out, pa.string())
        ).append_column(
            "matched_name", pa.array(name_out, pa.string())
        )

    return mentions.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
