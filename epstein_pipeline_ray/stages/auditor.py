"""Person-registry duplicate audit: fuzzy-name scan WITH alias
cross-matching (reference: src/epstein_pipeline/processors/person_auditor.py:257-303
``_phase_dedup`` — VERDICT r2 item 6; G11 previously ran on the title-fuzzy
machinery without the alias tier).

Reference semantics:

- every unordered person pair is checked: name_sim = ratio of lowercased
  names; the pair is a potential duplicate when name_sim >= threshold OR
  any alias of one side matches the OTHER side's canonical name at >=
  threshold (person_auditor.py:279-291).
- the emitted confidence is ALWAYS the name×name similarity — even for
  alias-matched pairs (person_auditor.py:294,300: ``name_sim / 100``).

Ray shape: the registry is the classic bounded small side. Its lookup
arrays are assembled INSIDE a Ray task from the dataset's block refs
(the driver only moves refs) and each persons batch compares its rows
against the broadcast side with the batched min-plus DP kernels from
``dedup_extra`` — vectorized ACROSS pairs, with a conservative length
prefilter; alias comparisons run only for pairs that failed the name
tier. Pair (a, b) is emitted by the batch containing min(a, b), so the
all-pairs scan emits each unordered pair exactly once with no distinct
exchange.

``metric='levenshtein'`` is the DuckDB-oracle-able tier
(1 - lev/max(len)); ``metric='indel'`` is the reference's fuzz.ratio
(parity-tested against ``functions.fuzzy.ratio`` in unit tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from epstein_pipeline_ray.functions.rounding import sql_round

AUDIT_SCHEMA = pa.schema(
    [
        ("id_a", pa.int64()),
        ("id_b", pa.int64()),
        ("confidence", pa.float64()),
        ("matched_via", pa.string()),
    ]
)


def _codes_matrix(strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64,
                       count=len(strs))
    W = max(int(lens.max()) if len(strs) else 1, 1)
    codes = np.full((len(strs), W), 0xFFFFFFFF, dtype=np.uint32)
    for r, s in enumerate(strs):
        v = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
        codes[r, : v.size] = v
    return codes, lens


def _pair_ratios(strs_a: list[str], strs_b: list[str],
                 I: np.ndarray, J: np.ndarray, metric: str) -> np.ndarray:
    """ratio(strs_a[I[k]], strs_b[J[k]]) for many pairs, vectorized."""
    from epstein_pipeline_ray.stages.dedup_extra import (
        _batched_lcs,
        _batched_levenshtein,
    )

    if I.size == 0:
        return np.zeros(0, dtype=np.float64)
    codes, lens = _codes_matrix(list(strs_a) + list(strs_b))
    Jo = J + len(strs_a)
    la, lb = lens[I], lens[Jo]
    if metric == "levenshtein":
        d = _batched_levenshtein(codes, lens, I, Jo)
        return 1.0 - d / np.maximum(np.maximum(la, lb), 1)
    lcs = _batched_lcs(codes, lens, I, Jo)
    tot = la + lb
    return np.where(tot > 0, 1.0 - (tot - 2 * lcs) / np.maximum(tot, 1), 1.0)


def person_audit_pairs(
    persons: Dataset,
    threshold: float = 0.85,
    metric: str = "levenshtein",
    id_col: str = "person_id",
    name_col: str = "name",
    alias_col: str = "aliases",
) -> Dataset:
    """→ (id_a, id_b, confidence, matched_via 'name'|'alias') pairs."""
    assert metric in ("levenshtein", "indel")
    has_alias_col = alias_col in persons.schema().names
    cols = [id_col, name_col] + ([alias_col] if has_alias_col else [])
    refs = persons.select_columns(cols).to_arrow_refs()

    @ray.remote
    def _build(*tables):
        live = [t for t in tables if t.num_rows]
        if not live:
            return (np.empty(0, np.int64), [], np.empty(0, np.int64),
                    [], np.empty(0, np.int64))
        tbl = pa.concat_tables(live)
        pids = np.asarray(tbl[id_col].to_pandas().to_numpy(), dtype=np.int64)
        names = [str(x).lower() if x is not None else ""
                 for x in tbl[name_col].to_pylist()]
        a_owner: list[int] = []
        a_texts: list[str] = []
        if has_alias_col:
            for i, al in enumerate(tbl[alias_col].to_pylist()):
                for a in (al or []):
                    if a is not None:
                        a_owner.append(i)
                        a_texts.append(str(a).lower())
        lens = np.fromiter((len(s) for s in names), dtype=np.int64,
                           count=len(names))
        return (pids, names, lens, a_texts,
                np.asarray(a_owner, dtype=np.int64))

    side_ref = _build.remote(*refs)

    def scan(batch: pa.Table) -> pa.Table:
        pids_all, names_all, lens_all, atexts_all, aowner_all = ray.get(side_ref)
        N = len(names_all)
        if batch.num_rows == 0 or N == 0:
            return AUDIT_SCHEMA.empty_table()
        pids = np.asarray(batch[id_col].to_pandas().to_numpy(), dtype=np.int64)
        names = [str(x).lower() if x is not None else ""
                 for x in batch[name_col].to_pylist()]
        aliases = (batch[alias_col].to_pylist() if has_alias_col
                   else [None] * len(names))
        lens = np.fromiter((len(s) for s in names), dtype=np.int64,
                           count=len(names))
        m = len(names)
        # candidate (i, j): this batch emits only pairs whose SMALLER id
        # sits in the batch row — every unordered pair exactly once
        I = np.repeat(np.arange(m, dtype=np.int64), N)
        J = np.tile(np.arange(N, dtype=np.int64), m)
        cand = pids[I] < pids_all[J]
        I, J = I[cand], J[cand]
        # name-tier ratios with a conservative length prefilter: both
        # metrics satisfy ratio <= 1 - |la-lb| / max_or_sum — pairs that
        # cannot reach the threshold skip the DP entirely
        la, lb = lens[I], lens_all[J]
        if metric == "levenshtein":
            feasible = np.abs(la - lb) <= (1.0 - threshold) * np.maximum(
                np.maximum(la, lb), 1)
        else:
            feasible = np.abs(la - lb) <= (1.0 - threshold) * np.maximum(
                la + lb, 1)
        name_sim = np.full(I.size, -1.0)
        if feasible.any():
            name_sim[feasible] = _pair_ratios(
                names, names_all, I[feasible], J[feasible], metric)
        # infeasible pairs still need their true name similarity when an
        # alias matches (reference reports name_sim regardless); compute
        # lazily below for alias hits only
        name_hit = name_sim >= threshold

        alias_hit = np.zeros(I.size, dtype=bool)
        miss = np.flatnonzero(~name_hit)
        if miss.size:
            # (alias of batch person) x (canonical name of the other side)
            exp_pair: list[int] = []
            exp_atext: list[str] = []
            exp_nidx: list[int] = []
            for k in miss:
                i = int(I[k])
                for a in (aliases[i] or []):
                    if a is not None:
                        exp_pair.append(k)
                        exp_atext.append(str(a).lower())
                        exp_nidx.append(int(J[k]))
            if exp_pair:
                r = _pair_ratios(exp_atext, names_all,
                                 np.arange(len(exp_atext), dtype=np.int64),
                                 np.asarray(exp_nidx, dtype=np.int64), metric)
                for k, rv in zip(exp_pair, r):
                    if rv >= threshold:
                        alias_hit[k] = True
            # (canonical batch name) x (alias of the broadcast person)
            if len(atexts_all):
                still = np.flatnonzero(~name_hit & ~alias_hit)
                owner_to_aliases: dict[int, list[int]] = {}
                for ai, ow in enumerate(aowner_all):
                    owner_to_aliases.setdefault(int(ow), []).append(ai)
                exp_pair2: list[int] = []
                exp_name: list[str] = []
                exp_aidx: list[int] = []
                for k in still:
                    for ai in owner_to_aliases.get(int(J[k]), ()):
                        exp_pair2.append(int(k))
                        exp_name.append(names[int(I[k])])
                        exp_aidx.append(ai)
                if exp_pair2:
                    r = _pair_ratios(exp_name, atexts_all,
                                     np.arange(len(exp_name), dtype=np.int64),
                                     np.asarray(exp_aidx, dtype=np.int64),
                                     metric)
                    for k, rv in zip(exp_pair2, r):
                        if rv >= threshold:
                            alias_hit[k] = True
        hit = name_hit | alias_hit
        if not hit.any():
            return AUDIT_SCHEMA.empty_table()
        # alias-matched pairs report the true name similarity even when the
        # prefilter skipped it (reference person_auditor.py:294)
        need = np.flatnonzero(hit & (name_sim < 0))
        if need.size:
            name_sim[need] = _pair_ratios(names, names_all, I[need], J[need],
                                          metric)
        hi = np.flatnonzero(hit)
        via = np.where(name_hit[hi], "name", "alias").astype(object)
        return pa.table(
            {
                "id_a": pa.array(pids[I[hi]], pa.int64()),
                "id_b": pa.array(pids_all[J[hi]], pa.int64()),
                "confidence": pa.array(sql_round(name_sim[hi], 6), pa.float64()),
                "matched_via": pa.array(via, pa.string()),
            },
            schema=AUDIT_SCHEMA,
        )

    return persons.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)
