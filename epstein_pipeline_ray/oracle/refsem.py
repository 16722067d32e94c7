"""Pure-Python oracle implementing the reference's dedup semantics.

This is the ground truth for the recall >= 0.99 harness (BASELINE.md).
It deliberately mirrors the *algorithm structure* of the reference —
single-process, in-memory dicts, insert-then-query LSH
(reference: src/epstein_pipeline/processors/dedup.py:138-171 pass merging,
247-273 hash groups, 332-398 MinHash/LSH, 173-236 union-find) — so that
agreement with the distributed engine validates the shuffle machinery,
not merely that both call the same function.

It shares only the leaf hash functions (normalize / shingle / minhash
family) with the engine: parity is defined at the pair/cluster level and
both sides must use the same hash family for that to be exact
(SURVEY.md §7.2 item 4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from epstein_pipeline_ray.config import DedupConfig
from epstein_pipeline_ray.functions.minhash import (
    band_keys,
    estimate_jaccard,
    optimal_lsh_params,
    shingle_hashes,
    signature,
)
from epstein_pipeline_ray.functions.normalize import content_hash, normalize_text

ROLLUP_SEP = "\n"


@dataclass(frozen=True)
class OraclePair:
    id_a: str  # < id_b (canonical order, reference dedup.py:146)
    id_b: str
    score: float
    method: str


def rollup_turns_pandas(turns: pd.DataFrame) -> pd.DataFrame:
    """Turns → one document per conversation, turns joined in turn_idx order.

    The driver-side (small data) twin of the engine's rollup stage; both
    must produce identical (conv_id, text) for the oracle to be meaningful.
    """
    s = turns.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    docs = s.groupby("conv_id", sort=True)["text"].agg(ROLLUP_SEP.join).reset_index()
    return docs


def oracle_pairs(
    docs: list[tuple[str, str]],
    cfg: DedupConfig | None = None,
    titles: dict[str, str] | None = None,
    bates: dict[str, str] | None = None,
    embeddings: dict[str, np.ndarray] | None = None,
) -> list[OraclePair]:
    """Exact (content hash → Bates overlap → title fuzzy, dedup.py:242-326)
    + MinHash + semantic passes with first-wins merge, sorted by score desc.

    ``docs`` = [(doc_id, raw_text)]; ``titles`` / ``bates`` /
    ``embeddings`` are optional per-doc side columns (``embeddings``
    stands in for the reference's model encode at dedup.py:439-448 — the
    oracle consumes precomputed vectors, like the engine).
    """
    cfg = cfg or DedupConfig()
    pairs: list[OraclePair] = []
    seen: set[tuple[str, str]] = set()

    # ---- pass 1a: exact (content-hash groups, score 1.0) — dedup.py:247-273
    if cfg.enable_exact:
        hash_groups: dict[str, list[str]] = {}
        for doc_id, text in docs:
            if text and text.strip():
                hash_groups.setdefault(content_hash(text), []).append(doc_id)
        for group in hash_groups.values():
            if len(group) < 2:
                continue
            for i in range(len(group)):
                for j in range(i + 1, len(group)):
                    key = (min(group[i], group[j]), max(group[i], group[j]))
                    if key not in seen:
                        seen.add(key)
                        pairs.append(OraclePair(key[0], key[1], 1.0, "exact"))

    # ---- pass 1b: Bates range overlap, score 0.95 — dedup.py:276-294
    if cfg.enable_bates and bates:
        from epstein_pipeline_ray.functions.bates import bates_overlap

        bd = [(d, bates[d]) for d, _ in docs if bates.get(d)]
        for i in range(len(bd)):
            for j in range(i + 1, len(bd)):
                (ia, ba), (ib, bb) = bd[i], bd[j]
                key = (min(ia, ib), max(ia, ib))
                if key in seen:
                    continue
                if bates_overlap(ba, bb):
                    seen.add(key)
                    pairs.append(OraclePair(key[0], key[1], 0.95, "exact"))

    # ---- pass 1c: title first-word blocking + indel ratio — dedup.py:296-324
    if cfg.enable_title and titles:
        from epstein_pipeline_ray.functions.fuzzy import ratio

        groups: dict[str, list[str]] = {}
        for d, _ in docs:
            t = titles.get(d)
            if t:
                first = t.lower().split()[0] if t.split() else ""
                groups.setdefault(first, []).append(d)
        for members in groups.values():
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    ia, ib = members[i], members[j]
                    key = (min(ia, ib), max(ia, ib))
                    if key in seen:
                        continue
                    r = ratio(titles[ia].lower(), titles[ib].lower())
                    if r >= cfg.title_threshold:
                        seen.add(key)
                        pairs.append(OraclePair(key[0], key[1], round(r, 4), "exact"))

    # ---- pass 2: MinHash/LSH — dedup.py:332-398
    if cfg.enable_minhash:
        text_docs = [(d, t) for d, t in docs if t and len(t) > cfg.min_text_len]
        sigs: dict[str, np.ndarray] = {}
        for doc_id, text in text_docs:
            norm = normalize_text(text)
            sigs[doc_id] = signature(shingle_hashes(norm, cfg.shingle_size), cfg.num_perm, cfg.seed)
        b, r = optimal_lsh_params(cfg.jaccard_threshold, cfg.num_perm)
        # insert-then-query LSH: band buckets as plain dicts
        buckets: list[dict[int, list[str]]] = [dict() for _ in range(b)]
        keys: dict[str, np.ndarray] = {}
        for doc_id, sig in sigs.items():
            bk = band_keys(sig[None, :], b, r)[0]
            keys[doc_id] = bk
            for band in range(b):
                buckets[band].setdefault(int(bk[band]), []).append(doc_id)
        mseen: set[tuple[str, str]] = set()
        for doc_id, _sig in sigs.items():
            candidates: set[str] = set()
            bk = keys[doc_id]
            for band in range(b):
                candidates.update(buckets[band].get(int(bk[band]), ()))
            candidates.discard(doc_id)
            for cand in candidates:
                key = (min(doc_id, cand), max(doc_id, cand))
                if key in mseen:
                    continue
                mseen.add(key)
                jac = estimate_jaccard(sigs[doc_id], sigs[cand])
                if jac >= cfg.jaccard_threshold and key not in seen:
                    seen.add(key)
                    pairs.append(OraclePair(key[0], key[1], round(jac, 4), "minhash"))

    # ---- pass 3: semantic (all-pairs cosine over precomputed vectors,
    # dedup.py:404-464: eligible len(text) > 50, score round(sim, 4))
    if getattr(cfg, "enable_semantic", False) and embeddings:
        elig = [
            d for d, t in docs
            if t and len(t) > cfg.semantic_min_text_len and d in embeddings
        ]
        if len(elig) >= 2:
            mat = np.stack([np.asarray(embeddings[d], dtype=np.float64) for d in elig])
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ mat.T
            for i in range(len(elig)):
                for j in range(i + 1, len(elig)):
                    sim = float(sims[i, j])
                    if sim < cfg.semantic_threshold:
                        continue
                    key = (min(elig[i], elig[j]), max(elig[i], elig[j]))
                    if key in seen:
                        continue
                    seen.add(key)
                    # sql_round (= DuckDB round), the engine's convention;
                    # the reference's Python round differs only on exact
                    # half boundaries (see functions/rounding.py)
                    from epstein_pipeline_ray.functions.rounding import sql_round

                    pairs.append(OraclePair(
                        key[0], key[1],
                        float(sql_round(sql_round(sim, 6), 4)), "semantic"))

    pairs.sort(key=lambda p: p.score, reverse=True)
    return pairs


def oracle_clusters(
    docs: list[tuple[str, str]],
    cfg: DedupConfig | None = None,
    titles: dict[str, str] | None = None,
    bates: dict[str, str] | None = None,
    embeddings: dict[str, np.ndarray] | None = None,
) -> tuple[list[OraclePair], dict[str, set[str]], dict[str, str]]:
    """Union-find over oracle pairs → (pairs, {root: members}, {member: representative}).

    Representative = longest raw text in the cluster (dedup.py:217-220);
    ties broken by doc id for determinism (the reference's ``max`` keeps the
    first maximum, which depends on input order — we pin it).
    """
    pairs = oracle_pairs(docs, cfg, titles=titles, bates=bates,
                         embeddings=embeddings)
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for p in pairs:
        parent.setdefault(p.id_a, p.id_a)
        parent.setdefault(p.id_b, p.id_b)
        ra, rb = find(p.id_a), find(p.id_b)
        if ra != rb:
            parent[ra] = rb

    groups: dict[str, set[str]] = {}
    for doc_id in parent:
        groups.setdefault(find(doc_id), set()).add(doc_id)
    groups = {k: v for k, v in groups.items() if len(v) >= 2}

    lengths = {d: len(t or "") for d, t in docs}
    rep: dict[str, str] = {}
    for members in groups.values():
        best = max(sorted(members), key=lambda d: (lengths.get(d, 0), d))
        for m in members:
            rep[m] = best
    return pairs, groups, rep
