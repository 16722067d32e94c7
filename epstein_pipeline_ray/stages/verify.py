"""Extended verification tier: SimHash hamming + suffix-automaton
substring confirmation of candidate pairs.

The north-rule extension on top of the reference's semantics (the
reference confirms with signature-estimated Jaccard only,
dedup.py:386-387; its docs claim SimHash but ship none — SURVEY.md):
``DedupConfig.verify_mode='extended'`` applies this tier AFTER the parity
confirmation, so extended output is always a subset of parity output and
parity mode remains bit-identical to the reference.

A minhash pair survives the extended tier iff

    hamming64(simhash(a), simhash(b)) <= simhash_max_hamming
    OR longest_common_substring(a, b) / min(len) >= substring_min_overlap

i.e. SimHash is the cheap accept; the suffix-automaton LCS rescues
containment-style duplicates (one transcript embedded in another) that
bit-fingerprints miss.

Physical shape: the pair set is orders of magnitude smaller than the
corpus, so the texts of paired ids are gathered once (filter by broadcast
id-set → driver map → ``ray.put``) and verification is a stateless
``map_batches`` over pairs. At corpus sizes where even the paired texts
outgrow the object store, replace the gather with the same
partitioned-file exchange join used by the MinHash stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from epstein_pipeline_ray.config import DedupConfig
from epstein_pipeline_ray.functions.minhash import shingle_hashes
from epstein_pipeline_ray.functions.normalize import normalize_text
from epstein_pipeline_ray.functions.simhash import hamming64, simhash64
from epstein_pipeline_ray.functions.substring import substring_overlap_ratio


def extended_verify(pairs: Dataset, docs: Dataset, cfg: DedupConfig) -> Dataset:
    """Filter minhash pairs through the SimHash + substring tier.

    Exact-pass pairs (identical normalized text) skip the tier — they are
    duplicates by construction.
    """
    pair_df = pairs.to_pandas()
    if pair_df.empty:
        return pairs
    mh = pair_df[pair_df["method"] == "minhash"]
    ids = set(mh["id_a"]) | set(mh["id_b"])
    if not ids:
        return pairs
    ids_ref = ray.put(ids)

    def gather(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        mask = pa.array([i in wanted for i in batch["conv_id"].to_pylist()], pa.bool_())
        return batch.filter(mask).select(["conv_id", "text"])

    texts_df = docs.map_batches(gather, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    text_map = dict(zip(texts_df["conv_id"], texts_df["text"]))
    texts_ref = ray.put(text_map)
    k = cfg.shingle_size
    max_ham = cfg.simhash_max_hamming
    min_overlap = cfg.substring_min_overlap

    def verify(batch: pa.Table) -> pa.Table:
        tm = ray.get(texts_ref)
        keep = np.ones(batch.num_rows, dtype=bool)
        methods = batch["method"].to_pylist()
        ids_a = batch["id_a"].to_pylist()
        ids_b = batch["id_b"].to_pylist()
        sim_cache: dict[str, np.uint64] = {}

        def sh(doc_id: str) -> np.uint64 | None:
            if doc_id not in sim_cache:
                t = tm.get(doc_id)
                sim_cache[doc_id] = (
                    None if t is None else simhash64(shingle_hashes(normalize_text(t), k))
                )
            return sim_cache[doc_id]

        for i, (m, a, b) in enumerate(zip(methods, ids_a, ids_b)):
            if m != "minhash":
                continue
            ha, hb = sh(a), sh(b)
            if ha is None or hb is None:
                keep[i] = False
                continue
            if int(hamming64(np.array([ha]), np.array([hb]))[0]) <= max_ham:
                continue
            na, nb = normalize_text(tm[a]), normalize_text(tm[b])
            if substring_overlap_ratio(na, nb) >= min_overlap:
                continue
            keep[i] = False
        from epstein_pipeline_ray.state import metrics

        metrics.inc("verify.pairs_checked", int((np.asarray(methods) == "minhash").sum()))
        metrics.inc("verify.pairs_rejected", int((~keep).sum()))
        return batch.filter(pa.array(keep, pa.bool_()))

    return pairs.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
