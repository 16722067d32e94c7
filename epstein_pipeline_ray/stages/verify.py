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

Physical shape (VERDICT r1 item 4 — no driver-side text gather): the
paired-id text table is built with a ``key_membership_join`` semi-join
(docs filtered to ids that appear in any minhash pair), then both texts
ride to each pair row via two ``attach_column`` joins — each of which
internally switches between a plasma broadcast and the partitioned-file
exchange on the small side's size, so no driver structure is ever
proportional to the corpus. Verification itself is a stateless
``map_batches`` over pair rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from epstein_pipeline_ray.config import DedupConfig
from epstein_pipeline_ray.functions.minhash import shingle_hashes
from epstein_pipeline_ray.functions.normalize import normalize_text
from epstein_pipeline_ray.functions.simhash import hamming64, simhash64
from epstein_pipeline_ray.functions.substring import substring_overlap_ratio


def extended_verify(pairs: Dataset, docs: Dataset, cfg: DedupConfig,
                    broadcast_rows_limit: int | None = None) -> Dataset:
    """Filter minhash pairs through the SimHash + substring tier.

    Exact-pass pairs (identical normalized text) skip the tier — they are
    duplicates by construction.
    """
    from epstein_pipeline_ray.stages.joins import attach_column, key_membership_join

    limit = (broadcast_rows_limit if broadcast_rows_limit is not None
             else cfg.broadcast_sig_rows_limit)
    pairs = pairs.materialize()  # consumed for ids + joined + returned

    def pair_ids(batch: pa.Table) -> pa.Table:
        mh = batch.filter(pc.equal(batch["method"], "minhash"))
        ids = pa.concat_arrays(
            [mh["id_a"].combine_chunks() if isinstance(mh["id_a"], pa.ChunkedArray) else mh["id_a"],
             mh["id_b"].combine_chunks() if isinstance(mh["id_b"], pa.ChunkedArray) else mh["id_b"]]
        )
        return pa.table({"conv_id": ids})

    ids_ds = pairs.map_batches(pair_ids, batch_format="pyarrow", zero_copy_batch=True)
    if ids_ds.count() == 0:
        return pairs
    texts_needed = key_membership_join(
        docs.select_columns(["conv_id", "text"]), ids_ds, "conv_id",
        mode="semi", broadcast_rows_limit=limit,
    ).materialize()  # consumed by both attach joins
    with_a = attach_column(pairs, texts_needed, "id_a", "conv_id", "text",
                           "__text_a", broadcast_rows_limit=limit)
    with_ab = attach_column(with_a, texts_needed, "id_b", "conv_id", "text",
                            "__text_b", broadcast_rows_limit=limit)

    k = cfg.shingle_size
    max_ham = cfg.simhash_max_hamming
    min_overlap = cfg.substring_min_overlap

    if cfg.substring_backend == "suffix_array":
        from epstein_pipeline_ray.functions.suffix_array import (
            lcs_via_suffix_array,
        )

        def overlap_ratio(a: str, b: str) -> float:
            if not a or not b:
                return 0.0
            return lcs_via_suffix_array(a, b) / min(len(a), len(b))
    else:
        overlap_ratio = substring_overlap_ratio

    def verify(batch: pa.Table) -> pa.Table:
        keep = np.ones(batch.num_rows, dtype=bool)
        methods = batch["method"].to_pylist()
        texts_a = batch["__text_a"].to_pylist()
        texts_b = batch["__text_b"].to_pylist()
        sim_cache: dict[str, np.uint64] = {}

        def sh(text: str | None) -> np.uint64 | None:
            if text is None:
                return None
            h = sim_cache.get(text)
            if h is None:
                h = simhash64(shingle_hashes(normalize_text(text), k))
                sim_cache[text] = h
            return h

        n_checked = 0
        for i, (m, ta, tb) in enumerate(zip(methods, texts_a, texts_b)):
            if m != "minhash":
                continue
            n_checked += 1
            ha, hb = sh(ta), sh(tb)
            if ha is None or hb is None:
                keep[i] = False
                continue
            if int(hamming64(np.array([ha]), np.array([hb]))[0]) <= max_ham:
                continue
            na, nb = normalize_text(ta), normalize_text(tb)
            if overlap_ratio(na, nb) >= min_overlap:
                continue
            keep[i] = False
        from epstein_pipeline_ray.state import metrics

        metrics.inc("verify.pairs_checked", n_checked)
        metrics.inc("verify.pairs_rejected", int((~keep).sum()))
        return batch.filter(pa.array(keep, pa.bool_())).drop_columns(
            ["__text_a", "__text_b"]
        )

    return with_ab.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
