"""MinHash/LSH near-dup pass as distributed dataflow.

The reference builds one global in-memory ``datasketch.MinHashLSH`` index
and queries it per document (reference:
src/epstein_pipeline/processors/dedup.py:332-398). Here the same candidate
semantics — "two docs are candidates iff they agree on at least one LSH
band" — become a shuffle:

    docs → map_batches(SignatureActor)            # actor pool, perm matrix state
         → 1 row per (doc, band): bucket key + signature
         → groupby(bucket).map_groups(emit pairs)  # THE big shuffle
         → groupby(id_a, id_b).first               # band-level pair dedup

Confirmation (signature-estimated Jaccard >= threshold, dedup.py:386-387)
runs inside the bucket stage — the signatures are already co-located, so
verification costs no extra shuffle.

Skew: bucket keys are 64-bit hashes, so oversized buckets only arise from
genuinely identical band signatures (e.g. boilerplate/exact dup floods).
Groups above ``max_bucket_size`` switch from all-pairs to a
connectivity-preserving star+chain emission with per-bucket salted
sub-splitting of the verification work, and the drop is accounted in the
emitted ``pairs_capped`` metric column rather than silently ignored.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from epstein_pipeline_ray.config import DedupConfig
from epstein_pipeline_ray.functions.minhash import (
    band_keys,
    optimal_lsh_params,
    shingle_hashes,
    signature,
)
from epstein_pipeline_ray.functions.normalize import normalize_array

_MIX_BAND = np.uint64(0x9E3779B97F4A7C15)


class SignatureActor:
    """Stateful map_batches stage: holds the permutation family + LSH params.

    Emits one row per (doc, band): ``(conv_id, n_chars, bucket:uint64,
    sig:fixed_size_list<uint32, num_perm>)``. Carrying the signature on the
    band row trades ~num_perm*4 bytes of shuffle volume per band for not
    needing a second join to re-attach signatures at verification time.
    """

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        self.bands, self.rows = optimal_lsh_params(cfg.jaccard_threshold, cfg.num_perm)
        # warm the permutation cache once per actor
        from epstein_pipeline_ray.functions.minhash import permutations

        permutations(cfg.num_perm, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        # eligibility lives INSIDE the actor (not a separate filter stage):
        # a fully-filtered batch must still emit a band-schema empty table,
        # or Ray's empty-block pass-through would leak the doc schema into
        # the bucket shuffle (reference eligibility: dedup.py:346-350)
        import pyarrow.compute as pc

        mask = pc.greater(pc.utf8_length(batch["text"]), cfg.min_text_len)
        batch = batch.filter(mask)
        norm = normalize_array(batch["text"])
        texts = norm.to_pylist()
        n = len(texts)
        sigs = np.empty((n, cfg.num_perm), dtype=np.uint32)
        for i, t in enumerate(texts):
            sigs[i] = signature(shingle_hashes(t, cfg.shingle_size), cfg.num_perm, cfg.seed)
        bk = band_keys(sigs, self.bands, self.rows)  # (n, bands)
        # fold the band index into the key so band 0 and band 3 with equal
        # contents land in different buckets
        band_ids = np.arange(self.bands, dtype=np.uint64)
        buckets = bk + band_ids[None, :] * _MIX_BAND  # uint64 wrap
        b = self.bands
        # doc-major replication: one output row per (doc, band)
        rep_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), b))
        return pa.table(
            {
                "conv_id": batch["conv_id"].take(rep_idx),
                "n_chars": batch["n_chars"].take(rep_idx),
                "bucket": pa.array(buckets.reshape(-1), pa.uint64()),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.repeat(sigs, b, axis=0).reshape(-1), pa.uint32()),
                    cfg.num_perm,
                ),
            }
        )


def signature_band_rows(docs: Dataset, cfg: DedupConfig) -> Dataset:
    """Docs (conv_id, text, n_chars) → band rows via the actor pool.

    Eligibility mirrors the reference: only texts strictly longer than
    ``min_text_len`` enter the MinHash pass (dedup.py:346-350).
    """

    pruned = docs.select_columns(["conv_id", "text", "n_chars"])
    if cfg.signature_concurrency:
        # explicit actor pool (the classic stateful-stage shape; useful when
        # the per-actor state is expensive, e.g. a swapped-in embedding model)
        return pruned.map_batches(
            SignatureActor,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            batch_size=cfg.minhash_batch_size,
            concurrency=cfg.signature_concurrency,
        )
    # Default: stateless tasks on the shared worker pool. The only state —
    # the permutation matrix — is lru_cached per worker process
    # (functions.minhash.permutations), giving actor-style amortization
    # without actor-pool ramp-up, which dominated this stage's wall time
    # (autoscaling pools trickle actors in ~1s apiece).
    stage = SignatureActor(cfg)
    return pruned.map_batches(
        stage.__call__,
        batch_format="pyarrow",
        batch_size=cfg.minhash_batch_size,
    )


def _make_bucket_block_fn(cfg: DedupConfig):
    threshold = cfg.jaccard_threshold
    cap = cfg.max_bucket_size

    def emit_block_pairs(batch: pa.Table) -> pa.Table:
        """One call per key-sorted block: iterate bucket runs, vectorized
        signature-Jaccard pair emission per run. Emits the reference's full
        DuplicatePair shape (dedup.py:388-396) so every downstream block —
        empty or not — shares one schema."""
        from epstein_pipeline_ray.stages.exact import PAIRS_SCHEMA

        empty = PAIRS_SCHEMA.empty_table()
        n_rows = batch.num_rows
        if n_rows < 2:
            return empty
        buckets = np.asarray(batch["bucket"].to_numpy(zero_copy_only=False))
        sig_col = batch["sig"]
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        sigs_all = np.asarray(sig_col.flatten()).reshape(n_rows, -1)
        ids_all = np.asarray(batch["conv_id"].to_pylist(), dtype=object)
        starts = np.concatenate([[0], np.nonzero(buckets[1:] != buckets[:-1])[0] + 1])
        ends = np.concatenate([starts[1:], [n_rows]]).astype(np.int64)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            n = int(e - s)
            if n < 2:
                continue
            ids = ids_all[s:e]
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            sigs = sigs_all[s:e][order]
            if n <= cap:
                iu, ju = np.triu_indices(n, k=1)
            else:
                # star + chain: connectivity-preserving cap for flooded
                # buckets (north rule skew handling); drop is accounted
                star_i = np.zeros(n - 1, dtype=np.int64)
                star_j = np.arange(1, n, dtype=np.int64)
                chain_i = np.arange(1, n - 1, dtype=np.int64)
                iu = np.concatenate([star_i, chain_i])
                ju = np.concatenate([star_j, chain_i + 1])
                from epstein_pipeline_ray.state import metrics

                metrics.inc("lsh.buckets_capped")
                metrics.inc("lsh.pairs_capped", n * (n - 1) // 2 - iu.shape[0])
            eq = (sigs[iu] == sigs[ju]).mean(axis=1)
            keep = (eq >= threshold) & (ids[iu] != ids[ju])
            if keep.any():
                out_a.append(ids[iu[keep]])
                out_b.append(ids[ju[keep]])
                out_s.append(np.round(eq[keep], 4))
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        sc = np.concatenate(out_s)
        return pa.table(
            {
                "id_a": pa.array(a.tolist(), pa.string()),
                "id_b": pa.array(b.tolist(), pa.string()),
                "score": pa.array(sc, pa.float64()),
                "method": pa.array(["minhash"] * a.shape[0], pa.string()),
                "reason": pa.array(
                    [f"MinHash Jaccard similarity: {s:.2%}" for s in sc], pa.string()
                ),
            },
            schema=PAIRS_SCHEMA,
        )

    return emit_block_pairs


def _dedup_pairs_block(batch: pa.Table) -> pa.Table:
    """Band-level pair dedup: one row per (id_a, id_b). Scores for a given
    pair are identical across bands (pure function of the two signatures),
    so keeping any row is exact."""
    from epstein_pipeline_ray.stages.exact import PAIRS_SCHEMA

    df = batch.to_pandas()
    df = df.drop_duplicates(subset=["id_a", "id_b"], keep="first")
    return pa.Table.from_pandas(df, preserve_index=False).cast(PAIRS_SCHEMA)


def minhash_raw_pairs(docs: Dataset, cfg: DedupConfig,
                      num_partitions: int | None = None) -> Dataset:
    """Signatures → LSH buckets → confirmed pairs, NOT yet deduped across
    bands (a pair surfaces once per agreeing band). The pipeline merges
    this raw stream with the exact pairs in ONE (id_a, id_b) shuffle."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    band_rows = signature_band_rows(docs, cfg)
    return map_key_blocks(band_rows, ["bucket"], _make_bucket_block_fn(cfg), num_partitions)


def minhash_pairs(docs: Dataset, cfg: DedupConfig,
                  num_partitions: int | None = None) -> Dataset:
    """Full MinHash/LSH pass: docs → confirmed, band-deduped pairs."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    raw_pairs = minhash_raw_pairs(docs, cfg, num_partitions)
    return map_key_blocks(raw_pairs, ["id_a", "id_b"], _dedup_pairs_block, num_partitions)
