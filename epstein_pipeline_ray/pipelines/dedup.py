"""Flagship pipeline: transcript near-dup detection + clustering.

Distributed re-expression of ``epstein-pipeline dedup``
(reference: src/epstein_pipeline/cli.py:556-636 →
processors/dedup.py:138-236). Stage graph (SURVEY.md §7.1):

    read_parquet(turns)
     → rollup: groupby(conv_id) sort(turn_idx) concat     # SHUFFLE 1
     → normalize + content_hash map_batches               # stateless Arrow
     → exact: groupby(content_hash) → pairs               # SHUFFLE 2
     → minhash: SignatureActor pool → band rows
       → groupby(bucket) → verified pairs                 # SHUFFLE 3
       → groupby(pair) dedup                              # small shuffle
     → merge passes (first-wins: exact > minhash)         # small shuffle
     → union-find on driver over streamed pairs
     → cluster table via broadcast map_batches            # no shuffle
    [each stage optionally checkpointed with a lineage manifest]

Pass-merge semantics match the reference's first-wins ordering
(dedup.py:143-168): a pair found by both passes keeps the exact record.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import pandas as pd
from ray.data import Dataset

from epstein_pipeline_ray.config import DedupConfig, RunConfig
from epstein_pipeline_ray.sources.turns import rollup_convs
from epstein_pipeline_ray.stages.cluster import assign_clusters
from epstein_pipeline_ray.stages.exact import exact_pairs, hash_representatives, with_content_hash
from epstein_pipeline_ray.stages.minhash_stage import minhash_pairs
from epstein_pipeline_ray.state import metrics
from epstein_pipeline_ray.state.lineage import FingerprintChain, input_fingerprint, run_stage


@dataclass
class DedupResult:
    docs: Dataset      # (conv_id, text, n_turns, n_chars, content_hash)
    pairs: Dataset     # (id_a, id_b, score, method, reason)
    clusters: Dataset  # (conv_id, cluster_id, representative, cluster_size, avg_similarity)


def _merge_first_wins(all_pairs: Dataset) -> Dataset:
    """Pair-key dedup preferring exact > minhash > semantic — the
    reference's earlier-pass-wins merge (dedup.py:143-168), as one
    vectorized pass per key-sorted block."""
    import pyarrow as pa

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    rank = {"exact": 0, "minhash": 1, "semantic": 2}

    def pick_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        df = batch.to_pandas()
        df["__rank"] = df["method"].map(rank)
        df = (
            df.sort_values(["id_a", "id_b", "__rank"], kind="mergesort")
            .drop_duplicates(["id_a", "id_b"], keep="first")
            .drop(columns="__rank")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return map_key_blocks(all_pairs, ["id_a", "id_b"], pick_block)


def dedup_conv_docs(
    docs: Dataset,
    cfg: DedupConfig | None = None,
    run: RunConfig | None = None,
    *,
    minhash_on_reps: bool = False,
    pre_hashed: bool = False,
    _fp_chain: FingerprintChain | None = None,
) -> DedupResult:
    """Dedup over already-rolled-up conversation docs
    (conv_id, text, n_chars[, n_turns]).

    ``minhash_on_reps=True`` is the scale path: the MinHash pass runs only
    on one representative per content-hash group (identical texts share
    identical signatures); exact pairs restore full connectivity, so
    cluster assignments are unchanged while the largest LSH-skew source
    disappears. Pair-level output then differs from the reference on
    redundant cross-pairs — keep False for strict pair parity.
    """
    cfg = cfg or DedupConfig()
    run = run or RunConfig(write_checkpoints=False)
    # Checkpoint identity = config + input + physical-plan mode, chained per
    # stage in execution order (ADVICE r1: a config-only fingerprint reused
    # stale checkpoints across changed inputs / --on-reps toggles).
    chain = _fp_chain or FingerprintChain(
        f"{cfg.fingerprint()}|in={input_fingerprint(docs)}"
    )
    chain.cur = f"{chain.cur}|reps={minhash_on_reps}|prehashed={pre_hashed}"

    def ck(stage: str, builder):
        # Stage-sequential execution in BOTH modes. Checkpoint mode
        # serializes through Parquet; in-memory mode pins each stage in the
        # object store. Fusing every pass into one lazy DAG measured ~2.5x
        # slower on one node: 4+ concurrent hash-shuffle operators and the
        # signature actor pool over-subscribe the CPU pool and thrash.
        # (At persistent 100TB scale run with write_checkpoints=True; the
        # in-memory path is for tests/bench at object-store-sized inputs.)
        import time

        t0 = time.time()
        if not run.write_checkpoints:
            chain.next(stage)
            out = builder().materialize()
        else:
            out = run_stage(stage, run.run_dir, chain.next(stage), builder, resume=run.resume)
        # stage barrier: every exchange built for this stage is consumed —
        # free its shard dirs (tmpfs shards left around evict page cache)
        from epstein_pipeline_ray.stages.exchange import gc_exchange_dirs

        gc_exchange_dirs()
        if os.environ.get("EPR_TIMING"):
            print(f"[epr-stage] {stage} {time.time() - t0:.1f}s", flush=True)
        return out

    if pre_hashed:
        hashed = docs
    else:
        hashed = ck("docs_hashed", lambda: with_content_hash(docs))

    # raw pair streams: exact pairs + UN-deduped minhash bucket pairs; the
    # single merge shuffle below handles both the cross-band pair dedup and
    # the first-wins pass preference in one exchange
    parts = []
    if cfg.enable_exact:
        parts.append(ck("pairs_exact", lambda: exact_pairs(hashed)))
    if cfg.enable_minhash:
        from epstein_pipeline_ray.stages.minhash_stage import minhash_raw_pairs

        # the representative filter chains lazily into the signature stage
        # (both are maps after the tiny id/hash exchange inside
        # hash_representatives) — an extra materialize barrier here would
        # copy the full text corpus once more for nothing
        mh_input = hash_representatives(hashed) if minhash_on_reps else hashed
        parts.append(ck("pairs_minhash_raw", lambda: minhash_raw_pairs(mh_input, cfg)))

    if not parts:
        raise ValueError("at least one dedup pass must be enabled")
    from epstein_pipeline_ray.stages.groupblock import concat_datasets

    all_pairs = parts[0] if len(parts) == 1 else concat_datasets(parts)
    pairs = ck("pairs", lambda: _merge_first_wins(all_pairs))

    if cfg.verify_mode == "extended":
        from epstein_pipeline_ray.stages.verify import extended_verify

        pairs = ck("pairs_verified", lambda: extended_verify(pairs, hashed, cfg))

    clusters = ck("clusters", lambda: assign_clusters(hashed, pairs))

    if run.write_checkpoints:
        snap = metrics.snapshot()
        os.makedirs(run.run_dir, exist_ok=True)
        with open(os.path.join(run.run_dir, "metrics.json"), "w") as f:
            json.dump(snap, f, indent=1, sort_keys=True)

    return DedupResult(docs=hashed, pairs=pairs, clusters=clusters)


def dedup_turns(
    turns: Dataset,
    cfg: DedupConfig | None = None,
    run: RunConfig | None = None,
    *,
    minhash_on_reps: bool = False,
) -> DedupResult:
    """Full flagship: turn table in, pairs + clusters out."""
    cfg = cfg or DedupConfig()
    run = run or RunConfig(write_checkpoints=False)
    chain = FingerprintChain(f"{cfg.fingerprint()}|in={input_fingerprint(turns)}")

    def ck(stage: str, builder):
        import time

        t0 = time.time()
        if not run.write_checkpoints:
            chain.next(stage)
            out = builder().materialize()
        else:
            out = run_stage(stage, run.run_dir, chain.next(stage), builder, resume=run.resume)
        if os.environ.get("EPR_TIMING"):
            print(f"[epr-stage] {stage} {time.time() - t0:.1f}s", flush=True)
        return out

    docs = ck("conv_docs", lambda: rollup_convs(turns, with_hash=True))
    return dedup_conv_docs(
        docs, cfg, run, minhash_on_reps=minhash_on_reps, pre_hashed=True,
        _fp_chain=chain,
    )
