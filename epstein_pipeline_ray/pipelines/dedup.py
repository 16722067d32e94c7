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


def _bates_pass(docs: Dataset) -> Dataset:
    """Bates-overlap pairs in the flagship pair schema (reference
    dedup.py:276-294: score 0.95, method 'exact')."""
    import pyarrow as pa

    from epstein_pipeline_ray.stages.dedup_extra import bates_overlap_pairs

    raw = bates_overlap_pairs(docs, id_col="conv_id")

    def to_pairs(batch: pa.Table) -> pa.Table:
        from epstein_pipeline_ray.stages.exact import PAIRS_SCHEMA

        n = batch.num_rows
        return pa.table(
            {
                "id_a": batch["id_a"].cast(pa.string()),
                "id_b": batch["id_b"].cast(pa.string()),
                "score": batch["score"],
                "method": pa.array(["exact"] * n, pa.string()),
                "reason": pa.array(["Bates range overlap"] * n, pa.string()),
            },
            schema=PAIRS_SCHEMA,
        )

    return raw.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True)


def _title_pass(docs: Dataset, threshold: float) -> Dataset:
    """Title-fuzzy pairs in the flagship pair schema (reference
    dedup.py:296-324: score = round(ratio, 4), method 'exact')."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from epstein_pipeline_ray.stages.dedup_extra import title_fuzzy_pairs

    titled = docs.map_batches(
        lambda b: b.filter(
            pc.and_kleene(pc.is_valid(b["title"]),
                          pc.greater(pc.utf8_length(b["title"]), 0))
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    raw = title_fuzzy_pairs(titled, threshold=threshold,
                            id_col="conv_id", title_col="title")

    def to_pairs(batch: pa.Table) -> pa.Table:
        from epstein_pipeline_ray.stages.exact import PAIRS_SCHEMA

        n = batch.num_rows
        scores = batch["score"].to_pylist()
        return pa.table(
            {
                "id_a": batch["id_a"].cast(pa.string()),
                "id_b": batch["id_b"].cast(pa.string()),
                "score": batch["score"],
                "method": pa.array(["exact"] * n, pa.string()),
                "reason": pa.array(
                    [f"title similarity: {s:.2%}" for s in scores], pa.string()
                ),
            },
            schema=PAIRS_SCHEMA,
        )

    return raw.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True)


def _semantic_pass(docs: Dataset, cfg: DedupConfig) -> Dataset:
    """Embedding-cosine pairs in the flagship pair schema (reference
    dedup.py:404-464: eligibility len(text) > 50, score = round(cos, 4),
    method 'semantic', reason 'semantic similarity: XX.XX%'). Runs over a
    precomputed ``embedding`` list<float> column; size-switched between
    the exact all-pairs plan (reference parity) and the random-hyperplane
    LSH plan (scale path, recall-approximate)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from epstein_pipeline_ray.stages.embed import cosine_neardup_pairs, lsh_neardup_pairs

    def eligible(batch: pa.Table) -> pa.Table:
        mask = pc.and_kleene(
            pc.fill_null(
                pc.greater(pc.utf8_length(batch["text"]),
                           cfg.semantic_min_text_len), False),
            pc.is_valid(batch["embedding"]),
        )
        return batch.select(["conv_id", "embedding"]).filter(mask)

    vecs = docs.map_batches(eligible, batch_format="pyarrow", zero_copy_batch=True)
    n = vecs.count()
    if n < 2:
        import ray.data as rd

        from epstein_pipeline_ray.stages.exact import PAIRS_SCHEMA

        return rd.from_arrow(PAIRS_SCHEMA.empty_table())
    if n <= cfg.semantic_broadcast_limit:
        raw = cosine_neardup_pairs(vecs, threshold=cfg.semantic_threshold,
                                   id_col="conv_id", emb_col="embedding")
    else:
        raw = lsh_neardup_pairs(vecs, threshold=cfg.semantic_threshold,
                                id_col="conv_id", emb_col="embedding")

    def to_pairs(batch: pa.Table) -> pa.Table:
        from epstein_pipeline_ray.functions.rounding import sql_round
        from epstein_pipeline_ray.stages.exact import PAIRS_SCHEMA

        cos = batch["cos"].to_pylist()
        # score rounding follows the repo's SQL convention (sql_round —
        # half away from zero, = DuckDB round) rather than the reference's
        # Python round (banker's): the two differ only on exact half
        # boundaries at the 4th decimal, which real cosines don't hit
        return pa.table(
            {
                "id_a": batch["id_a"].cast(pa.string()),
                "id_b": batch["id_b"].cast(pa.string()),
                "score": pa.array(sql_round(cos, 4), pa.float64())
                if cos else pa.array([], pa.float64()),
                "method": pa.array(["semantic"] * batch.num_rows, pa.string()),
                "reason": pa.array(
                    [f"semantic similarity: {c:.2%}" for c in cos], pa.string()
                ),
            },
            schema=PAIRS_SCHEMA,
        )

    return raw.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True)


def _with_rank(ds: Dataset, rank: int) -> Dataset:
    """Tag a pass's pair stream with its first-wins priority (the
    reference's pass ORDER, dedup.py:143-168, 242-326: content hash <
    bates < title < minhash < semantic — lower wins)."""
    import pyarrow as pa

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__rank", pa.array([rank] * batch.num_rows, pa.int8())
        )

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def _merge_first_wins(all_pairs: Dataset) -> Dataset:
    """Pair-key dedup preferring the earliest pass — the reference's
    first-wins merge (dedup.py:143-168) generalized to the five-pass
    stream (content hash, bates, title, minhash, semantic), as one
    vectorized pass per key-sorted block. Input rows carry a ``__rank``
    priority column (dropped on output)."""
    import pyarrow as pa

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    from epstein_pipeline_ray.stages.exact import PAIRS_SCHEMA

    import numpy as np
    import pyarrow.compute as pc

    def pick_block(batch: pa.Table) -> pa.Table:
        # typed empty (not the raw zero-column block): downstream sort()
        # unions block schemas, and a schema-less empty poisons that union
        # (the "RefBundle with a different schema" warning, VERDICT r1)
        if batch.num_rows == 0:
            return PAIRS_SCHEMA.empty_table()
        # Arrow-native (VERDICT r3 item 5): sort by (pair, rank), keep the
        # first row of each (id_a, id_b) run — no pandas round-trip of the
        # pair-table-sized block
        batch = batch.combine_chunks().sort_by([
            ("id_a", "ascending"), ("id_b", "ascending"),
            ("__rank", "ascending"),
        ])
        n = batch.num_rows
        a = batch["id_a"].combine_chunks()
        b = batch["id_b"].combine_chunks()
        changed = pc.or_(
            pc.not_equal(a.slice(1), a.slice(0, n - 1)),
            pc.not_equal(b.slice(1), b.slice(0, n - 1)),
        )
        mask = np.empty(n, dtype=bool)
        mask[0] = True
        mask[1:] = np.asarray(changed.to_numpy(zero_copy_only=False), bool)
        return (batch.filter(pa.array(mask))
                .select(PAIRS_SCHEMA.names).cast(PAIRS_SCHEMA))

    # sort_blocks=False: pick_block does its own (pair, rank) sort — the
    # exchange's key-only consume sort would be strictly redundant work
    return map_key_blocks(all_pairs, ["id_a", "id_b"], pick_block,
                          sort_blocks=False)


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
            from epstein_pipeline_ray.stages.groupblock import drop_empty_blocks

            chain.next(stage)
            # materialize + launder zero-row blocks (refs only): a stray
            # schema-less empty at a stage barrier otherwise trips the
            # streaming executor's schema-consistency warning downstream
            out = drop_empty_blocks(builder())
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

    # raw pair streams: exact + bates + title + UN-deduped minhash bucket
    # pairs, each tagged with its pass priority; the single merge shuffle
    # below handles both the cross-band pair dedup and the first-wins pass
    # preference in one exchange (reference dedup.py:143-168, 242-326)
    doc_cols = set(hashed.schema().names)
    # the rank tag chains lazily INSIDE each pass's stage barrier so the
    # barrier materializes the tagged stream directly — tagging a
    # materialized pass would re-copy every pair table once more
    parts = []
    if cfg.enable_exact:
        parts.append(ck("pairs_exact", lambda: _with_rank(exact_pairs(hashed), 0)))
    if cfg.enable_bates and "bates_range" in doc_cols:
        parts.append(ck("pairs_bates", lambda: _with_rank(_bates_pass(hashed), 1)))
    if cfg.enable_title and "title" in doc_cols:
        parts.append(ck(
            "pairs_title",
            lambda: _with_rank(_title_pass(hashed, cfg.title_threshold), 2)))
    if cfg.enable_minhash:
        from epstein_pipeline_ray.stages.minhash_stage import minhash_raw_pairs

        # the representative filter chains lazily into the signature stage
        # (both are maps after the tiny id/hash exchange inside
        # hash_representatives) — an extra materialize barrier here would
        # copy the full text corpus once more for nothing
        mh_input = hash_representatives(hashed) if minhash_on_reps else hashed
        parts.append(ck(
            "pairs_minhash_raw",
            lambda: _with_rank(minhash_raw_pairs(mh_input, cfg), 3)))
    if cfg.enable_semantic and "embedding" in doc_cols:
        parts.append(ck(
            "pairs_semantic",
            lambda: _with_rank(_semantic_pass(hashed, cfg), 4)))

    if not parts:
        raise ValueError("at least one dedup pass must be enabled")
    from epstein_pipeline_ray.stages.groupblock import concat_datasets

    all_pairs = parts[0] if len(parts) == 1 else concat_datasets(parts)
    pairs = ck("pairs", lambda: _merge_first_wins(all_pairs))
    if cfg.sort_pairs_by_score:
        # reference output ordering (dedup.py:170-171); a range shuffle of
        # the pair table only — output-sized, not corpus-sized. Block count
        # is sized to the pair count first: sorting a small table across
        # many blocks makes Ray's sort emit schema-less empty ranges (the
        # RefBundle schema warning) and wastes range-partition tasks.
        def _sorted():
            n = pairs.count()
            target = max(1, -(-n // 2_000_000))
            try:
                cur = pairs.num_blocks()  # materialized in the in-memory path
            except NotImplementedError:
                cur = None  # lazy (checkpoint-resume read): block count unknown
            src = pairs if cur is not None and cur <= target else pairs.repartition(target)
            return src.sort("score", descending=True)

        pairs = ck("pairs_sorted", _sorted)

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
            from epstein_pipeline_ray.stages.groupblock import drop_empty_blocks

            chain.next(stage)
            # materialize + launder zero-row blocks (refs only): a stray
            # schema-less empty at a stage barrier otherwise trips the
            # streaming executor's schema-consistency warning downstream
            out = drop_empty_blocks(builder())
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
