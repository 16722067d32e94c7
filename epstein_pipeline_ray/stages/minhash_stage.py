"""MinHash/LSH near-dup pass as distributed dataflow.

The reference builds one global in-memory ``datasketch.MinHashLSH`` index
and queries it per document (reference:
src/epstein_pipeline/processors/dedup.py:332-398). Here the same candidate
semantics — "two docs are candidates iff they agree on at least one LSH
band" — become a shuffle:

    docs → map_batches(SignatureActor)       # (conv_id, sig) — one row/doc
         → band rows (conv_id, bucket)       # ids only on the default path
         → exchange(bucket) → block-local candidates → INLINE confirm
         → exchange(id pair) → globally distinct confirmed pairs

Two hard-won layout lessons (both measured on a 600k-conv corpus whose
band buckets flood to 100–2200 members — 39M candidate pairs of which
only ~350k confirm):

1. **Confirm must run inside the bucket task.** Shipping raw candidates
   to a separate confirm stage moved 38.5M rows through two exchanges
   and gathered 40 GB of signature pairs — 220 s. Confirmed-only output
   is ~2 orders of magnitude smaller.
2. **Signatures must not ride the band rows** (on the default path): a
   512 B signature replicated onto every (doc, band) row made the bucket
   exchange ship ``bands×`` the signature corpus. Instead the sig table
   is ``ray.put`` ONCE — plasma shares it zero-copy with every task on
   the node (one copy per node on a real cluster). Above
   ``broadcast_sig_rows_limit`` (the 10^12-turn path, where no node
   holds the sig corpus) signatures DO ride the band rows as binary
   blobs — the classic space-for-locality trade, partitioned so one
   bucket-hash partition fits a worker heap.

Confirm itself is a staged EXACT early-exit: agreement is counted 32
components at a time and a pair is dropped the moment even perfect
agreement on the remaining components could not reach the threshold —
flood pairs (J≈0.1) die after one stage, so ~75% of the gather traffic
disappears with bit-identical output.

Skew: bucket keys are 64-bit hashes, so oversized buckets only arise
from genuinely identical band signatures. Groups above
``max_bucket_size`` switch from all-pairs to a connectivity-preserving
star+chain emission, accounted in the metrics actor rather than
silently dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
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


def _sig_schema(num_perm: int) -> pa.Schema:
    return pa.schema(
        [("conv_id", pa.string()), ("sig", pa.list_(pa.uint32(), num_perm))]
    )


def _bin_from_mat(mat: np.ndarray) -> pa.Array:
    """(n, w) uint32 → binary array of fixed 4w-byte blobs (Parquet-safe)."""
    n, w = mat.shape
    offsets = np.arange(0, (n + 1) * w * 4, w * 4, dtype=np.int32)
    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(np.ascontiguousarray(mat).tobytes())],
    )


def _mat_from_bin(col, num_perm: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    joined = b"".join(col.to_pylist())
    return np.frombuffer(joined, dtype=np.uint32).reshape(-1, num_perm)


class SignatureActor:
    """Stateful map_batches stage: holds the permutation family + LSH params.

    Emits ONE row per eligible doc: ``(conv_id, sig:fixed_size_list<uint32,
    num_perm>)``. Eligibility mirrors the reference: only texts strictly
    longer than ``min_text_len`` enter the MinHash pass (dedup.py:346-350).
    """

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        from epstein_pipeline_ray.functions.minhash import permutations

        permutations(cfg.num_perm, cfg.seed)  # warm the cache once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        # the filter lives INSIDE the stage: a fully-filtered batch must
        # still emit a sig-schema empty table, or Ray's empty-block
        # pass-through would leak the doc schema downstream
        mask = pc.greater(pc.utf8_length(batch["text"]), cfg.min_text_len)
        batch = batch.filter(mask)
        norm = normalize_array(batch["text"])
        texts = norm.to_pylist()
        n = len(texts)
        sigs = np.empty((n, cfg.num_perm), dtype=np.uint32)
        for i, t in enumerate(texts):
            sigs[i] = signature(shingle_hashes(t, cfg.shingle_size), cfg.num_perm, cfg.seed)
        conv = batch["conv_id"]
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        return pa.table(
            {
                "conv_id": conv,
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1), pa.uint32()), cfg.num_perm
                ),
            },
            schema=_sig_schema(cfg.num_perm),
        )


def signature_rows(docs: Dataset, cfg: DedupConfig) -> Dataset:
    """Docs (conv_id, text, ...) → one (conv_id, sig) row per eligible doc."""
    pruned = docs.select_columns(["conv_id", "text"])
    if cfg.signature_concurrency:
        return pruned.map_batches(
            SignatureActor,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            batch_size=cfg.minhash_batch_size,
            concurrency=cfg.signature_concurrency,
        )
    # Default: stateless tasks on the shared worker pool. The only state —
    # the permutation matrix — is lru_cached per worker process, giving
    # actor-style amortization without actor-pool ramp-up (autoscaling
    # pools trickle actors in ~1s apiece, which dominated this stage).
    stage = SignatureActor(cfg)
    # batch_size=None (whole blocks): an explicit batch_size here becomes
    # min-rows-per-bundle when Ray fuses this map behind an exchange
    # consume, which was observed to bundle EVERY reduce partition into
    # one serial task (round 5, exchange.py:_consume_exchange). The
    # per-doc loop's working set is per-document, so block-sized batches
    # cost nothing.
    return pruned.map_batches(
        stage.__call__,
        batch_format="pyarrow",
        batch_size=None,
    )


def _expand_bands(batch: pa.Table, cfg: DedupConfig, with_sig: bool) -> pa.Table:
    bands, rows = optimal_lsh_params(cfg.jaccard_threshold, cfg.num_perm)
    n = batch.num_rows
    cols = {"conv_id": pa.array([], pa.string()), "bucket": pa.array([], pa.uint64())}
    if with_sig:
        cols["sig_bin"] = pa.array([], pa.binary())
    if n == 0:
        return pa.table(cols)
    sig_col = batch["sig"]
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    sigs = np.asarray(sig_col.flatten()).reshape(n, -1)
    bk = band_keys(sigs, bands, rows)  # (n, bands)
    # fold the band index into the key so band 0 and band 3 with equal
    # contents land in different buckets
    band_ids = np.arange(bands, dtype=np.uint64)
    buckets = bk + band_ids[None, :] * _MIX_BAND  # uint64 wrap
    rep_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
    out = {
        "conv_id": batch["conv_id"].take(rep_idx),
        "bucket": pa.array(buckets.reshape(-1), pa.uint64()),
    }
    if with_sig:
        out["sig_bin"] = _bin_from_mat(np.repeat(sigs, bands, axis=0))
    return pa.table(out)


def band_rows(sig_ds: Dataset, cfg: DedupConfig, with_sig: bool = False) -> Dataset:
    """(conv_id, sig) → one band row per (doc, band).

    ``with_sig=True`` is the beyond-broadcast scale path: the signature
    rides each band row as a binary blob so confirm stays bucket-local
    without any node holding the sig corpus.
    """

    def expand(batch: pa.Table) -> pa.Table:
        return _expand_bands(batch, cfg, with_sig)

    return sig_ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# bucket block: candidates + inline staged confirm
# ---------------------------------------------------------------------------


_LOCAL_RUN_MIN = 48  # runs at least this long confirm via a bucket-local matrix


def _staged_confirm(G: np.ndarray, ia: np.ndarray, ja: np.ndarray,
                    need: int, num_perm: int, stage: int = 32,
                    chunk: int = 1 << 18) -> tuple[np.ndarray, np.ndarray]:
    """Exact early-exit agreement count for row-index pairs into ``G``.

    Pairs are processed in bounded chunks; within a chunk, agreement is
    counted ``stage`` components at a time and a pair is dropped the
    moment agree + remaining < need — no approximation, flood pairs
    (J≈0.1) die after the first stage. Peak temp memory is
    O(chunk × stage), independent of bucket size.

    Returns (keep_mask over pairs, agree counts)."""
    n = ia.shape[0]
    keep = np.zeros(n, dtype=bool)
    agree_out = np.zeros(n, dtype=np.int32)
    for base in range(0, n, chunk):
        i_c = ia[base : base + chunk]
        j_c = ja[base : base + chunk]
        m = i_c.shape[0]
        agree = np.zeros(m, dtype=np.int32)
        alive = np.arange(m, dtype=np.int64)
        for lo in range(0, num_perm, stage):
            hi = min(lo + stage, num_perm)
            agree[alive] += (
                G[i_c[alive], lo:hi] == G[j_c[alive], lo:hi]
            ).sum(axis=1)
            alive = alive[agree[alive] + (num_perm - hi) >= need]
            if alive.size == 0:
                break
        if alive.size:
            ok = alive[agree[alive] >= need]
            keep[base + ok] = True
            agree_out[base + ok] = agree[ok]
    return keep, agree_out


def _confirm_block(buckets: np.ndarray, codes: np.ndarray, G_full: np.ndarray,
                   row_map: np.ndarray, cap: int, need: int, num_perm: int):
    """Bucket-sorted block → confirmed (block_i, block_j, agree) triples.

    ``codes`` are order-preserving integer ids per block row (global rank
    in the broadcast flavor, block rank in the local flavor);
    ``row_map[block_position]`` is the row index into ``G_full``.

    Two regimes, chosen per bucket run:

    - short runs (< _LOCAL_RUN_MIN): pairs from all runs of one length are
      confirmed in one batched pass — gather volume ≈ pair count × 2 rows.
    - long runs (the flood case — C(n,2) pairs per bucket): the bucket's n
      rows are gathered ONCE into a local matrix that stays cache-resident
      (2000 rows × 512 B ≈ 1 MiB) and all pairs compare against it.
      Per-pair gathers here measured 2x slower at 32-way concurrency than
      at 8 (DRAM random-access collapse); the local matrix restores
      near-linear scaling.
    """
    n_rows = buckets.shape[0]
    run_starts = np.concatenate([[0], np.nonzero(buckets[1:] != buckets[:-1])[0] + 1])
    run_lens = np.diff(np.concatenate([run_starts, [n_rows]])).astype(np.int64)
    multi = run_lens >= 2
    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    out_agree: list[np.ndarray] = []
    if not multi.any():
        return out_i, out_j, out_agree
    starts_m = run_starts[multi]
    lens_m = run_lens[multi]

    # --- regime 1: short runs, batched by length, per-pair gathers
    short = lens_m < _LOCAL_RUN_MIN
    pair_i: list[np.ndarray] = []
    pair_j: list[np.ndarray] = []
    for length in np.unique(lens_m[short]):
        s_l = starts_m[lens_m == length]
        iu, ju = np.triu_indices(int(length), k=1)
        pair_i.append((s_l[:, None] + iu[None, :]).ravel())
        pair_j.append((s_l[:, None] + ju[None, :]).ravel())
    if pair_i:
        I = np.concatenate(pair_i)
        J = np.concatenate(pair_j)
        ci = codes[I]
        cj = codes[J]
        keepm = ci != cj
        I, J = I[keepm], J[keepm]
        # dedup: a pair can agree on several bands in this partition
        ci, cj = codes[I], codes[J]
        lo_c = np.minimum(ci, cj)
        hi_c = np.maximum(ci, cj)
        fused = lo_c * np.int64(codes.max() + 2) + hi_c
        _, first = np.unique(fused, return_index=True)
        I, J = I[first], J[first]
        keep, agree = _staged_confirm(G_full, row_map[I], row_map[J], need, num_perm)
        if keep.any():
            out_i.append(I[keep])
            out_j.append(J[keep])
            out_agree.append(agree[keep])

    # --- regime 2: long runs, bucket-local matrix (star+chain above cap)
    for s, n in zip(starts_m[~short], lens_m[~short]):
        n = int(n)
        pos = np.arange(s, s + n, dtype=np.int64)
        G = np.ascontiguousarray(G_full[row_map[pos]])
        if n <= cap:
            iu, ju = np.triu_indices(n, k=1)
        else:
            # star + chain: connectivity-preserving cap for flooded buckets
            # (north rule skew handling); drop accounted in metrics
            star_i = np.zeros(n - 1, dtype=np.int64)
            star_j = np.arange(1, n, dtype=np.int64)
            chain_i = np.arange(1, n - 1, dtype=np.int64)
            iu = np.concatenate([star_i, chain_i])
            ju = np.concatenate([star_j, chain_i + 1])
            from epstein_pipeline_ray.state import metrics

            metrics.inc("lsh.buckets_capped")
            metrics.inc("lsh.pairs_capped", n * (n - 1) // 2 - (2 * n - 3))
        keep, agree = _staged_confirm(G, iu, ju, need, num_perm)
        if keep.any():
            ki, kj = iu[keep], ju[keep]
            same = codes[pos[ki]] == codes[pos[kj]]
            if same.any():
                ki, kj, ag = ki[~same], kj[~same], agree[keep][~same]
            else:
                ag = agree[keep]
            out_i.append(pos[ki])
            out_j.append(pos[kj])
            out_agree.append(ag)
    return out_i, out_j, out_agree


def _need(threshold: float, num_perm: int) -> int:
    """Smallest agreement count c with c/num_perm >= threshold."""
    return int(np.ceil(threshold * num_perm - 1e-12))


def _pairs_table(a, b, eq: np.ndarray) -> pa.Table:
    from epstein_pipeline_ray.stages.exact import PAIRS_SCHEMA

    sc = np.round(eq, 4)
    return pa.table(
        {
            "id_a": pa.array(list(a), pa.string()),
            "id_b": pa.array(list(b), pa.string()),
            "score": pa.array(sc, pa.float64()),
            "method": pa.array(["minhash"] * len(sc), pa.string()),
            "reason": pa.array(
                [f"MinHash Jaccard similarity: {s:.2%}" for s in sc], pa.string()
            ),
        },
        schema=PAIRS_SCHEMA,
    )


_BCAST_CACHE: dict[str, dict] = {}


def _make_bucket_fn_broadcast(cfg: DedupConfig, ids_ref, sigs_ref):
    """Bucket block fn, broadcast flavor: the block carries ids only; the
    globally-sorted sig matrix arrives via plasma (zero-copy per node)."""
    threshold = cfg.jaccard_threshold
    cap = cfg.max_bucket_size
    num_perm = cfg.num_perm
    need = _need(threshold, num_perm)
    key = ids_ref.hex()

    def bucket_confirm(batch: pa.Table) -> pa.Table:
        from epstein_pipeline_ray.stages.exact import PAIRS_SCHEMA

        if batch.num_rows < 2:
            return PAIRS_SCHEMA.empty_table()
        state = _BCAST_CACHE.get(key)
        if state is None:
            ids_l = ray.get(ids_ref)
            state = {
                "ids": ids_l,
                "idx": {v: i for i, v in enumerate(ids_l)},
                "sigs": ray.get(sigs_ref),
            }
            _BCAST_CACHE.clear()
            _BCAST_CACHE[key] = state
        idx = state["idx"]
        S = state["sigs"]
        ids_sorted = state["ids"]
        buckets = np.asarray(batch["bucket"].to_numpy(zero_copy_only=False))
        conv = batch["conv_id"].to_pylist()
        # global index == global string rank (ids_ref is sorted)
        codes = np.fromiter((idx[v] for v in conv), dtype=np.int64, count=len(conv))
        out_i, out_j, out_agree = _confirm_block(
            buckets, codes, S, codes, cap, need, num_perm
        )
        if not out_i:
            return PAIRS_SCHEMA.empty_table()
        I = np.concatenate(out_i)
        J = np.concatenate(out_j)
        agree = np.concatenate(out_agree)
        gi = codes[I]
        gj = codes[J]
        lo_g = np.minimum(gi, gj)
        hi_g = np.maximum(gi, gj)
        eq = agree / float(num_perm)
        a = [ids_sorted[g] for g in lo_g]
        b = [ids_sorted[g] for g in hi_g]
        return _pairs_table(a, b, eq)

    return bucket_confirm


def _make_bucket_fn_local(cfg: DedupConfig):
    """Bucket block fn, scale flavor: signatures ride the band rows."""
    threshold = cfg.jaccard_threshold
    cap = cfg.max_bucket_size
    num_perm = cfg.num_perm
    need = _need(threshold, num_perm)

    def bucket_confirm(batch: pa.Table) -> pa.Table:
        from epstein_pipeline_ray.stages.exact import PAIRS_SCHEMA

        if batch.num_rows < 2:
            return PAIRS_SCHEMA.empty_table()
        buckets = np.asarray(batch["bucket"].to_numpy(zero_copy_only=False))
        conv = batch["conv_id"]
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        dict_arr = conv.dictionary_encode()
        codes_raw = np.asarray(dict_arr.indices)
        uniq = np.asarray(dict_arr.dictionary.to_pylist(), dtype=object)
        order_u = np.argsort(uniq, kind="stable")
        rank = np.empty(order_u.shape[0], dtype=np.int64)
        rank[order_u] = np.arange(order_u.shape[0], dtype=np.int64)
        codes = rank[codes_raw]
        uniq_sorted = uniq[order_u]
        S = _mat_from_bin(batch["sig_bin"], num_perm)
        row_map = np.arange(batch.num_rows, dtype=np.int64)
        out_i, out_j, out_agree = _confirm_block(
            buckets, codes, S, row_map, cap, need, num_perm
        )
        if not out_i:
            return PAIRS_SCHEMA.empty_table()
        I = np.concatenate(out_i)
        J = np.concatenate(out_j)
        agree = np.concatenate(out_agree)
        ci = codes[I]
        cj = codes[J]
        lo_c = np.minimum(ci, cj)
        hi_c = np.maximum(ci, cj)
        eq = agree / float(num_perm)
        a = uniq_sorted[lo_c].tolist()
        b = uniq_sorted[hi_c].tolist()
        return _pairs_table(a, b, eq)

    return bucket_confirm


def _dedup_pairs_block(batch: pa.Table) -> pa.Table:
    """Globally distinct pairs: scores for a given pair are identical
    across bands/blocks (pure function of the two signatures), so keeping
    any row is exact."""
    from epstein_pipeline_ray.stages.exact import PAIRS_SCHEMA

    if batch.num_rows == 0:
        return batch.cast(PAIRS_SCHEMA)
    batch = batch.combine_chunks().sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")])
    ca = np.asarray(batch["id_a"].combine_chunks().dictionary_encode().indices)
    cb = np.asarray(batch["id_b"].combine_chunks().dictionary_encode().indices)
    dup = np.zeros(batch.num_rows, dtype=bool)
    dup[1:] = (ca[1:] == ca[:-1]) & (cb[1:] == cb[:-1])
    return batch.filter(pa.array(~dup)).cast(PAIRS_SCHEMA)


def minhash_raw_pairs(docs: Dataset, cfg: DedupConfig,
                      num_partitions: int | None = None) -> Dataset:
    """MinHash/LSH pass: docs → confirmed pairs, block-deduped but NOT yet
    globally distinct (a pair that collides in two bands landing in
    different partitions surfaces twice — the pipeline's merge exchange
    removes it)."""
    import os
    import time

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    detail = os.environ.get("EPR_TIMING")
    t0 = time.time()
    sig_ds = signature_rows(docs, cfg).materialize()  # consumed twice
    n_sigs = sig_ds.count()
    if detail:
        print(f"[epr-minhash] signatures {time.time() - t0:.1f}s ({n_sigs} rows)",
              flush=True)
        t0 = time.time()
    if n_sigs <= cfg.broadcast_sig_rows_limit:
        tables = [t for t in ray.get(sig_ds.to_arrow_refs()) if t.num_rows]
        if not tables:
            from epstein_pipeline_ray.stages.exact import PAIRS_SCHEMA

            import ray.data as rd

            return rd.from_arrow(PAIRS_SCHEMA.empty_table())
        # Arrow-native sort: utf8 byte order == Python str order (UTF-8
        # preserves codepoint order), so ranks stay consistent with every
        # other stage's string-canonical pair ordering
        tbl = pa.concat_tables(tables).combine_chunks()
        tbl = tbl.sort_by([("conv_id", "ascending")])
        n_rows = tbl.num_rows
        ids_ref = ray.put(tbl["conv_id"].to_pylist())
        sigs_sorted = np.asarray(
            tbl["sig"].combine_chunks().flatten()
        ).reshape(n_rows, -1)
        sigs_ref = ray.put(np.ascontiguousarray(sigs_sorted))
        bands_ds = band_rows(sig_ds, cfg, with_sig=False)
        fn = _make_bucket_fn_broadcast(cfg, ids_ref, sigs_ref)
        if detail:
            print(f"[epr-minhash] broadcast-prep {time.time() - t0:.1f}s", flush=True)
            t0 = time.time()
    else:
        bands_ds = band_rows(sig_ds, cfg, with_sig=True)
        fn = _make_bucket_fn_local(cfg)
    out = map_key_blocks(bands_ds, ["bucket"], fn, num_partitions)
    if detail:
        out = out.materialize()
        print(f"[epr-minhash] bucket+confirm {time.time() - t0:.1f}s "
              f"({out.count()} rows)", flush=True)
    return out


def minhash_pairs(docs: Dataset, cfg: DedupConfig,
                  num_partitions: int | None = None) -> Dataset:
    """Full MinHash/LSH pass: docs → confirmed, globally-distinct pairs."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    raw = minhash_raw_pairs(docs, cfg, num_partitions)
    return map_key_blocks(raw, ["id_a", "id_b"], _dedup_pairs_block, num_partitions)


# ---------------------------------------------------------------------------
# oracle-exact variant: LSH candidates + TRUE shingle-set Jaccard confirm
# ---------------------------------------------------------------------------

_TRUE_CAND_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
_TRUE_PAIRS_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]
)


def minhash_true_jaccard_pairs(
    docs: Dataset,
    threshold: float = 0.8,
    k: int = 5,
    bands: int = 64,
    rows: int = 2,
    seed: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> Dataset:
    """MinHash-LSH candidate generation confirmed by the TRUE char-k-shingle
    set Jaccard — the oracle-exact sibling of :func:`minhash_pairs`
    (VERDICT r1 item 9).

    LSH here is candidates only: with the wide-recall default banding
    (r=2 x b=64) a pair sitting exactly at jaccard 0.8 shares a band with
    probability 0.64, so the miss probability is 0.36^64 ~ 4e-29 — the
    output equals the exact threshold-Jaccard self-join on any realistic
    corpus, and is verified pair-for-pair against a DuckDB brute-force
    shingle-set oracle. The confirm statistic uses 64-bit shingle hashes
    (:func:`shingle_hashes64`) so hash-vs-string-set divergence is
    ~2^-64 per shingle pair, invisible at 6-decimal rounding.

    Scale shape: shingle sets do NOT ride the (x bands) band rows — band
    rows are (bucket, id) only, candidate pairs are made globally distinct
    FIRST, and the two per-side set attachments go through the
    size-switched ``attach_column`` exchange, so set bytes cross the wire
    once per confirmed candidate side, not once per band. No
    ``max_bucket_size`` cap: this operator promises the exact join, so a
    degenerate all-identical corpus costs O(n^2) pairs — the same rows the
    oracle emits. Reference semantics: dedup.py:332-398 (LSH index +
    confirm), with the signature-estimate confirm replaced by the true set
    statistic.
    """
    from epstein_pipeline_ray.functions.minhash import shingle_hashes64, signature
    from epstein_pipeline_ray.functions.normalize import normalize_text
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    num_perm = bands * rows

    def base_stage(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        sh: list[np.ndarray] = []
        sigs = np.empty((n, num_perm), dtype=np.uint32)
        for i, t in enumerate(texts):
            h64 = shingle_hashes64(normalize_text(t or ""), k)
            sh.append(h64)
            sigs[i] = signature(h64, num_perm, seed)
        bk = band_keys(sigs, bands, rows)
        return pa.table(
            {
                "id": batch[id_col].cast(pa.int64()),
                "sh": pa.array([a.tolist() for a in sh], pa.list_(pa.uint64())),
                "bk": pa.array([r.tolist() for r in bk], pa.list_(pa.uint64())),
            }
        )

    base = docs.map_batches(
        base_stage, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed twice: band explode + set attach
    sets = base.select_columns(["id", "sh"])

    def explode_bands(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema([("bucket", pa.uint64()), ("id", pa.int64())]).empty_table()
        bkcol = batch["bk"]
        if isinstance(bkcol, pa.ChunkedArray):
            bkcol = bkcol.combine_chunks()
        ids = np.asarray(batch["id"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "bucket": bkcol.values,
                "id": pa.array(np.repeat(ids, bands), pa.int64()),
            }
        )

    band_ds = base.select_columns(["id", "bk"]).map_batches(
        explode_bands, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_pairs(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _TRUE_CAND_SCHEMA.empty_table()
        b = np.asarray(block["bucket"].to_numpy(zero_copy_only=False))
        ids = np.asarray(block["id"].to_numpy(zero_copy_only=False))
        starts = np.concatenate(
            [[0], np.nonzero(b[1:] != b[:-1])[0] + 1, [len(b)]]
        ).astype(np.int64)
        outs_a: list[np.ndarray] = []
        outs_b: list[np.ndarray] = []
        for s, e in zip(starts[:-1], starts[1:]):
            m = int(e - s)
            if m < 2:
                continue
            I, J = np.triu_indices(m, 1)
            gi = ids[s:e]
            outs_a.append(gi[I])
            outs_b.append(gi[J])
        if not outs_a:
            return _TRUE_CAND_SCHEMA.empty_table()
        a = np.concatenate(outs_a)
        bb = np.concatenate(outs_b)
        lo = np.minimum(a, bb)
        hi = np.maximum(a, bb)
        # two bands of the same doc can collide into one bucket value
        nontriv = lo != hi
        lo, hi = lo[nontriv], hi[nontriv]
        if lo.size == 0:
            return _TRUE_CAND_SCHEMA.empty_table()
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        keep = np.concatenate([[True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])])
        return pa.table({"id_a": pa.array(lo[keep]), "id_b": pa.array(hi[keep])})

    cand = map_key_blocks(band_ds, ["bucket"], bucket_pairs, num_partitions)

    def distinct_pairs(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _TRUE_CAND_SCHEMA.empty_table()
        a = np.asarray(block["id_a"].to_numpy(zero_copy_only=False))
        b = np.asarray(block["id_b"].to_numpy(zero_copy_only=False))
        keep = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        return block.filter(pa.array(keep)).cast(_TRUE_CAND_SCHEMA)

    pairs = map_key_blocks(cand, ["id_a", "id_b"], distinct_pairs, num_partitions)
    pairs = attach_column(pairs, sets, "id_a", "id", "sh", "sh_a",
                          num_partitions=num_partitions)
    pairs = attach_column(pairs, sets, "id_b", "id", "sh", "sh_b",
                          num_partitions=num_partitions)

    def confirm(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _TRUE_PAIRS_SCHEMA.empty_table()
        sa = batch["sh_a"]
        sb = batch["sh_b"]
        if isinstance(sa, pa.ChunkedArray):
            sa = sa.combine_chunks()
        if isinstance(sb, pa.ChunkedArray):
            sb = sb.combine_chunks()
        va, oa = np.asarray(sa.values), np.asarray(sa.offsets)
        vb, ob = np.asarray(sb.values), np.asarray(sb.offsets)
        n = batch.num_rows
        jac = np.empty(n, np.float64)
        for i in range(n):
            A = va[oa[i] : oa[i + 1]]
            B = vb[ob[i] : ob[i + 1]]
            inter = np.intersect1d(A, B, assume_unique=True).size
            jac[i] = inter / float(A.size + B.size - inter)
        mask = jac >= threshold  # unrounded compare, exactly as the SQL WHERE
        out = batch.select(["id_a", "id_b"]).filter(pa.array(mask))
        return out.append_column(
            "jaccard", pa.array(sql_round(jac[mask], 6), pa.float64())
        ).cast(_TRUE_PAIRS_SCHEMA)

    return pairs.map_batches(confirm, batch_format="pyarrow", zero_copy_batch=True)
