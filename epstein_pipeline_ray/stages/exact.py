"""Exact dedup pass: content-hash grouping → duplicate pairs.

Reference semantics: SHA-256 of normalized text, groups of >= 2 emit all
C(n,2) pairs with score 1.0, canonical (min,max) id order
(reference: src/epstein_pipeline/processors/dedup.py:92-95, 247-273).

Ray shape: vectorized hash column in ``map_batches`` (zero-copy Arrow)
followed by a hash-shuffle on content_hash and ONE vectorized pass per
key-sorted block (stages.groupblock) — the shuffle replaces the
reference's driver-side dict, the block pass replaces per-group UDF
dispatch.
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from epstein_pipeline_ray.functions.normalize import content_hash_array, normalize_array
from epstein_pipeline_ray.stages.groupblock import encode_groups, group_starts, map_key_blocks

# SHA-256 of the empty string — the shared hash of every blank /
# whitespace-only document after normalization. The reference excludes
# blank docs from dedup entirely (dedup.py:250 `if doc.ocrText and
# doc.ocrText.strip()`, mirrored in oracle/refsem.py), so rows with this
# hash must never pair: a blank-heavy corpus would otherwise emit an
# unbounded C(n,2) clique of false "exact" pairs.
EMPTY_TEXT_HASH = "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"

PAIRS_SCHEMA = pa.schema(
    [
        ("id_a", pa.string()),
        ("id_b", pa.string()),
        ("score", pa.float64()),
        ("method", pa.string()),
        ("reason", pa.string()),
    ]
)


def with_content_hash(docs: Dataset, text_col: str = "text") -> Dataset:
    """Append a ``content_hash`` column (SHA-256 of normalized text)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        norm = normalize_array(batch[text_col])
        return batch.append_column("content_hash", content_hash_array(norm))

    return docs.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)


def _exact_pairs_block(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return PAIRS_SCHEMA.empty_table()
    codes = encode_groups(batch, "content_hash")
    ids = batch["conv_id"].to_pylist()
    starts = group_starts(codes)
    ends = np.concatenate([starts[1:], [len(codes)]]).astype(np.int64)
    out_a: list[str] = []
    out_b: list[str] = []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        group = sorted(ids[s:e])
        for a, b in itertools.combinations(group, 2):
            out_a.append(a)
            out_b.append(b)
    n = len(out_a)
    return pa.table(
        {
            "id_a": pa.array(out_a, pa.string()),
            "id_b": pa.array(out_b, pa.string()),
            "score": pa.array([1.0] * n, pa.float64()),
            "method": pa.array(["exact"] * n, pa.string()),
            "reason": pa.array(["exact content hash match"] * n, pa.string()),
        },
        schema=PAIRS_SCHEMA,
    )


def exact_pairs(docs_hashed: Dataset, num_partitions: int | None = None) -> Dataset:
    """SHUFFLE key=content_hash → all-pairs per group, score 1.0.

    Group blowup note: a group of n identical docs emits C(n,2) pairs, same
    as the reference. Callers at extreme duplicate rates should dedupe to
    representatives before the MinHash pass (pipeline.minhash_on_reps) so
    the blowup stays confined to this cheap id-only stage.
    """
    import pyarrow.compute as pc

    pruned = docs_hashed.select_columns(["conv_id", "content_hash"]).map_batches(
        lambda b: b.filter(pc.not_equal(b["content_hash"], EMPTY_TEXT_HASH)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return map_key_blocks(pruned, ["content_hash"], _exact_pairs_block, num_partitions)


def _rep_ids_block(batch: pa.Table) -> pa.Table:
    """(conv_id, content_hash) sorted block → min conv_id per hash group."""
    if batch.num_rows == 0:
        return pa.table({"conv_id": pa.array([], pa.string())})
    codes = encode_groups(batch, "content_hash")
    ids = batch["conv_id"].to_pylist()
    starts = group_starts(codes)
    ends = np.concatenate([starts[1:], [len(codes)]]).astype(np.int64)
    keep = [s + min(range(e - s), key=lambda i: ids[s + i]) for s, e in zip(starts, ends)]
    return pa.table({"conv_id": batch["conv_id"].take(pa.array(keep, pa.int64()))})


def hash_representatives(docs_hashed: Dataset, num_partitions: int | None = None,
                         broadcast_ids_limit: int = 5_000_000) -> Dataset:
    """One representative doc per content-hash group (min conv_id).

    Scale path for the MinHash pass: identical texts share identical
    signatures, so running LSH once per distinct text removes the largest
    skew source; exact pairs restore full-cluster connectivity.

    Only the id/hash projection goes through the rep-picking exchange —
    shuffling the full text corpus to pick ids measured ~7x the cost. The
    winning-id filter is a ``key_membership_join`` semi-join: one plasma
    Arrow array + vectorized ``pc.is_in`` below ``broadcast_ids_limit``,
    and the partitioned-file exchange join above it (the 10^12 path where
    the rep-id set itself is corpus-scale and no node can hold it)."""
    from epstein_pipeline_ray.stages.joins import key_membership_join

    pruned = docs_hashed.select_columns(["conv_id", "content_hash"])
    rep_ids = map_key_blocks(pruned, ["content_hash"], _rep_ids_block, num_partitions)
    return key_membership_join(
        docs_hashed, rep_ids, "conv_id", mode="semi",
        broadcast_rows_limit=broadcast_ids_limit, num_partitions=num_partitions,
    )


def soft_dedup_weights(docs: Dataset, id_col: str = "doc_id",
                       text_col: str = "text",
                       num_partitions: int | None = None) -> Dataset:
    """Soft deduplication: instead of DROPPING duplicates, weight every
    doc by the inverse size of its exact-duplicate group (normalized
    text), so duplicated content is down-sampled rather than removed —
    the reweighting alternative to hard dedup (He et al., "SoftDedup",
    ACL 2024). Composable as a sampling-weight column for training-data
    assembly.

    Blank-normalized docs follow the engine's exact-pass convention
    (they never group — ADVICE r1): each keeps n_copies=1, weight=1.0.
    Plan: content hash map-side → ids-only keyed exchange on the hash →
    vectorized run sizes per block. Output: (id, n_copies:int64,
    weight:float64 rounded 6).
    """
    import pyarrow.compute as pc

    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    hashed = with_content_hash(docs.select_columns([id_col, text_col]),
                               text_col=text_col)
    pruned = hashed.select_columns([id_col, "content_hash"])

    def per_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({id_col: block[id_col],
                             "n_copies": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.float64())})
        block = block.combine_chunks().sort_by(
            [("content_hash", "ascending")])
        hcol = block["content_hash"]
        if isinstance(hcol, pa.ChunkedArray):
            hcol = hcol.combine_chunks()
        codes = np.asarray(hcol.dictionary_encode().indices)
        first = np.zeros(codes.size, dtype=bool)
        first[0] = True
        first[1:] = codes[1:] != codes[:-1]
        run_id = np.cumsum(first) - 1
        sizes = np.bincount(run_id)
        n_copies = sizes[run_id]
        blank = np.asarray(pc.equal(hcol, EMPTY_TEXT_HASH)
                           .to_numpy(zero_copy_only=False))
        n_copies = np.where(blank, 1, n_copies).astype(np.int64)
        return pa.table({
            id_col: block[id_col],
            "n_copies": pa.array(n_copies, pa.int64()),
            "weight": pa.array(sql_round(1.0 / n_copies.astype(np.float64), 6),
                               pa.float64()),
        })

    return map_key_blocks(pruned, ["content_hash"], per_block, num_partitions,
                          sort_blocks=False)


def dataset_diff(
    old: Dataset,
    new: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> Dataset:
    """Version diff between two releases of a corpus: one row per
    changed key — ``status`` in {'added', 'removed', 'changed'}
    (unchanged rows are dropped). Content identity is the normalized
    SHA-256 (the exact-dedup convention), so the comparison ships
    hashes, never text; the FULL OUTER join is joins.hash_join's
    exchange plan (unmatched keys on either side surface as typed
    nulls)."""
    import pyarrow.compute as pc

    from epstein_pipeline_ray.stages.joins import hash_join

    def hashed(ds: Dataset) -> Dataset:
        h = with_content_hash(ds.select_columns([id_col, text_col]),
                              text_col=text_col)
        return h.select_columns([id_col, "content_hash"])

    j = hash_join(hashed(old), hashed(new), id_col, how="outer",
                  num_partitions=num_partitions)

    def flag(batch: pa.Table) -> pa.Table:
        hl = batch["content_hash_l"]
        hr = batch["content_hash_r"]
        added = pc.is_null(hl)
        removed = pc.is_null(hr)
        changed = pc.and_kleene(
            pc.and_kleene(pc.is_valid(hl), pc.is_valid(hr)),
            pc.not_equal(hl, hr))
        changed = pc.fill_null(changed, False)
        status = pc.if_else(added, pa.scalar("added"),
                            pc.if_else(removed, pa.scalar("removed"),
                                       pa.scalar("changed")))
        keep = pc.or_(pc.or_(added, removed), changed)
        out = pa.table({id_col: batch[id_col], "status": status})
        return out.filter(keep)

    return j.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def dup_rate_by_group(docs: Dataset, group_col: str = "source",
                      id_col: str = "doc_id", text_col: str = "text",
                      round_digits: int = 9,
                      num_partitions: int | None = None) -> Dataset:
    """Per-``group_col`` exact-duplicate exposure report: of each
    group's docs, how many share their normalized content hash with ANY
    other doc in the WHOLE corpus (cross-group duplication counts), and
    the resulting dup rate. The corpus-health headline a dedup run
    starts from.

    Plan: content hash per batch -> hash-keyed exchange for global
    group sizes (hashes+group ship, never text) -> per-group aggregate
    in a second exchange. Twin groups by the normalized text itself
    (equivalent partition — the oracle convention of exact_dedup_docs★).
    Output: (group_col, n_docs, n_dup_docs, dup_rate)."""
    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    gtype = dict(zip(docs.schema().names, docs.schema().types))[group_col]
    hashed = with_content_hash(docs.select_columns(
        [id_col, group_col, text_col]), text_col=text_col)

    ROW = pa.schema([("h", pa.string()), (group_col, gtype)])

    def prune(batch: pa.Table) -> pa.Table:
        return pa.table({"h": batch["content_hash"],
                         group_col: batch[group_col]}, schema=ROW)

    rows = hashed.map_batches(prune, batch_format="pyarrow",
                              zero_copy_batch=True)

    FLAG = pa.schema([(group_col, gtype), ("dup", pa.int8())])

    def flag_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return FLAG.empty_table()
        df = block.to_pandas()
        sz = df.groupby("h")["h"].transform("size")
        return pa.table({
            group_col: pa.array(df[group_col], gtype, from_pandas=True),
            "dup": pa.array((sz > 1).to_numpy().astype(np.int8), pa.int8()),
        }, schema=FLAG)

    flagged = map_key_blocks(rows, ["h"], flag_block, num_partitions,
                             sort_blocks=False)

    OUT = pa.schema([(group_col, gtype), ("n_docs", pa.int64()),
                     ("n_dup_docs", pa.int64()),
                     ("dup_rate", pa.float64())])

    def agg_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        g = (block.to_pandas().groupby(group_col, sort=True)["dup"]
             .agg(n="size", nd="sum").reset_index())
        n = g["n"].to_numpy(np.float64)
        nd = g["nd"].to_numpy(np.float64)
        return pa.table({
            group_col: pa.array(g[group_col], gtype, from_pandas=True),
            "n_docs": pa.array(n.astype(np.int64), pa.int64()),
            "n_dup_docs": pa.array(nd.astype(np.int64), pa.int64()),
            "dup_rate": pa.array(sql_round(nd / n, round_digits),
                                 pa.float64()),
        }, schema=OUT)

    return map_key_blocks(flagged, [group_col], agg_block, num_partitions,
                          sort_blocks=False)
