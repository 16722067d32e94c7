"""Exact substring-level deduplication: find documents sharing a
verbatim substring of >= min_len characters and (optionally) cut the
duplicated span from the non-canonical copy — the Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better", ACL'22)
EXACTSUBSTR operation, re-expressed for Ray Data.

The reference pipeline confirms near-dup pairs with substring overlap
(reference processors/dedup.py verify tier; our stages/verify.py); this
module promotes that confirm into a standalone corpus-level dedup
operator. Physical plan — never all-pairs:

  winnowing fingerprints (window = min_len-k+1, so ANY shared substring
  of >= min_len chars shares a fingerprint — SIGMOD'03 guarantee)
    → candidate pairs via the keyed fingerprint exchange
      (dedup_extra.winnow_pairs: star+chain skew caps, run-length pair
      emission)
    → texts attached to pair rows by two size-switched attach_column
      joins (broadcast below the limit, exchange above — no process
      holds the corpus)
    → per-pair EXACT confirm: suffix-automaton longest-common-substring
      with span offsets (functions/substring.py; O(|a|+|b|) per pair,
      candidates only)
    → span removal: intervals per victim doc through one keyed
      exchange, overlap-merged, cut in one vectorized rebuild pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from epstein_pipeline_ray.functions.substring import longest_common_substring_span

_PAIR_SCHEMA = pa.schema(
    [
        ("id_a", pa.int64()),
        ("id_b", pa.int64()),
        ("span_len", pa.int64()),
        ("a_start", pa.int64()),
        ("b_start", pa.int64()),
    ]
)


def exact_substring_pairs(
    docs: Dataset,
    min_len: int = 60,
    k: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    confirm_raw: bool = False,
    num_partitions: int | None = None,
    max_bucket_size: int = 4096,
    broadcast_rows_limit: int = 2_000_000,
) -> Dataset:
    """Pairs of docs sharing a verbatim substring of >= ``min_len``
    chars, with one maximal shared span's length and offsets.

    Candidates come from winnowing at window = min_len - k + 1: the
    winnowing guarantee makes every true pair a candidate (full
    recall); the suffix-automaton confirm is exact (full precision), so
    the output is EXACTLY the >= min_len shared-substring pairs.

    ``k`` trades candidate precision against fingerprint cost at FIXED
    recall (the guarantee only needs k + window - 1 = min_len): a small
    k makes a shared k-gram — hence a spurious shared fingerprint —
    common (measured 3.9M candidates for 3.4k true pairs at k=8 on the
    sf0.1 corpus vs 5.1k at k=24), so the default scales k to
    ~0.4·min_len, capped to [8, 40].

    Fingerprints are always computed on normalized text (lowercase,
    collapsed whitespace — with_winnow_fingerprints). By default the
    confirm and the reported offsets use the same normalized text;
    ``confirm_raw=True`` confirms against the raw ``text_col`` instead
    so offsets index the original string (what span REMOVAL needs).
    Normalization only ever lengthens a shared raw span's normalized
    image, so raw-confirm keeps the recall guarantee.
    """
    from epstein_pipeline_ray.functions.normalize import normalize_array
    from epstein_pipeline_ray.stages.dedup_extra import winnow_pairs
    from epstein_pipeline_ray.stages.joins import attach_column

    if k is None:
        k = max(8, min(40, (2 * min_len) // 5))
    window = min_len - k + 1
    if window < 1:
        raise ValueError(f"min_len={min_len} must be >= k={k}")

    cands = winnow_pairs(
        docs, min_shared=1, k=k, window=window, id_col=id_col,
        text_col=text_col, num_partitions=num_partitions,
        max_bucket_size=max_bucket_size,
    ).select_columns(["id_a", "id_b"])

    if confirm_raw:
        side = docs.select_columns([id_col, text_col])
    else:
        def norm(batch: pa.Table) -> pa.Table:
            return pa.table({id_col: batch[id_col],
                             text_col: normalize_array(batch[text_col])})

        side = docs.select_columns([id_col, text_col]).map_batches(
            norm, batch_format="pyarrow", zero_copy_batch=True)

    cands = attach_column(cands, side, "id_a", id_col, text_col, "__text_a",
                          broadcast_rows_limit=broadcast_rows_limit,
                          num_partitions=num_partitions)
    cands = attach_column(cands, side, "id_b", id_col, text_col, "__text_b",
                          broadcast_rows_limit=broadcast_rows_limit,
                          num_partitions=num_partitions)

    def confirm(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        ia = batch["id_a"].to_pylist()
        ib = batch["id_b"].to_pylist()
        ta = batch["__text_a"].to_pylist()
        tb = batch["__text_b"].to_pylist()
        out = {c: [] for c in _PAIR_SCHEMA.names}
        for a_id, b_id, a, b in zip(ia, ib, ta, tb):
            ln, sa, sb = longest_common_substring_span(a or "", b or "")
            if ln >= min_len:
                out["id_a"].append(a_id)
                out["id_b"].append(b_id)
                out["span_len"].append(ln)
                out["a_start"].append(sa)
                out["b_start"].append(sb)
        return pa.table(out, schema=_PAIR_SCHEMA)

    return cands.map_batches(confirm, batch_format="pyarrow",
                             zero_copy_batch=True)


def remove_duplicate_spans(
    docs: Dataset,
    pairs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    broadcast_rows_limit: int = 2_000_000,
) -> Dataset:
    """Cut each confirmed duplicated span from the HIGHER-id doc of its
    pair (keep-first policy: the lower id keeps the canonical copy),
    merging overlapping intervals per victim doc first. ``pairs`` must
    carry raw-text offsets (exact_substring_pairs(confirm_raw=True)).

    Plan: (id_b, b_start, b_end) rows → one keyed exchange grouping a
    victim's intervals → vectorized overlap-merge per block → interval
    lists attached back to the docs by a size-switched join → one
    rebuild pass. Adds ``n_cut`` (chars removed; 0 for untouched docs).

    Like the ACL'22 implementation this is one global cut pass, not a
    fixpoint: cutting a span can in principle create a new junction
    duplicate, which a second pass would catch.
    """
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.joins import attach_column

    def to_intervals(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch["id_b"],
            "start": batch["b_start"],
            "end": pc.add(batch["b_start"], batch["span_len"]),
        })

    iv = pairs.select_columns(["id_b", "b_start", "span_len"]).map_batches(
        to_intervals, batch_format="pyarrow", zero_copy_batch=True)

    def merge_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cuts": pa.array([], pa.list_(pa.int64()))})
        df = block.to_pandas().sort_values([id_col, "start", "end"],
                                           kind="mergesort")
        ids = df[id_col].to_numpy(np.int64)
        starts = df["start"].to_numpy(np.int64)
        ends = df["end"].to_numpy(np.int64)
        out_ids: list[int] = []
        out_cuts: list[list[int]] = []
        i, n = 0, len(ids)
        while i < n:
            j = i
            flat: list[int] = []
            cs, ce = starts[i], ends[i]
            while j + 1 < n and ids[j + 1] == ids[i]:
                j += 1
                if starts[j] <= ce:
                    ce = max(ce, ends[j])
                else:
                    flat.extend((int(cs), int(ce)))
                    cs, ce = starts[j], ends[j]
            flat.extend((int(cs), int(ce)))
            out_ids.append(int(ids[i]))
            out_cuts.append(flat)
            i = j + 1
        return pa.table({id_col: pa.array(out_ids, pa.int64()),
                         "cuts": pa.array(out_cuts, pa.list_(pa.int64()))})

    merged = map_key_blocks(iv, [id_col], merge_block, num_partitions)

    out = attach_column(docs, merged, id_col, id_col, "cuts", "__cuts",
                        broadcast_rows_limit=broadcast_rows_limit,
                        num_partitions=num_partitions)

    def rebuild(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        cuts = batch["__cuts"].to_pylist()
        new_texts: list[str] = []
        n_cut: list[int] = []
        for t, c in zip(texts, cuts):
            if not c:
                new_texts.append(t)
                n_cut.append(0)
                continue
            t = t or ""
            kept: list[str] = []
            pos, removed = 0, 0
            for m in range(0, len(c), 2):
                s, e = c[m], min(c[m + 1], len(t))
                kept.append(t[pos:s])
                removed += max(0, e - s)
                pos = max(pos, e)
            kept.append(t[pos:])
            new_texts.append("".join(kept))
            n_cut.append(removed)
        i = batch.schema.get_field_index(text_col)
        batch = batch.set_column(
            i, text_col, pa.array(new_texts, batch.schema.field(text_col).type))
        batch = batch.drop_columns(["__cuts"])
        return batch.append_column("n_cut", pa.array(n_cut, pa.int64()))

    return out.map_batches(rebuild, batch_format="pyarrow", zero_copy_batch=True)
