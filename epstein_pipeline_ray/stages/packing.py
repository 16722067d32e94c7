"""Training-sequence packing bookkeeping: concat-then-chunk assignment
of documents to fixed-length training samples (the GPT-style "pack all
tokens, cut every seq_len" assembly), computed as a DISTRIBUTED
two-phase prefix sum — no stage ever sees more than one id-range bucket
of the corpus, and the only driver-side object is one subtotal row per
bucket.

For each doc (in ascending id order): cum_before = total tokens of all
earlier docs; then
  sample_idx        = cum_before // seq_len   (first sample it lands in)
  sample_offset     = cum_before %  seq_len   (position inside it)
  n_samples_spanned = how many samples its tokens straddle.

Plan: map-side token counts → bucket = id // bucket_width → per-bucket
token subtotals via grouped_stats partials (tiny: one row per bucket)
→ exclusive prefix over the subtotal table on the driver (bounded by
n_buckets; pick bucket_width ≈ sqrt(corpus rows) so the driver table is
~sqrt(N) rows — 10^6 rows at 10^12 docs) → broadcast base offsets →
one keyed exchange on the bucket + vectorized in-bucket cumsum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

def _pack_schema(id_col: str) -> pa.Schema:
    # built from id_col so non-default id columns keep their name
    # (ADVICE r2: fixed output schemas silently rename id columns)
    return pa.schema(
        [
            (id_col, pa.int64()),
            ("n_tokens", pa.int64()),
            ("sample_idx", pa.int64()),
            ("sample_offset", pa.int64()),
            ("n_samples_spanned", pa.int64()),
        ]
    )


def pack_sequences(
    docs: Dataset,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 65_536,
    num_partitions: int | None = None,
) -> Dataset:
    """Assign every doc its packed-sample coordinates (see module doc).

    Ids must be integers; ordering is ascending ``id_col``. Token counts
    are single-space whitespace tokens (with_token_counts — empty text
    counts 0 and spans 0 samples).
    """
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.relational import grouped_stats
    from epstein_pipeline_ray.stages.transcript_ops import with_token_counts

    counted = with_token_counts(docs.select_columns([id_col, text_col]))
    counted = counted.select_columns([id_col, "n_tokens"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = pc.divide(batch[id_col], pa.scalar(bucket_width, pa.int64()))
        return batch.append_column("__bucket", pc.cast(b, pa.int64()))

    bucketed = counted.map_batches(add_bucket, batch_format="pyarrow",
                                   zero_copy_batch=True)

    # phase 1: one subtotal row per bucket (partial pre-agg inside
    # grouped_stats keeps the exchange tiny), exclusive prefix on the
    # driver — n_buckets rows only
    subtot = grouped_stats(bucketed.select_columns(["__bucket", "n_tokens"]),
                           ["__bucket"], sum_cols=["n_tokens"]).to_pandas()
    subtot = subtot.sort_values("__bucket").reset_index(drop=True)
    bucket_ids = subtot["__bucket"].to_numpy(np.int64)
    sums = subtot["sum_n_tokens"].to_numpy(np.float64).astype(np.int64)
    bases = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)
    base_ref = ray.put((bucket_ids, bases))

    out_schema = _pack_schema(id_col)

    def per_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        b_ids, b_bases = ray.get(base_ref)
        df = block.to_pandas().sort_values(id_col, kind="mergesort")
        ids = df[id_col].to_numpy(np.int64)
        toks = df["n_tokens"].to_numpy(np.int64)
        bucket = df["__bucket"].to_numpy(np.int64)
        # in-bucket exclusive cumsum (ids sorted => buckets are runs)
        cums = np.cumsum(toks)
        excl = cums - toks
        starts = np.concatenate(
            [[0], np.nonzero(bucket[1:] != bucket[:-1])[0] + 1]).astype(np.int64)
        run_id = np.cumsum(np.concatenate(
            [[0], (bucket[1:] != bucket[:-1]).astype(np.int64)]))
        excl = excl - excl[starts][run_id]
        base = b_bases[np.searchsorted(b_ids, bucket)]
        cum_before = base + excl
        sample_idx = cum_before // seq_len
        spanned = np.where(
            toks == 0, 0,
            (cum_before + toks - 1) // seq_len - sample_idx + 1)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(toks, pa.int64()),
            "sample_idx": pa.array(sample_idx, pa.int64()),
            "sample_offset": pa.array(cum_before % seq_len, pa.int64()),
            "n_samples_spanned": pa.array(spanned.astype(np.int64), pa.int64()),
        }, schema=out_schema)

    return map_key_blocks(bucketed, ["__bucket"], per_block, num_partitions,
                          sort_blocks=False)


def padding_waste(
    ds,
    len_col: str = "n_chars",
    max_pow: int = 63,
):
    """Power-of-two padding-waste report — the batch-shape diagnostic
    for fixed-bucket training loaders: each row pads up to the next
    power of two; per bucket, the row count, the padded total and the
    wasted share. Integer-exact bucket assignment on both engines (the
    twin picks min power >= len from a generate_series powers table;
    here it's one searchsorted against the same array). One bounded
    exchange (≤ max_pow rows per batch partial). Output:
    (bucket, n, total_len, padded_len, waste_pct)."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from epstein_pipeline_ray.functions.rounding import sql_round

    # powers up to 2**(max_pow-1); 63 keeps bucket >= len for any
    # realistic int64 length (2**63 itself would overflow int64)
    powers = np.left_shift(np.int64(1),
                           np.arange(min(max_pow, 63), dtype=np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        n = np.asarray(batch[len_col].to_numpy(zero_copy_only=False),
                       np.int64)
        idx = np.searchsorted(powers, n, side="left")
        if idx.size and idx.max() >= len(powers):
            # clamping would assign a bucket SMALLER than the row
            # (negative waste) while the SQL twin's min(pw >= len)
            # yields NULL — fail loudly instead of diverging silently
            raise ValueError(
                f"{len_col} exceeds the largest padding bucket "
                f"2**{len(powers) - 1}; raise max_pow")
        bucket = powers[idx]
        df = pd.DataFrame({"bucket": bucket, "__len": n})
        g = df.groupby("bucket", sort=False).agg(
            __n=("__len", "size"), __tl=("__len", "sum")).reset_index()
        return pa.table({
            "bucket": pa.array(g["bucket"].to_numpy(np.int64), pa.int64()),
            "__n": pa.array(g["__n"].to_numpy(np.int64), pa.int64()),
            "__tl": pa.array(g["__tl"].to_numpy(np.int64), pa.int64()),
        })

    agg = ds.select_columns([len_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bucket").aggregate(
        Sum("__n", alias_name="n"), Sum("__tl", alias_name="total_len"))

    def finalize(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch["bucket"].to_numpy(zero_copy_only=False),
                       np.int64)
        n = np.asarray(batch["n"].to_numpy(zero_copy_only=False), np.int64)
        tl = np.asarray(batch["total_len"].to_numpy(zero_copy_only=False),
                        np.int64)
        padded = b * n
        waste = (padded - tl).astype(np.float64) / padded.astype(np.float64)
        return pa.table({
            "bucket": batch["bucket"], "n": batch["n"],
            "total_len": batch["total_len"],
            "padded_len": pa.array(padded, pa.int64()),
            "waste_pct": pa.array(sql_round(waste, 6), pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)
