"""Blocked entity resolution → merge map (reference J5/J6:
src/epstein_pipeline/processors/entity_resolution.py — Splink blocked
JaroWinkler linkage producing a ``merge_map: dict[old_id → canonical_id]``
applied back over documents at entity_resolution.py:276-285).

Ray shape: ONE keyed exchange on the blocking key (normalized first name
token — the reference's ``block_on(name_lower)``), then a vectorized
per-block pass: exact-name groups merge unconditionally (tier 1.0, the
reference confidence ladder's top rung, confidence.py:30-119); an
optional fuzzy tier adds JaroWinkler >= threshold pairs within the
block. Pairs collapse to canonical ids by min-label propagation (same
components machinery as the dedup clusters). The merge map is applied
via the size-switched ``attach_column`` join (stages.joins) — the
reference's J6.
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

MERGE_SCHEMA = pa.schema([("entity_id", pa.int64()), ("canonical_id", pa.int64())])


def resolve_entities(
    ds: Dataset,
    id_col: str,
    name_col: str,
    fuzzy_threshold: float | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """→ (entity_id, canonical_id), one row per input entity.

    canonical_id = min entity id of the resolved group. With
    ``fuzzy_threshold=None`` only the exact tier runs (deterministic,
    SQL-oracle-able); with a threshold, JaroWinkler pairs within the
    block join the same union."""
    from epstein_pipeline_ray.functions.fuzzy import jaro_winkler
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    def add_key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        norm = pc.utf8_lower(pc.utf8_trim_whitespace(batch[name_col]))
        first = pc.list_element(pc.split_pattern_regex(norm, r"\s+"), 0)
        return pa.table(
            {"entity_id": batch[id_col].cast(pa.int64()), "name": norm, "block_key": first}
        )

    keyed = ds.select_columns([id_col, name_col]).map_batches(
        add_key, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return MERGE_SCHEMA.empty_table()
        df = block.to_pandas()
        # exact tier: same normalized name → same group (vectorized)
        canon = df.groupby("name")["entity_id"].transform("min")
        if fuzzy_threshold is not None:
            # fuzzy tier within the block: one comparison per distinct-name
            # pair (names, not rows — the reference compares records but
            # identical names are already merged)
            reps = df.loc[df.groupby("name")["entity_id"].idxmin()]
            names = reps["name"].tolist()
            ids = reps["entity_id"].tolist()
            parent = dict(zip(df["entity_id"], canon))
            extra = []
            for (na, ia), (nb, ib) in itertools.combinations(zip(names, ids), 2):
                if jaro_winkler(na, nb) >= fuzzy_threshold:
                    extra.append((ia, ib))
            if extra:
                # tiny per-block union-find over group representatives
                p: dict[int, int] = {}

                def find(x: int) -> int:
                    while p.get(x, x) != x:
                        p[x] = p.get(p[x], p[x])
                        x = p[x]
                    return x

                for a, b in extra:
                    p.setdefault(a, a)
                    p.setdefault(b, b)
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        lo, hi = sorted((ra, rb))
                        p[hi] = lo
                canon = canon.map(lambda c: find(c) if c in p else c)
        return pa.table(
            {
                "entity_id": pa.array(df["entity_id"].to_numpy(), pa.int64()),
                "canonical_id": pa.array(canon.to_numpy(), pa.int64()),
            },
            schema=MERGE_SCHEMA,
        )

    return map_key_blocks(keyed, ["block_key"], per_block, num_partitions)


FS_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()),
     ("match_weight", pa.float64()), ("match_probability", pa.float64())]
)


def fs_score_pairs(
    ds: Dataset,
    id_col: str,
    block_col: str,
    comparisons: list[tuple[str, float, float]],
    weight_threshold: float = 0.0,
    prior: float = 0.001,
    num_partitions: int | None = None,
    max_block_size: int = 10_000,
) -> Dataset:
    """Fellegi–Sunter scored record linkage (the reference's Splink-style
    probabilistic tier, J5: entity_resolution.py — blocked comparison
    with per-field m/u probabilities → log2 Bayes-factor match weight).

    ``comparisons`` is ``[(col, m, u), ...]``: an agreeing field adds
    ``log2(m/u)``, a disagreeing field adds ``log2((1-m)/(1-u))``, and a
    field NULL on either side contributes 0 (no information — Splink's
    null treatment). ``match_probability`` is the posterior
    ``prior*2^w / (prior*2^w + 1 - prior)``.

    Ray shape: ONE keyed exchange on ``block_col``; inside each
    key-sorted block, candidate pairs are enumerated batch-wise
    (``run_candidate_pairs`` — blocks beyond ``max_block_size`` fall to
    the star+chain cap with metrics accounting) and every field compares
    via dictionary codes, so scoring is pure numpy. Weight terms
    accumulate in ``comparisons`` order with IEEE left-to-right addition
    to stay bit-equal with the SQL oracle's ``CASE + CASE + ...`` chain.
    """
    import math

    import numpy as np

    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.dedup_extra import run_candidate_pairs
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    terms = [
        (col, math.log2(m / u), math.log2((1.0 - m) / (1.0 - u)))
        for col, m, u in comparisons
    ]
    cols = [id_col, block_col] + [c for c, _, _ in comparisons]

    def block_fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows < 2:
            return FS_SCHEMA.empty_table()

        def codes_valid(name: str) -> tuple[np.ndarray, np.ndarray]:
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            enc = col.dictionary_encode()
            codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False))
            valid = np.asarray(pc.is_valid(col).to_numpy(zero_copy_only=False))
            return codes, valid

        bcodes, bvalid = codes_valid(block_col)
        # exchange partitions hold many blocks: sort by block code, pair
        # within runs (NULL block keys never pair)
        order = np.argsort(np.where(bvalid, bcodes, -1), kind="stable")
        keys = np.where(bvalid, bcodes, -1)[order]
        lo = int(np.searchsorted(keys, 0))
        I, J = run_candidate_pairs(keys[lo:], max_block_size, "fs")
        if I.size == 0:
            return FS_SCHEMA.empty_table()
        I, J = order[I + lo], order[J + lo]

        weight = np.zeros(I.size, dtype=np.float64)
        for col, wa, wd in terms:
            c, v = codes_valid(col)
            both = v[I] & v[J]
            weight = weight + np.where(
                both, np.where(c[I] == c[J], wa, wd), 0.0
            )
        keep = weight >= weight_threshold
        if not keep.any():
            return FS_SCHEMA.empty_table()
        I, J, weight = I[keep], J[keep], weight[keep]
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        bayes = np.power(2.0, weight)
        prob = prior * bayes / (prior * bayes + 1.0 - prior)
        return pa.table(
            {
                "id_a": pa.array(np.minimum(ids[I], ids[J]), pa.int64()),
                "id_b": pa.array(np.maximum(ids[I], ids[J]), pa.int64()),
                "match_weight": pa.array(sql_round(weight, 6), pa.float64()),
                "match_probability": pa.array(sql_round(prob, 6), pa.float64()),
            },
            schema=FS_SCHEMA,
        )

    return map_key_blocks(ds.select_columns(cols), [block_col], block_fn,
                          num_partitions)


def apply_merge_map(ds: Dataset, merge_map: Dataset, col: str,
                    broadcast_rows_limit: int = 2_000_000) -> Dataset:
    """Merge-map application (reference J6, entity_resolution.py:276-285):
    replace ``col`` values by their canonical id; unmapped values pass
    through. Runs as an ``attach_column`` join — vectorized Arrow
    ``index_in``/``take`` below the broadcast limit, partitioned exchange
    above it — then a ``coalesce`` (no per-row Python ``.map(lambda)``)."""
    import pyarrow.compute as pc

    from epstein_pipeline_ray.stages.joins import attach_column

    col_type = dict(zip(ds.schema().names, ds.schema().types))[col]
    with_canon = attach_column(ds, merge_map, col, "entity_id",
                               "canonical_id", "__canon",
                               broadcast_rows_limit=broadcast_rows_limit)

    def coalesce(batch: pa.Table) -> pa.Table:
        canon = batch["__canon"]
        if isinstance(canon, pa.ChunkedArray):
            canon = canon.combine_chunks()
        merged = pc.coalesce(canon.cast(col_type), batch[col])
        t = batch.drop_columns(["__canon"])
        return t.set_column(t.schema.get_field_index(col), col, merged)

    return with_canon.map_batches(coalesce, batch_format="pyarrow",
                                  zero_copy_batch=True)


def sorted_neighborhood_pairs(
    ds: Dataset,
    id_col: str,
    key_col: str,
    window: int = 4,
    bucket_chars: int = 1,
    num_partitions: int | None = None,
) -> Dataset:
    """Sorted Neighborhood Method blocking (Hernández & Stolfo
    SIGMOD'95): candidate pairs = all record pairs within ``window``
    positions of each other in the global (key, id) sort order — the
    sliding-window alternative to equality blocking for records whose
    keys are close but not equal.

    Distributed without a global sort: rows route to ORDERED value
    buckets (the key's first ``bucket_chars`` chars — bucket order IS
    key-prefix order), each key-sorted block emits its within-bucket
    window pairs vectorized, and cross-boundary pairs come from a
    BOUNDED edge stream (every bucket's first/last ``window`` rows +
    bucket sizes; any pair spanning buckets has both members within
    ``window`` of a boundary, so the edge stream provably covers it).
    The driver-side step is edge-stream-sized (2*window per nonempty
    bucket), never corpus-sized. Twin: ``row_number() OVER (ORDER BY
    key, id)`` self-join on rank distance <= window. Output:
    (id_a, id_b) with id_a earlier in sort order."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    itype = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    ROW = pa.schema([("bkt", pa.string()), ("k", pa.string()),
                     (id_col, itype)])

    def route(batch: pa.Table) -> pa.Table:
        k = batch[key_col]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        k = pc.cast(k, pa.string())
        return pa.table({
            "bkt": pc.utf8_slice_codeunits(k, 0, bucket_chars),
            "k": k,
            id_col: batch[id_col],
        }, schema=ROW)

    rows = ds.select_columns([key_col, id_col]).map_batches(
        route, batch_format="pyarrow", zero_copy_batch=True)

    PAIR = pa.schema([("id_a", itype), ("id_b", itype)])
    EDGE = pa.schema([("bkt", pa.string()), ("k", pa.string()),
                      (id_col, itype), ("pos", pa.int64()),
                      ("size", pa.int64())])

    def block_pairs(block: pa.Table) -> pa.Table:
        # a block may hold SEVERAL (non-adjacent) buckets — window
        # pairs are valid only WITHIN one bucket; boundary pairs come
        # from the edge stream
        if block.num_rows == 0:
            return PAIR.empty_table()
        df = (block.to_pandas()
              .sort_values(["bkt", "k", id_col], kind="mergesort")
              .reset_index(drop=True))
        ids = df[id_col].to_numpy()
        bkt = df["bkt"].to_numpy()
        a_parts, b_parts = [], []
        for off in range(1, window + 1):
            if len(ids) > off:
                same = bkt[off:] == bkt[:-off]
                a_parts.append(ids[:-off][same])
                b_parts.append(ids[off:][same])
        if not a_parts:
            return PAIR.empty_table()
        return pa.table({
            "id_a": pa.array(np.concatenate(a_parts), itype,
                             from_pandas=True),
            "id_b": pa.array(np.concatenate(b_parts), itype,
                             from_pandas=True),
        }, schema=PAIR)

    def block_edges(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return EDGE.empty_table()
        df = (block.to_pandas()
              .sort_values(["bkt", "k", id_col], kind="mergesort")
              .reset_index(drop=True))
        bkt = df["bkt"].to_numpy()
        new_grp = np.r_[True, bkt[1:] != bkt[:-1]]
        starts = np.flatnonzero(new_grp)
        glen = np.diff(np.r_[starts, len(df)])
        pos = np.arange(len(df)) - np.repeat(starts, glen)
        size = np.repeat(glen, glen)
        keep = (pos < window) | (pos >= size - window)
        sub = df[keep]
        return pa.table({
            "bkt": pa.array(sub["bkt"], pa.string(), from_pandas=True),
            "k": pa.array(sub["k"], pa.string(), from_pandas=True),
            id_col: pa.array(sub[id_col], itype, from_pandas=True),
            "pos": pa.array(pos[keep].astype(np.int64), pa.int64()),
            "size": pa.array(size[keep].astype(np.int64), pa.int64()),
        }, schema=EDGE)

    inner = map_key_blocks(rows, ["bkt"], block_pairs, num_partitions,
                           sort_blocks=False)
    edges_ds = map_key_blocks(rows, ["bkt"], block_edges, num_partitions,
                              sort_blocks=False)

    import ray
    import ray.data as rd

    tabs = [t for t in ray.get(edges_ds.to_arrow_refs()) if t.num_rows]
    cross_a, cross_b = [], []
    if tabs:
        ed = (pa.concat_tables(tabs).to_pandas()
              .sort_values(["bkt", "k", id_col], kind="mergesort")
              .reset_index(drop=True))
        # global rank of each edge row: bucket-size prefix sum + local pos
        sizes = ed.groupby("bkt", sort=True)["size"].first()
        base = sizes.cumsum().shift(1).fillna(0).astype(np.int64)
        ed["grank"] = ed["bkt"].map(base).to_numpy() + ed["pos"].to_numpy()
        g = ed["grank"].to_numpy()
        ids = ed[id_col].to_numpy()
        bkt = ed["bkt"].to_numpy()
        for i in range(len(ed)):
            j = i + 1
            while j < len(ed) and g[j] - g[i] <= window:
                if bkt[j] != bkt[i]:      # within-bucket pairs already out
                    cross_a.append(ids[i])
                    cross_b.append(ids[j])
                j += 1
    cross = pa.table({
        "id_a": pa.array(cross_a, itype, from_pandas=True),
        "id_b": pa.array(cross_b, itype, from_pandas=True),
    }, schema=PAIR)
    from epstein_pipeline_ray.stages.groupblock import concat_datasets

    return concat_datasets([inner, rd.from_arrow(cross)])


def golden_records(
    ds: Dataset,
    key: str,
    rank_col: str | list[str],
    value_cols: list[str],
    num_partitions: int | None = None,
) -> Dataset:
    """Survivorship merge (the MDM step after entity resolution — the
    reference applies its merge_map and keeps whole rows,
    entity_resolution.py:276-285; golden records generalize that to
    per-FIELD survivorship): one output row per ``key`` where each value
    column takes its first NON-NULL value in ascending ``rank_col``
    order (a list = composite rank, later columns break ties; nulls sort
    last on both engines), plus ``n_rec`` (merged record count).
    ``(key, *rank_cols)`` must totally order rows UP TO full-duplicate
    rows — rows tied on every rank column contribute identical survivor
    values, so the output stays deterministic; the same contract as
    SQL's ``ORDER BY``.

    One keyed exchange; per key-sorted block, each column's survivor is
    found vectorized: positions of valid rows, ``np.minimum.reduceat``
    over runs, one Arrow ``take`` with a null mask for all-null groups —
    no per-group Python, works for any column type (timestamps included).

    Twin shape: ``(array_agg(col ORDER BY rnk) FILTER (WHERE col IS NOT
    NULL))[1]`` per column, ``GROUP BY key``.
    """
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    rank_cols = [rank_col] if isinstance(rank_col, str) else list(rank_col)
    names = ds.schema().names
    types = dict(zip(names, ds.schema().types))
    OUT = pa.schema([(key, types[key])]
                    + [(c, types[c]) for c in value_cols]
                    + [("n_rec", pa.int64())])

    def block_fn(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        block = block.combine_chunks().sort_by(
            [(key, "ascending")]
            + [(c, "ascending") for c in rank_cols])
        kcol = block[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        enc = kcol.dictionary_encode()
        idx = enc.indices
        if idx.null_count:
            # null keys form ONE group (SQL GROUP BY semantics) — raw
            # null indices become NaN under np.asarray and NaN != NaN
            # would split every null row into its own group. sort_by
            # put them contiguous at the end; give them a fresh code.
            idx = pc.fill_null(idx, len(enc.dictionary))
        codes = np.asarray(idx)
        n = len(codes)
        from epstein_pipeline_ray.stages.groupblock import group_starts

        starts = group_starts(codes)
        ends = np.concatenate([starts[1:], [n]])
        pos = np.arange(n, dtype=np.int64)
        cols = {key: kcol.take(pa.array(starts))}
        for c in value_cols:
            col = block[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            valid = np.asarray(pc.is_valid(col))
            cand = np.where(valid, pos, n)  # invalid rows → sentinel
            first = np.minimum.reduceat(cand, starts)
            missing = first >= n  # group had no non-null value
            # a null take-index yields a null output slot
            idx = pa.array(np.where(missing, 0, first), pa.int64(),
                           mask=missing)
            cols[c] = col.take(idx)
        cols["n_rec"] = pa.array(ends - starts, pa.int64())
        return pa.table(cols, schema=OUT)

    pruned = ds.select_columns(
        list(dict.fromkeys([key] + rank_cols + value_cols)))
    return map_key_blocks(pruned, [key], block_fn, num_partitions,
                          sort_blocks=False)
