"""Corpus integrity checks (reference: src/epstein_pipeline/validators/
integrity.py:20-70 — duplicate-id detection, field-consistency checks —
and validators/schema.py:29-50 row-level validation).

The reference walks the full `list[Document]` in driver memory; here each
check is a per-batch partial aggregate combined on the driver (constant
driver memory), except the duplicate-id check which needs one keyed
exchange on the id column.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
from ray.data import Dataset


def integrity_report(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str = "n_chars",
    allowed_langs: tuple[str, ...] | None = None,
    lang_col: str = "lang",
    len_lo: int | None = None,
    len_hi: int | None = None,
) -> pa.Table:
    """One-row summary: total rows, duplicated ids, rows whose recorded
    length disagrees with ``len(text)``, empty-text rows, and (when the
    bounds are given) out-of-vocabulary language and out-of-range length
    counts (reference validators/integrity.py:20-70 adds referential /
    date-range / format checks on top of duplicate-id detection; the
    row-level detail lives in :func:`validate_rows`)."""
    import pyarrow.compute as pc

    check_lang = allowed_langs is not None
    check_len = len_lo is not None or len_hi is not None
    lang_set = pa.array(sorted(allowed_langs)) if check_lang else None

    def partial(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        lens = pc.utf8_length(text)
        mismatch = pc.sum(pc.cast(pc.not_equal(lens, batch[len_col]), pa.int64())).as_py() or 0
        empty = pc.sum(
            pc.cast(pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(text)), 0), pa.int64())
        ).as_py() or 0
        cols = {
            "n_rows": pa.array([batch.num_rows], pa.int64()),
            "n_len_mismatch": pa.array([mismatch], pa.int64()),
            "n_empty": pa.array([empty], pa.int64()),
        }
        if check_lang:
            bad = pc.invert(pc.fill_null(pc.is_in(batch[lang_col], value_set=lang_set), False))
            cols["n_bad_lang"] = pa.array([pc.sum(pc.cast(bad, pa.int64())).as_py() or 0], pa.int64())
        if check_len:
            rec = batch[len_col]
            out = pa.array([False] * batch.num_rows)
            if len_lo is not None:
                out = pc.or_(out, pc.fill_null(pc.less(rec, len_lo), False))
            if len_hi is not None:
                out = pc.or_(out, pc.fill_null(pc.greater(rec, len_hi), False))
            cols["n_len_out_of_range"] = pa.array(
                [pc.sum(pc.cast(out, pa.int64())).as_py() or 0], pa.int64())
        return pa.table(cols)

    parts = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()

    # duplicate-id check: small aggregate result (one row per distinct id
    # would be big, but count>1 groups are rare) — pre-aggregate per batch
    # then a tiny groupby on the partial counts.
    grouped = docs.select_columns([id_col]).groupby(id_col).count()
    count_col = [c for c in grouped.schema().names if c != id_col][0]

    def dup_partial(batch: pa.Table) -> pa.Table:
        dups = pc.sum(pc.cast(pc.greater(batch[count_col], 1), pa.int64())).as_py() or 0
        return pa.table({"n_dup": pa.array([dups], pa.int64())})

    n_dup_ids = int(
        grouped.map_batches(dup_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()["n_dup"]
        .sum()
    )

    out = {
        "n_rows": pa.array([int(parts["n_rows"].sum())], pa.int64()),
        "n_dup_ids": pa.array([int(n_dup_ids)], pa.int64()),
        "n_len_mismatch": pa.array([int(parts["n_len_mismatch"].sum())], pa.int64()),
        "n_empty": pa.array([int(parts["n_empty"].sum())], pa.int64()),
    }
    if check_lang:
        out["n_bad_lang"] = pa.array([int(parts["n_bad_lang"].sum())], pa.int64())
    if check_len:
        out["n_len_out_of_range"] = pa.array([int(parts["n_len_out_of_range"].sum())], pa.int64())
    return pa.table(out)


@dataclass(frozen=True)
class Rule:
    """One row-level validation rule (reference validators/schema.py:29-50
    builds a per-document error list the same way: each failed check
    contributes one named error for that row).

    kind:
      not_null   — flag rows where ``col`` is NULL
      non_empty  — flag rows where ``col`` is NULL or whitespace-only
      len_match  — flag rows where ``len(col) != col2`` (recorded length)
      range      — flag rows where ``col`` < lo or > hi (NULLs not flagged)
      regex      — flag rows where ``col`` does NOT match ``pattern``
                   (anchor the pattern yourself; reference Bates-format
                   check integrity.py:52-58 is the model)
    """

    name: str
    kind: str
    col: str
    col2: str | None = None
    lo: object = None
    hi: object = None
    pattern: str | None = None


def validate_rows(ds: Dataset, id_col: str, rules: list[Rule]) -> Dataset:
    """Row-level violation report: one output row ``(row_id, rule)`` per
    rule a row fails. All rules are evaluated vectorized in ONE pass over
    each batch (k boolean masks per batch, no per-row Python). The output
    is violation-proportional, not corpus-proportional — at 100 TB a
    healthy corpus streams through and emits almost nothing."""
    import pyarrow.compute as pc

    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema([("row_id", id_type), ("rule", pa.string())])

    def check(batch: pa.Table) -> pa.Table:
        ids, names = [], []
        for r in rules:
            col = batch[r.col]
            if r.kind == "not_null":
                mask = pc.is_null(col)
            elif r.kind == "non_empty":
                blank = pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(col)), 0)
                mask = pc.fill_null(blank, True)
            elif r.kind == "len_match":
                mask = pc.fill_null(
                    pc.not_equal(pc.utf8_length(col), batch[r.col2]), False)
            elif r.kind == "range":
                mask = pa.array([False] * batch.num_rows)
                if r.lo is not None:
                    mask = pc.or_(mask, pc.fill_null(pc.less(col, r.lo), False))
                if r.hi is not None:
                    mask = pc.or_(mask, pc.fill_null(pc.greater(col, r.hi), False))
            elif r.kind == "regex":
                ok = pc.fill_null(pc.match_substring_regex(col, r.pattern), False)
                mask = pc.invert(ok)
            else:  # pragma: no cover - construction error
                raise ValueError(f"unknown rule kind {r.kind!r}")
            bad = batch[id_col].filter(mask)
            if len(bad):
                ids.append(bad.combine_chunks() if isinstance(bad, pa.ChunkedArray) else bad)
                names.append(pa.array([r.name] * len(bad), pa.string()))
        if not ids:
            return out_schema.empty_table()
        return pa.table({
            "row_id": pa.concat_arrays([a if isinstance(a, pa.Array) else a.combine_chunks()
                                        for a in ids]),
            "rule": pa.concat_arrays(names),
        })

    return ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)


def referential_violations(
    left: Dataset,
    left_key: str,
    right_keys: Dataset,
    right_key: str,
    rule_name: str,
    id_col: str | None = None,
    broadcast_rows_limit: int = 5_000_000,
) -> Dataset:
    """Rows of ``left`` whose ``left_key`` has no match in ``right_keys``
    (reference integrity.py referential personIds check), reported in the
    same ``(row_id, rule)`` shape as :func:`validate_rows`. Runs on the
    size-switched anti-join: broadcast ``pc.is_in`` below the limit, the
    partitioned-file exchange above it."""
    from epstein_pipeline_ray.stages.joins import key_membership_join

    id_col = id_col or left_key
    bad = key_membership_join(
        left.select_columns(sorted({left_key, id_col})), right_keys,
        left_key, right_key, mode="anti",
        broadcast_rows_limit=broadcast_rows_limit)

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "row_id": batch[id_col],
            "rule": pa.array([rule_name] * batch.num_rows, pa.string()),
        })

    return bad.map_batches(shape, batch_format="pyarrow", zero_copy_batch=True)


def profile_columns(ds, cols: list[str], num_partitions: int | None = None):
    """Deequ-style column profile: for each column, total rows, null
    count, and EXACT distinct count (non-null) — the completeness /
    cardinality sweep a pipeline runs before choosing keys and
    partitioners. Per column: decomposable (n, n_null) partials plus a
    two-phase distinct (map-side unique -> value-keyed exchange ->
    distinct-count partials summed); the per-column results (column
    count is bounded) union into one small table. Output:
    (column, n_rows, n_null, n_distinct). Twin: UNION ALL of per-column
    count/count(col)/count(DISTINCT col) SELECTs."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    out_rows = {"column": [], "n_rows": [], "n_null": [],
                "n_distinct": []}
    for col in cols:
        one = ds.select_columns([col])

        def base_part(batch: pa.Table, c=col) -> pa.Table:
            a = batch[c]
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            return pa.table({
                "n": pa.array([batch.num_rows], pa.int64()),
                "z": pa.array([a.null_count], pa.int64()),
            })

        tabs = [t for t in ray.get(one.map_batches(
            base_part, batch_format="pyarrow",
            zero_copy_batch=True).to_arrow_refs()) if t.num_rows]
        n = sum(int(t["n"].to_pandas().sum()) for t in tabs)
        z = sum(int(t["z"].to_pandas().sum()) for t in tabs)

        def uniq_part(batch: pa.Table, c=col) -> pa.Table:
            a = batch[c]
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            u = a.drop_null().unique()
            return pa.table({"v": u})

        def distinct_count_block(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return pa.table({"d": pa.array([], pa.int64())})
            v = block["v"]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            return pa.table({"d": pa.array([len(v.unique())], pa.int64())})

        dparts = map_key_blocks(
            one.map_batches(uniq_part, batch_format="pyarrow",
                            zero_copy_batch=True),
            ["v"], distinct_count_block, num_partitions,
            sort_blocks=False)
        d = int(dparts.sum("d") or 0)

        out_rows["column"].append(col)
        out_rows["n_rows"].append(n)
        out_rows["n_null"].append(z)
        out_rows["n_distinct"].append(d)

    return rd.from_arrow(pa.table({
        "column": pa.array(out_rows["column"], pa.string()),
        "n_rows": pa.array(out_rows["n_rows"], pa.int64()),
        "n_null": pa.array(out_rows["n_null"], pa.int64()),
        "n_distinct": pa.array(out_rows["n_distinct"], pa.int64()),
    }))


def corpus_digest(ds, text_col: str = "text"):
    """Order-invariant corpus checksum: Σ (md5-low64 of normalized text
    mod P) mod P with P = 2^61 - 1, plus the hashed-row count. Equality
    of two digests verifies snapshot identity WITHOUT sorting or moving
    any text — the 100-TB resume/replication check (each batch
    collapses to one residue row; the final fold sees one row per
    batch). Null texts are skipped on both engines (SQL md5(NULL) is
    NULL). The low-64 convention matches DuckDB md5_number_lower:
    digest bytes [8:16] little-endian."""
    import hashlib

    import pyarrow as pa

    from epstein_pipeline_ray.functions.normalize import normalize_array

    P = (1 << 61) - 1

    def partial(batch: pa.Table) -> pa.Table:
        norm = normalize_array(batch[text_col])
        res, cnt = 0, 0
        for s in norm.to_pylist():
            if s is None:
                continue
            d = hashlib.md5(s.encode()).digest()
            res = (res + int.from_bytes(d[8:16], "little") % P) % P
            cnt += 1
        return pa.table({"__r": pa.array([res], pa.int64()),
                         "__n": pa.array([cnt], pa.int64())})

    rows = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    digest = sum(r["__r"] for r in rows) % P
    n = sum(r["__n"] for r in rows)
    return pa.table({"n_hashed": pa.array([n], pa.int64()),
                     "digest": pa.array([digest], pa.int64())})
