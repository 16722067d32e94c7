"""HOC Concordance/Relativity load-file importer (reference S6:
importers/hoc_loader.py:1-418 — þ-delimited .dat metadata + comma
.opt page map → logical documents).

Reference semantics reproduced:
  - .dat: every value wrapped þ...þ; header row names the fields; rows
    shorter than the header pad with "" (hoc_loader.py:180-199).
  - .opt: CSV rows (bates_id, volume, image_path, doc_start Y/blank,
    _, _, page_count) (hoc_loader.py:139-163).
  - grouping: a page belongs to the most recent doc-start page at or
    before it in bates order; bates_end = last page of the doc
    (hoc_loader.py:209-274).
  - doc_id = "kaggle-ho-%06d" from the numeric tail of bates_begin;
    title fallback = Document Title → Email Subject → Original
    Filename → bates; category from extension/email heuristics
    (hoc_loader.py:73-118).

Ray-Data-first design: the .opt/.dat files stream through
``read_text``/``read_csv`` map_batches parsers (vectorized Arrow splits;
no driver row loop). Doc assignment is size-switched (VERDICT r2 item 5):

- at or below ``broadcast_rows_limit`` doc-starts: broadcast as-of — the
  doc-start table (one row per DOCUMENT) is sorted once, shipped via
  ``ray.put``, and each page batch does one ``np.searchsorted``.
- above it: bucketed-exchange as-of — pages are keyed by fixed-width
  bates buckets, a per-bucket max-start table (bucket-count-sized, NOT
  page- or doc-sized) yields each bucket's carry-in via a prefix max,
  and one keyed exchange computes the seeded running max per block. No
  process ever holds the doc-start table.

Page aggregation is ONE keyed exchange on the assigned doc; metadata
attaches through the size-switched key join. Partitioning assumption:
one document's pages fit one block (same assumption every keyed window
in the engine makes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

_DAT_DELIM = "þ"  # þ thorn

# .dat metadata fields we project into the document table
# (reference field name -> output column)
_DAT_FIELDS = {
    "Bates End": "bates_end_meta",
    "Author": "author",
    "Custodian/Source": "custodian",
    "Date Sent": "date_sent",
    "Date Created": "date_created",
    "Document Extension": "doc_extension",
    "Email From": "email_from",
    "Email To": "email_to",
    "Email Subject/Title": "email_subject",
    "Original Filename": "original_filename",
    "MD5 Hash": "md5_hash",
    "Document Title": "doc_title",
}


def read_dat(path: str, columns: list[str] | None = None) -> Dataset:
    """Parse a þ-delimited .dat file into a Dataset (all-string columns
    named by the header row). Header is read driver-side (one line);
    data rows stream through a vectorized Arrow parser: slice off the
    wrapping thorns, split on þþ."""
    with open(path, encoding="utf-8-sig") as f:
        header = f.readline().rstrip("\r\n")
    parts = header.split(_DAT_DELIM)
    field_names = [parts[i] for i in range(1, len(parts), 2)]
    keep = field_names if columns is None else [c for c in field_names if c in columns]
    keep_idx = {name: field_names.index(name) for name in keep}

    lines = rd.read_text(path)

    def parse(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        # drop the header row (it streams through like any other line)
        col = col.filter(pc.invert(pc.equal(col, header)))
        if len(col) == 0:
            return pa.table({n: pa.array([], pa.string()) for n in keep})
        # split on þ puts values at ODD indices (reference :180-190); the
        # whole extraction is Arrow list kernels + one numpy gather
        vals = pc.split_pattern(col, pattern=_DAT_DELIM)
        flat = pc.list_flatten(vals)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = np.asarray(pc.list_value_length(vals)).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        cols = {}
        for name in keep:
            i = keep_idx[name]
            idx = starts + 2 * i + 1
            ok = (2 * i + 1) < lens
            # rows shorter than the header pad with "" (reference :190-199)
            gathered = flat.take(pa.array(np.where(ok, idx, 0)))
            cols[name] = pc.if_else(pa.array(ok), gathered, pa.scalar("", pa.string()))
        return pa.table(cols)

    return lines.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


def read_opt(path: str) -> Dataset:
    """Parse a Concordance .opt page map (headerless CSV:
    bates_id, volume, image_path, doc_start Y/blank, _, _, page_count)."""
    from pyarrow import csv as pacsv

    names = ["bates_id", "volume", "image_path", "doc_start", "u1", "u2", "page_count"]
    ds = rd.read_csv(
        path,
        read_options=pacsv.ReadOptions(column_names=names),
        convert_options=pacsv.ConvertOptions(
            column_types={n: pa.string() for n in names}),
    )

    def shape(batch: pa.Table) -> pa.Table:
        bates = pc.utf8_trim_whitespace(batch["bates_id"])
        start = pc.equal(pc.utf8_upper(
            pc.utf8_trim_whitespace(pc.fill_null(batch["doc_start"], ""))), "Y")
        pages = pc.cast(
            pc.utf8_trim_whitespace(pc.fill_null(batch["page_count"], "")), pa.string())
        num = pc.extract_regex(bates, r"(?P<num>[0-9]+)$")
        return pa.table({
            "bates_id": bates,
            "bates_num": pc.fill_null(
                pc.cast(pc.struct_field(num, "num"), pa.int64()), -1),
            "image_path": pc.utf8_trim_whitespace(pc.fill_null(batch["image_path"], "")),
            "doc_start": start,
            "page_count": pc.if_else(pc.equal(pages, ""), pa.scalar(None, pa.string()),
                                     pages).cast(pa.int64()),
        })

    return ds.map_batches(shape, batch_format="pyarrow", zero_copy_batch=True)


_NO_DOC = np.iinfo(np.int64).min  # "no doc-start at or before this page"


def _assign_docs_exchange(
    pages: Dataset,
    bucket_width: int = 1_000_000,
    num_partitions: int | None = None,
) -> Dataset:
    """Exchange-plan as-of: page → greatest doc-start bates_num <= page.

    Bucket key = ``bates_num // bucket_width``. The per-bucket max-start
    table is bucket-count-sized (corpus bates span / width — pick the
    width so this is thousands-to-millions of rows, bounded regardless of
    page count); its prefix max gives each bucket's carry-in seed, and
    the page exchange computes a seeded running max per bucket run."""
    from epstein_pipeline_ray.stages.groupblock import group_starts, map_key_blocks

    def with_bucket(batch: pa.Table) -> pa.Table:
        nums = np.asarray(batch["bates_num"])
        return batch.append_column(
            "__bucket", pa.array(nums // bucket_width, pa.int64()))

    pb = pages.map_batches(with_bucket, batch_format="pyarrow", zero_copy_batch=True)

    BMAX = pa.schema([("__bucket", pa.int64()), ("max_start", pa.int64())])

    def bucket_max_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return BMAX.empty_table()
        block = block.combine_chunks().sort_by([("__bucket", "ascending")])
        b = np.asarray(block["__bucket"])
        nums = np.asarray(block["bates_num"])
        starts = group_starts(np.asarray(
            block["__bucket"].combine_chunks().dictionary_encode().indices
            if isinstance(block["__bucket"], pa.ChunkedArray)
            else block["__bucket"].dictionary_encode().indices))
        mx = np.maximum.reduceat(nums, starts)
        return pa.table({"__bucket": pa.array(b[starts], pa.int64()),
                         "max_start": pa.array(mx, pa.int64())}, schema=BMAX)

    start_pages = pb.map_batches(
        lambda b: b.filter(b["doc_start"]).select(["__bucket", "bates_num"]),
        batch_format="pyarrow", zero_copy_batch=True)
    bmax = map_key_blocks(start_pages, ["__bucket"], bucket_max_block,
                          num_partitions, sort_blocks=False)
    # bucket-count-sized gather (documented bound above) → prefix max
    tbls = [t for t in ray.get(bmax.to_arrow_refs()) if t.num_rows]
    if tbls:
        cat = pa.concat_tables(tbls).sort_by([("__bucket", "ascending")])
        sb = np.asarray(cat["__bucket"])
        pm = np.maximum.accumulate(np.asarray(cat["max_start"]))
    else:
        sb = np.empty(0, np.int64)
        pm = np.empty(0, np.int64)
    carry_ref = ray.put((sb, pm))

    def assign_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            sch = block.schema
            if "__bucket" in sch.names:
                sch = sch.remove(sch.get_field_index("__bucket"))
            return sch.append(pa.field("doc_num", pa.int64())).empty_table()
        block = block.combine_chunks().sort_by(
            [("__bucket", "ascending"), ("bates_num", "ascending")])
        bkt_col = block["__bucket"]
        if isinstance(bkt_col, pa.ChunkedArray):
            bkt_col = bkt_col.combine_chunks()
        codes = np.asarray(bkt_col.dictionary_encode().indices)
        starts = group_starts(codes)
        nums = np.asarray(block["bates_num"])
        is_start = np.asarray(block["doc_start"].to_numpy(zero_copy_only=False))
        sb_, pm_ = ray.get(carry_ref)
        # carry-in = prefix max over strictly-earlier buckets
        run_buckets = np.asarray(bkt_col.take(pa.array(starts)))
        idx = np.searchsorted(sb_, run_buckets, side="left") - 1
        seeds = np.where(idx >= 0, pm_[np.clip(idx, 0, None)], _NO_DOC)
        cand = np.where(is_start, nums, _NO_DOC)
        doc = np.empty(len(cand), dtype=np.int64)
        ends = np.concatenate([starts[1:], [len(cand)]])
        for s, e, seed in zip(starts, ends, seeds):  # runs per block: few
            seg = cand[s:e].copy()
            seg[0] = max(seg[0], seed)
            doc[s:e] = np.maximum.accumulate(seg)
        keep = doc != _NO_DOC
        out = block.drop_columns(["__bucket"]).append_column(
            "doc_num", pa.array(doc, pa.int64()))
        return out.filter(pa.array(keep))

    return map_key_blocks(pb, ["__bucket"], assign_block, num_partitions,
                          sort_blocks=False)


def load_hoc_documents(
    opt_path: str,
    dat_path: str | None = None,
    broadcast_rows_limit: int = 5_000_000,
    asof_bucket_width: int = 1_000_000,
) -> Dataset:
    """.opt pages + .dat metadata → one row per logical document:
    (doc_id, bates_begin, bates_end, n_pages, page_count, pages
    list<struct{bates_id, image_path}>, title, category, best_date,
    author, custodian, email_from/to/subject, md5_hash)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    pages = read_opt(opt_path)

    # doc-start table: one row per DOCUMENT; sorted bates numbers are the
    # as-of index every page batch searches against
    starts_tbl = pages.map_batches(
        lambda b: b.filter(b["doc_start"]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).select_columns(["bates_num"])
    n_starts = starts_tbl.count()
    if n_starts <= broadcast_rows_limit:
        start_arrays = [np.asarray(t["bates_num"])
                        for t in ray.get(starts_tbl.to_arrow_refs()) if t.num_rows]
        starts_sorted = np.sort(np.concatenate(start_arrays)) if start_arrays else np.array([], np.int64)
        starts_ref = ray.put(starts_sorted)

        def assign(batch: pa.Table) -> pa.Table:
            ss = ray.get(starts_ref)
            nums = np.asarray(batch["bates_num"])
            pos = np.searchsorted(ss, nums, side="right") - 1
            ok = pos >= 0  # pages before the first doc-start are dropped
            doc_start_num = np.where(ok, ss[np.clip(pos, 0, None)], -1)
            out = batch.append_column("doc_num", pa.array(doc_start_num, pa.int64()))
            return out.filter(pa.array(ok))

        assigned = pages.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    else:
        # bucketed-exchange as-of — no process holds the doc-start table
        assigned = _assign_docs_exchange(pages, asof_bucket_width)

    page_struct = pa.struct([("bates_id", pa.string()), ("image_path", pa.string())])
    out_schema = pa.schema([
        ("doc_num", pa.int64()),
        ("bates_begin", pa.string()),
        ("bates_end", pa.string()),
        ("n_pages", pa.int64()),
        ("page_count", pa.int64()),
        ("pages", pa.list_(page_struct)),
    ])

    def per_doc_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        block = block.combine_chunks().sort_by(
            [("doc_num", "ascending"), ("bates_num", "ascending")])
        doc = np.asarray(block["doc_num"])
        bounds = np.concatenate([[0], np.nonzero(doc[1:] != doc[:-1])[0] + 1, [len(doc)]])
        lo, hi = bounds[:-1], bounds[1:]
        bates = block["bates_id"].combine_chunks() if isinstance(
            block["bates_id"], pa.ChunkedArray) else block["bates_id"]
        imgs = block["image_path"].combine_chunks() if isinstance(
            block["image_path"], pa.ChunkedArray) else block["image_path"]
        pcnt = np.asarray(pc.fill_null(block["page_count"], 0))
        # nested pages column built from offsets — no per-row Python
        flat = pa.StructArray.from_arrays([bates, imgs], fields=list(page_struct))
        pages_list = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32()) if len(doc) < 2**31 else pa.array(bounds), flat)
        return pa.table({
            "doc_num": pa.array(doc[lo], pa.int64()),
            "bates_begin": bates.take(pa.array(lo)),
            "bates_end": bates.take(pa.array(hi - 1)),
            "n_pages": pa.array(hi - lo, pa.int64()),
            # page_count rides the doc-start page (reference :256-259)
            "page_count": pa.array(pcnt[lo], pa.int64()),
            "pages": pages_list,
        })

    docs = map_key_blocks(assigned, ["doc_num"], per_doc_block, sort_blocks=False)

    if dat_path is not None:
        from epstein_pipeline_ray.stages.joins import attach_column

        meta = read_dat(dat_path, columns=["Bates Begin", *_DAT_FIELDS])

        def meta_shape(batch: pa.Table) -> pa.Table:
            cols = {"bates_begin": batch["Bates Begin"]}
            for ref_name, out_name in _DAT_FIELDS.items():
                cols[out_name] = batch[ref_name]
            return pa.table(cols)

        meta = meta.map_batches(meta_shape, batch_format="pyarrow", zero_copy_batch=True)
        for out_name in _DAT_FIELDS.values():
            docs = attach_column(docs, meta, "bates_begin", "bates_begin",
                                 out_name, out_name,
                                 broadcast_rows_limit=broadcast_rows_limit)
    else:
        for out_name in _DAT_FIELDS.values():
            docs = docs.map_batches(
                lambda b, n=out_name: b.append_column(n, pa.nulls(b.num_rows, pa.string())),
                batch_format="pyarrow", zero_copy_batch=True)

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        num = batch["doc_num"]
        pad = pc.utf8_lpad(pc.cast(num, pa.string()), 6, padding="0")
        doc_id = pc.binary_join_element_wise(pa.scalar("kaggle-ho-"), pad, "")

        def nz(name: str) -> pa.Array:
            col = batch[name]
            return pc.fill_null(col, "").combine_chunks() if isinstance(
                col, pa.ChunkedArray) else pc.fill_null(col, "")

        title = nz("doc_title")
        for fb in ("email_subject", "original_filename"):
            title = pc.if_else(pc.equal(title, ""), nz(fb), title)
        bates_fb = pc.binary_join_element_wise(
            pa.scalar("HOUSE_OVERSIGHT_"), pad, "")
        title = pc.if_else(pc.equal(title, ""), bates_fb, title)

        ext = pc.utf8_lower(nz("doc_extension"))
        fname = pc.utf8_lower(nz("original_filename"))
        is_corr_ext = pc.is_in(ext, value_set=pa.array(["msg", "eml"]))
        is_fin_ext = pc.is_in(ext, value_set=pa.array(["xls", "xlsx", "csv"]))
        fin_kw = pa.array([False] * n)
        for kw in ("invoice", "statement", "receipt", "tax", "bank"):
            fin_kw = pc.or_(fin_kw, pc.match_substring(fname, kw))
        is_fin_pdf = pc.and_(pc.equal(ext, "pdf"), fin_kw)
        has_email = pc.or_(pc.not_equal(nz("email_from"), ""),
                           pc.not_equal(nz("email_to"), ""))
        category = pc.if_else(
            is_corr_ext, pa.scalar("correspondence"),
            pc.if_else(pc.or_(is_fin_ext, is_fin_pdf), pa.scalar("financial"),
                       pc.if_else(has_email, pa.scalar("correspondence"),
                                  pa.scalar("other"))))

        # best_date: first non-empty of sent/created, MM/DD/YYYY → ISO
        raw_date = nz("date_sent")
        raw_date = pc.if_else(pc.equal(raw_date, ""), nz("date_created"), raw_date)
        m = pc.extract_regex(raw_date, r"^(?P<mm>[0-9]{2})/(?P<dd>[0-9]{2})/(?P<yy>[0-9]{4})")
        best_date = pc.binary_join_element_wise(
            pc.struct_field(m, "yy"), pc.struct_field(m, "mm"),
            pc.struct_field(m, "dd"), "-")

        keep = ["bates_begin", "bates_end", "n_pages", "page_count", "pages",
                "author", "custodian", "email_from", "email_to",
                "email_subject", "md5_hash"]
        cols = {"doc_id": doc_id}
        for c in keep:
            cols[c] = batch[c]
        cols["title"] = title
        cols["category"] = category
        cols["best_date"] = best_date
        return pa.table(cols)

    return docs.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
