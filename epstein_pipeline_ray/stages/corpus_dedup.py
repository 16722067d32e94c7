"""Corpus-wide sub-document dedup operators.

Two named-method operators over the ``documents`` table:

* :func:`line_dedup_corpus` — boilerplate line removal (the CCNet
  paragraph-dedup / RefinedWeb line-wise-correction idea, Wenzek 2020
  §3.1, Penedo 2023 §3.3): a "line" occurring in at least ``min_docs``
  DISTINCT documents is boilerplate and removed from every document.
* :func:`containment_pairs` — asymmetric set-containment near-dup join
  (the overlap/containment variant of the set-similarity join family,
  Xiao et al. WWW'08): ordered pairs (a, b) where
  ``|S(a) ∩ S(b)| / |S(a)| >= t`` over distinct word n-gram shingles —
  catches documents that are truncations / excerpts of another document,
  which symmetric Jaccard misses (a 60% prefix of a long doc has
  J ≈ 0.6 but containment 1.0).

Reference parity: the reference's dedup passes are whole-document only
(reference processors/dedup.py); these extend the family to
sub-document granularity, the gap its HOC corpus analyses flag
(duplicated OCR boilerplate inside otherwise-distinct documents).

Both are two-exchange plans: ids/hashes and the minimal payload ride
the exchanges, all per-block math is vectorized, and flood keys are
capped with metrics accounting (house convention, minhash_stage.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from epstein_pipeline_ray.functions.rounding import sql_round
from epstein_pipeline_ray.stages.dedup_extra import _token_hash64
from epstein_pipeline_ray.stages.groupblock import map_key_blocks

def _ngram_hash_postings(
    batch: pa.Table, id_col: str, text_col: str, ngram: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized distinct word-``ngram`` hash postings for a batch:
    returns ``(doc_pos, tok, n_per_row)`` — the batch row index, the
    64-bit shingle hash (int64 bit-view) and that doc's distinct-shingle
    count, one output row per DISTINCT (doc, shingle). Docs with fewer
    than ``ngram`` words emit nothing (blank-doc convention).

    Replaces the per-shingle ``_token_hash64(" ".join(...))`` Python set
    loop: Arrow lowers + whitespace-splits the column, a C hash table
    (``dictionary_encode``) collapses token instances to the vocabulary,
    only the VOCABULARY is blake2b-hashed in Python, and the n-gram hash
    is a rolling polynomial + splitmix64 over the word-hash array —
    numpy end to end. Shingle identity therefore changed from
    blake2b(joined n-gram string) to mix64(poly(word hashes)); both are
    ~2^-64-collision identities and every consumer treats the hash as an
    opaque set element, so results are invariant (oracle-checked)."""
    import pyarrow.compute as pc

    from epstein_pipeline_ray.functions.minhash import _mix64, _POLY_BASE

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.utf8_split_whitespace(
        pc.utf8_lower(pc.fill_null(col, "")))
    flat = pc.list_flatten(words)
    parents = np.asarray(pc.list_parent_indices(words))
    # split_whitespace can emit boundary empties — drop them
    nonempty = np.asarray(pc.not_equal(flat, ""))
    enc = pc.dictionary_encode(flat)
    codes = np.asarray(enc.indices, dtype=np.int64)
    vocab = enc.dictionary.to_pylist()
    vh = np.fromiter((_token_hash64(w) for w in vocab),
                     dtype=np.uint64, count=len(vocab))
    if not nonempty.all():
        parents = parents[nonempty]
        codes = codes[nonempty]
    wh = vh[codes]  # word hash per token, doc-ordered
    m = wh.shape[0] - ngram + 1
    if m <= 0:
        empty = np.empty(0, np.int64)
        return empty, empty, empty
    h = wh[0:m].copy()
    for j in range(1, ngram):
        h = h * _POLY_BASE + wh[j: j + m]
    h = _mix64(h)
    # windows must not straddle doc boundaries
    same = parents[:m] == parents[ngram - 1:]
    h, p = h[same], parents[:m][same]
    # distinct per (doc, hash)
    order = np.lexsort((h, p))
    h, p = h[order], p[order]
    keep = np.r_[True, (p[1:] != p[:-1]) | (h[1:] != h[:-1])]
    h, p = h[keep], p[keep]
    # distinct count per doc, aligned per row
    new_doc = np.r_[True, p[1:] != p[:-1]]
    run = np.cumsum(new_doc) - 1
    n_per_doc = np.bincount(run)
    return p, h.view(np.int64), n_per_doc[run]


def _pair_group_agg(
    ka: np.ndarray, kb: np.ndarray, sum_col: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Group rows by the (ka, kb) pair without a pandas round-trip:
    returns ``(sel, agg)`` — for each distinct pair (in (ka, kb)-sorted
    order) the index of one member row and the group COUNT (or the sum
    of ``sum_col``). One lexsort + run-boundary reduceat."""
    order = np.lexsort((kb, ka))
    ka_s, kb_s = ka[order], kb[order]
    new = np.r_[True, (ka_s[1:] != ka_s[:-1]) | (kb_s[1:] != kb_s[:-1])]
    starts = np.flatnonzero(new)
    sel = order[starts]
    if sum_col is None:
        agg = np.diff(np.r_[starts, ka_s.size])
    else:
        agg = np.add.reduceat(sum_col[order], starts)
    return sel, agg


_LINE_ROWS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("line_idx", pa.int32()),
    ("line", pa.large_string()),
    ("lh", pa.int64()),
])

_LINE_FLAG_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("line_idx", pa.int32()),
    ("line", pa.large_string()),
    ("dup", pa.bool_()),
])

_LINE_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("n_lines", pa.int64()),
    ("n_removed", pa.int64()),
    ("clean_text", pa.large_string()),
])


def line_dedup_corpus(
    docs: Dataset,
    width: int = 12,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> Dataset:
    """Remove corpus-boilerplate lines: a line (= ``width``-word window
    of the single-space word array, mirroring the noisy-turn window
    convention so the DuckDB twin can rebuild it with an array slice)
    that appears in >= ``min_docs`` distinct documents is dropped from
    ALL documents. Returns one row per input doc:
    ``(doc_id, n_lines, n_removed, clean_text)`` with ``clean_text`` =
    the kept lines re-joined in order (empty string when everything was
    boilerplate).

    Plan: explode → exchange 1 keyed on the line hash (per block: sort
    by (line, doc), distinct-doc counts via first-of-run flags — the
    line string rides the row so 64-bit hash collisions cannot
    mis-merge) → exchange 2 keyed on doc_id (sort by line_idx, rebuild).
    Text crosses each exchange exactly once — corpus-proportional but
    inherent to rebuilding the cleaned corpus; at 100 TB both exchanges
    are hash-partitioned on keys with no driver materialization.
    """

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id: list[int] = []
        out_idx: list[int] = []
        out_line: list[str] = []
        out_lh: list[int] = []
        for doc_id, text in zip(ids, texts):
            words = (text or "").split(" ")
            for i in range(0, (len(words) + width - 1) // width):
                line = " ".join(words[i * width: i * width + width])
                out_id.append(int(doc_id))
                out_idx.append(i)
                out_line.append(line)
                h = _token_hash64(line)
                out_lh.append(h if h < (1 << 63) else h - (1 << 64))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "line_idx": pa.array(out_idx, pa.int32()),
            "line": pa.array(out_line, pa.large_string()),
            "lh": pa.array(out_lh, pa.int64()),
        }, schema=_LINE_ROWS_SCHEMA)

    lines = docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)

    def flag_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _LINE_FLAG_SCHEMA.empty_table()
        df = block.to_pandas()
        df = df.sort_values(["line", "doc_id"], kind="mergesort").reset_index(drop=True)
        line = df["line"].to_numpy()
        did = df["doc_id"].to_numpy()
        new_line = np.ones(len(df), dtype=bool)
        new_line[1:] = line[1:] != line[:-1]
        new_doc = new_line.copy()
        new_doc[1:] |= did[1:] != did[:-1]
        # distinct docs per line run = count of new_doc flags in the run
        run_id = np.cumsum(new_line) - 1
        ndocs = np.bincount(run_id, weights=new_doc.astype(np.int64)).astype(np.int64)
        dup = ndocs[run_id] >= min_docs
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "line_idx": pa.array(df["line_idx"].to_numpy(), pa.int32()),
            "line": pa.array(df["line"], pa.large_string()),
            "dup": pa.array(dup, pa.bool_()),
        }, schema=_LINE_FLAG_SCHEMA)

    flagged = map_key_blocks(lines, ["lh"], flag_block, num_partitions,
                             sort_blocks=False)

    def rebuild_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _LINE_OUT_SCHEMA.empty_table()
        df = block.to_pandas()
        df = df.sort_values(["doc_id", "line_idx"], kind="mergesort").reset_index(drop=True)
        g = df.groupby("doc_id", sort=True)
        out = g.agg(
            n_lines=("line_idx", "size"),
            n_removed=("dup", "sum"),
        ).reset_index()
        kept = (
            df.loc[~df["dup"]]
            .groupby("doc_id", sort=True)["line"]
            .agg(" ".join)
        )
        out["clean_text"] = out["doc_id"].map(kept).fillna("")
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "n_lines": pa.array(out["n_lines"].to_numpy(np.int64), pa.int64()),
            "n_removed": pa.array(out["n_removed"].to_numpy(np.int64), pa.int64()),
            "clean_text": pa.array(out["clean_text"], pa.large_string()),
        }, schema=_LINE_OUT_SCHEMA)

    return map_key_blocks(flagged, [id_col], rebuild_block, num_partitions,
                          sort_blocks=False)


_PAIR_PARTIAL_SCHEMA = pa.schema([
    ("id_a", pa.int64()),
    ("id_b", pa.int64()),
    ("cnt", pa.int64()),
    ("na", pa.int32()),
    ("nb", pa.int32()),
])

_CONTAIN_SCHEMA = pa.schema([
    ("id_a", pa.int64()),
    ("id_b", pa.int64()),
    ("n_inter", pa.int64()),
    ("containment", pa.float64()),
])


def _run_pairs(run_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-run index pairs (i < j) for rows sorted by run —
    vectorized: element at in-run position p pairs with the p rows
    before it."""
    n = run_id.size
    starts = np.flatnonzero(np.r_[True, run_id[1:] != run_id[:-1]])
    run_start = starts[np.cumsum(np.r_[True, run_id[1:] != run_id[:-1]]) - 1]
    pos = np.arange(n) - run_start
    J = np.repeat(np.arange(n), pos)
    # partner index = run_start[j] + (sequence number within j's block)
    off = np.concatenate([[0], np.cumsum(pos)])
    I = np.arange(J.size) - np.repeat(off[:-1], pos) + np.repeat(run_start, pos)
    return I, J


def containment_pairs(
    docs: Dataset,
    threshold: float = 0.8,
    ngram: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    max_posting: int = 8192,
) -> Dataset:
    """Ordered near-dup pairs by shingle-set CONTAINMENT: emit
    ``(id_a, id_b, n_inter, containment)`` for every ordered pair with
    ``containment = |S(a) ∩ S(b)| / |S(a)| >= threshold``, S = distinct
    ``ngram``-word shingle hash set (lower().split() tokens, house
    convention). Exact count-then-filter plan — no signatures, no
    blobs:

    1. map-side: each doc emits its distinct shingle hashes
       ``(tok, id, n)``; docs with fewer than ``ngram`` words emit
       nothing and never pair (the blank-doc convention).
    2. exchange on ``tok``: each token's posting run emits its
       canonical doc pairs, pre-aggregated per block to
       ``(id_a, id_b, partial_cnt, na, nb)`` — the map-side combiner
       that keeps the pair exchange proportional to MATCHING pairs.
    3. exchange on ``(id_a, id_b)``: sum partials → exact
       ``|A ∩ B|``; both containment directions are tested and
       emitted independently.

    Postings longer than ``max_posting`` are truncated with metrics
    accounting (``containment.postings_capped`` — house skew-cap
    convention; never fires on the sf corpora, so oracle parity holds).
    Shingle identity is a 64-bit splitmix-mixed rolling polynomial over
    blake2b word hashes: a cross-doc collision (~2^-64 per shingle
    pair) could overcount one intersection slot.
    """
    t = float(threshold)

    def featurize(batch: pa.Table) -> pa.Table:
        p, tok, n = _ngram_hash_postings(batch, id_col, text_col, ngram)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        idv = np.asarray(ids.to_numpy(zero_copy_only=False), np.int64)[p]
        return pa.table({
            "tok": pa.array(tok, pa.int64()),
            "__id": pa.array(idv, pa.int64()),
            "n": pa.array(n.astype(np.int32), pa.int32()),
        })

    postings = docs.select_columns([id_col, text_col]).map_batches(
        featurize, batch_format="pyarrow", zero_copy_batch=True)

    def pair_block(block: pa.Table) -> pa.Table:
        if block.num_rows < 2:
            return _PAIR_PARTIAL_SCHEMA.empty_table()
        tok = np.asarray(block["tok"].to_numpy(zero_copy_only=False))
        ids = np.asarray(block["__id"].to_numpy(zero_copy_only=False))
        ns = np.asarray(block["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.lexsort((ids, tok))
        tok, ids, ns = tok[order], ids[order], ns[order]
        new_run = np.r_[True, tok[1:] != tok[:-1]]
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        over = run_len > max_posting
        if over.any():
            from epstein_pipeline_ray.state import metrics
            pos_in_run = np.arange(tok.size) - np.repeat(
                np.flatnonzero(new_run), run_len)
            keep = pos_in_run < max_posting
            metrics.inc("containment.postings_capped", int(over.sum()))
            metrics.inc("containment.rows_capped", int((~keep).sum()))
            tok, ids, ns, run_id = tok[keep], ids[keep], ns[keep], run_id[keep]
        I, J = _run_pairs(run_id)
        if I.size == 0:
            return _PAIR_PARTIAL_SCHEMA.empty_table()
        ia, ib = ids[I], ids[J]
        na, nb = ns[I], ns[J]
        swap = ia > ib
        ia2 = np.where(swap, ib, ia)
        ib2 = np.where(swap, ia, ib)
        na2 = np.where(swap, nb, na)
        nb2 = np.where(swap, na, nb)
        # map-side combine: one row per (pair) with its shared-token
        # count — lexsort + run boundaries, no pandas round-trip (na/nb
        # are pair-constant, so any member row's values serve)
        sel, cnt = _pair_group_agg(ia2, ib2)
        return pa.table({
            "id_a": pa.array(ia2[sel].astype(np.int64), pa.int64()),
            "id_b": pa.array(ib2[sel].astype(np.int64), pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            "na": pa.array(na2[sel].astype(np.int32), pa.int32()),
            "nb": pa.array(nb2[sel].astype(np.int32), pa.int32()),
        }, schema=_PAIR_PARTIAL_SCHEMA)

    partials = map_key_blocks(postings, ["tok"], pair_block, num_partitions,
                              sort_blocks=False)

    def reduce_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _CONTAIN_SCHEMA.empty_table()
        ida0 = np.asarray(block["id_a"].to_numpy(zero_copy_only=False),
                          np.int64)
        idb0 = np.asarray(block["id_b"].to_numpy(zero_copy_only=False),
                          np.int64)
        cnt0 = np.asarray(block["cnt"].to_numpy(zero_copy_only=False),
                          np.int64)
        sel, inter = _pair_group_agg(ida0, idb0, sum_col=cnt0)
        na = np.asarray(block["na"].to_numpy(zero_copy_only=False),
                        np.float64)[sel]
        nb = np.asarray(block["nb"].to_numpy(zero_copy_only=False),
                        np.float64)[sel]
        ida = ida0[sel]
        idb = idb0[sel]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_i: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for contained, container, n_c in ((ida, idb, na), (idb, ida, nb)):
            m = inter / n_c >= t
            out_a.append(contained[m])
            out_b.append(container[m])
            out_i.append(inter[m])
            out_c.append(sql_round(inter[m] / n_c[m], 6))
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            "n_inter": pa.array(np.concatenate(out_i), pa.int64()),
            "containment": pa.array(np.concatenate(out_c), pa.float64()),
        }, schema=_CONTAIN_SCHEMA)

    return map_key_blocks(partials, ["id_a", "id_b"], reduce_block,
                          num_partitions, sort_blocks=False)


_OVERLAP_PARTIAL_SCHEMA = pa.schema([
    ("source_a", pa.string()),
    ("source_b", pa.string()),
    ("cnt", pa.int64()),
])


def source_overlap(
    docs: Dataset,
    width: int = 12,
    text_col: str = "text",
    group_col: str = "source",
    num_partitions: int | None = None,
) -> pa.Table:
    """Cross-domain contamination matrix: for every unordered source
    pair, the number of DISTINCT boilerplate lines (``width``-word
    windows, the :func:`line_dedup_corpus` derivation) present in both
    sources — the inter-domain leakage report a mixture builder checks
    before weighting domains (shared boilerplate counted into two
    domains inflates both; CCNet/RefinedWeb line-dedup lineage,
    Wenzek 2020 §3.1).

    Plan: explode to (line, source) with a map-side per-batch distinct
    combiner → one exchange keyed on the 64-bit line hash (per block:
    distinct (line, source), runs over the LINE STRING so hash
    collisions cannot mis-merge, unordered source pairs pre-aggregated
    per block) → final reduce over a sources²-bounded partial table,
    summed driver-side (the documented small-side exception)."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        srcs = batch[group_col].to_pylist()
        out_line: list[str] = []
        out_src: list[str] = []
        out_lh: list[int] = []
        seen: set[tuple[str, str]] = set()
        for text, src in zip(texts, srcs):
            words = (text or "").split(" ")
            for i in range(0, (len(words) + width - 1) // width):
                line = " ".join(words[i * width: i * width + width])
                key = (line, src)
                if key in seen:
                    continue
                seen.add(key)
                out_line.append(line)
                out_src.append(src)
                h = _token_hash64(line)
                out_lh.append(h if h < (1 << 63) else h - (1 << 64))
        return pa.table({
            "lh": pa.array(out_lh, pa.int64()),
            "line": pa.array(out_line, pa.large_string()),
            "source": pa.array(out_src, pa.string()),
        })

    lines = docs.select_columns([text_col, group_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)

    def pair_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _OVERLAP_PARTIAL_SCHEMA.empty_table()
        df = (block.to_pandas()
              .drop_duplicates(["line", "source"])
              .sort_values(["line", "source"], kind="mergesort")
              .reset_index(drop=True))
        ln = df["line"].to_numpy()
        run_id = np.cumsum(np.r_[True, ln[1:] != ln[:-1]]) - 1
        I, J = _run_pairs(run_id)
        if I.size == 0:
            return _OVERLAP_PARTIAL_SCHEMA.empty_table()
        src = df["source"].to_numpy()
        g = (pd.DataFrame({"source_a": src[I], "source_b": src[J]})
             .groupby(["source_a", "source_b"], sort=False).size()
             .reset_index(name="cnt"))
        return pa.table({
            "source_a": pa.array(g["source_a"], pa.string()),
            "source_b": pa.array(g["source_b"], pa.string()),
            "cnt": pa.array(g["cnt"].to_numpy(np.int64), pa.int64()),
        }, schema=_OVERLAP_PARTIAL_SCHEMA)

    partials = map_key_blocks(lines, ["lh"], pair_block,
                              num_partitions, sort_blocks=False)
    pdf = partials.to_pandas()
    if len(pdf) == 0:
        return pa.table({"source_a": pa.array([], pa.string()),
                         "source_b": pa.array([], pa.string()),
                         "n_shared": pa.array([], pa.int64())})
    out = (pdf.groupby(["source_a", "source_b"], sort=True)["cnt"].sum()
           .reset_index().rename(columns={"cnt": "n_shared"}))
    return pa.table({
        "source_a": pa.array(out["source_a"], pa.string()),
        "source_b": pa.array(out["source_b"], pa.string()),
        "n_shared": pa.array(out["n_shared"].to_numpy(np.int64), pa.int64()),
    })


_XPAIR_PARTIAL_SCHEMA = pa.schema([
    ("new_id", pa.int64()),
    ("old_id", pa.int64()),
    ("cnt", pa.int64()),
    ("nn", pa.int32()),
    ("no", pa.int32()),
])

_XPAIR_SCHEMA = pa.schema([
    ("new_id", pa.int64()),
    ("old_id", pa.int64()),
    ("n_inter", pa.int64()),
    ("jaccard", pa.float64()),
])


def cross_jaccard_pairs(
    new_docs: Dataset,
    old_docs: Dataset,
    threshold: float = 0.8,
    ngram: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    max_posting: int = 8192,
) -> Dataset:
    """Cross-snapshot near-dedup join: ``(new_id, old_id, n_inter,
    jaccard)`` for every NEW×OLD pair with word-``ngram``-shingle
    Jaccard >= ``threshold`` — the crawl-N+1-vs-crawl-N dedup a corpus
    builder runs between snapshots (dedup the fresh crawl against the
    corpus already trained on, WITHOUT re-clustering the old side; the
    incremental-dedup gap the reference's whole-corpus passes leave
    open, reference processors/dedup.py:138-171 recomputes everything).

    Same exact count-then-filter plan as :func:`containment_pairs`
    (postings exchange on the shingle hash with a map-side pair
    combiner, then a pair-keyed exchange summing exact |A ∩ B|), but
    the per-token pairing is CROSS-SIDE ONLY: new×new and old×old pairs
    are never emitted, so the pair exchange stays proportional to
    cross-matching pairs even when either snapshot is internally
    duplicate-heavy. Docs with fewer than ``ngram`` words never pair
    (blank-doc convention); postings above ``max_posting`` rows are
    truncated with metrics accounting (``cross_dedup.postings_capped``).
    Shingle identity is a 64-bit splitmix-mixed rolling polynomial over
    blake2b word hashes (collision ~2^-64 may overcount one
    intersection slot — documented, matches containment).
    """
    t = float(threshold)

    def make_featurize(side: int):
        def featurize(batch: pa.Table) -> pa.Table:
            p, tok, n = _ngram_hash_postings(batch, id_col, text_col,
                                             ngram)
            ids = batch[id_col]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            idv = np.asarray(ids.to_numpy(zero_copy_only=False),
                             np.int64)[p]
            return pa.table({
                "tok": pa.array(tok, pa.int64()),
                "__id": pa.array(idv, pa.int64()),
                "n": pa.array(n.astype(np.int32), pa.int32()),
                "side": pa.array(np.full(len(p), side, np.int8),
                                 pa.int8()),
            })
        return featurize

    postings = (
        new_docs.select_columns([id_col, text_col])
        .map_batches(make_featurize(0), batch_format="pyarrow",
                     zero_copy_batch=True)
        .union(
            old_docs.select_columns([id_col, text_col])
            .map_batches(make_featurize(1), batch_format="pyarrow",
                         zero_copy_batch=True))
    )

    def pair_block(block: pa.Table) -> pa.Table:
        if block.num_rows < 2:
            return _XPAIR_PARTIAL_SCHEMA.empty_table()
        tok = np.asarray(block["tok"].to_numpy(zero_copy_only=False))
        ids = np.asarray(block["__id"].to_numpy(zero_copy_only=False))
        ns = np.asarray(block["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sd = np.asarray(block["side"].to_numpy(zero_copy_only=False), dtype=np.int8)
        # sort new-side rows first within each token run so cross pairs
        # are exactly the (I in new-prefix, J in old-suffix) rectangle
        order = np.lexsort((ids, sd, tok))
        tok, ids, ns, sd = tok[order], ids[order], ns[order], sd[order]
        new_run = np.r_[True, tok[1:] != tok[:-1]]
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        over = run_len > max_posting
        if over.any():
            from epstein_pipeline_ray.state import metrics
            pos_in_run = np.arange(tok.size) - np.repeat(
                np.flatnonzero(new_run), run_len)
            keep = pos_in_run < max_posting
            metrics.inc("cross_dedup.postings_capped", int(over.sum()))
            metrics.inc("cross_dedup.rows_capped", int((~keep).sum()))
            tok, ids, ns, sd, run_id = (tok[keep], ids[keep], ns[keep],
                                        sd[keep], run_id[keep])
        I, J = _run_pairs(run_id)
        if I.size == 0:
            return _XPAIR_PARTIAL_SCHEMA.empty_table()
        cross = sd[I] != sd[J]
        I, J = I[cross], J[cross]
        if I.size == 0:
            return _XPAIR_PARTIAL_SCHEMA.empty_table()
        # after the side-major sort, I is always the new side of the
        # pair; lexsort + run boundaries replace the pandas groupby
        # (nn/no are pair-constant)
        nid, oid = ids[I], ids[J]
        nn, no = ns[I], ns[J]
        sel, cnt = _pair_group_agg(nid, oid)
        return pa.table({
            "new_id": pa.array(nid[sel].astype(np.int64), pa.int64()),
            "old_id": pa.array(oid[sel].astype(np.int64), pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            "nn": pa.array(nn[sel].astype(np.int32), pa.int32()),
            "no": pa.array(no[sel].astype(np.int32), pa.int32()),
        }, schema=_XPAIR_PARTIAL_SCHEMA)

    partials = map_key_blocks(postings, ["tok"], pair_block, num_partitions,
                              sort_blocks=False)

    def reduce_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _XPAIR_SCHEMA.empty_table()
        nid0 = np.asarray(block["new_id"].to_numpy(zero_copy_only=False),
                          np.int64)
        oid0 = np.asarray(block["old_id"].to_numpy(zero_copy_only=False),
                          np.int64)
        cnt0 = np.asarray(block["cnt"].to_numpy(zero_copy_only=False),
                          np.int64)
        sel, inter = _pair_group_agg(nid0, oid0, sum_col=cnt0)
        nn = np.asarray(block["nn"].to_numpy(zero_copy_only=False),
                        np.int64)[sel]
        no = np.asarray(block["no"].to_numpy(zero_copy_only=False),
                        np.int64)[sel]
        union = nn + no - inter
        jac = inter / union
        m = jac >= t
        return pa.table({
            "new_id": pa.array(nid0[sel][m], pa.int64()),
            "old_id": pa.array(oid0[sel][m], pa.int64()),
            "n_inter": pa.array(inter[m], pa.int64()),
            "jaccard": pa.array(sql_round(jac[m], 6), pa.float64()),
        }, schema=_XPAIR_SCHEMA)

    return map_key_blocks(partials, ["new_id", "old_id"], reduce_block,
                          num_partitions, sort_blocks=False)


def ngram_novelty(
    docs, n: int = 8, id_col: str = "doc_id", text_col: str = "text",
    round_digits: int = 9, num_partitions: int | None = None,
):
    """Per-doc novelty profile in corpus order (the inverse of the
    dedup-rate view): of each doc's DISTINCT word n-grams, the
    fraction whose FIRST corpus appearance (min id) is this doc —
    1.0 = all-new content, 0.0 = everything seen in earlier docs.
    Two exchanges: gram-keyed (per block, min doc per gram -> an
    is-first flag on every (gram, doc) row) then doc-keyed count/sum.
    Docs with fewer than ``n`` tokens emit nothing (no grams — the
    twin's WHERE len >= n). Tokens: WORD_RE, lowercased. Output:
    (id_col, n_grams, n_novel, novelty)."""
    import numpy as np
    import pyarrow as pa

    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks
    from epstein_pipeline_ray.stages.ranking import WORD_RE

    itype = dict(zip(docs.schema().names, docs.schema().types))[id_col]
    GD = pa.schema([("g", pa.string()), (id_col, itype)])

    def grams(batch: pa.Table) -> pa.Table:
        gs, ids = [], []
        for did, tx in zip(batch[id_col].to_pylist(),
                           batch[text_col].to_pylist()):
            toks = [m.lower() for m in WORD_RE.findall(tx or "")]
            if len(toks) < n:
                continue
            seen = {" ".join(toks[i:i + n])
                    for i in range(len(toks) - n + 1)}
            gs.extend(seen)
            ids.extend([did] * len(seen))
        return pa.table({"g": pa.array(gs, pa.string()),
                         id_col: pa.array(ids, itype)}, schema=GD)

    FLAG = pa.schema([(id_col, itype), ("first", pa.int8())])

    def first_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return FLAG.empty_table()
        df = block.to_pandas()
        fd = df.groupby("g")[id_col].transform("min")
        return pa.table({
            id_col: pa.array(df[id_col], itype, from_pandas=True),
            "first": pa.array((df[id_col] == fd).to_numpy()
                              .astype(np.int8), pa.int8()),
        }, schema=FLAG)

    flags = map_key_blocks(
        docs.select_columns([id_col, text_col]).map_batches(
            grams, batch_format="pyarrow", zero_copy_batch=True),
        ["g"], first_block, num_partitions, sort_blocks=False)

    OUT = pa.schema([(id_col, itype), ("n_grams", pa.int64()),
                     ("n_novel", pa.int64()), ("novelty", pa.float64())])

    def agg_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        g = (block.to_pandas().groupby(id_col, sort=True)["first"]
             .agg(n="size", nv="sum").reset_index())
        nn = g["n"].to_numpy(np.float64)
        nv = g["nv"].to_numpy(np.float64)
        return pa.table({
            id_col: pa.array(g[id_col], itype, from_pandas=True),
            "n_grams": pa.array(nn.astype(np.int64), pa.int64()),
            "n_novel": pa.array(nv.astype(np.int64), pa.int64()),
            "novelty": pa.array(sql_round(nv / nn, round_digits),
                                pa.float64()),
        }, schema=OUT)

    return map_key_blocks(flags, [id_col], agg_block, num_partitions,
                          sort_blocks=False)


def dup_rate_estimate(
    docs,
    n_mod: int = 17,
    mult: int = 2654435761,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Corpus duplication-rate ESTIMATE from a deterministic pair
    sample — the answer to "is a full dedup pass worth scheduling"
    without paying for one. Every ``n_mod``-th doc pairs with a
    pinned-hash partner ((id*mult) mod n, self-pairs dropped); the
    partner text attaches through the size-switched join and each
    sampled pair scores the wordset-Jaccard convention
    (dedup_extra.wordset semantics: lowered whitespace word sets,
    blank docs score 0). Output: one row
    (n_pairs, mean_jaccard, dup_share) with dup_share = fraction of
    sampled pairs at or above ``threshold``."""
    import pyarrow as pa

    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.joins import attach_column

    n = docs.count()

    def sample(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                         np.int64)
        keep = ids % n_mod == 0
        ids = ids[keep]
        partner = (ids * mult) % n
        ok = partner != ids
        t = batch.filter(pa.array(keep))
        return pa.table({
            id_col: pa.array(ids[ok], pa.int64()),
            "partner": pa.array(partner[ok], pa.int64()),
            text_col: t.filter(pa.array(ok))[text_col],
        })

    pairs = docs.select_columns([id_col, text_col]).map_batches(
        sample, batch_format="pyarrow", zero_copy_batch=True)
    pairs = attach_column(pairs, docs.select_columns([id_col, text_col]),
                          "partner", id_col, text_col, "partner_text")

    def score(batch: pa.Table) -> pa.Table:
        out = []
        for a, b in zip(batch[text_col].to_pylist(),
                        batch["partner_text"].to_pylist()):
            sa = set((a or "").lower().split())
            sb = set((b or "").lower().split())
            u = len(sa | sb)
            out.append(len(sa & sb) / u if u else 0.0)
        j = np.asarray(out, np.float64)
        return pa.table({
            "__n": pa.array([len(j)], pa.int64()),
            "__s": pa.array([float(j.sum())], pa.float64()),
            "__d": pa.array([int((j >= threshold).sum())], pa.int64()),
        })

    rows = pairs.map_batches(score, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    np_ = sum(r["__n"] for r in rows)
    s = sum(r["__s"] for r in rows)
    d = sum(r["__d"] for r in rows)
    mean_j = (float(sql_round(np.array([s / np_]), 6)[0]) if np_ else None)
    share = (float(sql_round(np.array([d / np_]), 6)[0]) if np_ else None)
    return pa.table({
        "n_pairs": pa.array([np_], pa.int64()),
        "mean_jaccard": pa.array([mean_j], pa.float64()),
        "dup_share": pa.array([share], pa.float64()),
    })
