"""C4-style boilerplate line filtering (Raffel et al. 2020, §2.2 — the
cleaning pass a web-scale pretraining corpus runs before dedup):

- keep only lines that end in terminal punctuation (``[.!?"]``),
- drop lines with fewer than ``min_words`` words,
- flag pages containing "lorem ipsum" or a curly brace,
- keep a page only if >= ``min_kept_lines`` lines survive and no flag.

One vectorized ``map_batches`` pass: Arrow list kernels split lines
(``split_pattern`` + ``list_parent_indices``), per-line predicates are
RE2 kernels shared verbatim with the DuckDB twin, and the cleaned text
is rebuilt with ``binary_join`` over run offsets — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

TERMINAL_RE = r'[.!?"]\s*$'
WORD_RE = r"\S+"


def c4_line_filter(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> Dataset:
    """→ (id_col, n_lines, n_kept, has_lorem, has_brace, keep, clean_text)."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text.cast(pa.large_string()), "")
        lines = pc.split_pattern(text, pattern="\n")
        parents = np.asarray(pc.list_parent_indices(lines))
        flat = lines.flatten()
        terminal = pc.match_substring_regex(flat, TERMINAL_RE)
        wc = pc.count_substring_regex(flat, WORD_RE)
        kept = np.asarray(pc.and_(
            terminal, pc.greater_equal(wc, min_words)
        ).to_numpy(zero_copy_only=False))
        n = batch.num_rows
        n_lines = np.asarray(pc.list_value_length(lines)).astype(np.int64)
        n_kept = np.bincount(parents[kept], minlength=n).astype(np.int64)
        # rebuild the cleaned page from surviving lines (order preserved)
        kept_flat = flat.filter(pa.array(kept))
        offsets = np.concatenate([[0], np.cumsum(n_kept)])
        clean = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), kept_flat),
            pa.scalar("\n", pa.large_string()))
        has_lorem = pc.match_substring(pc.utf8_lower(text), "lorem ipsum")
        has_brace = pc.match_substring(text, "{")
        keep = pc.and_(
            pa.array(n_kept >= min_kept_lines),
            pc.and_(pc.invert(has_lorem), pc.invert(has_brace)))
        return pa.table({
            id_col: batch[id_col],
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "has_lorem": has_lorem,
            "has_brace": has_brace,
            "keep": keep,
            "clean_text": clean,
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


# pinned op order, shared verbatim with the SQL twin: tags → entities
# (amp LAST so '&amp;lt;' decodes to '&lt;', the HTML spec order) →
# whitespace collapse → trim
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&amp;", "&")]


def strip_html(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "clean_text",
) -> Dataset:
    """HTML boilerplate removal — the front-door cleanup before any
    C4-style line filtering on web-crawled text: drop ``<...>`` tags
    (replaced by a space so adjacent words don't fuse), decode the five
    core character entities, collapse whitespace runs, trim. Every step
    is an RE2 kernel (pyarrow.compute) — the same regex engine DuckDB
    uses, so the twin is expression-for-expression identical."""

    def clean(batch: pa.Table) -> pa.Table:
        t = batch[text_col]
        t = pc.replace_substring_regex(t, pattern="<[^>]*>",
                                       replacement=" ")
        for ent, ch in _ENTITIES:
            t = pc.replace_substring(t, pattern=ent, replacement=ch)
        t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        # trim ASCII space only — RE2's \s already collapsed every run it
        # recognizes, and DuckDB trim() is ASCII-space too, so exotic
        # unicode spaces behave identically on both engines
        t = pc.utf8_trim(t, characters=" ")
        return pa.table({id_col: batch[id_col], out_col: t})

    return docs.map_batches(clean, batch_format="pyarrow",
                            zero_copy_batch=True)
