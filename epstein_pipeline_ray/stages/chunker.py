"""Chunkers (1 doc row → N chunk rows) + the OCR noise-clean stage.

- ``chunk_docs``: fixed sliding window (reference
  src/epstein_pipeline/processors/chunker.py:302-379, simplified to the
  window/stride core — the reference's boundary-snapping regexes are
  OCR-specific). SURVEY M10.
- ``semantic_chunk_docs``: the reference's semantic mode
  (chunker.py:126-296, config.py:98-101) — paragraph split → greedy merge
  to a token target, sentence-split oversized paragraphs, min/max token
  bounds, optional title prefix. SURVEY M11. This is the mode the
  reference actually embeds with.
- ``clean_docs``: the OCR noise cleaner applied as a stage (SURVEY M9).

All are embarrassingly parallel ``map_batches``; per-doc work is Python
(the greedy merge is inherently sequential per doc) but state (compiled
regexes) lives at module level, loaded once per worker.
"""

from __future__ import annotations

import re

import pyarrow as pa
from ray.data import Dataset

from epstein_pipeline_ray.functions.textclean import clean_ocr_noise

_PARA_SPLIT = re.compile(r"\n\s*\n")
_SENT_END = re.compile(r"[.!?]\s+")

CHUNK_SCHEMA_EXTRA = ("token_count_est",)


def clean_docs(docs: Dataset, text_col: str = "text") -> Dataset:
    """Replace ``text_col`` with its OCR-noise-cleaned form (M9)."""

    def clean(batch: pa.Table) -> pa.Table:
        vals = [None if s is None else clean_ocr_noise(s)
                for s in batch[text_col].to_pylist()]
        idx = batch.schema.get_field_index(text_col)
        return batch.set_column(idx, text_col,
                                pa.array(vals, batch[text_col].type))

    return docs.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)


def semantic_chunks_one(
    text: str,
    *,
    target_tokens: int = 512,
    min_tokens: int = 100,
    max_tokens: int = 1024,
    min_chunk_size: int = 200,
    title: str | None = None,
    chars_per_token: int = 4,
) -> list[tuple[int, str, int, int]]:
    """Semantic chunks of one document →
    [(chunk_index, chunk_text, char_offset, token_count_est)].

    Faithful to the reference algorithm (chunker.py:126-296) including its
    quirks: char_offset only advances on paragraph-merge flushes, the
    trailing sentence buffer re-enters the paragraph buffer without a min
    check, and a buffer tail shorter than target/4 carries over as
    overlap context.
    """
    text = clean_ocr_noise(text or "")
    if not text or len(text.strip()) < min_chunk_size:
        return []
    target_chars = target_tokens * chars_per_token
    min_chars = min_tokens * chars_per_token
    max_chars = max_tokens * chars_per_token

    paras = [p.strip() for p in _PARA_SPLIT.split(text) if p.strip()]
    if not paras:
        return []

    def finish(body: str) -> str:
        return f"{title}\n\n{body}" if title else body

    if sum(len(p) for p in paras) <= target_chars:
        body = "\n\n".join(paras).strip()
        out_text = finish(body)
        return [(0, out_text, 0, len(out_text) // chars_per_token)]

    out: list[tuple[int, str, int, int]] = []
    buf: list[str] = []
    buf_len = 0
    idx = 0
    offset = 0

    def emit(body: str, at: int) -> None:
        nonlocal idx
        if len(body) >= min_chars:
            t = finish(body)
            out.append((idx, t, at, len(t) // chars_per_token))
            idx += 1

    for para in paras:
        if len(para) > max_chars:
            # flush the paragraph buffer, then sentence-split this one
            if buf:
                emit("\n\n".join(buf).strip(), offset)
                buf, buf_len = [], 0
            sents = [s.strip() for s in _SENT_END.split(para) if s.strip()]
            sbuf: list[str] = []
            slen = 0
            for sent in sents:
                if slen + len(sent) > target_chars and sbuf:
                    emit(" ".join(sbuf).strip(), offset)
                    sbuf, slen = [], 0
                sbuf.append(sent)
                slen += len(sent)
            if sbuf:
                buf = [" ".join(sbuf)]
                buf_len = slen
            continue
        if buf_len + len(para) > target_chars and buf:
            body = "\n\n".join(buf).strip()
            if len(body) >= min_chars:
                emit(body, offset)
                offset += buf_len
            # short tail carries over as overlap context
            if buf and len(buf[-1]) < target_chars // 4:
                buf = [buf[-1]]
                buf_len = len(buf[0])
            else:
                buf, buf_len = [], 0
        buf.append(para)
        buf_len += len(para)

    if buf:
        emit("\n\n".join(buf).strip(), offset)
    return out


def semantic_chunk_docs(
    docs: Dataset,
    target_tokens: int = 512,
    min_tokens: int = 100,
    max_tokens: int = 1024,
    min_chunk_size: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    title_col: str | None = None,
) -> Dataset:
    """Semantic-mode chunker as a 1→N ``map_batches`` stage (M11)."""

    def chunk(batch: pa.Table) -> pa.Table:
        ids_out, idx_out, off_out, txt_out, tok_out = [], [], [], [], []
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        titles = batch[title_col].to_pylist() if title_col else [None] * len(ids)
        for doc_id, text, title in zip(ids, texts, titles):
            for ci, ct, off, tc in semantic_chunks_one(
                text,
                target_tokens=target_tokens,
                min_tokens=min_tokens,
                max_tokens=max_tokens,
                min_chunk_size=min_chunk_size,
                title=title,
            ):
                ids_out.append(doc_id)
                idx_out.append(ci)
                off_out.append(off)
                txt_out.append(ct)
                tok_out.append(tc)
        return pa.table(
            {
                id_col: pa.array(ids_out, batch[id_col].type),
                "chunk_index": pa.array(idx_out, pa.int32()),
                "char_offset": pa.array(off_out, pa.int64()),
                "chunk_text": pa.array(txt_out, pa.large_string()),
                "token_count_est": pa.array(tok_out, pa.int64()),
            }
        )

    return docs.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True)


def chunk_docs(
    docs: Dataset,
    chunk_size: int = 200,
    overlap: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap

    def chunk(batch: pa.Table) -> pa.Table:
        ids_out, idx_out, off_out, txt_out = [], [], [], []
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        for doc_id, text in zip(ids, texts):
            text = text or ""
            n = len(text)
            ci = 0
            for off in range(0, max(n, 1), stride):
                piece = text[off : off + chunk_size]
                ids_out.append(doc_id)
                idx_out.append(ci)
                off_out.append(off)
                txt_out.append(piece)
                ci += 1
                if off + chunk_size >= n:
                    break
        return pa.table(
            {
                id_col: pa.array(ids_out, batch[id_col].type),
                "chunk_index": pa.array(idx_out, pa.int32()),
                "char_offset": pa.array(off_out, pa.int64()),
                "chunk_text": pa.array(txt_out, pa.large_string()),
            }
        )

    return docs.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True)
