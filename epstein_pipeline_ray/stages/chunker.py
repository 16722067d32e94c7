"""Fixed sliding-window chunker (1 doc row → N chunk rows).

Reference semantics (src/epstein_pipeline/processors/chunker.py:302-379,
simplified to the window/stride core — the reference's boundary-snapping
regexes are OCR-specific): windows of ``chunk_size`` chars advancing by
``chunk_size - overlap``; the final window may be short; every doc emits
at least one chunk. Embarrassingly parallel `map_batches` (SURVEY M10).
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset


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
