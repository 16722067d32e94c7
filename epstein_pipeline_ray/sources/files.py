"""Binary-file ingestion with content hashing (reference M3:
utils/hashing.py:23-36 ``file_hash`` — SHA-256 of raw file bytes, and the
PDF-lister pattern S2 that walks a directory into work items).

Ray-Data-first: ``read_binary_files`` streams each file as one row of an
Arrow binary column (bytes live in the object store, never the driver);
the hash stage is a ``map_batches`` over those rows. Per-row hashing is
payload-bound, not row-bound, so the Python loop over rows is fine — the
work is C (hashlib) over megabyte buffers.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset


def file_hashes(paths: str | list[str], keep_bytes: bool = False) -> Dataset:
    """(path, n_bytes, sha256[, data]) per file under ``paths``.

    ``keep_bytes=False`` drops the payload after hashing so only the
    manifest flows downstream — at 100 TB the bytes column must not
    survive past the stage that needs it."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def add_hash(batch: pa.Table) -> pa.Table:
        data = batch["bytes"]
        if isinstance(data, pa.ChunkedArray):
            data = data.combine_chunks()
        digests, sizes = [], []
        for i in range(len(data)):
            buf = data[i].as_buffer()
            # memoryview slicing feeds hashlib without copying the payload
            digests.append(hashlib.sha256(memoryview(buf)).hexdigest())
            sizes.append(len(buf))
        cols = {
            "path": batch["path"],
            "n_bytes": pa.array(sizes, pa.int64()),
            "sha256": pa.array(digests, pa.string()),
        }
        if keep_bytes:
            cols["data"] = data
        return pa.table(cols)

    return ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)


def dedup_files_by_hash(paths: str | list[str]) -> Dataset:
    """Exact file-level dedup: one representative path (lexicographic min)
    per distinct SHA-256 — the file-corpus twin of the exact text pass."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    hashes = file_hashes(paths)

    def first_per_hash(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.schema([("sha256", pa.string()), ("path", pa.string()),
                              ("n_copies", pa.int64())]).empty_table()
        import numpy as np
        import pyarrow.compute as pc

        block = block.combine_chunks().sort_by(
            [("sha256", "ascending"), ("path", "ascending")])
        h = block["sha256"]
        codes = np.asarray((h.combine_chunks() if isinstance(h, pa.ChunkedArray)
                            else h).dictionary_encode().indices)
        starts = np.concatenate([[0], np.nonzero(codes[1:] != codes[:-1])[0] + 1])
        counts = np.diff(np.concatenate([starts, [len(codes)]]))
        take = pa.array(starts)
        return pa.table({
            "sha256": pc.take(block["sha256"], take),
            "path": pc.take(block["path"], take),
            "n_copies": pa.array(counts, pa.int64()),
        })

    return map_key_blocks(hashes.select_columns(["sha256", "path"]),
                          ["sha256"], first_per_hash, sort_blocks=False)
