"""NDJSON / JSON-result-dir sources with a malformed-row policy (S1).

Reference semantics (cli.py:595-616): one JSON file per document; files
that fail to parse or lack the identifying fields are SILENTLY SKIPPED
(``except Exception: continue``); envelope objects (``{"document":
{...}}``, the ProcessingResult shape) are unwrapped; bare objects must
carry the identifying fields. The reference has no explicit policy knob —
the ``policy`` parameter here generalizes its skip behavior:

- ``skip``  — drop malformed / required-field-missing rows (reference).
- ``error`` — raise on the first malformed row (strict ingest).
- ``null``  — keep a row of nulls per malformed line for later auditing.

Two readers for two physical layouts:

- :func:`read_ndjson` — newline-delimited JSON shards, the layout a
  100-TB pipeline actually ships. Fast path parses a whole batch of
  lines with ``pyarrow.json`` (C++, explicit schema); only a batch
  containing a bad line pays the per-line Python fallback, so clean data
  never runs row-wise Python.
- :func:`read_result_dir` — the reference's one-JSON-file-per-document
  dirs via ``ray.data.read_binary_files`` (parse is per-file by nature).
"""

from __future__ import annotations

import io
import json

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset


class MalformedJSONError(ValueError):
    """Raised under policy='error' with the offending line/path."""


def _null_row(schema: pa.Schema) -> dict:
    return {name: None for name in schema.names}


def _rows_to_table(rows: list[dict], schema: pa.Schema) -> pa.Table:
    cols = {
        f.name: pa.array([r.get(f.name) for r in rows], f.type) for f in schema
    }
    return pa.table(cols, schema=schema)


def _filter_required(tbl: pa.Table, required: tuple[str, ...],
                     policy: str, what: str) -> pa.Table:
    """Apply the policy to structurally-valid rows missing required fields."""
    import pyarrow.compute as pc

    if not required:
        return tbl
    mask = None
    for col in required:
        v = pc.is_valid(tbl[col])
        mask = v if mask is None else pc.and_(mask, v)
    if policy == "skip":
        return tbl.filter(mask)
    if policy == "error" and not pc.all(mask).as_py() and tbl.num_rows:
        raise MalformedJSONError(f"required field missing in {what}")
    return tbl  # null: keep the row, missing fields stay null


def parse_ndjson_lines(lines: list[str], schema: pa.Schema, policy: str,
                       required: tuple[str, ...]) -> pa.Table:
    """One batch of NDJSON lines → Arrow table under the policy.

    Fast path: one ``pyarrow.json.read_json`` call over the joined batch
    (explicit schema, unknown fields ignored). Any structural error in the
    batch falls back to per-line ``json.loads`` where the policy applies
    row by row — the O(rows) Python loop is paid only on dirty batches.
    """
    from pyarrow import json as paj

    opts = paj.ParseOptions(
        explicit_schema=schema, unexpected_field_behavior="ignore"
    )
    try:
        tbl = paj.read_json(
            io.BytesIO("\n".join(lines).encode("utf-8")), parse_options=opts
        )
        return _filter_required(tbl.cast(schema), required, policy, "batch")
    except pa.ArrowInvalid:
        pass
    rows: list[dict] = []
    for ln in lines:
        if not ln.strip():
            continue
        try:
            obj = json.loads(ln)
            if not isinstance(obj, dict):
                raise ValueError("not a JSON object")
            if any(obj.get(c) is None for c in required):
                raise ValueError("required field missing")
            rows.append(obj)
        except (ValueError, TypeError) as exc:
            if policy == "error":
                raise MalformedJSONError(f"{exc}: {ln[:120]!r}") from exc
            if policy == "null":
                rows.append(_null_row(schema))
    return _rows_to_table(rows, schema)


def read_ndjson(paths: str | list[str], schema: pa.Schema,
                policy: str = "skip",
                required: tuple[str, ...] = ()) -> Dataset:
    """NDJSON shard reader: ``read_text`` (one row per line, file-parallel)
    → batch parse. Bare objects only; envelopes are a result-dir shape."""
    assert policy in ("skip", "error", "null")
    ds = rd.read_text(paths)

    def parse(batch: pa.Table) -> pa.Table:
        return parse_ndjson_lines(
            batch["text"].to_pylist(), schema, policy, required
        )

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


def read_result_dir(paths: str | list[str], schema: pa.Schema,
                    policy: str = "skip",
                    required: tuple[str, ...] = (),
                    envelope_key: str = "document") -> Dataset:
    """Reference-shaped result dir: one JSON document per ``*.json`` file;
    ``{"document": {...}}`` envelopes unwrapped (cli.py:603-609)."""
    assert policy in ("skip", "error", "null")
    ds = rd.read_binary_files(paths, include_paths=True,
                              file_extensions=["json"])

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for path, data in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            try:
                obj = json.loads(data.decode("utf-8"))
                if isinstance(obj, dict) and envelope_key in obj:
                    obj = obj[envelope_key]
                if not isinstance(obj, dict):
                    raise ValueError("not a JSON object")
                if any(obj.get(c) is None for c in required):
                    raise ValueError("required field missing")
                rows.append(obj)
            except (ValueError, TypeError, UnicodeDecodeError) as exc:
                if policy == "error":
                    raise MalformedJSONError(f"{exc}: {path}") from exc
                if policy == "null":
                    rows.append(_null_row(schema))
        return _rows_to_table(rows, schema)

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


def read_ndjson_gz(paths: str | list[str], schema: pa.Schema,
                   policy: str = "skip",
                   required: tuple[str, ...] = ()) -> Dataset:
    """Gzip NDJSON shard reader — ``read_text`` with a gzip stream
    (file-parallel decompression in the read tasks) into the same
    malformed-row policy parse as :func:`read_ndjson`."""
    assert policy in ("skip", "error", "null")
    # restrict to *.gz: the writer publishes shards atomically via
    # `<name>.tmp.<pid>` + os.replace, and a directory listing that races a
    # concurrent writer must never hand a half-written temp to the gzip
    # decoder ("zlib inflate failed")
    ds = rd.read_text(paths, file_extensions=["gz"],
                      arrow_open_stream_args={"compression": "gzip"})

    def parse(batch: pa.Table) -> pa.Table:
        return parse_ndjson_lines(
            batch["text"].to_pylist(), schema, policy, required
        )

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
