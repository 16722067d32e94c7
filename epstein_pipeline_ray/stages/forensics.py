"""Embedded-plist forensics over binary payload columns.

Documents converted from Apple Mail can carry embedded plist metadata
(sender / recipients / subject / date / headers) inside the binary
stream; the reference scans files for XML and binary plists and parses
them with stdlib ``plistlib``
(reference: src/epstein_pipeline/processors/plist_forensics.py:22-148).

Re-expressed Ray-Data-first: one ``map_batches`` pass over a
``(id, payload: large_binary)`` Dataset that emits one row per extracted
plist — the scan parallelises per payload batch, no driver loop (the
reference iterates files serially on one process,
plist_forensics.py:150-171). Nested values come out as typed Arrow
columns (``recipients: list<string>``, ``raw_keys: list<string>``) and
the free-form header map as a JSON string.

plistlib is stdlib — this stage is fully real, unlike the codec-bound
media decode fakes in ``stages.multimodal``.
"""

from __future__ import annotations

import json
import plistlib
import re

import pyarrow as pa
from ray.data import Dataset

# markers the reference looks for (plist_forensics.py:23-27)
_PLIST_XML_PATTERN = re.compile(
    rb"<\?xml\s+version=[^?]+\?>\s*.*?<plist[^>]*>.*?</plist>",
    re.DOTALL,
)
_BPLIST_MAGIC = b"bplist00"

PLIST_META_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("plist_type", pa.string()),
        ("sender", pa.string()),
        ("recipients", pa.list_(pa.string())),
        ("subject", pa.string()),
        ("date", pa.string()),
        ("headers_json", pa.string()),
        ("raw_keys", pa.list_(pa.string())),
    ]
)


def _parse_plist_dict(data, plist_type: str) -> dict | None:
    """Mail-metadata projection of one parsed plist (reference
    plist_forensics.py:97-148: same key ladder, same keep-if-useful
    rule)."""
    if not isinstance(data, dict):
        return None
    sender = data.get("sender") or data.get("from") or data.get("X-Sender")
    if not sender:
        author = data.get("kMDItemAuthorAddresses")
        sender = author[0] if isinstance(author, list) and author else author
    recipients: list[str] = []
    for key in ("to", "recipients", "X-To", "kMDItemRecipientAddresses"):
        val = data.get(key)
        if isinstance(val, list):
            recipients.extend(str(v) for v in val)
        elif isinstance(val, str):
            recipients.append(val)
    subject = data.get("subject") or data.get("Subject") or data.get("kMDItemSubject")
    date = data.get("date") or data.get("Date") or data.get("kMDItemContentCreationDate")
    if date is not None and not isinstance(date, str):
        date = str(date)
    if not (sender or recipients or subject):
        return None
    headers = {k: v for k, v in data.items() if isinstance(v, str) and len(v) < 1000}
    return {
        "plist_type": plist_type,
        "sender": str(sender) if sender else None,
        "recipients": recipients,
        "subject": str(subject) if subject else None,
        "date": date,
        "headers_json": json.dumps(headers, sort_keys=True, default=str),
        "raw_keys": [str(k) for k in data.keys()],
    }


def extract_plists_from_bytes(raw: bytes) -> list[dict]:
    """All mail-metadata plists embedded in one binary payload.

    XML plists are located by the reference's marker regex; binary
    plists by the ``bplist00`` magic with the reference's
    grow-the-window parse (first parseable end wins,
    plist_forensics.py:82-93) — but the magic scan here is
    ``bytes.find`` (the reference slices at every byte offset, O(n·8)).
    """
    out: list[dict] = []
    for match in _PLIST_XML_PATTERN.finditer(raw):
        try:
            parsed = plistlib.loads(match.group())
        except Exception:
            continue
        meta = _parse_plist_dict(parsed, "xml")
        if meta:
            out.append(meta)
    pos = raw.find(_BPLIST_MAGIC)
    while pos != -1:
        # a binary plist's 32-byte trailer sits at the END of the buffer,
        # so a parse only succeeds when the slice end is exact. Tail-first
        # (mail-conversion artifacts are appended to the stream), then the
        # reference's stepped window as the interior best-effort.
        candidates = [len(raw)]
        candidates += list(range(pos + 100, min(pos + 100_000, len(raw)) + 1, 1000))
        for end in candidates:
            try:
                parsed = plistlib.loads(raw[pos:end])
            except Exception:
                continue
            meta = _parse_plist_dict(parsed, "binary")
            if meta:
                out.append(meta)
            break
        pos = raw.find(_BPLIST_MAGIC, pos + 1)
    return out


def extract_plist_metadata(
    docs: Dataset, id_col: str = "doc_id", payload_col: str = "payload"
) -> Dataset:
    """One metadata row per embedded plist across all payloads.

    The output id column keeps the caller's ``id_col`` name and value
    type (the metadata fields follow ``PLIST_META_SCHEMA``)."""

    def scan(batch: pa.Table) -> pa.Table:
        id_arr = batch[id_col]
        out_schema = pa.schema(
            [pa.field(id_col, id_arr.type)] + list(PLIST_META_SCHEMA)[1:]
        )
        payloads = batch[payload_col].to_pylist()
        idx: list[int] = []
        rows: list[dict] = []
        for j, raw in enumerate(payloads):
            for meta in extract_plists_from_bytes(raw or b""):
                idx.append(j)
                rows.append(meta)
        if not rows:
            return out_schema.empty_table()
        cols = {id_col: id_arr.take(pa.array(idx, pa.int64()))}
        for f in list(PLIST_META_SCHEMA)[1:]:
            cols[f.name] = [r[f.name] for r in rows]
        return pa.table(cols, schema=out_schema)

    return docs.map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True, batch_size=64
    )


def synth_plist_corpus(n: int, seed: int = 42) -> pa.Table:
    """Deterministic test corpus: every third payload embeds an XML or
    binary plist inside junk bytes (mirrors DOJ-PDF streams carrying
    Apple Mail metadata); the rest are plain junk."""
    import numpy as np

    rng = np.random.default_rng(seed)
    ids, payloads = [], []
    for i in range(n):
        junk_a = rng.bytes(int(rng.integers(20, 400)))
        junk_b = rng.bytes(int(rng.integers(20, 400)))
        if i % 3 == 0:
            meta = {
                "sender": f"user{i}@example.com",
                "to": [f"a{i}@example.com", f"b{i}@example.com"],
                "subject": f"Re: matter {i}",
                "date": f"2003-0{(i % 9) + 1}-11",
            }
            if i % 2 == 0:
                # XML plists are locatable mid-stream (regex has an end tag)
                payload = junk_a + plistlib.dumps(meta, fmt=plistlib.FMT_XML) + junk_b
            else:
                # binary plists parse only with an exact end: appended
                payload = junk_a + junk_b + plistlib.dumps(meta, fmt=plistlib.FMT_BINARY)
        else:
            payload = junk_a + junk_b
        ids.append(f"pdf-{i:04d}")
        payloads.append(payload)
    return pa.table(
        {"doc_id": pa.array(ids, pa.string()), "payload": pa.array(payloads, pa.large_binary())}
    )


def benford_deviation(
    ds, key: str, value_col: str, scale: int = 100,
    round_digits: int = 9, num_partitions: int | None = None,
):
    """Benford's-law deviation per group — the classic forensic screen
    for fabricated numeric data: leading-digit frequencies of
    ``round(value * scale)`` (an integer in both engines) against the
    log10(1 + 1/d) expectation, scored with the chi-square statistic.
    The leading digit comes from a deterministic CASE ladder over
    integer magnitude (NO float log10 — its floor at power-of-ten
    boundaries is libm-dependent). Values rounding to < 1 are dropped
    on both sides. Map-side (group, digit) count partials, one keyed
    exchange, per-group closed form. Output:
    (key, n, chi2, max_digit_gap)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    CNT = pa.schema([(key, ktype), ("dig", pa.int64()),
                     ("c", pa.int64())])

    def lead_digit(x: np.ndarray) -> np.ndarray:
        # CASE ladder: shift down by powers of 10 until < 10
        d = x.copy()
        for _ in range(18):
            big = d >= 10
            if not big.any():
                break
            d = np.where(big, d // 10, d)
        return d

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col].to_numpy(zero_copy_only=False),
                       np.float64)
        # half-up (floor(x+0.5)) — np.rint is half-to-even but
        # DuckDB round() is half-away; pin one rule on both sides
        x = np.floor(v * scale + 0.5).astype(np.int64)
        keep = x >= 1
        if not keep.any():
            return CNT.empty_table()
        dig = lead_digit(x[keep])
        df = pd.DataFrame({
            "k": pd.Series(batch[key].to_pandas())[keep].to_numpy(),
            "dig": dig})
        g = df.groupby(["k", "dig"], sort=False).size().rename("c") \
              .reset_index()
        return pa.table({
            key: pa.array(g["k"], ktype, from_pandas=True),
            "dig": pa.array(g["dig"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        }, schema=CNT)

    OUT = pa.schema([(key, ktype), ("n", pa.int64()),
                     ("chi2", pa.float64()),
                     ("max_digit_gap", pa.float64())])

    def score_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        df = (block.to_pandas()
              .groupby([key, "dig"], sort=True, as_index=False)["c"].sum())
        rows = {"k": [], "n": [], "chi2": [], "gap": []}
        for g, sub in df.groupby(key, sort=True):
            n = float(sub["c"].sum())
            obs = np.zeros(9, np.float64)
            obs[sub["dig"].to_numpy(np.int64) - 1] = \
                sub["c"].to_numpy(np.float64)
            exp = np.log10(1.0 + 1.0 / np.arange(1, 10)) * n
            chi2 = float(((obs - exp) ** 2 / exp).sum())
            gap = float(np.max(np.abs(obs / n - exp / n)))
            rows["k"].append(g)
            rows["n"].append(int(n))
            rows["chi2"].append(chi2)
            rows["gap"].append(gap)
        return pa.table({
            key: pa.array(rows["k"], ktype, from_pandas=True),
            "n": pa.array(rows["n"], pa.int64()),
            "chi2": pa.array(sql_round(np.asarray(rows["chi2"]),
                                       round_digits), pa.float64()),
            "max_digit_gap": pa.array(sql_round(np.asarray(rows["gap"]),
                                                round_digits),
                                      pa.float64()),
        }, schema=OUT)

    parts = ds.select_columns([key, value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return map_key_blocks(parts, [key], score_block, num_partitions,
                          sort_blocks=False)
