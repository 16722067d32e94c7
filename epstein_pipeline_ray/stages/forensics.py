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
