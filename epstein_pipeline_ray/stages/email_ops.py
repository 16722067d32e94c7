"""Email nested-struct operators (reference models/document.py:106-127 —
``Email`` with ``from_: EmailContact`` and ``to``/``cc``
``list[EmailContact]``; VERDICT r2 item 7: the engine produced nested
columns (sources/hoc.py pages) but nothing consumed one).

Operators over the Arrow shape ``struct<name, email, person_slug>`` and
``list<struct<...>>``:

- :func:`explode_participants` — flatten from/to/cc into a participants
  link table (the J7 ``document_persons`` analog for emails, reference
  exporters/sqlite_export.py:58-63): one row per (email, role, position,
  contact). Pure Arrow list/struct kernels — ``list_parent_indices`` +
  ``flatten`` + run arithmetic; no per-row Python.
- :func:`nest_participants` — the inverse: a participants link table
  back to one row per email with from/to/cc rebuilt from run offsets.
- :func:`synth_email_table` — deterministic nested corpus for tests.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

CONTACT_STRUCT = pa.struct(
    [("name", pa.string()), ("email", pa.string()), ("person_slug", pa.string())]
)

EMAIL_SCHEMA = pa.schema(
    [
        ("email_id", pa.string()),
        ("subject", pa.string()),
        ("from", CONTACT_STRUCT),
        ("to", pa.list_(CONTACT_STRUCT)),
        ("cc", pa.list_(CONTACT_STRUCT)),
        ("date", pa.string()),
        ("body", pa.large_string()),
        ("folder", pa.string()),
    ]
)

PARTICIPANT_SCHEMA = pa.schema(
    [
        ("email_id", pa.string()),
        ("role", pa.string()),
        ("pos", pa.int32()),
        ("name", pa.string()),
        ("email", pa.string()),
        ("person_slug", pa.string()),
    ]
)


def _combine(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _list_positions(parents: np.ndarray) -> np.ndarray:
    """Within-list position per flat element (parents are contiguous runs)."""
    n = parents.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    starts = np.concatenate([[0], np.nonzero(parents[1:] != parents[:-1])[0] + 1])
    lengths = np.diff(np.concatenate([starts, [n]]))
    return (np.arange(n) - np.repeat(starts, lengths)).astype(np.int32)


def explode_participants(emails: Dataset, id_col: str = "email_id") -> Dataset:
    """Nested emails → participants link table (PARTICIPANT_SCHEMA)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = _combine(batch[id_col]).cast(pa.string())
        parts: list[pa.Table] = []
        # sender: a single struct column, one row where present
        f = _combine(batch["from"])
        valid = f.is_valid()
        n_from = int(pc.sum(valid).as_py() or 0)
        parts.append(pa.table(
            {
                "email_id": ids.filter(valid),
                "role": pa.array(["from"] * n_from, pa.string()),
                "pos": pa.array(np.zeros(n_from, dtype=np.int32)),
                "name": f.field("name").filter(valid),
                "email": f.field("email").filter(valid),
                "person_slug": f.field("person_slug").filter(valid),
            },
            schema=PARTICIPANT_SCHEMA,
        ))
        for role in ("to", "cc"):
            col = _combine(batch[role])
            parents = np.asarray(pc.list_parent_indices(col))
            flat = col.flatten()
            k = len(flat)
            parts.append(pa.table(
                {
                    "email_id": ids.take(pa.array(parents, pa.int64())),
                    "role": pa.array([role] * k, pa.string()),
                    "pos": pa.array(_list_positions(parents)),
                    "name": flat.field("name"),
                    "email": flat.field("email"),
                    "person_slug": flat.field("person_slug"),
                },
                schema=PARTICIPANT_SCHEMA,
            ))
        return pa.concat_tables(parts)

    return emails.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def nest_participants(participants: Dataset,
                      num_partitions: int | None = None) -> Dataset:
    """Participants link table → one row per email with from / to / cc
    rebuilt (inverse of :func:`explode_participants`; emails whose sender
    row is absent get a null ``from``). One keyed exchange on email_id."""
    from epstein_pipeline_ray.stages.groupblock import map_key_blocks

    OUT = pa.schema([
        ("email_id", pa.string()),
        ("from", CONTACT_STRUCT),
        ("to", pa.list_(CONTACT_STRUCT)),
        ("cc", pa.list_(CONTACT_STRUCT)),
    ])

    def rebuild(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return OUT.empty_table()
        block = block.combine_chunks().sort_by([
            ("email_id", "ascending"), ("role", "ascending"), ("pos", "ascending"),
        ])
        ids = _combine(block["email_id"])
        codes = np.asarray(ids.dictionary_encode().indices)
        starts = np.concatenate([[0], np.nonzero(codes[1:] != codes[:-1])[0] + 1])
        n_groups = len(starts)
        roles = np.asarray(block["role"].to_numpy(zero_copy_only=False))
        contacts = pa.StructArray.from_arrays(
            [_combine(block["name"]), _combine(block["email"]),
             _combine(block["person_slug"])],
            fields=list(CONTACT_STRUCT))
        run_id = np.cumsum(
            np.concatenate([[0], (codes[1:] != codes[:-1]).astype(np.int64)]))
        to_mask = roles == "to"
        cc_mask = roles == "cc"
        from_mask = roles == "from"
        to_counts = np.bincount(run_id[to_mask], minlength=n_groups)
        cc_counts = np.bincount(run_id[cc_mask], minlength=n_groups)
        to_off = np.concatenate([[0], np.cumsum(to_counts)]).astype(np.int32)
        cc_off = np.concatenate([[0], np.cumsum(cc_counts)]).astype(np.int32)
        to_list = pa.ListArray.from_arrays(
            pa.array(to_off), contacts.take(pa.array(np.flatnonzero(to_mask))))
        cc_list = pa.ListArray.from_arrays(
            pa.array(cc_off), contacts.take(pa.array(np.flatnonzero(cc_mask))))
        # sender row index per group (at most one per email)
        from_src = np.zeros(n_groups, dtype=np.int64)
        from_rows = np.flatnonzero(from_mask)
        from_src[run_id[from_rows]] = from_rows
        has_from = np.zeros(n_groups, dtype=bool)
        has_from[run_id[from_rows]] = True
        from_valid = pa.array(has_from)
        from_arr = contacts.take(pa.array(from_src))
        # null out groups with no sender row
        from_arr = pc.if_else(from_valid, from_arr,
                              pa.nulls(n_groups, CONTACT_STRUCT))
        return pa.table(
            {"email_id": ids.take(pa.array(starts)), "from": from_arr,
             "to": to_list, "cc": cc_list},
            schema=OUT,
        )

    pruned = participants.select_columns(
        ["email_id", "role", "pos", "name", "email", "person_slug"])
    return map_key_blocks(pruned, ["email_id"], rebuild, num_partitions,
                          sort_blocks=False)


_CONTACT_RE = re.compile(
    r'^\s*"?([^"<]*?)"?\s*<([^>]+)>\s*$'  # 'Display Name <addr@host>'
)


def _parse_contact(raw: str) -> dict | None:
    """One 'Name <addr>' / bare-address contact string → CONTACT_STRUCT
    dict (the shape HOC .dat Email From/To fields carry,
    reference hoc_loader.py:58,247 — raw Relativity strings)."""
    s = (raw or "").strip()
    if not s:
        return None
    m = _CONTACT_RE.match(s)
    if m:
        name, addr = m.group(1).strip(), m.group(2).strip()
        return {"name": name or addr, "email": addr or None, "person_slug": None}
    if "@" in s:
        return {"name": s, "email": s, "person_slug": None}
    return {"name": s, "email": None, "person_slug": None}


def hoc_to_emails(docs, id_col: str = "doc_id",
                  from_col: str = "email_from", to_col: str = "email_to",
                  subject_col: str = "email_subject") -> "Dataset":
    """HOC documents (raw string email fields, sources/hoc.py) → the typed
    nested email shape: from struct + to list<struct> (semicolon/comma
    split), ready for :func:`explode_participants`. Rows with no email
    metadata are dropped (reference hoc_loader.py:115 treats
    email_from/email_to presence as 'is an email')."""

    def convert(batch: pa.Table) -> pa.Table:
        ids = _combine(batch[id_col]).cast(pa.string()).to_pylist()
        froms = _combine(batch[from_col]).to_pylist()
        tos = _combine(batch[to_col]).to_pylist()
        subjects = _combine(batch[subject_col]).to_pylist()
        out_ids: list[str] = []
        out_subj: list[str | None] = []
        out_from: list[dict | None] = []
        out_to: list[list[dict]] = []
        for i, f, t, subj in zip(ids, froms, tos, subjects):
            f = f or ""
            t = t or ""
            if not f.strip() and not t.strip():
                continue
            recips = [c for part in re.split(r"[;,]", t)
                      for c in [_parse_contact(part)] if c is not None]
            out_ids.append(i)
            out_subj.append(subj if subj else None)
            out_from.append(_parse_contact(f))
            out_to.append(recips)
        return pa.table({
            "email_id": pa.array(out_ids, pa.string()),
            "subject": pa.array(out_subj, pa.string()),
            "from": pa.array(out_from, CONTACT_STRUCT),
            "to": pa.array(out_to, pa.list_(CONTACT_STRUCT)),
            "cc": pa.array([[] for _ in out_ids], pa.list_(CONTACT_STRUCT)),
        })

    return docs.map_batches(convert, batch_format="pyarrow", zero_copy_batch=True)


def synth_email_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic nested email corpus: every email has a sender, 1-3
    to-contacts, 0-2 cc; every 7th email has a NULL from; every 5th a
    contact with null email address."""
    rng = np.random.default_rng(seed)
    ids, subjects, froms, tos, ccs, dates, bodies, folders = (
        [], [], [], [], [], [], [], [])

    def contact(i: int, j: int, null_email: bool = False):
        return {
            "name": f"person {i}-{j}",
            "email": None if null_email else f"p{i}.{j}@example.com",
            "person_slug": f"p-{i:04d}-{j}",
        }

    for i in range(n):
        ids.append(f"e-{i:05d}")
        subjects.append(f"Re: matter {i}")
        froms.append(None if i % 7 == 0 else contact(i, 0, null_email=i % 5 == 0))
        n_to = int(rng.integers(1, 4))
        tos.append([contact(i, j + 1) for j in range(n_to)])
        n_cc = int(rng.integers(0, 3))
        ccs.append([contact(i, 10 + j) for j in range(n_cc)])
        dates.append(f"200{i % 10}-03-11")
        bodies.append(f"body text {i} " * 3)
        folders.append(f"folder{i % 4}")
    return pa.table(
        {
            "email_id": pa.array(ids, pa.string()),
            "subject": pa.array(subjects, pa.string()),
            "from": pa.array(froms, CONTACT_STRUCT),
            "to": pa.array(tos, pa.list_(CONTACT_STRUCT)),
            "cc": pa.array(ccs, pa.list_(CONTACT_STRUCT)),
            "date": pa.array(dates, pa.string()),
            "body": pa.array(bodies, pa.large_string()),
            "folder": pa.array(folders, pa.string()),
        },
        schema=EMAIL_SCHEMA,
    )
