"""Derive a transcript turn table from the driver-provided ``documents``
Parquet (TESTDATA.md) — deterministic, seeded, per-row pure — so the
flagship transcript pipeline has a turn-shaped input at every sf without
shipping external data.

Each document becomes one conversation (turns = fixed word windows);
every 13th doc also emits an exact-duplicate conversation and every 7th
a near-duplicate (~3% token edits) so the dedup passes have work to do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from epstein_pipeline_ray.sources.synth import TURNS_SCHEMA, _EPOCH_US, _VOCAB

_TURN_WORDS = 10


def _doc_turns(text: str) -> list[str]:
    words = text.split()
    if not words:
        return [""]
    return [" ".join(words[i : i + _TURN_WORDS]) for i in range(0, len(words), _TURN_WORDS)]


def _emit_conv(rows: dict, conv_id: str, turn_texts: list[str], base_ts: int) -> None:
    ts = base_ts
    for j, t in enumerate(turn_texts):
        rows["conv_id"].append(conv_id)
        rows["turn_idx"].append(j)
        rows["role"].append("user" if j % 2 == 0 else "assistant")
        rows["text"].append(t)
        rows["tool"].append("")
        ts += 5_000_000
        rows["ts"].append(ts)


def turns_from_documents(sf_dir: str, seed: int = 42) -> Dataset:
    """documents.parquet → turn table (TURNS_SCHEMA), with planted dups."""

    def derive(batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {c: [] for c in TURNS_SCHEMA.names}
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        for doc_id, text in zip(ids, texts):
            turn_texts = _doc_turns(text or "")
            base_ts = _EPOCH_US + int(doc_id) * 90_000_000
            _emit_conv(rows, f"doc-{doc_id:08d}", turn_texts, base_ts)
            if doc_id % 13 == 0:
                _emit_conv(rows, f"copy-{doc_id:08d}", list(turn_texts), base_ts + 7)
            if doc_id % 7 == 0:
                rng = np.random.default_rng(seed * 1_000_003 + int(doc_id))
                edited = []
                for t in turn_texts:
                    ws = t.split()
                    if len(ws) > 4 and rng.random() < 0.35:
                        ws[int(rng.integers(0, len(ws)))] = _VOCAB[int(rng.integers(0, len(_VOCAB)))]
                    edited.append(" ".join(ws))
                _emit_conv(rows, f"near-{doc_id:08d}", edited, base_ts + 13)
        return pa.table(
            {
                "conv_id": pa.array(rows["conv_id"], pa.string()),
                "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
                "role": pa.array(rows["role"], pa.string()),
                "text": pa.array(rows["text"], pa.large_string()),
                "tool": pa.array(rows["tool"], pa.string()),
                "ts": pa.array(rows["ts"], pa.timestamp("us")),
            },
            schema=TURNS_SCHEMA,
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


def noisy_turns_from_documents(sf_dir: str) -> Dataset:
    """documents.parquet → a turn table with PLANTED conversational noise
    (role-alternation violations, timestamp regressions, turn_idx gaps,
    consecutive repeated turns, sparse tool annotations) so the
    transcript-hygiene operators (stages/transcript_ops.py) have real
    work to do. Every rule is pure integer arithmetic on (doc_id, i), so
    the DERIVATION ITSELF is expressible in ANSI SQL — the DuckDB twin
    in ``__ray_entry__._noisy_turns_cte`` rebuilds the identical table
    and the hygiene queries get full value-hash oracles.

    Per document (one conversation ``doc-%08d``; words = text split on
    single spaces, 10-word turn windows, i = 0-based window index):
      role  : 'assistant' if (doc_id+i) % 11 == 0 else alternating; a
              stutter turn (below) copies turn i-1's role instead, so
              the repeat is a true consecutive (role, text) duplicate
      text  : window i-1 repeated when i > 0 and (doc_id+i) % 19 == 0
              (the stutter; % 19 never fires on adjacent i, so the
              copied role is always i-1's final role)
      tool  : ['', 'search', 'code', 'browse', ''][(doc_id*31+i) % 5]
      ts    : EPOCH + doc_id*90e6 + i*5e6, minus 9e6 when (doc_id+i) % 17
              == 0  (out-of-order timestamps)
      drop  : the row vanishes when i > 0 and (doc_id*7+i) % 13 == 0
              (turn_idx gaps; turn 0 always survives)
    """
    _TOOLS = ["", "search", "code", "browse", ""]

    def derive(batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {c: [] for c in TURNS_SCHEMA.names}
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            words = (text or "").split(" ")
            windows = [
                " ".join(words[i : i + _TURN_WORDS])
                for i in range(0, len(words), _TURN_WORDS)
            ]
            conv = f"doc-{doc_id:08d}"
            for i, w in enumerate(windows):
                if i > 0 and (doc_id * 7 + i) % 13 == 0:
                    continue
                rows["conv_id"].append(conv)
                rows["turn_idx"].append(i)
                stutter = i > 0 and (doc_id + i) % 19 == 0
                j = i - 1 if stutter else i
                if (doc_id + j) % 11 == 0:
                    rows["role"].append("assistant")
                else:
                    rows["role"].append("user" if j % 2 == 0 else "assistant")
                rows["text"].append(windows[i - 1] if stutter else w)
                rows["tool"].append(_TOOLS[(doc_id * 31 + i) % 5])
                ts = _EPOCH_US + doc_id * 90_000_000 + i * 5_000_000
                if (doc_id + i) % 17 == 0:
                    ts -= 9_000_000
                rows["ts"].append(ts)
        return pa.table(
            {
                "conv_id": pa.array(rows["conv_id"], pa.string()),
                "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
                "role": pa.array(rows["role"], pa.string()),
                "text": pa.array(rows["text"], pa.large_string()),
                "tool": pa.array(rows["tool"], pa.string()),
                "ts": pa.array(rows["ts"], pa.timestamp("us")),
            },
            schema=TURNS_SCHEMA,
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


def spanned_docs_from_documents(sf_dir: str) -> Dataset:
    """documents.parquet → the same docs with PLANTED verbatim shared
    spans for the exact-substring dedup operator
    (stages/substring_dedup.py): every doc with doc_id % 7 == 2 gets
    ``' seg{g}w0 seg{g}w1 … seg{g}w9'`` appended, g = doc_id // 70, so
    all planted docs of one g-group share that >= 69-char span verbatim
    and docs of different groups share nothing long (the group tag is
    interleaved into every word — cross-group common substrings stay
    within-word fragments). Pure integer arithmetic on doc_id → the
    true pair set is SQL-expressible (same-group planted pairs) and the
    substring_pairs query gets a full DuckDB oracle.
    """

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out = []
        for doc_id, text in zip(ids, texts):
            if doc_id % 7 == 2:
                g = doc_id // 70
                span = " ".join(f"seg{g}w{t}" for t in range(10))
                out.append((text or "") + " " + span)
            else:
                out.append(text or "")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(out, pa.string()),
        })

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


def truncated_docs_from_documents(sf_dir: str) -> Dataset:
    """documents.parquet → the same docs PLUS planted truncated copies
    for the set-containment dedup operator
    (stages/corpus_dedup.containment_pairs): every doc with
    doc_id % 9 == 3 and >= 14 words also emits a copy under
    doc_id + 100_000_000 holding its first ``(n_words * 6) // 10``
    words followed by two copy-unique marker words (``t{id}x t{id}y``),
    so the copy's shingle set is ALMOST contained in the original's
    (the two markers create a handful of shingles the original lacks,
    putting true containment strictly between the threshold and 1.0).
    Pure integer arithmetic on doc_id → the DuckDB twin rebuilds the
    identical table with an array slice and the containment query gets
    a full value-hash oracle.
    """

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_id: list[int] = []
        out_text: list[str] = []
        for doc_id, text in zip(ids, texts):
            t = text or ""
            out_id.append(int(doc_id))
            out_text.append(t)
            if doc_id % 9 == 3:
                words = t.split(" ")
                if len(words) >= 14:
                    keep = (len(words) * 6) // 10
                    out_id.append(int(doc_id) + 100_000_000)
                    out_text.append(
                        " ".join(words[:keep])
                        + f" t{doc_id}x t{doc_id}y"
                    )
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "text": pa.array(out_text, pa.string()),
        })

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


def snapshot_docs_from_documents(sf_dir: str) -> tuple[Dataset, Dataset]:
    """documents.parquet → (new_snapshot, old_snapshot) for the
    cross-snapshot dedup operator
    (stages/corpus_dedup.cross_jaccard_pairs). Old = the full corpus;
    new = a deterministic "fresh crawl" under ids doc_id + 200_000_000:

    * doc_id % 11 == 4 — verbatim recrawl (Jaccard 1.0 vs its source);
    * doc_id % 11 == 7 and >= 12 words — first two words dropped
      (shingle set a strict subset: J = (L-6)/(L-4) for an L-word doc,
      straddling the 0.8 threshold exactly at L = 14 — 12/13-word docs
      land BELOW it, longer docs above);
    * doc_id % 11 == 9 and >= 14 words — first 40% of words plus two
      copy-unique markers (J far below threshold — never pairs);
    * doc_id % 11 == 2 — six copy-unique words (a genuinely-new doc).

    Pure integer arithmetic on doc_id → the DuckDB twin rebuilds the
    identical pair of tables and the cross_snapshot query gets a full
    value-hash oracle.
    """

    def derive_new(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_id: list[int] = []
        out_text: list[str] = []
        for doc_id, text in zip(ids, texts):
            t = text or ""
            r = doc_id % 11
            nid = int(doc_id) + 200_000_000
            if r == 4:
                out_id.append(nid)
                out_text.append(t)
            elif r == 7:
                words = t.split(" ")
                if len(words) >= 12:
                    out_id.append(nid)
                    out_text.append(" ".join(words[2:]))
            elif r == 9:
                words = t.split(" ")
                if len(words) >= 14:
                    keep = (len(words) * 4) // 10
                    out_id.append(nid)
                    out_text.append(" ".join(words[:keep])
                                    + f" s{doc_id}x s{doc_id}y")
            elif r == 2:
                out_id.append(nid)
                out_text.append(" ".join(f"f{doc_id}{c}" for c in "abcdef"))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "text": pa.array(out_text, pa.string()),
        })

    old = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
    new = old.map_batches(derive_new, batch_format="pyarrow",
                          zero_copy_batch=True)
    return new, old


def versioned_docs_from_documents(sf_dir: str) -> tuple[Dataset, Dataset]:
    """documents.parquet → (v1, v2) for the dataset-diff operator:
    v1 = the corpus as-is; v2 = a deterministic next release where
    doc_id % 13 == 1 documents are edited (text + ' v2edit'),
    doc_id % 13 == 5 documents are dropped, and fresh documents appear
    under doc_id + 300_000_000 for doc_id % 13 == 8. Pure integer
    arithmetic → the DuckDB twin rebuilds both sides exactly."""

    def derive_v2(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_id: list[int] = []
        out_text: list[str] = []
        for doc_id, text in zip(ids, texts):
            t = text or ""
            r = doc_id % 13
            if r == 5:
                continue
            if r == 1:
                out_id.append(int(doc_id))
                out_text.append(t + " v2edit")
            else:
                out_id.append(int(doc_id))
                out_text.append(t)
            if r == 8:
                out_id.append(int(doc_id) + 300_000_000)
                out_text.append(f"fresh d{doc_id}a d{doc_id}b d{doc_id}c")
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "text": pa.array(out_text, pa.string()),
        })

    v1 = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    v2 = v1.map_batches(derive_v2, batch_format="pyarrow",
                        zero_copy_batch=True)
    return v1, v2
