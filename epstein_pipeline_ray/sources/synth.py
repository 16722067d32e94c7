"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

One row per conversation turn:
``(conv_id, turn_idx, role, text, tool, ts)``.

Every conversation is a *pure function of (seed, conv_index)* so generation
is order-independent and can run distributed via
``ray.data.range(n).map_batches(...)`` — a duplicate conversation
regenerates its source conversation from the source's index instead of
looking it up.

Planted duplicate taxonomy (mirrors what the reference detects,
reference: src/epstein_pipeline/processors/dedup.py + tests/test_dedup.py):

================  =====================  ========================================
conv_index % 20    class                  relationship to source conv
================  =====================  ========================================
0-11               base                   —
12                 exact                  byte-identical turn texts, shifted ts
13                 ws_case                case/whitespace jitter (normalization-equal)
14, 15             token_edit             ~3% of words replaced (shingle-J >= ~0.85)
16                 turn_reword            one turn reworded
17                 boilerplate            shared 2-turn opening, different body (NOT a dup)
18                 borderline             ~25% of words replaced (J ~ 0.55-0.7)
19                 chain_b / chain_c      alternating: edit(base) / edit(edit(base))
================  =====================  ========================================

Ground truth for the recall harness is NOT the planting classes — it is
the pure-Python reference-semantics oracle (epstein_pipeline_ray.oracle)
run over the generated corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TURNS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.large_string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_VOCAB = [
    f"{p}{s}"
    for p in ("data", "shuf", "part", "agg", "sort", "hash", "join", "scan", "read",
              "block", "batch", "actor", "task", "node", "key", "row", "col", "map",
              "filter", "merge", "spill", "plan", "query", "index", "cache", "log")
    for s in ("", "er", "ing", "ed", "s", "ify", "let", "ive", "ful", "or")
]  # 260 words
_TOOLS = ["search", "python", "bash", "browser", "calculator", ""]
_ROLES = ["user", "assistant"]
_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds


def _rng(seed: int, conv_index: int, salt: int = 0) -> np.random.Generator:
    return np.random.default_rng((seed * 1_000_003 + conv_index) * 7 + salt)


def _words(rng: np.random.Generator, n: int) -> list[str]:
    idx = rng.integers(0, len(_VOCAB), size=n)
    return [_VOCAB[i] for i in idx]


def _base_turn_texts(seed: int, conv_index: int) -> list[str]:
    """Turn texts of a base conversation — pure function of (seed, index)."""
    rng = _rng(seed, conv_index)
    n_turns = int(2 + rng.pareto(1.5) * 4)
    n_turns = min(n_turns, 40)
    texts = []
    for _ in range(n_turns):
        n_words = int(8 + rng.pareto(1.2) * 25)
        n_words = min(n_words, 600)
        texts.append(" ".join(_words(rng, n_words)))
    return texts


def _token_edit(texts: list[str], rng: np.random.Generator, frac: float) -> list[str]:
    out = []
    for t in texts:
        words = t.split()
        n_edit = max(1, int(len(words) * frac)) if len(words) > 3 else 0
        if n_edit:
            pos = rng.choice(len(words), size=min(n_edit, len(words)), replace=False)
            repl = _words(rng, len(pos))
            for p, w in zip(pos, repl):
                words[p] = w
        out.append(" ".join(words))
    return out


def _ws_case_jitter(texts: list[str], rng: np.random.Generator) -> list[str]:
    out = []
    for t in texts:
        words = t.split()
        for i in range(len(words)):
            r = rng.random()
            if r < 0.15:
                words[i] = words[i].upper()
            elif r < 0.25:
                words[i] = words[i].capitalize()
        sep = ["  " if rng.random() < 0.2 else " " for _ in range(max(0, len(words) - 1))]
        s = words[0] if words else ""
        for w, sp in zip(words[1:], sep):
            s += sp + w
        out.append("  " + s if rng.random() < 0.3 else s)
    return out


_BOILER_OPENINGS = [
    [
        f"hello agent please help with template task {g} as configured in the standard onboarding flow",
        f"certainly i will follow the standard template {g} procedure step by step as documented",
    ]
    for g in range(7)
]


def conv_turn_texts(seed: int, conv_index: int) -> list[str]:
    """Turn texts for any conversation index — regenerates sources recursively."""
    kind = conv_index % 20
    if kind <= 11:
        return _base_turn_texts(seed, conv_index)
    if kind == 17:  # boilerplate: shared opening + unique body
        rng = _rng(seed, conv_index)
        body = _base_turn_texts(seed, conv_index)
        return _BOILER_OPENINGS[conv_index % 7] + body
    if kind == 19 and (conv_index % 40) == 39:  # chain_c = edit(chain_b)
        src_b = conv_index - 20
        texts = conv_turn_texts(seed, src_b)
        return _token_edit(texts, _rng(seed, conv_index, salt=1), 0.03)
    src = conv_index - (kind - 11)  # lands on a base index (…%20 == 11-kind+11)
    texts = conv_turn_texts(seed, src)
    rng = _rng(seed, conv_index, salt=1)
    if kind == 12:
        return list(texts)
    if kind == 13:
        return _ws_case_jitter(texts, rng)
    if kind in (14, 15):
        return _token_edit(texts, rng, 0.03)
    if kind == 16:
        total = sum(len(t) for t in texts)
        i = int(rng.integers(0, len(texts)))
        if len(texts) > 1 and len(texts[i]) < 0.10 * total:
            out = list(texts)
            out[i] = " ".join(_words(rng, max(4, len(texts[i].split()))))
            return out
        return _token_edit(texts, rng, 0.03)
    if kind == 18:
        return _token_edit(texts, rng, 0.25)
    if kind == 19:  # chain_b
        return _token_edit(texts, rng, 0.03)
    raise AssertionError(kind)


def gen_convs(seed: int, conv_indices: np.ndarray) -> pa.Table:
    """Generate all turns for the given conversation indices → Arrow table."""
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []
    for ci in conv_indices:
        ci = int(ci)
        turn_texts = conv_turn_texts(seed, ci)
        rng = _rng(seed, ci, salt=2)
        cid = f"conv-{ci:08d}"
        ts = _EPOCH_US + ci * 60_000_000
        for j, t in enumerate(turn_texts):
            conv_ids.append(cid)
            turn_idxs.append(j)
            if j == 0 and rng.random() < 0.05:
                roles.append("system")
            else:
                roles.append(_ROLES[j % 2])
            is_tool = rng.random() < 0.08
            if is_tool:
                roles[-1] = "tool"
                tools.append(_TOOLS[int(rng.integers(0, len(_TOOLS) - 1))])
            else:
                tools.append("")
            texts.append(t)
            ts += int(rng.integers(1_000_000, 30_000_000))
            tss.append(ts)
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.large_string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        },
        schema=TURNS_SCHEMA,
    )


def turns_table(n_convs: int, seed: int = 42, shuffle_rows: bool = True) -> pa.Table:
    """Driver-side corpus for unit tests (tiny/small sizes)."""
    t = gen_convs(seed, np.arange(n_convs))
    if shuffle_rows:
        perm = np.random.default_rng(seed).permutation(t.num_rows)
        t = t.take(pa.array(perm))
    return t


def write_turns_parquet(path: str, n_convs: int, seed: int = 42, shuffle_rows: bool = True) -> str:
    """Distributed generation → shuffled-row Parquet dir. Ray must already be up.

    Generation is a ``map_batches`` over conversation indices (stateless,
    embarrassingly parallel); within-batch row shuffling breaks the
    (conv_id, turn_idx) physical order, which the stable-ordering tests and
    the rollup stage must restore.
    """
    import ray.data as rd

    def gen_batch(batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy()
        t = gen_convs(seed, idx)
        if shuffle_rows:
            perm = np.random.default_rng(seed ^ int(idx[0])).permutation(t.num_rows)
            t = t.take(pa.array(perm))
        return t

    n_blocks = max(4, min(512, n_convs // 64))
    ds = rd.range(n_convs, override_num_blocks=n_blocks)
    ds = ds.map_batches(gen_batch, batch_format="pyarrow", batch_size=4096)
    ds.write_parquet(path)
    return path
