"""Transcript turn-table reader + conversation rollup.

Input schema (BASELINE.json ``input_hint``):
``(conv_id:string, turn_idx:int32, role:string, text:large_string,
tool:string, ts:timestamp[us])``.

The rollup concatenates each conversation's turns in stable
``(conv_id, turn_idx)`` order into one document row — the engine's
equivalent of the reference loading one JSON document per file
(reference: cli.py:595-611). Rows may arrive in any physical order;
ordering is restored per group, never assumed from block layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

ROLLUP_SEP = "\n"

CONV_DOC_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("text", pa.large_string()),
        ("n_turns", pa.int32()),
        ("n_chars", pa.int64()),
    ]
)


def read_turns(path: str, columns: list[str] | None = None) -> Dataset:
    """Read a turn table, pruning to the needed columns at the read."""
    return rd.read_parquet(path, columns=columns)


def stable_turns(turns: Dataset) -> Dataset:
    """Turns in stable (conv_id, turn_idx) order — the per-turn invariant
    surface: a pipeline must never alter per-turn text, and this sort is the
    canonical view tests compare against."""
    return turns.sort(["conv_id", "turn_idx"])


def _rollup_group(g: pd.DataFrame) -> pd.DataFrame:
    order = np.argsort(g["turn_idx"].to_numpy(), kind="stable")
    texts = g["text"].to_numpy()[order]
    text = ROLLUP_SEP.join(texts)
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "text": [text],
            "n_turns": [np.int32(len(texts))],
            "n_chars": [np.int64(len(text))],
        }
    )


def rollup_convs(turns: Dataset) -> Dataset:
    """Turns → one row per conversation (SHUFFLE 1, key=conv_id).

    ``groupby(conv_id).map_groups`` hash-partitions turns by conversation;
    each group is sorted by ``turn_idx`` inside the group function so the
    result is independent of physical row order. Only the columns the
    rollup needs survive to the shuffle (column pruning before the wide op).
    """
    pruned = turns.select_columns(["conv_id", "turn_idx", "text"])
    return pruned.groupby("conv_id").map_groups(_rollup_group, batch_format="pandas")
