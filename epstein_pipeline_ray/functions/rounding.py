"""SQL-compatible rounding.

``np.round``/pandas ``round`` use banker's rounding (half-to-even);
DuckDB/ANSI ``round()`` rounds half AWAY FROM ZERO (std::round). A value
landing exactly on a .5 boundary at the target precision — e.g. a
duration of 767.37865 s built from integer microseconds — hashes
differently against the SQL oracle. This helper mirrors
``std::round(x * 10^n) / 10^n`` exactly."""

from __future__ import annotations

import numpy as np


def sql_round(x, ndigits: int):
    arr = np.asarray(x, dtype=np.float64)
    p = 10.0 ** ndigits
    y = arr * p
    return np.trunc(y + np.copysign(0.5, y)) / p
