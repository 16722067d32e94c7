#!/usr/bin/env python
"""Full local sf0.01 correctness gate with per-query timing (VERDICT r4
item 8's measurement harness): runs EVERY oracled queries() entry at
sf0.01 against DuckDB value-exact — the driver's check, locally — and
prints total wall plus the slowest queries.

Usage: python scripts/gate_profile.py [--sf sf0.01] [--top 25]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    sf_dir = f"/root/testdata/{args.sf}"

    import duckdb
    import pandas as pd
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as em

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    Q, S = em.queries(), em.oracle_sql()
    times: dict[str, float] = {}
    bad: list[str] = []
    t_all = time.time()
    for name in sorted(S):
        t0 = time.time()
        got = Q[name](sf_dir)
        try:
            got = got.to_pandas()
        except AttributeError:
            pass
        times[name] = round(time.time() - t0, 3)
        want = con.execute(S[name]).df()
        try:
            pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                          check_dtype=False,
                                          check_exact=True)
        except AssertionError:
            bad.append(name)
        from epstein_pipeline_ray.stages.exchange import gc_exchange_dirs

        gc_exchange_dirs()
    total = time.time() - t_all
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:args.top]
    print(json.dumps({
        "gate": args.sf,
        "oracled_queries": len(S),
        "bad": bad,
        "total_sec": round(total, 1),
        "ray_query_sec": round(sum(times.values()), 1),
        "slowest": dict(slow),
    }))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
