"""Local twin of the driver's correctness gate: every queries() entry with
an oracle_sql() runs at sf0.001 and must match DuckDB exactly
(order-insensitive, columns sorted by name, values rounded identically)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


_SQL = entrymod.oracle_sql()
_QUERIES = entrymod.queries()


def test_every_oracle_key_has_a_query():
    assert set(_SQL) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_SQL))
def test_query_matches_oracle(ray_session, con, name):
    got = _canon(_to_pandas(_QUERIES[name](SF_DIR)))
    want = _canon(con.execute(_SQL[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize(
    "name", sorted(set(_QUERIES) - set(_SQL) - {"transcript_clusters", "transcript_pairs"})
)
def test_rows_only_queries_run(ray_session, name):
    df = _to_pandas(_QUERIES[name](SF_DIR))
    assert df is not None and len(df.columns) > 0


def test_entry_smoke(ray_session):
    df = _to_pandas(entrymod.entry())
    assert set(df.columns) >= {"conv_id", "cluster_id", "representative"}
    # derived corpus plants exact dups (copy-*) — the flagship must find them
    assert (df.conv_id.str.startswith("copy-")).sum() > 0
    assert len(df) > 0


def test_transcript_queries_run(ray_session):
    clusters = _to_pandas(_QUERIES["transcript_clusters"](SF_DIR))
    pairs = _to_pandas(_QUERIES["transcript_pairs"](SF_DIR))
    assert len(clusters) > 0 and len(pairs) > 0
    assert set(pairs.method) <= {"exact", "minhash"}
    # every copy- conv must be clustered with its doc- source
    cmap = dict(zip(clusters.conv_id, clusters.cluster_id))
    copies = [c for c in cmap if c.startswith("copy-")]
    assert copies
    for c in copies:
        assert cmap.get("doc-" + c.split("-")[1]) == cmap[c]
