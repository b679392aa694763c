"""Local mirror of the driver's Ray-vs-DuckDB comparison: row count,
schema (column names), and order-insensitive value comparison with
columns sorted by name."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # canonical row order over stringified values (order-insensitive compare)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_matches_oracle(ray_result, sql: str, sf_dir: str):
    con = duckdb_con(sf_dir)
    oracle = con.sql(sql).df()
    got = to_pandas(ray_result)
    assert sorted(got.columns) == sorted(oracle.columns), (
        f"schema mismatch: {sorted(got.columns)} vs {sorted(oracle.columns)}"
    )
    assert len(got) == len(oracle), f"row count {len(got)} vs {len(oracle)}"
    a, b = normalize(got), normalize(oracle)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            pd.testing.assert_series_equal(
                av.astype(float), bv.astype(float), check_names=False, rtol=0, atol=0
            )
        else:
            assert list(av.astype(str)) == list(bv.astype(str)), f"value mismatch in {col}"
