"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs a registered query's DataFrame builder and its DuckDB oracle SQL on
the same parquet tables and asserts exact equality after canonicalization
(columns sorted by name, rows sorted by all columns, integer/float dtypes
widened). Stricter than the driver's value-hash — if this passes, the
hash matches.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from spotify_tags_etl_spark.sources.tpch import TPCH_TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        dt = str(df[col].dtype)
        if dt.startswith(("int", "uint", "Int", "UInt")):
            df[col] = df[col].astype("int64")
        elif dt.startswith(("float", "Float")):
            df[col] = df[col].astype("float64")
        elif dt == "object":
            # normalize bytes → hex for stable compare
            if df[col].map(lambda v: isinstance(v, (bytes, bytearray))).any():
                df[col] = df[col].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
            # normalize lists/arrays → tuples so they sort/compare
            if df[col].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "tolist")).any():
                df[col] = df[col].map(lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else (tuple(v) if isinstance(v, (list, tuple)) else v))
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if (a is None or (isinstance(a, float) and math.isnan(a))) and (
        b is None or (isinstance(b, float) and math.isnan(b))
    ):
        return True
    return a == b


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    s, o = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    assert list(s.columns) == list(o.columns), f"{name}: columns {list(s.columns)} != {list(o.columns)}"
    assert len(s) == len(o), f"{name}: row count {len(s)} != {len(o)}"
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            assert _values_equal(a, b), f"{name}: col {col} row {i}: spark={a!r} oracle={b!r}"


def run_parity(spark, sf_dir: str, name: str, builder, oracle: str) -> None:
    spark_pdf = builder(spark, sf_dir).toPandas()
    con = duckdb_connect(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).fetchdf()
    finally:
        con.close()
    compare_frames(spark_pdf, oracle_pdf, name)
