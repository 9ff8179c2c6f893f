"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the contract described in /root/repo/__spark_entry__.py: run the
Spark plan and the oracle SQL on the same parquet tables, sort columns by
name, compare row count + column names + (order-insensitive) values.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from customer_activity_lakehouse_spark.schemas import DRIVER_TABLES

FLOAT_ATOL = 1e-9


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions; empty = match."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"column mismatch: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems
    s, o = _normalize(spark_df), _normalize(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        # Integer-vs-float dtype drift (e.g. DuckDB sum(BIGINT) → HUGEINT →
        # pandas float64) stringifies differently ("3549" vs "3549.0") and
        # flips the driver's value hash even when the numbers agree — flag it.
        if pd.api.types.is_integer_dtype(sv) != pd.api.types.is_integer_dtype(ov):
            problems.append(
                f"col {c}: dtype drift spark={sv.dtype} oracle={ov.dtype} "
                "(cast the oracle aggregate, e.g. ::BIGINT)"
            )
            continue
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv_f = pd.to_numeric(sv, errors="coerce")
            ov_f = pd.to_numeric(ov, errors="coerce")
            bad = ~(
                (sv_f.isna() & ov_f.isna())
                | ((sv_f - ov_f).abs() <= FLOAT_ATOL)
            )
        else:
            bad = ~((sv.isna() & ov.isna()) | (sv == ov))
        n_bad = int(bad.sum())
        if n_bad:
            i = bad.idxmax()
            problems.append(
                f"col {c}: {n_bad} mismatched values; first at row {i}: "
                f"spark={sv[i]!r} oracle={ov[i]!r}"
            )
    return problems


def exact_float_diffs(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> int:
    """Count float cells that are not bit-identical (stricter than compare —
    the driver hashes values, so we also track exactness)."""
    s, o = _normalize(spark_df), _normalize(oracle_df)
    n = 0
    for c in s.columns:
        if pd.api.types.is_float_dtype(s[c]):
            for a, b in zip(s[c], o[c]):
                if not (
                    (isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b))
                    or a == b
                ):
                    n += 1
    return n
