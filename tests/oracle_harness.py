"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a contract query on Spark and its oracle SQL on DuckDB over the same
sf dir, then compares row count, column names, and an order-insensitive
canonicalized row multiset (floats rounded, timestamps stringified).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from hadoop_invertedindexer_spark.sources.tables import TABLES

FLOAT_DECIMALS = 6


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{round(v, FLOAT_DECIMALS):.{FLOAT_DECIMALS}f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df[sorted(df.columns)]
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def compare_query(spark, con, qfn, sql: str, sf_dir: str, name: str = "?") -> None:
    from hadoop_invertedindexer_spark.caching import release_persisted

    sdf = qfn(spark, sf_dir).toPandas()
    # builder persists (tracked_persist) otherwise accumulate across the
    # ~190 parametrized contract cases and starve the shared session's
    # heap late in the suite (the bench harness releases between samples
    # for the same reason)
    release_persisted()
    odf = con.execute(sql).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: rowcount spark={len(sdf)} oracle={len(odf)}"
    srows, orows = canon_rows(sdf), canon_rows(odf)
    if srows != orows:
        diff_s = [r for r in srows if r not in set(orows)][:5]
        diff_o = [r for r in orows if r not in set(srows)][:5]
        raise AssertionError(
            f"{name}: value mismatch; spark-only={diff_s} oracle-only={diff_o}"
        )
