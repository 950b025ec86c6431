"""Additional source/sink formats beyond text and parquet.

The reference reads only a text dir (SURVEY §2B: 'no CSV/JSON/Parquet/JDBC
anywhere'); an engine replacing it needs the standard interchange formats.
All readers take explicit schemas — schema inference is a convenience for
notebooks and a full extra pass over the data at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with explicit schema (PERMISSIVE mode: malformed rows null out
    rather than kill a 1000-executor job; audit with a corrupt-record
    column when needed)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Newline-delimited JSON with explicit schema."""
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC (columnar alternative to parquet; same pushdown/pruning via the
    vectorized reader)."""
    return spark.read.orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)
