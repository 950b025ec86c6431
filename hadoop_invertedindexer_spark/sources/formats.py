"""Additional source/sink formats beyond text and parquet.

The reference reads only a text dir (SURVEY §2B: 'no CSV/JSON/Parquet/JDBC
anywhere'); an engine replacing it needs the standard interchange formats.
All readers take explicit schemas — schema inference is a convenience for
notebooks and a full extra pass over the data at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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


CORRUPT_COL = "_corrupt_record"


def read_jsonl_audited(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> tuple[DataFrame, DataFrame]:
    """Ingestion gate for untrusted JSONL: returns ``(good, bad)``.

    A 100 TB ingest can't die on one malformed line (FAILFAST) and must
    not silently null it out either (plain PERMISSIVE): the corrupt raw
    text is captured in ``_corrupt_record`` so the bad rows are routed to
    a quarantine sink for replay after the producer is fixed. Spark
    requires the corrupt column to be part of the declared schema, and a
    caching quirk means the captured column is only reliably populated
    when the frame is read with the column explicitly selected — both
    handled here so callers can't hold it wrong.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL not in schema.names:
        schema = schema.add(T.StructField(CORRUPT_COL, T.StringType()))
    # localCheckpoint (not cache): one parse pass serves both splits,
    # satisfies the can't-reference-only-the-corrupt-column analysis
    # restriction, and the blocks are released when the frames are
    # garbage-collected — a .cache() here would pin every ingested file
    # in executor storage for the session's lifetime with no unpersist
    # handle exposed to the caller.
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .localCheckpoint(eager=True)
    )
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


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
