"""Multi-dimensional data layout: z-order (Morton) clustering for
file-level data skipping.

The reference's only layout decision is "one globally sorted output
file" (single reducer, ``/root/reference/src/InvertedIndexer.java``
job wiring + ``README.md:21``) — the 1-D special case. At 100 TB, scans
are won before they start, by laying files out so that per-file min/max
statistics exclude most of the table for the common predicates. A linear
sort gives that for ONE column; interleaving the bits of several
rank-normalized columns (the z-curve) gives bounded min/max ranges on
EVERY interleaved column, so point/range predicates on any of them skip
most files (proved against actual parquet footer stats in
``tests/test_layout.py``).

All expression work is built-in bit arithmetic (shiftright/and/or) —
whole-stage codegen, no UDF; normalization stats are one broadcast
1-row aggregate; the final placement is ``repartitionByRange`` +
``sortWithinPartitions`` on the z-key, Spark's native range shuffle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def interleave_bits(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave ``bits`` low bits of each (already normalized,
    non-negative) integer column: bit i of column j lands at position
    ``i * n_cols + j``. Built as a flat OR-tree of shift/mask exprs —
    constant-folded, codegen'd, no Python per row."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} z-bits > 63: the key "
            f"must fit a non-negative long (Java shifts mask by 63, so "
            f"overflow silently corrupts curve order). Use bits <= {63 // n}."
        )
    parts = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts).cast("bigint")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS
) -> DataFrame:
    """Attach a ``_z`` Morton key over ``cols``: each column is min/max
    normalized into [0, 2^bits) with stats from one broadcast 1-row
    aggregate (never a driver collect), then bit-interleaved."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("double").alias(f"_min_{c}"),
            F.max(c).cast("double").alias(f"_max_{c}"),
        ]
    stats = df.groupBy().agg(*aggs)
    top = float((1 << bits) - 1)
    normed = [
        F.least(
            F.lit(top),
            F.floor(
                (F.col(c).cast("double") - F.col(f"_min_{c}"))
                / F.greatest(
                    F.col(f"_max_{c}") - F.col(f"_min_{c}"), F.lit(1e-12)
                )
                * top
            ).cast("double"),
        ).cast("bigint")
        for c in cols
    ]
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_z", interleave_bits(normed, bits))
        .drop(*[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols])
    )


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int,
    bits: int = DEFAULT_BITS,
) -> None:
    """Cluster ``df`` on the z-curve of ``cols`` into ``n_files`` parquet
    files: range-partition by the z-key (contiguous curve segments per
    file) and sort within each, so every file covers a compact
    hyper-rectangle-ish region and its footer min/max on each clustered
    column stays narrow."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def linear_write(df: DataFrame, col: str, path: str, n_files: int) -> None:
    """The 1-D baseline the z-order test compares against: a plain global
    range sort on one column (what the reference's single sorted output
    generalizes to)."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )
