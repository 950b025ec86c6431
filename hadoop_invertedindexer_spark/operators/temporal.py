"""Temporal join operators Spark lacks as built-ins (EXT, SURVEY §2B):
as-of join and bucketed range join.

Both are *compositions of built-in operators* (SURVEY's custom-operator
policy tier (a)): the as-of join is the classic union-merge + running
last_value window; the range join pre-buckets time so the inequality
predicate only evaluates within coarse buckets instead of a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the most recent right row of the same key
    with ``right_ts <= left_ts`` (ASOF LEFT JOIN semantics).

    Union-merge: tag both sides, sort per key by (time, side) with right
    rows first on ties, and carry the right columns forward with
    ``last_value(ignorenulls)``. One shuffle on the key — same cost as a
    regular join, no inequality-join blowup; this is how as-of joins are
    done at market-data scale.

    Each right column is carried inside a struct wrapper: a struct is
    non-null even when its field is null, so ``ignorenulls`` skips only
    the union-injected nulls on LEFT rows — a legitimately-NULL right
    value is still attached (matching ASOF semantics) instead of falling
    through to a stale older value.

    ``right`` must be unique per (key, right_ts) — pre-aggregate if not;
    duplicate timestamps would make "the" most recent row ambiguous.
    """
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right_cols {sorted(overlap)} collide with left columns; "
            "rename before joining"
        )
    lt = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("_t"),
            *[F.struct(F.col(c)).alias(f"_r_{c}") for c in right_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).getField(c).alias(c)
            for c in right_cols
        ],
    )
    return carried.where(F.col("_side") == 1).drop(
        "_t", "_side", *[f"_r_{c}" for c in right_cols]
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_start: str,
    width_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Inner join on key with ``right_start <= left_ts < right_start +
    width_seconds``: equi-join on (key, coarse time bucket) with the
    right side replicated into each bucket its window overlaps, then the
    exact range predicate refines. Fanout is 2 copies of the right side
    — bounded — instead of the |left| x |right| nested-loop Spark would
    otherwise plan for a pure inequality join.

    The bucket modulus IS ``width_seconds``, so each right window spans
    at most 2 buckets regardless of the width chosen — the bucket
    arithmetic and the replication fanout derive from the same
    parameter (a fixed bucket width would silently drop matches for any
    wider window).
    """
    bucket = lambda c: F.unix_timestamp(c).cast("long") - (  # noqa: E731
        F.unix_timestamp(c).cast("long") % F.lit(width_seconds)
    )
    lb = left.withColumn("_bk", bucket(F.col(left_ts)))
    rb = right.withColumn(
        "_bk0", bucket(F.col(right_start))
    ).withColumn(
        "_end", F.col(right_start) + F.expr(f"INTERVAL {width_seconds} SECONDS")
    )
    rb = rb.withColumn("_bks", F.array("_bk0", F.col("_bk0") + width_seconds)).select(
        "*", F.explode("_bks").alias("_bk")
    ).drop("_bks", "_bk0")
    joined = lb.join(rb, [key, "_bk"]).where(
        (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) < F.col("_end"))
    )
    return joined.drop("_bk", "_end")
