"""EXT relational surface (SURVEY §2B): the join/agg/window/set-op/scalar-fn
coverage the reference lacks, expressed purely with Catalyst built-ins over
the driver's TPC-H-ish tables.

Scale notes baked into each query:

* Dim joins (region/nation/customer/supplier) are broadcast — explicit
  ``F.broadcast`` for the provably-tiny sides; the big fact side never
  shuffles for the join. At 100 TB the fact table streams through
  map-side hash joins.
* Aggregations rely on Catalyst's partial+final HashAggregate; no
  ``collect`` anywhere.
* Floating-point aggregates are rounded at the query edge (sum order
  differs across engines); money flows use 2 decimals, ratios 6.
* Top-k always carries a deterministic tiebreak key so LIMIT is stable
  across engines and across reruns at any parallelism.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.sources.tables import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ------------------------------------------------------------------ joins


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key into
    ``salt_buckets`` sub-keys and replicate the small side once per salt,
    so one hot key spreads over ``salt_buckets`` tasks instead of
    stalling a single reducer. AQE's skew-join handles moderate skew
    automatically; explicit salting is for the pathological hot-key case
    (a sentinel/default value, a celebrity user) where even split
    partitions exceed executor memory. (Null keys are NOT such a case:
    an inner equi-join drops them before the shuffle.) Result is
    identical to ``big.join(small, key)`` — proven by test.
    """
    salted_big = big.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    salted_small = small.select("*", salts)
    return salted_big.join(salted_small, [key, "_salt"]).drop("_salt")


def bloom_filtered_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Equi-join with a runtime Bloom semi-join reduction: a compact
    bitmap of the (already-filtered) small side's join keys is built
    once, broadcast as ONE row (``m_bits/64`` packed words — 128 KiB at
    the default), and the big side is pre-filtered MAP-SIDE before its
    shuffle. The exact join then runs on the survivors, so false
    positives cannot change the result — proven identical to
    ``big.join(small, key)`` by test.

    This is the shuffle-volume lever for selective dim filters at scale:
    when the filter keeps 1% of the dim, ~99% of the fact rows die
    before the exchange instead of after it (Spark's own
    ``runtime.bloomFilter`` optimization makes the same move when its
    thresholds line up; this operator makes the reduction explicit,
    plannable, and testable). Reuses the dedup module's portable
    md5-60bit double hashing, so the filter is engine-reproducible."""
    from hadoop_invertedindexer_spark.operators.dedup import (
        _bloom_positions,
        bloom_bitmap,
    )

    keys = small.select(F.col(key).cast("string").alias("jk")).distinct()
    bloom = bloom_bitmap(keys, "jk", m_bits, k)
    probe = big.join(F.broadcast(bloom))
    hit_all = None
    for p in _bloom_positions(F.col(key).cast("string"), m_bits, k):
        word = F.element_at("bloom", (p / 64).cast("int") + 1)
        hit = F.bit_get(word, p % 64) == 1
        hit_all = hit if hit_all is None else (hit_all & hit)
    return probe.where(hit_all).drop("bloom").join(small, key)


def q_bloom_join_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order volume for rich customers (c_acctbal > 9000, ~1% of the
    dim) through :func:`bloom_filtered_join`: the fact side is pruned
    map-side by the 128 KiB key bitmap before any exchange. The bloom is
    result-transparent (exact join re-applied), so the oracle is the
    PLAIN SQL join — the driver proving bit-equality IS the proof the
    reduction changed nothing."""
    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    rich = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    joined = bloom_filtered_join(
        o, rich.select("c_custkey", "c_nationkey"), key="c_custkey", m_bits=1 << 20
    )
    return (
        joined.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-hash join chain fact→dims: revenue per region.

    lineitem⋈orders is the only shuffle-worthy join (both large at scale;
    here AQE picks broadcast); customer/nation/region are broadcast dims.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers that have at least one order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no orders (same shape as the stop-word
    filter, op #9 — the general form)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, revenue by nation where the supplying
    and ordering nations coincide."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    quarter. lineitem⋈orders carries the only big shuffle; customer and
    nation broadcast. The returnflag + date filters push to the scans."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            # decimal accumulation: exact, so the 2-dp rounding is
            # independent of partial-agg order (a double sum here lands on
            # a .xx5 boundary and flips the last digit between engines)
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue for one market segment
    (testdata has no o_shippriority column, so the projection drops it —
    the join/agg skeleton is Q3's). customer broadcasts after its segment
    filter; orders⋈lineitem is the one big shuffle, both date filters
    pushed to the scans."""
    cutoff = "1996-03-15"
    c = F.broadcast(
        _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    )
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit(cutoff))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit(cutoff))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: critical- vs normal-priority order counts among
    late shipments, per line status (testdata has no l_shipmode /
    l_commitdate / l_receiptdate, so 'late' is l_shipdate > o_orderdate
    + 60 days and the grouping column is l_linestatus — the
    join + conditional-sum skeleton is Q12's). One lineitem⋈orders
    shuffle; the CASE sums fold into the partial aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(critical, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold —
    an aggregate-then-join-back (HAVING feeding a join). The heavy groupBy
    runs on lineitem alone; the surviving keys (~1%) then join orders, so
    the second join's left side is already tiny."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
    )


# ------------------------------------------------------------ aggregation


def q_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: wide aggregate over lineitem — partial+final HashAggregate,
    pushdown-friendly date filter at the scan."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, no join — every
    predicate (date range, discount band, quantity cap) is pushdown-
    eligible, so at 100 TB this reads only row groups whose min/max
    statistics intersect the filters."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (CASE inside SUM) — the
    promo revenue share for one month. part broadcasts; the month filter
    pushes to the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-03-01"))
    )
    p = F.broadcast(_t(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 6).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_group_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct aggregate: unique ordering customers per priority."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (orderstatus, orderpriority)."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under cube/rollup)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


def q_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ distinct, t-digest-ish percentile).
    Rows-only in the contract — sketch internals differ across engines by
    design; tests/test_relational_ext.py bounds them against exact."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_p50"),
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile_cont semantics)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90"),
    )


# ---------------------------------------------------------------- windows


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (ranking window + filter)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer over time (explicit ROWS frame)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta vs previous order per customer (lag)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice", 1).over(w), 2
        ).alias("delta_prev"),
    )


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile / percent_rank / cume_dist per
    priority. The order key carries the orderkey tiebreak — one
    (priority, totalprice) pair repeats in the data, and an ambiguous
    order would make ntile assignment nondeterministic."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching over the distinct name vocabulary,
    blocked on the first character — the vocabulary-reconciliation op
    (typo clusters, alias merging). Blocking bounds the candidate join;
    levenshtein runs only inside blocks. At 100 TB the same shape holds:
    distinct-vocab is orders of magnitude smaller than the corpus."""
    p = _t(spark, sf_dir, "part")
    names = p.select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    blocked = a.join(
        b,
        (F.substring("name_a", 1, 1) == F.substring("name_b", 1, 1))
        & (F.col("name_a") < F.col("name_b")),
    )
    return blocked.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
    ).where(F.col("dist") <= 4)


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 parts by revenue — deterministic tiebreak on key.

    At scale this is TakeOrderedAndProject: per-partition top-k then a
    k-row merge on the driver — no global sort materialization.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    rev = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return rev.orderBy(F.desc("revenue"), F.asc("p_partkey")).limit(10)


# ----------------------------------------------------------------- set ops


def _segment_keys(spark: SparkSession, sf_dir: str, segment: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.where(F.col("c_mktsegment") == segment).select("c_custkey")


def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two customer segments."""
    a = _segment_keys(spark, sf_dir, "BUILDING")
    b = _segment_keys(spark, sf_dir, "AUTOMOBILE")
    return a.union(b).distinct()


def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers in a segment that also placed orders."""
    a = _segment_keys(spark, sf_dir, "BUILDING")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return a.intersect(o)


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: segment customers minus those with any order."""
    a = _segment_keys(spark, sf_dir, "BUILDING")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return a.exceptAll(o.distinct())


# --------------------------------------------------- scalar fn coverage


def q_date_trunc_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-level date math over orders."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day extraction."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from events.props."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): ``parse_json`` once into
    the binary VariantType, typed ``variant_get`` extractions after —
    the engine-native alternative to per-query string re-parsing. At
    100 TB the parse happens at ingestion and the shredded binary column
    is scanned, not the text; this query proves the typed-extraction
    semantics match the string path bit-for-bit (same oracle shape as
    json_extract)."""
    e = _t(spark, sf_dir, "events")
    v = e.withColumn("v", F.parse_json("props"))
    k = F.variant_get("v", "$.k", "bigint")
    return v.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.when(k > 50, 1)).alias("n_gt50"),
    )


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String fn coverage beyond the reference's lower/regex/split."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
    )


_SQL_Q3 = """
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
"""


def q_sql_api_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape through the engine's SQL front door: the identical
    ANSI text runs on Spark (via register_sf_tables + spark.sql) and on
    the DuckDB oracle — same string, two engines, same rows."""
    from hadoop_invertedindexer_spark.sources.tables import register_sf_tables

    register_sf_tables(spark, sf_dir)
    return spark.sql(_SQL_Q3)


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array fn coverage (sort/distinct/slice/contains over token arrays);
    array outputs rendered as strings so the oracle compare is
    representation-stable across engines."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.concat_ws(",", F.slice(F.sort_array(toks), 1, 3)).alias("first3"),
        F.array_contains(toks, "the").cast("int").cast("bigint").alias("has_the"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )


def q_pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: quantity by returnflag × linestatus, statuses as columns.
    The value list is pinned (no discovery pass) — at scale an unpinned
    pivot first runs a distinct over the pivot column."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


def q_unpivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: per-priority measures widened back to (metric, value)
    rows — the inverse of pivot, used to normalize wide metric tables."""
    o = _t(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
    )
    return wide.unpivot(
        ["o_orderpriority"], ["sum_price", "n_orders"], "metric", "value"
    )


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map fn coverage: construct, extract, keys, cardinality."""
    li = _t(spark, sf_dir, "lineitem")
    m = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("price")),
        F.array(F.col("l_quantity"), F.col("l_extendedprice")),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, "qty").alias("qty_val"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
        F.concat_ws(",", F.map_keys(m)).alias("keys"),
    )


def q_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: exact median, sample stddev, Pearson corr."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.round(F.stddev("l_extendedprice"), 4).alias("stddev_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
    )


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of extendedprice (fixed-width buckets via a
    pure projection — no sampling pass, each row maps independently, so
    the shuffle carries only bucket-count pairs)."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.least(F.floor(F.col("l_extendedprice") / 10000), F.lit(9)).cast(
        "bigint"
    )
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the 10 heaviest o_custkey values and
    their share of all orders — the profiling step that decides between
    plain, AQE-skew, and salted join plans before a 100 TB run."""
    o = _t(spark, sf_dir, "orders")
    per_key = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = per_key.agg(F.sum("n").alias("total"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .select("key", "n", F.round(F.col("n") / F.col("total"), 6).alias("share"))
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(10)
    )


def q_argmax_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max/arg-min aggregates: which order realizes each priority's
    price extremes (max_by/min_by — ties impossible on this data, checked
    before pinning the oracle)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("top_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("bottom_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


_SQL_CORRELATED = """
    SELECT c_custkey, c_name FROM customer c
    WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
"""


def q_sql_api_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL front door — the same
    ANSI text on both engines (Catalyst decorrelates it to an aggregate
    + join; no per-row re-execution)."""
    from hadoop_invertedindexer_spark.sources.tables import register_sf_tables

    register_sf_tables(spark, sf_dir)
    return spark.sql(_SQL_CORRELATED)


_SQL_RECURSIVE = """
    WITH RECURSIVE nxt AS (
        SELECT o_custkey AS c, o_orderkey AS k,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn,
               lead(o_orderkey) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS nk
        FROM orders
    ),
    chain(c, k, depth) AS (
        SELECT c, k, 1 FROM nxt WHERE rn = 1
        UNION ALL
        SELECT n.c, n.nk, ch.depth + 1
        FROM chain ch JOIN nxt n ON n.c = ch.c AND n.k = ch.k
        WHERE n.nk IS NOT NULL
    )
    SELECT c AS o_custkey, max(depth) AS chain_len
    FROM chain GROUP BY c
"""


_SQL_RECURSIVE_NXT = """
    SELECT o_custkey AS c, o_orderkey AS k,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn,
           lead(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS nk
    FROM orders
"""

_SQL_RECURSIVE_OVER_MAT = """
    WITH RECURSIVE chain(c, k, depth) AS (
        SELECT c, k, 1 FROM nxt_mat WHERE rn = 1
        UNION ALL
        SELECT n.c, n.nk, ch.depth + 1
        FROM chain ch JOIN nxt_mat n ON n.c = ch.c AND n.k = ch.k
        WHERE n.nk IS NOT NULL
    )
    SELECT c AS o_custkey, max(depth) AS chain_len
    FROM chain GROUP BY c
"""


def q_sql_api_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE through the SQL front door (Spark 4.x WITH
    RECURSIVE): walk each customer's order sequence as a linked list
    (anchor = earliest order, step = the lead() successor) and report
    the traversal depth — the chain length must equal the customer's
    plain order count, which the recursion-free cross-check test pins.

    The non-recursive ``nxt`` precursor (a window over orders) is
    MATERIALIZED first (eager localCheckpoint behind a temp view):
    Catalyst inlines CTEs, so left inside the recursion it re-ran the
    full window per step — ~30 sequential steps (max orders/customer)
    re-sorting orders each time (VERDICT r5 item 2; the Spark analog of
    the AS MATERIALIZED lesson the DuckDB oracle side already learned —
    the ORACLE text, ``_SQL_RECURSIVE``, keeps the single-statement
    ANSI form with the same semantics). Measured at sf0.1:
    8.8s -> see bench_baseline.json.

    The temp view is DROPPED immediately after the recursive plan is
    analyzed (ADVICE r6): ``spark.sql`` inlines the view's plan eagerly,
    so the catalog reference is not needed afterwards — and leaving it
    registered pinned the checkpointed RDD alive forever, invisible to
    ``release_persisted()``/``clearCache()``. With the view gone, the
    only reference is the returned DataFrame itself; once the caller's
    action completes and the frame is garbage-collected, ContextCleaner
    reclaims the blocks. (A ``tracked_persist`` + temp-view variant was
    measured at +2.5 s per run — the ~30 recursion steps pay the
    InMemoryRelation's columnar decode per scan, vs the checkpointed
    RDD's row cache — so the checkpoint stays.)"""
    from hadoop_invertedindexer_spark.sources.tables import register_sf_tables

    register_sf_tables(spark, sf_dir)
    spark.sql(_SQL_RECURSIVE_NXT).localCheckpoint(
        eager=True
    ).createOrReplaceTempView("nxt_mat")
    out = spark.sql(_SQL_RECURSIVE_OVER_MAT)
    spark.catalog.dropTempView("nxt_mat")
    return out


_SQL_LATERAL = """
    SELECT c.c_custkey, c.c_name,
           round(t.total_spend, 2) AS total_spend, t.n_orders
    FROM customer c, LATERAL (
        SELECT sum(o.o_totalprice) AS total_spend, count(*) AS n_orders
        FROM orders o WHERE o.o_custkey = c.c_custkey
    ) t
    WHERE t.n_orders >= 20
"""


def q_sql_api_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table through the SQL front door — the
    same ANSI text on both engines. Catalyst decorrelates the lateral
    aggregate into a grouped join (no per-row subquery execution), so
    the shape survives at fact-table scale."""
    from hadoop_invertedindexer_spark.sources.tables import register_sf_tables

    register_sf_tables(spark, sf_dir)
    return spark.sql(_SQL_LATERAL)


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math fn coverage."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.ln(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        F.ceil("l_quantity").cast("bigint").alias("ceil_qty"),
        F.floor(F.col("l_discount")).cast("bigint").alias("floor_disc"),
        F.abs(F.col("l_tax") - 0.05).alias("abs_tax_dev"),
    )


# ------------------------------------------------- TPC-H remainder (adapted)
#
# The driver's star schema trims TPC-H (no partsupp, no commit/receipt
# dates, no phone/comment/container columns), so the remaining TPC-H
# queries are adapted to the available columns while keeping each query's
# *shape* — the plan pattern Catalyst must get right — intact:
# q4 EXISTS-semi-join, q7/q8/q9 multi-way dim joins with derived grouping,
# q13 outer-join + distribution, q15 scalar-max view join-back, q17
# correlated-avg join-back, q19 OR-of-ANDs pushdown, q21 double
# existential, q22 anti-join + global scalar. "Late" stands in for the
# missing commit/receipt lateness: l_shipdate > o_orderdate + 60 days.


def q_tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join. Orders in one quarter with
    at least one late lineitem, counted per priority. The semi-join keeps
    orders' columns only, so no dedup of multi-match lineitems is needed —
    exactly why EXISTS compiles to LeftSemi and not an inner join."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-04-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dim table (nation) joined twice under two
    roles (supplier's vs customer's nation) — alias hygiene plus a
    symmetric pair filter. Both nation sides broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue per year —
    conditional numerator over a grouped total (CASE inside SUM over a
    6-way join). Customer-side region restricts; supplier-side nation is
    the share subject."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    p = F.broadcast(_t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD"))
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    r = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    subject = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("c_nkey"))
        .join(r, F.col("c_rkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n2, F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(subject) / F.sum(rev), 6).alias("mkt_share"))
    )


def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (sans partsupp): profit per supplier-nation per year
    over parts matching a name substring. The LIKE filter lands on the
    broadcast part side, shrinking the probe before the fact join."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = F.broadcast(
        _t(spark, sf_dir, "part").where(F.col("p_name").contains("widget"))
    )
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("sum_profit")
        )
    )


def q_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join preserving zero-order customers, then a
    distribution-of-counts (two stacked groupBys). count(o_orderkey) —
    not count(*) — so NULL probe misses count as 0."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a revenue view joined back against its own scalar
    max. The max is computed once over the (tiny, post-agg) view and
    broadcast — no window-over-everything, no second scan of lineitem.
    Decimal accumulation makes the max comparison engine-exact."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    top = F.broadcast(rev.agg(F.max("total_revenue").alias("max_rev")))
    return (
        rev.join(top, F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average decorrelated into an
    aggregate + join-back. The per-part avg runs over the brand-filtered
    lineitems only (join first, then agg), and l_quantity is integral in
    this corpus so the double avg is order-exact."""
    p = F.broadcast(
        _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#7").select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(p, F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.5).alias("half_avg"))
    return (
        li.join(F.broadcast(avg_qty), "l_partkey")
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice") / 4.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive bands (brand × size ×
    quantity). The part-side legs of each disjunct prune the broadcast
    build side; the OR over mixed-side predicates evaluates post-join."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    band = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(band)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double existential (EXISTS another supplier on the
    order, NOT EXISTS another *late* supplier) decorrelated into one
    order-level aggregate — n_suppliers and n_late_suppliers per order —
    instead of two correlated re-scans of lineitem. One shuffle replaces
    the EXISTS pair; the oracle keeps the correlated form to prove the
    rewrite. Late = shipped >60 days after the order date."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    flagged = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    stats = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    late_pairs = (
        flagged.where(F.col("is_late")).select("l_orderkey", "l_suppkey").distinct()
    )
    return (
        late_pairs.join(stats, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q_tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: anti-join against orders plus a global scalar
    threshold (avg positive balance). The scalar is carried as exact
    (sum DECIMAL, count BIGINT) and compared cross-multiplied —
    acctbal * n_pos > sum_pos — so no engine-dependent double division
    decides membership. "Lapsed" = no order since mid-2000 (every
    customer in this corpus has *some* order, so the classic no-orders
    form would be vacuously empty)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= F.lit("2000-07-01"))
    target = c.where(F.col("c_nationkey").isin(1, 3, 5, 7))
    pos = F.broadcast(
        target.where(F.col("c_acctbal") > 0.0).agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("sum_pos"),
            F.count(F.lit(1)).alias("n_pos"),
        )
    )
    return (
        target.join(o, target.c_custkey == o.o_custkey, "left_anti")
        .crossJoin(pos)
        .where(F.col("c_acctbal").cast("decimal(18,2)") * F.col("n_pos") > F.col("sum_pos"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis over the events stream: users whose first
    view precedes their first click precedes their first purchase, plus
    the mean view→purchase latency for converters. One shuffle (groupBy
    user) carrying five conditional-min timestamps; the funnel
    comparisons then run on the tiny per-user frame. Time math stays in
    integer microseconds (unix_micros) so every sum is exact — no
    floating-point timestamp drift between engines."""
    ev = _t(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.unix_micros("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_view") < F.col("t_click"))
    converted = clicked & (F.col("t_click") < F.col("t_purchase"))
    conv_us = F.when(converted, F.col("t_purchase") - F.col("t_view"))
    return per_user.agg(
        F.count(F.when(viewed, 1)).alias("n_viewers"),
        F.count(F.when(clicked, 1)).alias("n_clicked_after_view"),
        F.count(F.when(converted, 1)).alias("n_converted"),
        F.round(
            F.sum(conv_us) / (F.lit(1000000.0) * F.count(conv_us)), 6
        ).alias("avg_seconds_to_convert"),
    )


def q_window_trailing_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based trailing window (RANGE frame, not ROWS): per event, the
    count and value-sum of the same user's events in the preceding hour.
    The frame is value-based on integer epoch-seconds — tie rows are
    peers in both engines — and the windowed sum accumulates in DECIMAL
    so frame-internal addition order can't drift the output."""
    ev = _t(spark, sf_dir, "events")
    t_sec = (F.unix_micros("ts") / F.lit(1000000)).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_sec")
        .rangeBetween(-3599, Window.currentRow)
    )
    return (
        ev.withColumn("t_sec", t_sec)
        .select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).over(w), 2)
            .cast("double")
            .alias("sum_1h"),
        )
    )


def q_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation: orders placed vs lineitems shipped per
    month. The two calendars overhang each other (shipments trail
    orders by months), so both null sides are exercised; counts
    coalesce to 0 the way a reconciliation report would. Both inputs
    are pre-aggregated to month grain before the join, so the full
    outer join moves |months| rows, not fact rows."""
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_shipped"))
    )
    return o.join(li, "month", "full_outer").select(
        F.date_format("month", "yyyy-MM").alias("month"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_shipped", F.lit(0)).alias("n_shipped"),
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank over the customer→supplier transaction graph
    (edges = distinct (o_custkey, l_suppkey) pairs). The driver oracle
    unrolls the same 5 matrix-vector steps as chained CTEs in DuckDB
    (:func:`_pagerank_oracle`); round(rank, 6) on both sides absorbs the
    ulp-level double-summation-order differences between engines. The
    recurrence is additionally pinned against a pure-Python reference
    loop in test_graph.py."""
    from hadoop_invertedindexer_spark.operators.graph import pagerank

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
    )
    return pagerank(edges, iters=5).select(
        "node", F.round("rank", 6).alias("rank")
    )


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the part co-purchase graph (parts sharing an
    order are adjacent; per-order fanout is bounded by order size, <= 13
    in this data). Degree-ordered orientation caps the wedge join's
    fanout at O(sqrt(m)) per node regardless of raw degree skew — the
    property that keeps the count feasible on power-law graphs at scale
    (see operators/graph.py:triangle_count)."""
    from hadoop_invertedindexer_spark.operators.graph import triangle_count

    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    x, y = li.alias("x"), li.alias("y")
    e0 = x.join(
        y, (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p"))
    ).select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
    return triangle_count(e0)


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core of the part co-purchase graph at k=80 (measured: 5 peeling
    rounds at sf0.01, 1857 of 2000 parts survive — the cascade is real,
    not a single filter). Fixed 8-round schedule, exact because peeling
    is monotone and 8 >= the depth; the oracle unrolls the identical
    rounds as CTEs (the pagerank-oracle pattern)."""
    from hadoop_invertedindexer_spark.operators.graph import kcore_nodes

    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    x, y = li.alias("x"), li.alias("y")
    e0 = x.join(
        y, (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p"))
    ).select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
    return kcore_nodes(e0, k=80, iters=8)


def _kcore_oracle(k: int = 80, iters: int = 8) -> str:
    """Unrolled peeling rounds as chained CTEs (lockstep with
    graph.kcore_nodes at the same k / iters)."""
    # AS MATERIALIZED: each round references the previous CTE three
    # times (twice via the degree CTE); DuckDB inlines CTEs by default,
    # which expands the 8-round chain exponentially (~3^8 parquet
    # re-scans — measured fd exhaustion). Materializing keeps the oracle
    # linear, mirroring Spark's localCheckpoint cadence.
    ctes = [
        "li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
        "l_partkey AS p FROM lineitem)",
        "e0 AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b FROM li x "
        "JOIN li y ON x.o = y.o AND x.p < y.p)",
    ]
    prev = "e0"
    for i in range(iters):
        ctes.append(
            f"k{i} AS MATERIALIZED (SELECT n FROM (SELECT a AS n FROM {prev} "
            f"UNION ALL SELECT b FROM {prev}) u GROUP BY n "
            f"HAVING count(*) >= {k})"
        )
        ctes.append(
            f"e{i + 1} AS MATERIALIZED (SELECT e.a, e.b FROM {prev} e "
            f"JOIN k{i} ka ON e.a = ka.n JOIN k{i} kb ON e.b = kb.n)"
        )
        prev = f"e{i + 1}"
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT DISTINCT n AS node FROM (SELECT a AS n FROM {prev} "
        f"UNION ALL SELECT b FROM {prev}) fin"
    )


RELATIONAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "funnel_conversion": q_funnel_conversion,
    "triangle_count": q_triangle_count,
    "kcore_nodes": q_kcore,
    "bloom_join_reduction": q_bloom_join_reduction,
    "pagerank": q_pagerank,
    "window_trailing_range": q_window_trailing_range,
    "full_outer_reconcile": q_full_outer_reconcile,
    "tpch_q4_priority_check": q_tpch_q4_priority_check,
    "tpch_q7_volume_shipping": q_tpch_q7_volume_shipping,
    "tpch_q8_market_share": q_tpch_q8_market_share,
    "tpch_q9_product_profit": q_tpch_q9_product_profit,
    "tpch_q13_customer_distribution": q_tpch_q13_customer_distribution,
    "tpch_q15_top_supplier": q_tpch_q15_top_supplier,
    "tpch_q17_small_qty_revenue": q_tpch_q17_small_qty_revenue,
    "tpch_q19_discounted_revenue": q_tpch_q19_discounted_revenue,
    "tpch_q21_waiting_suppliers": q_tpch_q21_waiting_suppliers,
    "tpch_q22_global_sales": q_tpch_q22_global_sales,
    "join_broadcast": q_join_broadcast,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "tpch_q5_local_supplier": q_tpch_q5_local_supplier,
    "tpch_q1_pricing_summary": q_tpch_q1_pricing_summary,
    "tpch_q6_forecast_revenue": q_tpch_q6_forecast_revenue,
    "tpch_q3_shipping_priority": q_tpch_q3_shipping_priority,
    "tpch_q12_late_shipments": q_tpch_q12_late_shipments,
    "tpch_q10_returned_items": q_tpch_q10_returned_items,
    "tpch_q14_promo_effect": q_tpch_q14_promo_effect,
    "tpch_q18_large_orders": q_tpch_q18_large_orders,
    "group_distinct": q_group_distinct,
    "cube_agg": q_cube_agg,
    "rollup_agg": q_rollup_agg,
    "grouping_sets": q_grouping_sets,
    "approx_aggs": q_approx_aggs,
    "percentiles": q_percentiles,
    "window_rank": q_window_rank,
    "window_running_sum": q_window_running_sum,
    "window_lag": q_window_lag,
    "topk": q_topk,
    "set_union": q_set_union,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "date_trunc_agg": q_date_trunc_agg,
    "date_parts": q_date_parts,
    "json_extract": q_json_extract,
    "variant_extract": q_variant_extract,
    "string_funcs": q_string_funcs,
    "sql_api_q3": q_sql_api_q3,
    "array_funcs": q_array_funcs,
    "math_funcs": q_math_funcs,
    "pivot_agg": q_pivot_agg,
    "unpivot_agg": q_unpivot_agg,
    "map_funcs": q_map_funcs,
    "stats_aggs": q_stats_aggs,
    "histogram": q_histogram,
    "skew_profile": q_skew_profile,
    "window_distribution": q_window_distribution,
    "fuzzy_match": q_fuzzy_match,
    "argmax_aggs": q_argmax_aggs,
    "sql_api_correlated": q_sql_api_correlated,
    "sql_api_lateral": q_sql_api_lateral,
    "sql_api_recursive": q_sql_api_recursive,
}

_REV = "l_extendedprice * (1 - l_discount)"

def _pagerank_oracle(iters: int = 5) -> str:
    """Exact SQL twin of :func:`q_pagerank`: the PageRank recurrence
    unrolled as ``iters`` chained CTEs (DuckDB recursive CTEs disallow
    aggregation in the recursive term, so unrolling is the portable
    spelling). Doubles throughout, mirroring the Spark op; the teleport
    constant is spelled ``(1.0::DOUBLE - 0.85::DOUBLE)`` because Spark
    evaluates ``F.lit(1.0 - damping)`` in Python double arithmetic —
    a DuckDB DECIMAL ``0.15`` literal is one ulp away."""
    steps = []
    prev = "r0"
    for k in range(1, iters + 1):
        steps.append(f"""
        c{k} AS (
            SELECT e.dst AS node, sum(r.rank / d.deg) AS contrib
            FROM edges e
            JOIN deg d ON e.src = d.src
            JOIN {prev} r ON r.node = e.src
            GROUP BY e.dst),
        d{k} AS (
            SELECT coalesce(sum(r.rank), 0.0::DOUBLE) AS dangling
            FROM {prev} r LEFT JOIN deg d ON r.node = d.src
            WHERE d.src IS NULL),
        r{k} AS (
            SELECT n.node,
                   (1.0::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM nn)
                   + 0.85::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE)
                        + (SELECT dangling FROM d{k}) / (SELECT n FROM nn))
                       AS rank
            FROM nodes n LEFT JOIN c{k} c ON n.node = c.node)""")
        prev = f"r{k}"
    return f"""
        WITH edges AS (
            SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        nodes AS (
            SELECT src AS node FROM edges
            UNION
            SELECT dst FROM edges),
        deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        r0 AS (
            SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS rank
            FROM nodes),{",".join(steps)}
        SELECT node, round(rank, 6) AS rank FROM {prev}"""


RELATIONAL_ORACLE_SQL: dict[str, str] = {
    "pagerank": _pagerank_oracle(iters=5),
    "kcore_nodes": _kcore_oracle(k=80, iters=8),
    # the bloom is result-transparent (exact join re-applied after the
    # map-side prune), so the oracle is the PLAIN join — equality proves
    # the reduction dropped only non-matching rows
    "bloom_join_reduction": """
        SELECT c.c_nationkey,
               count(*)::BIGINT AS n_orders,
               round(sum(o.o_totalprice), 2) AS total_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_acctbal > 9000
        GROUP BY c.c_nationkey""",
    # same degree-ordered orientation as graph.triangle_count: row-value
    # (degree, node) comparison picks the edge direction, wedges close
    # against the oriented list, each triangle matched exactly once
    "triangle_count": """
        WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                    FROM lineitem),
        e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
               FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
        deg AS (SELECT n, count(*) AS d FROM (
                    SELECT a AS n FROM e0
                    UNION ALL SELECT b FROM e0) u GROUP BY n),
        o AS (SELECT CASE WHEN (da.d, e0.a) < (db.d, e0.b)
                          THEN e0.a ELSE e0.b END AS src,
                     CASE WHEN (da.d, e0.a) < (db.d, e0.b)
                          THEN e0.b ELSE e0.a END AS dst
              FROM e0 JOIN deg da ON da.n = e0.a
                      JOIN deg db ON db.n = e0.b),
        w AS (SELECT o1.dst AS y, o2.dst AS z
              FROM o o1 JOIN o o2 ON o1.src = o2.src AND o1.dst <> o2.dst)
        SELECT (SELECT count(*) FROM e0)::BIGINT AS n_edges,
               count(*)::BIGINT AS n_triangles
        FROM w JOIN o ON o.src = w.y AND o.dst = w.z""",
    "full_outer_reconcile": """
        SELECT strftime(coalesce(o.month, l.month), '%Y-%m') AS month,
               coalesce(n_orders, 0) AS n_orders,
               coalesce(n_shipped, 0) AS n_shipped
        FROM (SELECT date_trunc('month', o_orderdate) AS month,
                     count(*) AS n_orders
              FROM orders GROUP BY 1) o
        FULL OUTER JOIN
             (SELECT date_trunc('month', l_shipdate) AS month,
                     count(*) AS n_shipped
              FROM lineitem GROUP BY 1) l
          USING (month)""",
    "window_trailing_range": """
        SELECT event_id, user_id,
               count(*) OVER w AS n_1h,
               round(sum(value::DECIMAL(18,2)) OVER w, 2)::DOUBLE AS sum_1h
        FROM (SELECT event_id, user_id, value,
                     epoch_us(ts) // 1000000 AS t_sec
              FROM events) e
        WINDOW w AS (PARTITION BY user_id ORDER BY t_sec
                     RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)""",
    "funnel_conversion": """
        WITH per_user AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view'
                            THEN epoch_us(ts) END) AS t_view,
                   min(CASE WHEN event_type = 'click'
                            THEN epoch_us(ts) END) AS t_click,
                   min(CASE WHEN event_type = 'purchase'
                            THEN epoch_us(ts) END) AS t_purchase
            FROM events GROUP BY user_id)
        SELECT count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_viewers,
               count(CASE WHEN t_view < t_click THEN 1 END)
                   AS n_clicked_after_view,
               count(CASE WHEN t_view < t_click AND t_click < t_purchase
                          THEN 1 END) AS n_converted,
               round(sum(CASE WHEN t_view < t_click AND t_click < t_purchase
                              THEN t_purchase - t_view END)
                     / (1000000.0 *
                        count(CASE WHEN t_view < t_click
                                    AND t_click < t_purchase
                                   THEN 1 END)), 6)
                   AS avg_seconds_to_convert
        FROM per_user""",
    "tpch_q4_priority_check": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= '1997-04-01' AND o_orderdate < '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority""",
    "tpch_q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate)::INTEGER AS l_year,
               round(sum({_REV}), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY supp_nation, cust_nation, l_year""",
    "tpch_q8_market_share": f"""
        SELECT year(o_orderdate)::INTEGER AS o_year,
               round(sum(CASE WHEN n2.n_name = 'NATION_3' THEN {_REV}
                              ELSE 0.0 END) / sum({_REV}), 6) AS mkt_share
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE p_type = 'STANDARD' AND r_name = 'EUROPE'
        GROUP BY o_year""",
    "tpch_q9_product_profit": f"""
        SELECT n_name AS nation, year(o_orderdate)::INTEGER AS o_year,
               round(sum(({_REV})::DECIMAL(18,6)), 2)::DOUBLE AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, year(o_orderdate)""",
    "tpch_q13_customer_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer
              LEFT OUTER JOIN orders
                ON c_custkey = o_custkey
               AND o_orderpriority <> '4-NOT SPECIFIED'
              GROUP BY c_custkey) c_orders
        GROUP BY c_count""",
    "tpch_q15_top_supplier": f"""
        WITH revenue AS (
            SELECT l_suppkey,
                   round(sum(({_REV})::DECIMAL(18,6)), 2)::DOUBLE AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""",
    "tpch_q17_small_qty_revenue": """
        SELECT round(sum(l_extendedprice) / 4.0, 2) AS avg_yearly,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#7'
          AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                            FROM lineitem l2 JOIN part p2
                              ON l2.l_partkey = p2.p_partkey
                            WHERE l2.l_partkey = lineitem.l_partkey
                              AND p2.p_brand = 'Brand#7')""",
    "tpch_q19_discounted_revenue": f"""
        SELECT round(sum({_REV}), 2) AS revenue, count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1  AND 15
               AND l_quantity BETWEEN 1  AND 11)
           OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#21' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 30)""",
    "tpch_q21_waiting_suppliers": """
        SELECT s_name, count(*) AS numwait
        FROM (SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
              FROM lineitem l1
              JOIN orders ON o_orderkey = l1.l_orderkey
              WHERE o_orderstatus = 'F'
                AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
                AND EXISTS (SELECT 1 FROM lineitem l2
                            WHERE l2.l_orderkey = l1.l_orderkey
                              AND l2.l_suppkey <> l1.l_suppkey)
                AND NOT EXISTS (SELECT 1 FROM lineitem l3
                                WHERE l3.l_orderkey = l1.l_orderkey
                                  AND l3.l_suppkey <> l1.l_suppkey
                                  AND l3.l_shipdate >
                                      o_orderdate + INTERVAL 60 DAY)) waiters
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name""",
    "tpch_q22_global_sales": """
        WITH target AS (SELECT * FROM customer
                        WHERE c_nationkey IN (1, 3, 5, 7)),
             pos AS (SELECT sum(c_acctbal::DECIMAL(18,2)) AS sum_pos,
                            count(*) AS n_pos
                     FROM target WHERE c_acctbal > 0.0)
        SELECT c_nationkey, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM target, pos
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = target.c_custkey
                            AND o.o_orderdate >= '2000-07-01')
          AND c_acctbal::DECIMAL(18,2) * n_pos > sum_pos
        GROUP BY c_nationkey""",
    "join_broadcast": f"""
        SELECT r_name, round(sum({_REV}), 2) AS revenue, count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name""",
    "semi_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
    "anti_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
    "tpch_q5_local_supplier": f"""
        SELECT n_name, round(sum({_REV}), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE c_nationkey = s_nationkey
        GROUP BY n_name""",
    "tpch_q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                      AS sum_qty,
               round(sum(l_extendedprice), 2)                 AS sum_base_price,
               round(sum({_REV}), 2)                          AS sum_disc_price,
               round(sum({_REV} * (1 + l_tax)), 2)            AS sum_charge,
               round(avg(l_quantity), 6)                      AS avg_qty,
               round(avg(l_extendedprice), 6)                 AS avg_price,
               round(avg(l_discount), 6)                      AS avg_disc,
               count(*)                                       AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus""",
    "tpch_q6_forecast_revenue": f"""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24""",
    "tpch_q12_late_shipments": """
        SELECT l_linestatus,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY l_linestatus ORDER BY l_linestatus""",
    "tpch_q3_shipping_priority": f"""
        SELECT l_orderkey, o_orderdate,
               round(sum(({_REV})::DECIMAL(18,6)), 2)::DOUBLE AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < '1996-03-15' AND l_shipdate > '1996-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "tpch_q10_returned_items": f"""
        SELECT c_custkey, c_name, n_name,
               round(sum(({_REV})::DECIMAL(18,6)), 2)::DOUBLE AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "tpch_q14_promo_effect": f"""
        SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV}
                                      ELSE 0.0 END) / sum({_REV}), 6)
                   AS promo_pct,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-03-01'""",
    "tpch_q18_large_orders": """
        SELECT c_custkey, o_orderkey,
               round(o_totalprice, 2) AS totalprice, sum_qty
        FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING round(sum(l_quantity), 2) > 250) big
        JOIN orders   ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey""",
    "group_distinct": """
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority""",
    "cube_agg": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "rollup_agg": """
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS sum_price, count(*) AS n
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    "grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    "percentiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 6) AS p90
        FROM lineitem GROUP BY l_returnflag""",
    "window_rank": """
        SELECT o_custkey, o_orderkey, rn FROM (
            SELECT o_custkey, o_orderkey,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rn
            FROM orders) t
        WHERE rn <= 3""",
    "window_running_sum": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_total
        FROM orders""",
    "window_lag": """
        SELECT o_custkey, o_orderkey,
               round(o_totalprice - lag(o_totalprice, 1) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
                   AS delta_prev
        FROM orders""",
    "topk": f"""
        SELECT p_partkey, p_name, revenue FROM (
            SELECT p_partkey, p_name, round(sum({_REV}), 2) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_partkey, p_name) t
        ORDER BY revenue DESC, p_partkey LIMIT 10""",
    "set_union": """
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'""",
    "set_intersect": """
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey FROM orders""",
    "set_except": """
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT ALL
        SELECT DISTINCT o_custkey FROM orders""",
    "date_trunc_agg": """
        SELECT date_trunc('month', o_orderdate) AS month,
               count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY 1""",
    "date_parts": """
        SELECT o_orderkey,
               year(o_orderdate)::BIGINT AS y,
               month(o_orderdate)::BIGINT AS m,
               day(o_orderdate)::BIGINT AS d
        FROM orders""",
    "json_extract": """
        SELECT event_type,
               sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
               max(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS max_k,
               count(*) AS n
        FROM events GROUP BY event_type""",
    "variant_extract": """
        SELECT event_type,
               sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
               max(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS max_k,
               count(CASE WHEN json_extract_string(props, '$.k')::BIGINT > 50
                          THEN 1 END) AS n_gt50
        FROM events GROUP BY event_type""",
    "string_funcs": """
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               substring(p_name, 1, 5) AS name_pfx,
               length(p_name)::BIGINT AS name_len,
               concat_ws('|', p_brand, p_type) AS brand_type,
               regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel
        FROM part""",
    "sql_api_q3": _SQL_Q3,
    "array_funcs": """
        SELECT doc_id,
               len(list_distinct(string_split(text, ' ')))::BIGINT AS n_distinct,
               array_to_string(list_sort(string_split(text, ' '))[1:3], ',')
                   AS first3,
               list_contains(string_split(text, ' '), 'the')::INT::BIGINT
                   AS has_the,
               len(string_split(text, ' '))::BIGINT AS n_tokens
        FROM documents""",
    "math_funcs": """
        SELECT l_orderkey, l_linenumber,
               round(sqrt(l_extendedprice), 6) AS sqrt_price,
               round(ln(l_extendedprice + 1), 6) AS ln_price,
               ceil(l_quantity)::BIGINT AS ceil_qty,
               floor(l_discount)::BIGINT AS floor_disc,
               abs(l_tax - 0.05) AS abs_tax_dev
        FROM lineitem""",
    "pivot_agg": """
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2)
                   AS "F",
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2)
                   AS "O"
        FROM lineitem GROUP BY l_returnflag""",
    "unpivot_agg": """
        WITH wide AS (
            SELECT o_orderpriority,
                   round(sum(o_totalprice), 2) AS sum_price,
                   count(*)::DOUBLE AS n_orders
            FROM orders GROUP BY o_orderpriority)
        SELECT o_orderpriority, 'sum_price' AS metric, sum_price AS value
        FROM wide
        UNION ALL
        SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value
        FROM wide""",
    "map_funcs": """
        SELECT l_orderkey, l_linenumber,
               map(['qty', 'price'], [l_quantity, l_extendedprice])['qty'][1]
                   AS qty_val,
               cardinality(map(['qty', 'price'],
                               [l_quantity, l_extendedprice]))::BIGINT AS n_keys,
               array_to_string(map_keys(map(['qty', 'price'],
                                            [l_quantity, l_extendedprice])), ',')
                   AS keys
        FROM lineitem""",
    "stats_aggs": """
        SELECT l_returnflag,
               round(median(l_quantity), 6) AS median_qty,
               round(stddev_samp(l_extendedprice), 4) AS stddev_price,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
        FROM lineitem GROUP BY l_returnflag""",
    "histogram": """
        SELECT least(floor(l_extendedprice / 10000), 9)::BIGINT AS bucket,
               count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY 1""",
    "skew_profile": """
        WITH per_key AS (SELECT o_custkey AS key, count(*) AS n
                         FROM orders GROUP BY 1),
             t AS (SELECT sum(n) AS total FROM per_key)
        SELECT key, n, round(n / total::DOUBLE, 6) AS share
        FROM per_key, t ORDER BY n DESC, key LIMIT 10""",
    "argmax_aggs": """
        SELECT o_orderpriority,
               arg_max(o_orderkey, o_totalprice) AS top_order,
               arg_min(o_orderkey, o_totalprice) AS bottom_order,
               round(max(o_totalprice), 2) AS max_price
        FROM orders GROUP BY o_orderpriority""",
    "sql_api_correlated": _SQL_CORRELATED,
    "sql_api_lateral": _SQL_LATERAL,
    "sql_api_recursive": _SQL_RECURSIVE,
    "window_distribution": """
        SELECT o_orderkey, o_orderpriority,
               ntile(4) OVER w::BIGINT AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)""",
    "fuzzy_match": """
        WITH names AS (SELECT DISTINCT p_name FROM part)
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               levenshtein(a.p_name, b.p_name)::BIGINT AS dist
        FROM names a JOIN names b
          ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1)
         AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 4""",
}
