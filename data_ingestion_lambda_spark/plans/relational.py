"""Relational query surface: scans, filters, joins, aggregations, sorts.

SURVEY.md §2.2 (P6), §2.3 (joins — all EXT), §2.4 (A4), §2.6 (top-k).
The reference implements none of these (its only relational shape is the
per-row upsert loop, src/db_operations.py:75-91); they are required by the
BASELINE.json north star. Each builder is paired with a DuckDB oracle.

Scale notes per query are inline — the recurring themes:
- fact-to-fact joins (orders⋈lineitem) shuffle on the join key; dimension
  joins are broadcast (explicitly hinted where Catalyst's size estimate
  might not see it);
- aggregates are partial+final automatically (map-side combine);
- top-k is orderBy+limit → TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans.decimals import davg, dec, dsum, sql_davg, sql_dec, sql_dsum
from data_ingestion_lambda_spark.plans.registry import pin, register
from data_ingestion_lambda_spark.plans._util import t

# ---------------------------------------------------------------------------
# TPC-H-shaped analytics
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           CAST(SUM({sql_dec('l_extendedprice')} * {sql_dec('1 - l_discount')}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({sql_dec('l_extendedprice')} * {sql_dec('1 - l_discount')} * {sql_dec('1 + l_tax')}) AS DOUBLE) AS sum_charge,
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide grouped aggregation over the fact table.

    Scale: single shuffle on a 6-value grouping key; partial aggregation
    collapses each map partition to ≤6 rows before the exchange, so this is
    scan-bound at 100 TB. Filter + 7-column projection push into the scan.
    """
    l = t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    charge = disc_price * dec(F.lit(1) + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({sql_dec('l_extendedprice')} * {sql_dec('1 - l_discount')}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → grouped top-k.

    Scale: customer (filtered to one segment) broadcasts into orders; the
    orders⋈lineitem join shuffles on orderkey (both sides pre-filtered by
    pushed-down date predicates). Top-k via TakeOrderedAndProject — no
    global sort materialization.
    """
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    revenue = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(SUM({sql_dec('l_extendedprice')} * {sql_dec('1 - l_discount')}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "agg", "tpch"),
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join with a region filter.

    Scale: supplier/nation/region broadcast (bounded dims); the only big
    shuffles are orders⋈customer (on custkey) and orders⋈lineitem (on
    orderkey). Region filter prunes through nation→supplier before
    touching facts.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({sql_dec('l_extendedprice')} * {sql_dec('1 - l_discount')}) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    return (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Join kinds (SURVEY §2.3 — every entry in the EXT table)
# ---------------------------------------------------------------------------


@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name, COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("join",),
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained broadcast-hash joins: fact → dim → dim, zero fact shuffles
    until the final tiny aggregation. The canonical star-schema plan at
    100 TB: orders never moves, dims ship to every executor."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_big_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS big_total
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) big
           ON c_custkey = big.o_custkey
    GROUP BY c_custkey
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero matches (COUNT→0)."""
    c = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(12,2)"))
            .cast("double")
            .alias("big_total"),
        )
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_urgent,
           CAST(COALESCE(MAX(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS max_urgent_price
    FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') urgent
    RIGHT JOIN customer ON urgent.o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (how='right'): urgent orders on the LEFT, customer
    preserved on the RIGHT — every customer appears even with zero urgent
    orders. Physically Spark plans right-outer as the mirrored left-outer,
    so shuffle cost matches join_left_outer; the point is API coverage
    (SURVEY §2.3 row J3)."""
    c = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        urgent.join(c, urgent.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_urgent"),
            F.coalesce(F.max(dec("o_totalprice")), F.lit(0).cast("decimal(12,2)"))
            .cast("double")
            .alias("max_urgent_price"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 urgent order. Semi joins carry no
    payload columns from the right side → smaller shuffle than inner+distinct."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no 1995 orders (the reference's
    missing-dates difference, src/s3_processor.py:176, done relationally)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@register(
    "join_full_outer",
    oracle="""
    WITH auto_c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
         heavy  AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
                    GROUP BY o_custkey HAVING COUNT(*) > 12)
    SELECT COALESCE(a.c_custkey, h.o_custkey) AS custkey,
           (a.c_custkey IS NOT NULL) AS is_automobile,
           (h.o_custkey IS NOT NULL) AS is_heavy,
           COALESCE(h.n_orders, 0) AS n_orders
    FROM auto_c a FULL OUTER JOIN heavy h ON a.c_custkey = h.o_custkey
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two derived sets with presence indicators."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    auto_c = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    heavy = (
        o.groupBy("o_custkey").agg(F.count("*").alias("n_orders")).filter(F.col("n_orders") > 12)
    )
    j = auto_c.join(heavy, auto_c.c_custkey == heavy.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_custkey").isNotNull().alias("is_automobile"),
        F.col("o_custkey").isNotNull().alias("is_heavy"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, o_orderstatus, n_status
    FROM region CROSS JOIN (
        SELECT o_orderstatus, COUNT(*) AS n_status FROM orders GROUP BY o_orderstatus
    ) s
    """,
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny derived relations (region × order statuses)."""
    r = t(spark, sf_dir, "region").select("r_name")
    o = t(spark, sf_dir, "orders")
    status_counts = o.groupBy(F.col("o_orderstatus")).agg(F.count("*").alias("n_status"))
    return r.crossJoin(status_counts).select("r_name", "o_orderstatus", "n_status")


@register(
    "join_range_nonequi",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('small', 1, 15), ('medium', 16, 35), ('large', 36, 50)
    )
    SELECT band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM part JOIN bands ON p_size BETWEEN lo AND hi
    GROUP BY band
    """,
    tags=("join",),
)
def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a small bands relation.

    Scale: the bands side is tiny → broadcast-nested-loop, which is the
    right physical plan; the fact side never shuffles."""
    p = t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("small", 1, 15), ("medium", 16, 35), ("large", 36, 50)],
        "band string, lo int, hi int",
    )
    return (
        p.join(F.broadcast(bands), (p.p_size >= bands.lo) & (p.p_size <= bands.hi))
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), dsum("p_retailprice", "total_price"))
    )


# ---------------------------------------------------------------------------
# Aggregation kinds (SURVEY §2.4 A4)
# ---------------------------------------------------------------------------


@register(
    "agg_groupby_basic",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_groupby_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped count/min/max/sum (min/max of doubles are order-independent)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        dsum("o_totalprice", "sum_price"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT DISTINCT in one aggregation (Catalyst expands)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims: all 4 grouping-set combinations in one pass."""
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice", "total")
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg", "join"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP region→nation hierarchy over a broadcast-joined dim chain."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, n_name, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (via SQL — the DataFrame API routes through
    the same Expand operator as cube/rollup)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("gs_customer")
    t(spark, sf_dir, "nation").createOrReplaceTempView("gs_nation")
    return spark.sql(
        """
        SELECT c_mktsegment, n_name, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
        FROM gs_customer JOIN gs_nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
        """
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
    tags=("agg",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey").agg(F.count("*").alias("n_orders")).filter(F.col("n_orders") >= 15)
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "sort_topk_global",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
    tags=("topk",),
)
def sort_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: planned as TakeOrderedAndProject — each partition keeps
    its local top 15, driver merges; no full sort at any scale."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"), "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


@register(
    "filter_pushdown_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS l_quantity
    FROM lineitem
    WHERE l_quantity >= 49 AND l_returnflag = 'A'
    """,
    tags=("scan",),
)
def filter_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection+filter that must reach the parquet scan (PushedFilters /
    3-column ReadSchema) — SURVEY §2.2 P6."""
    l = t(spark, sf_dir, "lineitem")
    return l.filter((F.col("l_quantity") >= 49) & (F.col("l_returnflag") == "A")).select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").cast("double").alias("l_quantity")
    )


@register(
    "agg_approx_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_exact,
           TRUE AS approx_within_5pct
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "approx"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) validated against the exact
    count: emits the exact distinct count plus a boolean asserting the
    sketch landed within 5% (rsd=0.02 → far tighter in practice).

    The sketch itself is the 100 TB shape — mergeable fixed-size state,
    one pass, no distinct-shuffle of the raw keys; the exact count here
    exists to make the sketch oracle-checkable."""
    o = t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_approx"),
    )
    return agg.select(
        "o_orderpriority",
        "n_exact",
        (
            (F.abs(F.col("n_approx") - F.col("n_exact")) / F.col("n_exact")) <= 0.05
        ).alias("approx_within_5pct"),
    )


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 2) AS p50_exact,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95), 2) AS p95_exact,
           TRUE AS approx_within_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (t-digest-style sketch) validated against exact
    interpolated percentiles (Spark `percentile` == DuckDB quantile_cont,
    rounded to cents to absorb last-ulp interpolation differences).

    Same pattern as the HLL query: the sketch is the scalable one-pass
    answer; the exact percentile makes it oracle-checkable.

    Known knife-edge: cent-rounding absorbs last-ulp interpolation
    differences EXCEPT when the true percentile lies exactly on a
    half-cent, where one ulp flips the rounding direction — observed
    once at sf0.001 (52724.24 vs .25; sf0.01, the driver's gate, is
    unaffected). The repo's own cure for exact cross-engine percentiles
    is the integer bucket-histogram recipe (profile_numeric_quantiles /
    events_interarrival_hist), which never interpolates in doubles."""
    l = t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    agg = l.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.5)"), 2).alias("p50_exact"),
        F.round(F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.95)"), 2).alias("p95_exact"),
        F.percentile_approx(price, 0.5, 10000).alias("p50_approx"),
        F.percentile_approx(price, 0.95, 10000).alias("p95_approx"),
    )
    ok = (
        (F.abs(F.col("p50_approx") - F.col("p50_exact")) / F.col("p50_exact") <= 0.01)
        & (F.abs(F.col("p95_approx") - F.col("p95_exact")) / F.col("p95_exact") <= 0.01)
    )
    return agg.select("l_returnflag", "p50_exact", "p95_exact", ok.alias("approx_within_1pct"))


@register(
    "subq_exists_correlated",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
      AND NOT EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_suppkey = s.s_suppkey AND l2.l_returnflag = 'R'
                        AND l2.l_quantity > 49)
    ORDER BY s_suppkey
    """,
    tags=("subquery", "join"),
)
def subq_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS subqueries, expressed as SQL and
    decorrelated by Catalyst into left-semi / left-anti hash joins — the
    same physical shape as join_semi/join_anti but arriving through the
    subquery rewriting path (RewritePredicateSubquery)."""
    t(spark, sf_dir, "supplier").createOrReplaceTempView("sq_supplier")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("sq_lineitem")
    return spark.sql("""
        SELECT s_suppkey, s_name
        FROM sq_supplier s
        WHERE EXISTS (SELECT 1 FROM sq_lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
          AND NOT EXISTS (SELECT 1 FROM sq_lineitem l2
                          WHERE l2.l_suppkey = s.s_suppkey AND l2.l_returnflag = 'R'
                            AND l2.l_quantity > 49)
        ORDER BY s_suppkey
    """)


@register(
    "subq_scalar_correlated",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) >= 20
    ORDER BY c_custkey
    """,
    tags=("subquery", "agg"),
)
def subq_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-customer order count), decorrelated
    by Catalyst into an aggregate + outer join with the COUNT-bug null->0
    handling. Count-based predicate keeps the comparison exact (no
    floating-point reassociation between engines)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("sq_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders")
    return spark.sql("""
        SELECT c_custkey, c_name
        FROM sq_customer c
        WHERE (SELECT count(*) FROM sq_orders o
               WHERE o.o_custkey = c.c_custkey) >= 20
        ORDER BY c_custkey
    """)


# ---------------------------------------------------------------------------
# Skew handling: salted two-phase aggregation
# ---------------------------------------------------------------------------

_N_SALT = 32  # salt fan-out; sized to the executor count at deploy time


@register(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "skew"),
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a pathologically low-cardinality
    key (l_returnflag: 3 values). A plain groupBy routes EVERY row of a
    hot key through one reducer — the classic skew bottleneck at 100 TB.
    Salting splits phase 1 into (key, salt) groups (bounded fan-in per
    reducer: ~rows/(keys*_N_SALT)), then phase 2 merges _N_SALT partial
    rows per key — decomposable aggregates (sum/count/max) make the
    rewrite semantics-preserving, which the plain-GROUP-BY oracle proves.

    The salt is derived from a uniformly-distributed existing column
    (l_orderkey) rather than rand() so the query stays deterministic and
    retry-safe (a re-executed task re-salts identically).
    """
    li = t(spark, sf_dir, "lineitem")
    salted = li.withColumn("_salt", F.pmod(F.col("l_orderkey"), F.lit(_N_SALT)))
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count("*").alias("pn"),
        F.sum(dec("l_quantity")).alias("pq"),
        F.max("l_extendedprice").alias("pm"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n_rows"),
        F.sum("pq").cast("double").alias("sum_qty"),
        F.max("pm").cast("double").alias("max_price"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list(o_orderkey ORDER BY o_orderkey DESC)[:5], ',')
               AS top5_keys,
           COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > 400000
    GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collect_list -> top-5 slice, surfaced as a joined string so
    the cross-engine value hash is canonical. collect_list has no intra-
    group order guarantee in a distributed agg, so the sort happens AFTER
    collection (sort_array desc + slice) — the only portable semantics."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return o.groupBy("o_orderpriority").agg(
        F.array_join(
            F.slice(F.sort_array(F.collect_list("o_orderkey"), asc=False), 1, 5), ","
        ).alias("top5_keys"),
        F.count("*").alias("n"),
    )


@register(
    "agg_rfm_segmentation",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(datediff('day', CAST(max(o_orderdate) AS DATE),
                    (SELECT CAST(max(o_orderdate) AS DATE) FROM orders)) AS INTEGER)
                   AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    q AS (
        SELECT quantile_cont(recency_days, 0.25) AS r1, quantile_cont(recency_days, 0.5) AS r2,
               quantile_cont(recency_days, 0.75) AS r3,
               quantile_cont(frequency, 0.25) AS f1, quantile_cont(frequency, 0.5) AS f2,
               quantile_cont(frequency, 0.75) AS f3,
               quantile_cont(monetary, 0.25) AS m1, quantile_cont(monetary, 0.5) AS m2,
               quantile_cont(monetary, 0.75) AS m3
        FROM cust
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           CAST(1 + CAST(recency_days < r3 AS INTEGER) + CAST(recency_days < r2 AS INTEGER)
                  + CAST(recency_days < r1 AS INTEGER) AS INTEGER) AS r_score,
           CAST(1 + CAST(frequency > f1 AS INTEGER) + CAST(frequency > f2 AS INTEGER)
                  + CAST(frequency > f3 AS INTEGER) AS INTEGER) AS f_score,
           CAST(1 + CAST(monetary > m1 AS INTEGER) + CAST(monetary > m2 AS INTEGER)
                  + CAST(monetary > m3 AS INTEGER) AS INTEGER) AS m_score
    FROM cust, q
    """,
    tags=("agg", "analytics"),
)
def agg_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer recency (days since last
    order, against the corpus max date), frequency (order count), monetary
    (exact decimal revenue), each scored 1-4 against the interpolated
    quartile boundaries of the customer population.

    Deliberately NOT ntile(): a global ntile is a single-partition window
    — a driver-sized bottleneck at 100 TB. Comparing against three
    broadcast quartile values is the same segmentation as one bounded
    aggregate + a scan-local map, and stays deterministic (exact decimal
    monetary, interpolated percentiles, strict inequalities)."""
    o = t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_dt"),
        F.count("*").alias("frequency"),
        dsum("o_totalprice", "monetary"),
    )
    maxd = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    cust = cust.crossJoin(F.broadcast(maxd)).select(
        "o_custkey",
        F.datediff("maxd", "last_dt").cast("int").alias("recency_days"),
        "frequency",
        "monetary",
    )
    q = cust.agg(
        *[
            F.percentile(c, p).alias(f"{c[0]}{i + 1}")
            for c in ("recency_days", "frequency", "monetary")
            for i, p in enumerate((0.25, 0.5, 0.75))
        ]
    )
    j = cust.crossJoin(F.broadcast(q))
    score = lambda better_low, c, q1, q2, q3: (
        F.lit(1)
        + (
            (F.col(c) < F.col(q3)).cast("int")
            + (F.col(c) < F.col(q2)).cast("int")
            + (F.col(c) < F.col(q1)).cast("int")
            if better_low
            else (F.col(c) > F.col(q1)).cast("int")
            + (F.col(c) > F.col(q2)).cast("int")
            + (F.col(c) > F.col(q3)).cast("int")
        )
    ).cast("int")
    return j.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        score(True, "recency_days", "r1", "r2", "r3").alias("r_score"),
        score(False, "frequency", "f1", "f2", "f3").alias("f_score"),
        score(False, "monetary", "m1", "m2", "m3").alias("m_score"),
    )


# Coarse-range width for the RFM histogram's two-phase prefix sum: no
# window task ever sees more than this many bucket rows per metric.
_RFM_COARSE = 100_000


@register(
    "agg_rfm_segmentation_hist",
    oracle=f"""
    WITH cust AS (
        SELECT o_custkey,
               CAST(datediff('day', CAST(max(o_orderdate) AS DATE),
                    (SELECT CAST(max(o_orderdate) AS DATE) FROM orders)) AS INTEGER)
                   AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
                   AS monetary_cents
        FROM orders GROUP BY o_custkey
    ),
    melt AS (
        SELECT 'r' AS metric, CAST(recency_days AS BIGINT) AS v FROM cust
        UNION ALL SELECT 'f', frequency FROM cust
        UNION ALL SELECT 'm', monetary_cents FROM cust
    ),
    hist AS (SELECT metric, v, COUNT(*) AS cnt FROM melt GROUP BY 1, 2),
    cum AS (
        SELECT metric, v,
               SUM(cnt) OVER (PARTITION BY metric ORDER BY v
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY metric) AS n
        FROM hist
    ),
    q AS (
        SELECT metric,
               MIN(CASE WHEN cum * 100 >= n * 25 THEN v END) AS q1,
               MIN(CASE WHEN cum * 100 >= n * 50 THEN v END) AS q2,
               MIN(CASE WHEN cum * 100 >= n * 75 THEN v END) AS q3
        FROM cum GROUP BY metric
    ),
    qq AS (
        SELECT MAX(CASE WHEN metric = 'r' THEN q1 END) AS r1,
               MAX(CASE WHEN metric = 'r' THEN q2 END) AS r2,
               MAX(CASE WHEN metric = 'r' THEN q3 END) AS r3,
               MAX(CASE WHEN metric = 'f' THEN q1 END) AS f1,
               MAX(CASE WHEN metric = 'f' THEN q2 END) AS f2,
               MAX(CASE WHEN metric = 'f' THEN q3 END) AS f3,
               MAX(CASE WHEN metric = 'm' THEN q1 END) AS m1,
               MAX(CASE WHEN metric = 'm' THEN q2 END) AS m2,
               MAX(CASE WHEN metric = 'm' THEN q3 END) AS m3
        FROM q
    )
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           CAST(1 + CAST(recency_days < r3 AS INTEGER)
                  + CAST(recency_days < r2 AS INTEGER)
                  + CAST(recency_days < r1 AS INTEGER) AS INTEGER) AS r_score,
           CAST(1 + CAST(frequency > f1 AS INTEGER)
                  + CAST(frequency > f2 AS INTEGER)
                  + CAST(frequency > f3 AS INTEGER) AS INTEGER) AS f_score,
           CAST(1 + CAST(monetary_cents > m1 AS INTEGER)
                  + CAST(monetary_cents > m2 AS INTEGER)
                  + CAST(monetary_cents > m3 AS INTEGER) AS INTEGER) AS m_score
    FROM cust, qq
    """,
    tags=("agg", "analytics"),
)
def agg_rfm_segmentation_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-safe twin of agg_rfm_segmentation: identical RFM scoring,
    but the quartile boundaries come from an integer-bucket HISTOGRAM with
    a two-phase distributed prefix sum (the round-6 percentile-lane recipe:
    events_interarrival_hist / profile_numeric_quantiles) instead of the
    exact-interpolation ``percentile`` aggregate, whose buffer is
    |customers|-sized in ONE task — the last such aggregate over an
    unbounded key domain in the repo.

    All three metrics are already integers (days, order count, exact
    cents), so type-1 lower quartiles from the histogram are EXACT — the
    only semantic delta vs the gauge variant is discrete vs interpolated
    boundaries (monetary is reported in cents here for the same reason).
    The three metrics MELT into one (metric, value) relation, so one
    bucket rollup + one windowed prefix sum serves all nine boundaries.

    Scale: bucket rows are bounded by DISTINCT observed values per metric
    (never by customer count beyond that); the cumulative window
    partitions by (metric, coarse range of {_RFM_COARSE} values) with a
    broadcast offsets table per coarse range — no task windows more than
    {_RFM_COARSE} bucket rows. Scoring is the same broadcast-quartiles
    scan-local map as the exact variant; still no ntile, no global sort."""
    o = t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_dt"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("monetary_cents"),
    )
    maxd = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    # Persisted: melt + the final scoring join both read it; tiny (one row
    # per customer).
    cust = (
        cust.crossJoin(F.broadcast(maxd))
        .select(
            "o_custkey",
            F.datediff("maxd", "last_dt").cast("int").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
        .transform(pin)
    )
    melt = cust.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("metric"),
                    F.col("recency_days").cast("long").alias("v"),
                ),
                F.struct(F.lit("f").alias("metric"), F.col("frequency").alias("v")),
                F.struct(
                    F.lit("m").alias("metric"), F.col("monetary_cents").alias("v")
                ),
            )
        ).alias("x")
    ).select("x.metric", "x.v")
    hist = (
        melt.groupBy("metric", "v")
        .agg(F.count("*").alias("cnt"))
        .withColumn("coarse", F.expr(f"v div {_RFM_COARSE}"))
    )
    wl = (
        Window.partitionBy("metric", "coarse")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wo = (
        Window.partitionBy("metric")
        .orderBy("coarse")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        hist.groupBy("metric", "coarse")
        .agg(F.sum("cnt").alias("ccnt"))
        .select(
            "metric",
            "coarse",
            F.coalesce(F.sum("ccnt").over(wo), F.lit(0)).alias("off"),
        )
    )
    n = hist.groupBy("metric").agg(F.sum("cnt").alias("n"))
    cum = (
        hist.withColumn("lcum", F.sum("cnt").over(wl))
        .join(F.broadcast(offsets), ["metric", "coarse"])
        .withColumn("cum", F.col("lcum") + F.col("off"))
        .join(F.broadcast(n), "metric")
    )
    q = cum.groupBy("metric").agg(
        *[
            F.min(F.when(F.col("cum") * 100 >= F.col("n") * p, F.col("v"))).alias(
                f"q{i + 1}"
            )
            for i, p in enumerate((25, 50, 75))
        ]
    )
    qq = q.agg(
        *[
            F.max(F.when(F.col("metric") == m, F.col(f"q{i}"))).alias(f"{m}{i}")
            for m in ("r", "f", "m")
            for i in (1, 2, 3)
        ]
    )
    j = cust.crossJoin(F.broadcast(qq))
    score = lambda better_low, c, q1, q2, q3: (
        F.lit(1)
        + (
            (F.col(c) < F.col(q3)).cast("int")
            + (F.col(c) < F.col(q2)).cast("int")
            + (F.col(c) < F.col(q1)).cast("int")
            if better_low
            else (F.col(c) > F.col(q1)).cast("int")
            + (F.col(c) > F.col(q2)).cast("int")
            + (F.col(c) > F.col(q3)).cast("int")
        )
    ).cast("int")
    return j.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        score(True, "recency_days", "r1", "r2", "r3").alias("r_score"),
        score(False, "frequency", "f1", "f2", "f3").alias("f_score"),
        score(False, "monetary_cents", "m1", "m2", "m3").alias("m_score"),
    )


@register(
    "join_salted_skew",
    oracle=f"""
    SELECT s_nationkey,
           COUNT(*) AS n_lines,
           CAST(SUM({sql_dec('l_extendedprice')} * {sql_dec('1 - l_discount')}) AS DOUBLE)
               AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate-join — the join twin of agg_salted_skew. When the
    probe side's join key is skewed AND the build side is too big to
    broadcast, a plain shuffle join routes every row of a hot key through
    one reducer. The salted rewrite: the fact side gains a deterministic
    salt (pmod of a uniformly-distributed existing column — retry-safe,
    unlike rand()); the dim side is replicated once per salt value; the
    join runs on (key, salt), fanning each hot key across _N_SALT
    reducers. Semantics-preserving by construction — the plain-join oracle
    proves it.

    The shuffle_hash hint pins the shuffled-join physical shape the
    pattern exists for (Catalyst would otherwise broadcast this
    demo-sized dim and the salt would be decoration; AQE's skew-join
    split is the runtime alternative when statistics surface the skew —
    this rewrite is the declarative form that also works map-side of any
    stats)."""
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    salted = li.withColumn("_salt", F.pmod(F.col("l_orderkey"), F.lit(_N_SALT)))
    rep = sup.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(_N_SALT - 1))))
    j = salted.hint("shuffle_hash").join(
        rep,
        (salted["l_suppkey"] == rep["s_suppkey"]) & (salted["_salt"] == rep["_salt"]),
    )
    revenue = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    return j.groupBy("s_nationkey").agg(
        F.count("*").alias("n_lines"),
        F.sum(revenue).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Join -> histogram-quantile composition (the percentile recipe after a
# fact-fact join)
# ---------------------------------------------------------------------------

_LATENCY_PS = (50, 90, 99)


@register(
    "shipping_latency_quantiles",
    oracle=f"""
    WITH lat AS (
        SELECT o.o_orderpriority AS grp,
               datediff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    hist AS (SELECT grp, days, COUNT(*) AS cnt FROM lat GROUP BY 1, 2),
    n AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n_rows FROM hist GROUP BY 1),
    cum AS (
        SELECT grp, days, cnt,
               SUM(cnt) OVER (PARTITION BY grp ORDER BY days
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist
    )
    SELECT cum.grp AS o_orderpriority, n.n_rows,
           {", ".join(
               f"CAST(MIN(CASE WHEN cum.cum * 100 >= n.n_rows * {p} "
               f"THEN cum.days END) AS BIGINT) AS p{p}_days"
               for p in _LATENCY_PS
           )}
    FROM cum JOIN n USING (grp)
    GROUP BY cum.grp, n.n_rows
    """,
    tags=("relational", "quantiles", "join"),
)
def shipping_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency quantiles (p50/p90/p99 days) per order
    priority — the SLA dashboard, and the proof that the distributed
    histogram-percentile recipe composes AFTER a fact-fact join: the
    latency column only exists post lineitem⋈orders, and the quantile
    machinery runs unchanged on the joined stream.

    Scale: the join is an orderkey equi-join (both sides shuffle once on
    the key — at 100 TB this is the bucketed-table co-location case);
    everything after collapses to (priority, integer-day) bucket rows —
    the day domain is bounded by business latency (~a quarter), so the
    cumulative window never sees volume. All-integer, hash-stable."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("grp"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).cast("long").alias("days"),
    )
    hist = lat.groupBy("grp", "days").agg(F.count("*").alias("cnt"))
    n = hist.groupBy("grp").agg(F.sum("cnt").cast("long").alias("n_rows"))
    w = (
        Window.partitionBy("grp")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    return (
        cum.join(F.broadcast(n), "grp")
        .groupBy("grp", "n_rows")
        .agg(
            *[
                F.min(F.when(F.col("cum") * 100 >= F.col("n_rows") * p, F.col("days")))
                .cast("long")
                .alias(f"p{p}_days")
                for p in _LATENCY_PS
            ]
        )
        .select(
            F.col("grp").alias("o_orderpriority"),
            "n_rows",
            *[f"p{p}_days" for p in _LATENCY_PS],
        )
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (association mining over order lines)
# ---------------------------------------------------------------------------

_BASKET_MIN_SUPPORT = 3  # pairs must co-occur in at least this many orders
_BASKET_TOP_K = 25


@register(
    "agg_market_basket",
    oracle=f"""
    WITH lines AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    item AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_orders_item
        FROM lines GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
            FROM lines),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS n_pair
        FROM lines a JOIN lines b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT}
    )
    SELECT part_a, part_b, n_pair,
           ia.n_orders_item AS n_a, ib.n_orders_item AS n_b,
           CAST(n_pair * (SELECT n_orders FROM tot) AS DOUBLE)
             / (ia.n_orders_item * ib.n_orders_item) AS lift,
           CAST(rk AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY CAST(n_pair * (SELECT n_orders FROM tot) AS DOUBLE)
                     / (ia2.n_orders_item * ib2.n_orders_item) DESC,
                     part_a, part_b) AS rk
        FROM pairs
        JOIN item ia2 ON ia2.l_partkey = pairs.part_a
        JOIN item ib2 ON ib2.l_partkey = pairs.part_b
    ) p
    JOIN item ia ON ia.l_partkey = p.part_a
    JOIN item ib ON ib.l_partkey = p.part_b
    WHERE rk <= {_BASKET_TOP_K}
    """,
    tags=("agg", "association"),
)
def agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: the top-{_BASKET_TOP_K} part
    PAIRS by lift = P(a,b)/(P(a)·P(b)) among pairs co-ordered at least
    {_BASKET_MIN_SUPPORT} times — the relational twin of
    text_collocations_lift (same rational-lift-before-the-log
    discipline), and the recommender bootstrap ("customers who bought a
    also bought b") every commerce pipeline starts from.

    Determinism: all counts are integers over the DISTINCT (order,
    part) relation (a part twice in one order counts once); lift is ONE
    IEEE division of exact integers; ROW_NUMBER breaks ties on
    (part_a, part_b).

    Scale: the pair join is WITHIN-ORDER (equi on l_orderkey with
    part_a < part_b) — candidates are Σ per-order (lines choose 2),
    bounded by order size squared (~7² here), never catalog²; the pair
    rollup combines map-side; item marginals are one part-keyed
    aggregate; the total is one scalar. Top-k plans
    TakeOrderedAndProject over support-filtered pairs."""
    lines = (
        t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    ).transform(pin)
    item = lines.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n_orders_item")
    )
    n_orders = lines.select("l_orderkey").distinct().count()  # scalar
    a = lines.alias("a")
    b = lines.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= _BASKET_MIN_SUPPORT)
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders_item").alias("n_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders_item").alias("n_b")
    )
    scored = (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .withColumn(
            "lift",
            (F.col("n_pair") * F.lit(n_orders)).cast("double")
            / (F.col("n_a") * F.col("n_b")),
        )
    )
    w = Window.orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _BASKET_TOP_K)
        .select("part_a", "part_b", "n_pair", "n_a", "n_b", "lift", "rank")
    )


_ABC_COARSE = 100_000_000  # revenue cents-x100 per bucket ($10,000)


@register(
    "agg_pareto_abc",
    oracle=f"""
    WITH line_rev AS (
        SELECT l_partkey,
               CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                   * (100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT))
                   AS rev_cx100
        FROM lineitem
    ),
    part_rev AS (
        SELECT l_partkey AS p_partkey,
               CAST(SUM(rev_cx100) AS BIGINT) AS revenue_cx100
        FROM line_rev GROUP BY l_partkey
    ),
    bucketed AS (
        SELECT p_partkey, revenue_cx100,
               revenue_cx100 // {_ABC_COARSE} AS bucket
        FROM part_rev
    ),
    by_bucket AS (
        SELECT bucket, CAST(SUM(revenue_cx100) AS BIGINT) AS brev
        FROM bucketed GROUP BY bucket
    ),
    tot AS (SELECT CAST(SUM(brev) AS BIGINT) AS total FROM by_bucket),
    walked AS (
        SELECT bucket,
               CAST(COALESCE(SUM(brev) OVER (ORDER BY bucket DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_above
        FROM by_bucket
    ),
    classed AS (
        SELECT w.bucket,
               CASE WHEN w.cum_above * 100 < 80 * t.total THEN 'A'
                    WHEN w.cum_above * 100 < 95 * t.total THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM walked w CROSS JOIN tot t
    )
    SELECT b.p_partkey, b.revenue_cx100, CAST(b.bucket AS BIGINT) AS bucket,
           c.abc_class
    FROM bucketed b JOIN classed c ON b.bucket = c.bucket
    """,
    tags=("agg", "analytics"),
)
def agg_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue — the inventory
    80/95 rule (class A carries the first ~80% of revenue, B the next
    ~15%, C the tail) every supply-chain deployment of the reference's
    order data eventually asks for. Classification is QUANTIZED to
    revenue buckets (the repo's histogram-percentile discipline): each
    part's exact integer revenue (cents x100 — price cents times the
    integer discount complement, no float product) maps to a coarse
    bucket, the cumulative-from-the-top walk runs over BUCKET rows
    (value-domain-bounded, never a global part sort), and every part
    inherits its bucket's class — parts sharing a bucket share a class,
    a bounded quantization the $10k bucket keeps honest.

    Scale: the part rollup is the only data-sized exchange; the
    ordered walk sees revenue-domain rows (same bound as
    profile_numeric_quantiles); the class map broadcasts back. At 1e8
    parts nothing here sorts parts globally — the exact-rank
    alternative is the known 100 TB trap this lane exists to avoid."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"),
        (
            F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
            * (100 - F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long"))
        ).alias("rev_cx100"),
    )
    part_rev = li.groupBy("p_partkey").agg(
        F.sum("rev_cx100").cast("long").alias("revenue_cx100")
    )
    bucketed = part_rev.withColumn(
        "bucket", F.expr(f"revenue_cx100 div {_ABC_COARSE}")
    )
    by_bucket = bucketed.groupBy("bucket").agg(
        F.sum("revenue_cx100").cast("long").alias("brev")
    )
    # The grand total is computed IN-PLAN as a cross-joined 1-row
    # broadcast (the oracle's own ``tot`` CTE shape) — no driver
    # collect, no InMemoryRelation pinned past return (ADVICE r9);
    # exchange reuse shares the one by_bucket shuffle.
    tot = by_bucket.agg(F.sum("brev").cast("long").alias("total"))
    w = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    classed = by_bucket.select(
        "bucket",
        F.coalesce(F.sum("brev").over(w), F.lit(0)).cast("long").alias(
            "cum_above"
        ),
    ).crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.when(F.col("cum_above") * 100 < 80 * F.col("total"), "A")
        .when(F.col("cum_above") * 100 < 95 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return bucketed.join(F.broadcast(classed), "bucket").select(
        "p_partkey", "revenue_cx100", "bucket", "abc_class"
    )
