"""TPC-H query-shape suite beyond q01/q03/q05/q10 (plans/relational.py).

Sixteen more of the classic shapes, adapted to the test schema — the
generated tables carry no partsupp, comment/phone/address columns, ship
modes, or commit/receipt dates. q02/q11 price stock the schema carries
nowhere (ps_supplycost / ps_availqty) and genuinely cannot exist;
q15/q16/q20's shapes survive substituting the (part, supplier)
relationship lineitem itself records (see the round-5 section at the end
of this file), and the remaining queries substitute equivalent
predicates over existing columns (noted per query). What is preserved is
the *physical shape* each TPC-H query exists to exercise: EXISTS
decorrelation (q04), scan-only filter-sum (q06), OR-ed dimension pairs
(q07), conditional-ratio over a star join (q08), multi-fact profit
rollup (q09), late-line conditional counts (q12), left-join count
distribution (q13), promo ratio (q14), correlated scalar average (q17),
HAVING-subquery fan-in (q18), disjunctive multi-range predicates (q19),
anti/semi self-joins (q21), and scalar-subquery + anti-join (q22).

Determinism: every money aggregate goes through exact decimal sums
(plans/decimals.py); ratios divide two exactly-summed doubles; all top-k
orderings carry a unique-key tie-break.

Scale notes: all joins here are either broadcastable dims (nation,
region, part at 0.2% of lineitem) or fact-fact equi-joins on their
natural keys; Catalyst chooses broadcast for the dim sides (verified
via .explain in tests/test_bucketed_join.py patterns). The self-join
shapes (q17/q18/q21) shuffle on l_orderkey/l_partkey — the same key the
fact table would be bucketed by in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans._util import t
from data_ingestion_lambda_spark.plans.decimals import dec, dsum, sql_dec, sql_dsum
from data_ingestion_lambda_spark.plans.registry import register

_REV_SQL = f"{sql_dec('l_extendedprice')} * {sql_dec('1 - l_discount')}"


def _rev() -> F.Column:
    return dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "join", "subq"),
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join (the
    commit<receipt predicate becomes shipped-after-order — the schema has
    no commit/receipt dates)."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01")) & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = t(spark, sf_dir, "lineitem")
    sem = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM({sql_dec('l_extendedprice')} * {sql_dec('l_discount')}) AS DOUBLE)
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "agg"),
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-sum; the whole query is one codegen
    stage over the pushed-down scan (no shuffle but the final 1-row agg)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue")
    )


@register(
    "q07_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year, {_REV_SQL} AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join", "agg"),
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: two-nation trade volume by year; the OR-ed nation pair is
    applied after broadcast-joining both nation dims."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    j = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


@register(
    "q08_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, {_REV_SQL} AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
    )
    GROUP BY o_year
    """,
    tags=("tpch", "join", "agg"),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share as a ratio of conditional decimal
    sums over a 7-table star join (dims broadcast)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select("n_nationkey", "n_regionkey")
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
    )
    vol = j.select(
        F.year("o_orderdate").alias("o_year"), _rev().alias("volume"), "nation"
    )
    zero = F.lit(0).cast("decimal(25,4)")
    return vol.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@register(
    "q09_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {_REV_SQL} - {sql_dec('p_retailprice')} * {sql_dec('l_quantity')} AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
    tags=("tpch", "join", "agg"),
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-nation/year profit. The schema has no partsupp,
    so ps_supplycost is substituted by p_retailprice as the unit cost —
    the multi-fact join + signed decimal rollup shape is unchanged."""
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    amount = _rev() - dec("p_retailprice") * dec("l_quantity")
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.select(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"),
                 amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@register(
    "q12_late_lines_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    tags=("tpch", "join", "agg"),
)
def q12_late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counts over late lines
    (no l_shipmode/commit/receipt in schema: 'late' = shipped >60 days
    after order date, grouped by return flag instead of ship mode)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tags=("tpch", "join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: orders-per-customer histogram via a filtered left join
    (the comment NOT LIKE filter becomes a priority filter); COUNT of a
    nullable key counts only matches."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                              ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
           / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
    """,
    tags=("tpch", "join", "agg"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — conditional decimal ratio over a
    broadcast part join."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-06-01")) & (F.col("l_shipdate") < _ts("1997-07-01"))
    )
    p = t(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(25,4)")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(_rev()).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q17_small_qty_revenue",
    oracle=f"""
    SELECT CAST(SUM({sql_dec('l_extendedprice')}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS a_partkey,
               0.2 * (CAST(SUM({sql_dec('l_quantity')}) AS DOUBLE) / COUNT(*)) AS qty_cut
        FROM lineitem GROUP BY l_partkey
    ) ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#9' AND l_quantity < qty_cut
    """,
    tags=("tpch", "join", "agg", "subq"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue. The correlated AVG
    subquery is decorrelated to a per-part aggregate joined back on
    l_partkey (the plan Catalyst produces for the correlated form, made
    explicit); the average is an exact decimal sum over count so both
    engines derive the identical double cutoff."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#9")
    cuts = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * (F.sum(dec("l_quantity")).cast("double") / F.count("*"))).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(cuts, F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg((F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customer",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM({sql_dec('l_quantity')}) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 20
    """,
    tags=("tpch", "join", "agg", "subq", "topk"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume customers — IN-subquery over a HAVING
    aggregate becomes a semi join against the big-order keys; the decimal
    HAVING threshold compares exactly in both engines."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "b_orderkey"),
              F.col("o_orderkey") == F.col("b_orderkey"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#9' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch", "join", "agg"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three OR-ed brand/size/quantity branches (shipmode and
    container predicates dropped with their columns). Catalyst extracts
    the common p_partkey equi-key so this stays a broadcast hash join
    with the disjunction as a post-join filter, not a nested loop."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")

    def branch(brand: str, s_lo: int, s_hi: int, q_lo: int, q_hi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    cond = (
        branch("Brand#1", 1, 15, 1, 20)
        | branch("Brand#9", 10, 30, 10, 30)
        | branch("Brand#20", 20, 50, 20, 40)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("tpch", "join", "subq", "topk"),
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: the sole late supplier on multi-supplier finished
    orders — EXISTS + correlated NOT EXISTS over lineitem self-joins
    ('late' = shipped >90 days after order date in place of the absent
    receipt/commit dates). Expressed in Spark SQL so Catalyst plans the
    decorrelation (left-semi + left-anti on l_orderkey) itself."""
    t(spark, sf_dir, "supplier").createOrReplaceTempView("q21_supplier")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("q21_lineitem")
    t(spark, sf_dir, "orders").createOrReplaceTempView("q21_orders")
    return spark.sql("""
        SELECT s_name, COUNT(*) AS numwait
        FROM q21_supplier
        JOIN q21_lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN q21_orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAYS
          AND EXISTS (SELECT 1 FROM q21_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM q21_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAYS)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """)


@register(
    "q22_dormant_customers",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS numcust,
           {sql_dsum('c_acctbal', 'totacctbal')}
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM({sql_dec('c_acctbal')}) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
    )
    GROUP BY c_mktsegment
    """,
    tags=("tpch", "join", "subq", "agg"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders (phone-prefix country buckets become market segments; 'no
    orders at all' becomes 'no orders in 2001+' since every generated
    customer has orders). Scalar subquery broadcast as a literal-free
    cross-join row + left-anti join for NOT EXISTS."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= _ts("2001-01-01"))
    avg_row = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("cut"))
    )
    return (
        c.join(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("cut"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal", "totacctbal"))
    )


# ---------------------------------------------------------------------------
# partsupp-free adaptations (round 5). The test schema ships no partsupp, so
# q02/q11 (need ps_supplycost/ps_availqty, prices the schema carries nowhere)
# genuinely cannot exist. q15/q16/q20's PHYSICAL SHAPES survive substituting
# the (part, supplier) relationship lineitem itself records:
#   q15: aggregated revenue view + tie-safe scalar-subquery max
#   q16: distinct-supplier counts per part class + NOT IN exclusion
#   q20: nested IN subqueries gated by a correlated share-of-volume agg
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "subq", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view per supplier over one quarter, then
    the supplier(s) hitting the scalar-subquery MAX — the create-view +
    uncorrelated scalar aggregate pattern. The revenue doubles on both
    sides of the equality are the SAME exact-decimal sum cast once to
    double, so the cross-engine comparison is deterministic (the reason
    TPC-H's own spec tolerates ties here)."""
    li = t(spark, sf_dir, "lineitem")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    best = revenue.agg(F.max("total_revenue").alias("best_rev"))
    return (
        t(spark, sf_dir, "supplier")
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(best), F.col("total_revenue") == F.col("best_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_part_supplier_relationship",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "agg", "subq"),
)
def q16_part_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can source each part
    class, excluding a blacklist via NOT IN. partsupp is substituted by
    the (l_partkey, l_suppkey) pairs lineitem actually records; the
    absent comment-based complaints filter becomes the schema's negative
    account balance. Physical shape preserved: dedup'd fact projection,
    broadcast dim join, anti-join exclusion, COUNT(DISTINCT) rollup."""
    ps = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").startswith("MEDIUM"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    return (
        ps.join(F.broadcast(bad), ps["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_potential_promotion",
    oracle=f"""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               {sql_dsum("l_quantity", "qty")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey),
    tot AS (
        SELECT l_partkey, {sql_dsum("l_quantity", "part_qty")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_partkey)
    SELECT s_name, s_suppkey
    FROM supplier
    WHERE s_suppkey IN (
        SELECT s.l_suppkey
        FROM shipped s JOIN tot USING (l_partkey)
        WHERE s.qty > 0.5 * tot.part_qty
          AND s.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    )
    ORDER BY s_suppkey
    """,
    tags=("tpch", "subq", "semi"),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominate supply of a named part
    family — nested IN subqueries whose inner filter compares against a
    correlated aggregate. ps_availqty > 0.5 * shipped-qty becomes
    'this supplier shipped > 50% of the part's year volume' (both sides
    exact decimal sums), and the part family filter is p_name LIKE
    'red%'. Catalyst decorrelates the INs to left-semi joins; the share
    comparison divides two decimal-sum doubles, deterministic in both
    engines."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(dsum("l_quantity", "qty"))
    tot = li.groupBy("l_partkey").agg(dsum("l_quantity", "part_qty"))
    red_parts = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    dominant = (
        shipped.join(tot, "l_partkey")
        .filter(F.col("qty") > 0.5 * F.col("part_qty"))
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t(spark, sf_dir, "supplier")
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_suppkey")
    )
