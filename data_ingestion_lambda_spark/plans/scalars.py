"""Scalar function surface (SURVEY.md §2.8).

Covers every scalar family the reference uses (F1-F10: the date-parse
fallback chain, date arithmetic/range generation, string ops, null
coercion, JSON) plus the general math/conditional families (F11) the
north star needs. All JVM-side built-ins — no UDFs anywhere here, so
everything stays inside whole-stage codegen.

Cross-engine determinism notes:
- double→int casts are avoided (Spark truncates, DuckDB rounds);
- no exp/log/pow (libm last-ulp differences); sqrt IS used (IEEE-exact);
- day-of-week is aligned explicitly (Spark 1=Sun..7, DuckDB 0=Sun..6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans.registry import register
from data_ingestion_lambda_spark.plans._util import t


@register(
    "scalar_dates_extract",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(month(o_orderdate) AS INTEGER) AS mth, CAST(day(o_orderdate) AS INTEGER) AS dom,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(week(o_orderdate) AS INTEGER) AS iso_week,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(o_orderdate AS DATE) + 30 AS plus_30d,
           CAST(o_orderdate AS DATE) - 30 AS minus_30d,
           CAST((CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH) AS DATE) AS plus_1m,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch_start,
           strftime(o_orderdate, '%Y_%m_%d') AS ymd_underscore
    FROM orders
    """,
    tags=("scalar", "dates"),
)
def scalar_dates_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction + arithmetic (reference F3/F5/F7: ±30 days, YYYY_MM_DD
    formatting — src/s3_processor.py:21,31,179)."""
    o = t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mth"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.date_add(d, 30).alias("plus_30d"),
        F.date_sub(d, 30).alias("minus_30d"),
        F.add_months(d, 1).alias("plus_1m"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "yyyy_MM_dd").alias("ymd_underscore"),
    )


@register(
    "scalar_date_parse_chain",
    oracle="""
    SELECT o_orderkey, datestr,
           COALESCE(CAST(try_strptime(datestr, '%d-%b-%Y') AS DATE),
                    CAST(try_strptime(datestr, '%Y-%m-%d') AS DATE)) AS parsed_date
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%d-%b-%Y')
                    ELSE strftime(o_orderdate, '%Y-%m-%d') END AS datestr
        FROM orders
    )
    """,
    tags=("scalar", "dates"),
)
def scalar_date_parse_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's multi-format date-parse fallback chain (F1/F2,
    src/s3_processor.py:94-104): try `dd-MMM-yyyy` first, then ISO.

    Built as COALESCE(to_date(fmt1), to_date(fmt2)) — null on mismatch,
    next format wins; at 100 TB this is pure codegen, no Python."""
    o = t(spark, sf_dir, "orders")
    datestr = F.when(
        F.col("o_orderkey") % 2 == 0, F.date_format("o_orderdate", "dd-MMM-yyyy")
    ).otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
    return o.select("o_orderkey", datestr.alias("datestr")).select(
        "o_orderkey",
        "datestr",
        F.coalesce(
            F.try_to_date("datestr", "dd-MMM-yyyy"),
            F.try_to_date("datestr", "yyyy-MM-dd"),
        ).alias("parsed_date"),
    )


@register(
    "scalar_date_range_gen",
    oracle="""
    SELECT CAST(UNNEST(generate_series(DATE '1995-03-01', DATE '1995-03-31',
                                       INTERVAL 1 DAY)) AS DATE) AS cal_day
    """,
    tags=("scalar", "dates"),
)
def scalar_date_range_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range generation (reference F4: checkpoint+1..today scan range,
    src/s3_processor.py:29-32) via sequence()+explode — the distributed
    replacement for the reference's Python day loop."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-03-01").cast("date"),
                F.lit("1995-03-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("cal_day")
    )


@register(
    "scalar_strings",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
           CAST(length(c_name) AS INTEGER) AS name_len,
           substr(c_name, 10, 9) AS cust_num_str,
           replace(c_name, 'Customer#', 'C-') AS short_name,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
           rpad(c_mktsegment, 12, '.') AS padded_seg,
           concat(c_mktsegment, ':', c_name) AS seg_name,
           CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
           string_split(c_name, '#')[2] AS after_hash,
           trim('  ' || c_mktsegment || '  ') AS trimmed,
           reverse(c_mktsegment) AS rseg,
           starts_with(c_name, 'Customer') AS is_cust,
           contains(c_name, '0042') AS has_42
    FROM customer
    """,
    tags=("scalar", "strings"),
)
def scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (reference F9: endswith/contains/strip/split/concat,
    src/s3_processor.py:59,166,183,43)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 10, 9).alias("cust_num_str"),
        F.regexp_replace("c_name", "Customer#", "C-").alias("short_name"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.rpad("c_mktsegment", 12, ".").alias("padded_seg"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("seg_name"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.split("c_name", "#").getItem(1).alias("after_hash"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias("trimmed"),
        F.reverse("c_mktsegment").alias("rseg"),
        F.col("c_name").startswith("Customer").alias("is_cust"),
        F.col("c_name").contains("0042").alias("has_42"),
    )


@register(
    "scalar_case_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 35 THEN 'mid'
                ELSE 'high' END AS qty_band,
           abs(l_extendedprice - 30000) AS dist_from_30k,
           l_orderkey % 7 AS key_mod7,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_div7_floor,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_div7_ceil,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(round(l_discount * 100, 0) AS INTEGER) AS disc_pct,
           CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS price_sign,
           greatest(l_quantity, CAST(l_linenumber AS DOUBLE) * 10) AS g,
           least(l_quantity, CAST(l_linenumber AS DOUBLE) * 10) AS l
    FROM lineitem
    """,
    tags=("scalar", "math"),
)
def scalar_case_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE + arithmetic family (abs/mod/floor/ceil/sqrt/round/sign/
    greatest/least) — all codegen-friendly builtins."""
    l = t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 35, "mid")
        .otherwise("high")
        .alias("qty_band"),
        F.abs(F.col("l_extendedprice") - 30000).alias("dist_from_30k"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.floor(F.col("l_quantity") / 7.0).alias("qty_div7_floor"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_div7_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.col("l_discount") * 100, 0).cast("int").alias("disc_pct"),
        F.signum(F.col("l_extendedprice") - 30000).alias("price_sign"),
        F.greatest(F.col("l_quantity"), F.col("l_linenumber").cast("double") * 10).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_linenumber").cast("double") * 10).alias("l"),
    )


@register(
    "scalar_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    """,
    tags=("scalar", "json"),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (reference F10 — serialize/deserialize of checkpoint
    audit and secrets, src/lambda_handler.py:33, src/s3_processor.py:152)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@register(
    "scalar_from_json",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           (TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL) AS parsed_ok,
           CASE WHEN json_valid('not json')
                THEN TRY_CAST(json_extract_string('not json', '$.k') AS BIGINT)
                ELSE NULL END AS malformed_k
    FROM events
    """,
    tags=("scalar", "json"),
)
def scalar_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-declared JSON parse — ``from_json`` with an explicit
    StructType (reference F10 deserialize side, the typed counterpart of
    scalar_json's path extraction; src/lambda_handler.py:33). Includes the
    malformed-input contract: an unparseable document yields NULL fields
    (PERMISSIVE), never a failed job — the same quarantine-not-crash rule
    the CSV source follows.

    Scale: from_json with a declared schema parses each document ONCE into
    a struct (single codegen'd Jackson pass); per-path get_json_object
    re-parses per path — with K extracted fields the struct form scans the
    payload K× less."""
    e = t(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    bad = F.from_json(F.lit("not json"), "k BIGINT")
    return e.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        parsed["k"].isNotNull().alias("parsed_ok"),
        bad["k"].alias("malformed_k"),
    )


@register(
    "scalar_to_json",
    oracle="""
    SELECT o_orderkey,
           to_json(struct_pack(orderkey := o_orderkey, status := o_orderstatus)) AS payload,
           CAST(json_extract_string(
               to_json(struct_pack(orderkey := o_orderkey, status := o_orderstatus)),
               '$.orderkey') AS BIGINT) AS roundtrip_key
    FROM orders
    """,
    tags=("scalar", "json"),
)
def scalar_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON *serialize* direction (reference F10 serialize side — the
    checkpoint audit twin json.dumps, src/lambda_handler.py:98) plus a
    round-trip extract proving serialize∘deserialize = identity.

    Both engines emit compact `{"k":v}` JSON with declaration-order keys;
    null-field handling differs (Spark omits, DuckDB keeps) so only
    never-null columns go in the struct."""
    o = t(spark, sf_dir, "orders")
    payload = F.to_json(
        F.struct(F.col("o_orderkey").alias("orderkey"), F.col("o_orderstatus").alias("status"))
    )
    return o.select(
        "o_orderkey",
        payload.alias("payload"),
        F.get_json_object(payload, "$.orderkey").cast("bigint").alias("roundtrip_key"),
    )


@register(
    "scalar_regexp",
    oracle="""
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, '(\\d+)', 1) AS INTEGER) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS consonant_name,
           regexp_matches(p_type, '^(ECONOMY|SMALL)') AS is_eco_small
    FROM part
    """,
    tags=("scalar", "strings"),
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract/replace/match (Java regex and RE2 agree on these
    patterns; exotic syntax is deliberately avoided)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"(\d+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("consonant_name"),
        F.col("p_type").rlike("^(ECONOMY|SMALL)").alias("is_eco_small"),
    )


@register(
    "scalar_null_handling",
    oracle="""
    SELECT c_custkey,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS seg_coalesced,
           (c_acctbal IS NULL) AS bal_is_null,
           COALESCE(CAST(NULL AS BIGINT), 0) AS tokens_coerced,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg
    FROM customer
    """,
    tags=("scalar",),
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL plumbing: nullif/coalesce/is-null — the reference's NaN→0 token
    coercion (F8/P5, src/db_operations.py:90) generalized."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("SUPPRESSED")).alias(
            "seg_coalesced"
        ),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
        F.coalesce(F.lit(None).cast("bigint"), F.lit(0)).alias("tokens_coerced"),
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal_nonneg"),
    )


@register(
    "scalar_variant",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k,
           CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS n_distinct_k
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "variant"),
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics on Spark 4's VARIANT type: ``parse_json``
    once into the binary variant encoding, then ``variant_get`` typed
    extraction — the open-format answer to schema-on-read JSON columns
    (parse cost paid once per row, extractions are binary field lookups,
    and at 100 TB the variant column shreds into parquet instead of
    re-parsing text per query). The schema'd `from_json` lane
    (scalar_json) is the closed-schema alternative; variant is for
    payloads whose shape drifts. DuckDB replays the extraction through
    its JSON lanes — values, not encodings, are what hash-matches."""
    e = t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "long")
    return e.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        F.max("k").cast("long").alias("max_k"),
        F.count_distinct("k").cast("long").alias("n_distinct_k"),
    )
