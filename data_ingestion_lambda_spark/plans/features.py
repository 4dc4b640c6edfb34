"""ML feature-preparation lanes: the transforms a training-data pipeline
applies to tabular columns before a model ever sees them — scaling,
categorical encoding, the hashing trick, and quantile discretization.

The reference repo ingests raw rows and stops
(/root/reference/src/s3_processor.py:10-210); feature preparation is
extension surface, built on the same determinism disciplines as the
profiling suite:

- every statistic that feeds a per-row transform is an EXACT integer /
  decimal aggregate (cent-quantized values, decimal(38,0) co-moments in
  Spark / HUGEINT in DuckDB), so the two engines agree bit-for-bit;
- the final per-row arithmetic is a short, fixed sequence of
  correctly-rounded IEEE double ops written identically in both engines;
- double constants in oracle SQL carry an ``e0`` suffix (a bare decimal
  literal parses as DECIMAL in DuckDB and converts one ulp off).

Scale notes are per-lane; the common shape is "one map-side-combinable
stats aggregation, broadcast back over the scan" — group statistics are
group-cardinality rows no matter how many trillion rows carry them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestion_lambda_spark.plans._util import t
from data_ingestion_lambda_spark.plans.llm_ops import P, polyhash
from data_ingestion_lambda_spark.plans.registry import register

DEC38 = "decimal(38,0)"

# ---------------------------------------------------------------------------
# Numeric scaling: per-group z-score + min-max, exact group moments
# ---------------------------------------------------------------------------

# Deterministic ~1% row sample so the lane emits a bounded, hash-checkable
# slice of the scaled output (the transform itself is row-parallel over the
# full table; the sample is only the *verification* surface).
_SAMPLE_MOD = 97


@register(
    "feature_scale_numeric",
    oracle=f"""
    WITH v AS (
        SELECT l_orderkey, l_linenumber, l_returnflag AS grp,
               CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM lineitem
    ),
    stats AS (
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(cents) AS sx,
               SUM(cents * cents) AS sxx,
               MIN(cents) AS mn,
               MAX(cents) AS mx
        FROM v GROUP BY grp
    )
    SELECT v.l_orderkey, v.l_linenumber, v.grp AS l_returnflag,
           v.cents AS price_cents,
           CAST(CAST(s.n AS HUGEINT) * v.cents - s.sx AS DOUBLE)
             / sqrt(CAST(CAST(s.n AS HUGEINT) * s.sxx - s.sx * s.sx AS DOUBLE))
             AS z_price,
           CAST(v.cents - s.mn AS DOUBLE) / CAST(s.mx - s.mn AS DOUBLE)
             AS minmax_price
    FROM v JOIN stats s ON s.grp = v.grp
    WHERE (v.l_orderkey * 7 + v.l_linenumber) % {_SAMPLE_MOD} = 0
    """,
    tags=("features", "scaling"),
)
def feature_scale_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score and min-max scaling of line price — the two
    standard numeric normalizations a tabular feature pipeline applies
    before gradient-based training, emitted for a deterministic 1-in-97
    key-hash sample of rows.

    Determinism: prices quantize to integer cents; the group statistics
    (n, Σx, Σx², min, max) are exact integer aggregates (decimal(38,0) /
    HUGEINT — Σcents² crosses 2⁶³ near 1e5 rows of 1e7-cent values).
    The per-row z-score uses the division-free closed form
    z = (n·x − Σx) / √(n·Σx² − (Σx)²) — algebraically (x−μ)/σ with the
    1/n factors cancelled, so each row is ONE decimal→double conversion
    pair, one sqrt, one divide: identical IEEE ops in both engines.
    Min-max is (x−min)/(max−min), both deltas exact integers.

    Scale: one map-side-combinable stats aggregation (5 integer moments
    per return flag), broadcast-joined back over the scan — group stats
    are 3 rows regardless of fact volume; the transform is then
    row-parallel with NO second exchange. The sample predicate is a pure
    integer expression on the key, pushed into the scan."""
    v = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").alias("grp"),
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    stats = v.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("cents").cast(DEC38)).alias("sx"),
        F.sum((F.col("cents") * F.col("cents")).cast(DEC38)).alias("sxx"),
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
    )
    nD = F.col("n").cast(DEC38)
    return (
        v.filter((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % _SAMPLE_MOD == 0)
        .join(F.broadcast(stats), "grp")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("grp").alias("l_returnflag"),
            F.col("cents").alias("price_cents"),
            (
                (nD * F.col("cents") - F.col("sx")).cast("double")
                / F.sqrt((nD * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
            ).alias("z_price"),
            (
                (F.col("cents") - F.col("mn")).cast("double")
                / (F.col("mx") - F.col("mn")).cast("double")
            ).alias("minmax_price"),
        )
    )


# ---------------------------------------------------------------------------
# Categorical target encoding (m-estimate smoothing)
# ---------------------------------------------------------------------------

_TE_SMOOTH = 20  # m-estimate pseudo-count


@register(
    "feature_target_encode_brand",
    oracle=f"""
    WITH j AS (
        SELECT p.p_brand,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    per AS (
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(ret) AS BIGINT) AS n_returned
        FROM j GROUP BY p_brand
    ),
    g AS (
        SELECT CAST(SUM(n_returned) AS DOUBLE) / CAST(SUM(n_lines) AS BIGINT)
               AS gmean
        FROM per
    )
    SELECT per.p_brand, per.n_lines, per.n_returned,
           CAST(per.n_returned AS DOUBLE) / per.n_lines AS raw_return_rate,
           (CAST(per.n_returned AS DOUBLE) + {_TE_SMOOTH}e0 * g.gmean)
             / CAST(per.n_lines + {_TE_SMOOTH} AS DOUBLE) AS smoothed_return_rate
    FROM per CROSS JOIN g
    """,
    tags=("features", "encoding"),
)
def feature_target_encode_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target encoding of a categorical feature (part brand) against a
    binary target (line was returned), with m-estimate smoothing —
    the leakage-resistant way to feed a high-cardinality category to a
    model: each brand's rate is shrunk toward the global rate by a
    pseudo-count of m=20 observations, so rare brands don't memorize
    their few labels.

    Determinism: per-brand counts are exact integers; the global mean is
    ONE integer-ratio division, and the smoothed rate
    (n_ret + m·G)/(n + m) is mul-add-divide in fixed written order —
    bit-identical in both engines (the oracle spells m as ``20e0`` so
    DuckDB parses a double, not a decimal).

    Scale: fact joins the part dimension broadcast (no fact shuffle for
    the join), the brand rollup combines map-side to |brands| rows, and
    the global mean derives from the rollup itself — one exchange over
    brand-cardinality rows total."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret")
    )
    pt = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum("ret").cast("long").alias("n_returned"),
        )
    )
    g = per.agg(
        (F.sum("n_returned").cast("double") / F.sum("n_lines").cast("long")).alias(
            "gmean"
        )
    )
    return per.crossJoin(F.broadcast(g)).select(
        "p_brand",
        "n_lines",
        "n_returned",
        (F.col("n_returned").cast("double") / F.col("n_lines")).alias(
            "raw_return_rate"
        ),
        (
            (F.col("n_returned").cast("double") + F.lit(float(_TE_SMOOTH)) * F.col("gmean"))
            / (F.col("n_lines") + F.lit(_TE_SMOOTH)).cast("double")
        ).alias("smoothed_return_rate"),
    )


# ---------------------------------------------------------------------------
# The hashing trick: portable polynomial hash → fixed bucket space
# ---------------------------------------------------------------------------

_HASH_BUCKETS = 64


@register(
    "feature_hash_bucket",
    oracle=f"""
    WITH h AS (
        SELECT p_type,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(p_type, ''),
                                  c -> CAST(ascii(c) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % {P}) % {_HASH_BUCKETS} AS bucket
        FROM part
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types
    FROM h GROUP BY bucket
    """,
    tags=("features", "encoding"),
)
def feature_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: map a string category (part type) into a fixed
    64-bucket feature space via the repo's portable polynomial hash —
    how an unbounded-vocabulary categorical becomes a bounded model
    input with no fitted dictionary. The output is the bucket occupancy
    table: rows per bucket plus DISTINCT source categories per bucket
    (n_types > 1 marks a hash collision — the accounting a pipeline
    owner checks before sizing the bucket space).

    Determinism: the polynomial hash (fold ×31 mod 1e9+7 over
    codepoints) is exact integer arithmetic reproducible in any engine —
    unlike murmur/xxhash builtins, which differ across engines.

    Scale: pure row-parallel hashing in whole-stage codegen, then one
    map-side-combined rollup to <= 64 rows; the distinct-count expands
    per bucket but stays hash-path (no string min/max shares the
    aggregate — the profile_table SortAggregate lesson)."""
    h = t(spark, sf_dir, "part").select(
        "p_type", (polyhash(F.col("p_type")) % _HASH_BUCKETS).alias("bucket")
    )
    return h.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.countDistinct("p_type").cast("long").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# Quantile discretization (decile binning via the bucket-histogram recipe)
# ---------------------------------------------------------------------------

_QB_COARSE = 100_000  # cents per coarse prefix-sum range ($1,000)


@register(
    "feature_quantile_bucketize",
    oracle="""
    WITH v AS (
        SELECT o_orderkey,
               CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    hist AS (SELECT cents, COUNT(*) AS cnt FROM v GROUP BY cents),
    n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows FROM hist),
    cum AS (
        SELECT cents, cnt,
               SUM(cnt) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist
    ),
    cuts AS (
        SELECT g.p,
               MIN(CASE WHEN cum.cum * 10 >= n.n_rows * g.p
                        THEN cum.cents END) AS cut
        FROM cum CROSS JOIN n CROSS JOIN generate_series(1, 9) AS g(p)
        GROUP BY g.p
    ),
    assigned AS (
        SELECT v.o_orderkey, v.cents,
               1 + COUNT(c.cut) AS decile
        FROM v LEFT JOIN cuts c ON c.cut < v.cents
        GROUP BY v.o_orderkey, v.cents
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(cents) AS lo_cents,
           MAX(cents) AS hi_cents
    FROM assigned GROUP BY decile
    """,
    tags=("features", "discretization"),
)
def feature_quantile_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretization: bin order total price into DECILES whose
    cut points come from the data itself — the standard way a skewed
    numeric becomes a uniform categorical feature (equal-population
    bins), and the feature-prep application of the round-6/7
    integer-bucket histogram recipe.

    Cut points are type-1 lower quantiles at cent resolution: the
    smallest cent bucket whose cumulative count covers p/10 of rows,
    for p = 1..9. A row's decile is 1 + (# cuts strictly below its
    value), so boundary values land in the LOWER bin — the same
    convention as the histogram percentile lanes, and exactly
    reproducible in SQL (no interpolation, all integers).

    Scale: the histogram rolls up map-side to one row per distinct
    cent value (value-domain-bounded, never volume-bounded); the
    cumulative count is the TWO-PHASE distributed prefix sum from
    events_interarrival_hist (per-$1,000-range local cumsum + broadcast
    offsets — no task windows more than one range); the 9 cut points
    collapse to a single broadcast array and the per-row assignment is
    a codegen filter-count against it — NO second shuffle over facts,
    then a 10-row rollup."""
    v = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    hist = v.groupBy("cents").agg(F.count("*").alias("cnt"))
    hist = hist.withColumn("coarse", F.expr(f"cents div {_QB_COARSE}"))
    wl = (
        Window.partitionBy("coarse")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wo = Window.orderBy("coarse").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        hist.groupBy("coarse")
        .agg(F.sum("cnt").alias("ccnt"))
        .select("coarse", F.coalesce(F.sum("ccnt").over(wo), F.lit(0)).alias("off"))
    )
    cum = (
        hist.withColumn("lcum", F.sum("cnt").over(wl))
        .join(F.broadcast(offsets), "coarse")
        .withColumn("cum", F.col("lcum") + F.col("off"))
    )
    n = hist.agg(F.sum("cnt").cast("long").alias("n_rows"))
    cuts = (
        cum.crossJoin(F.broadcast(n))
        .select(
            "cents",
            "cum",
            "n_rows",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("p"),
        )
        .groupBy("p")
        .agg(
            F.min(
                F.when(F.col("cum") * 10 >= F.col("n_rows") * F.col("p"), F.col("cents"))
            ).alias("cut")
        )
    )
    cut_arr = cuts.agg(F.sort_array(F.collect_list("cut")).alias("cut_arr"))
    assigned = v.crossJoin(F.broadcast(cut_arr)).select(
        "o_orderkey",
        "cents",
        (
            1 + F.size(F.filter(F.col("cut_arr"), lambda c: c < F.col("cents")))
        )
        .cast("long")
        .alias("decile"),
    )
    return assigned.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )


# ---------------------------------------------------------------------------
# Unique-key candidate discovery
# ---------------------------------------------------------------------------

_KEY_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@register(
    "profile_unique_key_candidates",
    oracle=f"""
    WITH s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               {", ".join(
                   f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS d_{c}, "
                   f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
                   f" AS z_{c}"
                   for c in _KEY_COLS
               )}
        FROM orders
    )
    {" UNION ALL ".join(
        f"SELECT '{c}' AS col_name, n_rows, d_{c} AS n_distinct, z_{c} AS n_nulls, "
        f"CAST(d_{c} AS DOUBLE) / n_rows AS uniqueness, "
        f"CAST(d_{c} = n_rows AND z_{c} = 0 AS BOOLEAN) AS is_key FROM s"
        for c in _KEY_COLS
    )}
    """,
    tags=("profiling", "quality", "features"),
)
def profile_unique_key_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key candidate discovery over the orders table: for each
    column, exact distinct count, NULL count, uniqueness ratio, and the
    is_key verdict (distinct == rows AND no NULLs) — the schema-
    inference step a pipeline runs on an undocumented drop before
    choosing MERGE keys (the reference hardcodes its key;
    /root/reference/src/db_operations.py:77-84 — this lane derives it).

    Determinism: counts are exact integers; the ratio is one
    integer-ratio division. Column set is fixed and ordered, so the
    6-row output is stable.

    Scale: ONE aggregation with 6 COUNT(DISTINCT) columns — Catalyst
    Expand (×6 row replication of a 6-column projection) feeding a
    hash aggregate with map-side partials; no string min/max shares the
    plan, so the whole Expand stays on the hash path (the profile_table
    lesson). The long-format pivot is a 1-row → 6-row stack on the
    driver-side-free aggregate result."""
    o = t(spark, sf_dir, "orders")
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in _KEY_COLS:
        aggs.append(F.countDistinct(c).cast("long").alias(f"d_{c}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"z_{c}")
        )
    s = o.agg(*aggs)
    stack_args: list[Column] = []
    for c in _KEY_COLS:
        stack_args.extend([F.lit(c), F.col(f"d_{c}"), F.col(f"z_{c}")])
    return s.select(
        "n_rows",
        F.stack(F.lit(len(_KEY_COLS)), *stack_args).alias(
            "col_name", "n_distinct", "n_nulls"
        ),
    ).select(
        "col_name",
        "n_rows",
        "n_distinct",
        "n_nulls",
        (F.col("n_distinct").cast("double") / F.col("n_rows")).alias("uniqueness"),
        ((F.col("n_distinct") == F.col("n_rows")) & (F.col("n_nulls") == 0)).alias(
            "is_key"
        ),
    )


# ---------------------------------------------------------------------------
# Per-user feature vectors (one-shot twin of the maintained feature store)
# ---------------------------------------------------------------------------


@register(
    "feature_user_vectors",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id, event_type,
               CAST(epoch_us(ts) AS BIGINT) AS us,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    m AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases,
               SUM(cents) AS s, SUM(cents * cents) AS sq,
               MIN(us) AS mn, MAX(us) AS mx
        FROM v GROUP BY user_id
    ),
    last AS (
        SELECT user_id, event_type AS last_event_type
        FROM (SELECT user_id, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY us DESC, event_id DESC) AS rn
              FROM v) r
        WHERE rn = 1
    )
    SELECT m.user_id, m.n_events, m.n_purchases,
           CAST(m.n_purchases AS DOUBLE) / m.n_events AS purchase_rate,
           CAST(m.s AS DOUBLE) / m.n_events AS mean_cents,
           sqrt(CAST(CAST(m.n_events AS HUGEINT) * m.sq - m.s * m.s AS DOUBLE))
             / CAST(m.n_events AS DOUBLE) AS std_cents,
           CAST(m.mx - m.mn AS DOUBLE) / 86400000000e0 AS tenure_days,
           last.last_event_type
    FROM m JOIN last USING (user_id)
    """,
    tags=("features", "events"),
)
def feature_user_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user training feature vectors from the events table: activity
    counts, purchase rate, exact-cent value mean and population std,
    tenure, and the last event type — the entity-level feature set a
    model trainer joins against. This is the ONE-SHOT derivation; the
    maintained form (operators/feature_store.py) persists per-batch
    additive moment deltas and derives the SAME vectors read-side
    through the SAME shared expressions (user_moments ∘
    derive_user_vector — imported here, so lane and store can never
    desynchronize; N-batch == one-shot equality is pinned in
    tests/test_feature_store.py).

    Determinism: all moments are exact (integer cents, decimal(38,0)
    sums, epoch-µs bounds; the last event is a lexicographic struct max
    with the unique event_id as tiebreak — no window needed in Spark);
    the derivation is a fixed short IEEE sequence per feature. The
    oracle reproduces the struct max as a ROW_NUMBER pick over the same
    (ts, event_id) ordering.

    Scale: ONE user-keyed exchange with map-side partials — moments
    and the struct max combine in the same aggregate; the derivation is
    a projection. |users| output rows."""
    from data_ingestion_lambda_spark.operators.feature_store import (
        derive_user_vector,
        user_moments,
    )

    return derive_user_vector(user_moments(t(spark, sf_dir, "events")))


# ---------------------------------------------------------------------------
# Point-in-time feature join (the label-leakage guard)
# ---------------------------------------------------------------------------


@register(
    "feature_point_in_time",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id, event_type, ts,
               CAST(epoch_us(ts) AS BIGINT) AS us,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    c AS (
        SELECT user_id, event_id AS label_event_id, ts AS label_ts,
               event_type,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_events,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END) OVER w, 0)
                    AS BIGINT) AS n_purchases,
               SUM(cents) OVER w AS s,
               SUM(cents * cents) OVER w AS sq,
               MIN(us) OVER w AS mn,
               MAX(us) OVER w AS mx,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY us, event_id)
                 AS last_event_type
        FROM v
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, label_event_id, label_ts, n_events, n_purchases,
           CAST(n_purchases AS DOUBLE) / n_events AS purchase_rate,
           CAST(s AS DOUBLE) / n_events AS mean_cents,
           sqrt(CAST(CAST(n_events AS HUGEINT) * sq - s * s AS DOUBLE))
             / CAST(n_events AS DOUBLE) AS std_cents,
           CAST(mx - mn AS DOUBLE) / 86400000000e0 AS tenure_days,
           last_event_type
    FROM c
    WHERE event_type = 'purchase' AND n_events > 0
    """,
    tags=("features", "events"),
)
def feature_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join: for every purchase event (the
    label), the SAME per-user feature vector feature_user_vectors
    computes — but over only the events STRICTLY BEFORE that label in
    (ts, event_id) order. This is the feature-store operation that
    prevents label leakage: a trainer joining labels against
    current-state features lets each label see its own future; this
    lane reconstructs what the store would have served at label time.
    Labels whose user has no prior event are dropped (no vector existed
    to serve — and Spark 4 ANSI mode makes the 0-division an error, so
    the filter is correctness, not taste).

    Shares derive_user_vector with the one-shot lane and both ledger
    read sides (label keys ride through extra_cols) — the served-online
    vs reconstructed-offline skew is zero by construction.

    Determinism: cumulative moments are exact (integer cents,
    decimal(38,0) window sums, epoch-µs bounds); "strictly before" is
    the ROWS frame ending at 1 PRECEDING over the unique (ts, event_id)
    order, spelled identically in both engines; the last-prior-event
    struct max over that frame equals LAG over the same order.

    Scale: ONE user-keyed exchange and one sort — all seven cumulative
    aggregates and the struct max share a single window frame, so
    Catalyst evaluates them in one Window operator (pinned in
    tests/test_plan_shapes_features.py). Running state is a handful of
    scalars per user; output is |labels| rows."""
    from data_ingestion_lambda_spark.operators.feature_store import (
        DEC38,
        derive_user_vector,
    )

    us = F.unix_micros(F.col("ts"))
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    moments = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            "ts",
            us.alias("us"),
            cents.alias("cents"),
        )
        .select(
            "user_id",
            F.col("event_id").alias("label_event_id"),
            F.col("ts").alias("label_ts"),
            "event_type",
            F.count(F.lit(1)).over(w).alias("n_events"),
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                ).over(w),
                F.lit(0),
            )
            .cast("long")
            .alias("n_purchases"),
            F.sum(F.col("cents").cast(DEC38)).over(w).alias("sum_cents"),
            F.sum((F.col("cents") * F.col("cents")).cast(DEC38))
            .over(w)
            .alias("sumsq_cents"),
            F.min("us").over(w).alias("first_ts_us"),
            F.max("us").over(w).alias("last_ts_us"),
            F.max(
                F.struct(
                    F.col("us").alias("ts_us"),
                    F.col("event_id").alias("event_id"),
                    F.col("event_type").alias("event_type"),
                )
            )
            .over(w)
            .alias("last_event"),
        )
        .filter((F.col("event_type") == "purchase") & (F.col("n_events") > 0))
    )
    return derive_user_vector(moments, extra_cols=("label_event_id", "label_ts"))


# ---------------------------------------------------------------------------
# Negative sampling (contrastive / recsys training pairs)
# ---------------------------------------------------------------------------

_NEG_K = 4  # candidates drawn per customer
_NEG_A = 2654435761  # Knuth multiplicative hash constant
_NEG_B = 40503
_NEG_COARSE = 65536  # part-rank prefix-sum coarse range (keys per task)


@register(
    "feature_negative_sampling",
    oracle=f"""
    WITH np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part),
    pidx AS (
        SELECT p_partkey,
               CAST(ROW_NUMBER() OVER (ORDER BY p_partkey) AS BIGINT) AS rk
        FROM part
    ),
    cand AS (
        SELECT c_custkey, CAST(i.i AS BIGINT) AS sample_idx,
               (((c_custkey % 1000000007) * {_NEG_A} % 1000000007
                 + i.i * {_NEG_B}) % 1000000007)
                 % (SELECT n FROM np) + 1 AS rk
        FROM customer, (SELECT UNNEST(generate_series(0, {_NEG_K - 1})) AS i) i
    ),
    inter AS (
        SELECT DISTINCT o_custkey AS ckey, l_partkey AS pkey
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    )
    SELECT cand.c_custkey, cand.sample_idx, pidx.p_partkey
    FROM cand JOIN pidx ON cand.rk = pidx.rk
    WHERE NOT EXISTS (
        SELECT 1 FROM inter
        WHERE inter.ckey = cand.c_custkey AND inter.pkey = pidx.p_partkey
    )
    """,
    tags=("features", "sampling"),
)
def feature_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive / recommender
    training: per customer, {_NEG_K} pseudo-random candidate parts drawn
    by a multiplicative hash over (c_custkey, sample_idx), anti-joined
    against the OBSERVED (customer, part) interactions (orders ⋈
    lineitem) so no sampled "negative" is secretly a positive. The
    standard positives+negatives construction for a two-tower or
    ranking model — and the op that goes subtly wrong with rand()
    (non-reproducible epochs, accidental positives): here the draw is a
    pure hash, so every engine, run, and retry yields the same pairs.

    Determinism: candidate = hash % P % |parts| mapped through a dense
    part-rank index; all integer arithmetic, with the key reduced mod P
    BEFORE the multiply — ((ck % P)·A) % P ≡ (ck·A) % P but the left
    form's intermediate is bounded by (P−1)·A < 2.7e18 < 2^63 for ANY
    key, while the naive ck·A overflows ANSI int64 once keys reach
    ~3.5e9 (found at 100x replication; real 10-digit user ids hit it
    too). ROW_NUMBER over the same (p_partkey) order in both engines.

    Scale: ONE fact exchange (the orderkey join for interactions,
    distinct-reduced before the anti-join, so the anti-join's right
    side is interaction-pairs-sized, not lineitem-sized); candidates
    are |customers| × {_NEG_K} rows. The dense part-rank index is the
    TWO-PHASE coarse-range prefix sum (the feature_quantile_bucketize /
    events_interarrival_hist recipe) — per-coarse-range local
    row_number in parallel + broadcast coarse offsets — NOT a global
    row_number over the part dim: a recsys item catalog is the one
    "dim" that reaches 1e8+ rows, where a single-partition sort window
    dies (ADVICE r8; 100x point in SCALE.md). The only unpartitioned
    window left runs over the coarse-range AGGREGATE (|keyspace|/2^16
    rows — reduced, domain-bounded). The part index broadcasts into the
    candidate join — no fact-side shuffle for it (plan-pinned)."""
    part = t(spark, sf_dir, "part").select("p_partkey")
    n_parts = part.agg(F.count("*").cast("long").alias("n"))
    pp = part.withColumn("coarse", F.expr(f"p_partkey div {_NEG_COARSE}"))
    wo = Window.orderBy("coarse").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        pp.groupBy("coarse")
        .agg(F.count("*").alias("ccnt"))
        .select(
            "coarse", F.coalesce(F.sum("ccnt").over(wo), F.lit(0)).alias("off")
        )
    )
    pidx = (
        pp.withColumn(
            "lrk",
            F.row_number().over(
                Window.partitionBy("coarse").orderBy("p_partkey")
            ),
        )
        .join(F.broadcast(offsets), "coarse")
        .select(
            "p_partkey", (F.col("lrk") + F.col("off")).cast("long").alias("rk")
        )
    )
    cand = (
        t(spark, sf_dir, "customer")
        .select("c_custkey")
        .crossJoin(F.broadcast(n_parts))
        .select(
            "c_custkey",
            F.explode(F.sequence(F.lit(0), F.lit(_NEG_K - 1))).alias("i"),
            "n",
        )
        .select(
            "c_custkey",
            F.col("i").cast("long").alias("sample_idx"),
            "n",
        )
        .select(
            "c_custkey",
            "sample_idx",
            (
                (
                    (
                        (F.col("c_custkey") % F.lit(1000000007)) * F.lit(_NEG_A)
                        % F.lit(1000000007)
                        + F.col("sample_idx") * F.lit(_NEG_B)
                    )
                    % F.lit(1000000007)
                )
                % F.col("n")
                + 1
            ).alias("rk"),
        )
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    inter = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").alias("ckey"), F.col("l_partkey").alias("pkey")
        )
        .distinct()
    )
    return (
        cand.join(F.broadcast(pidx), "rk")
        .join(
            inter,
            (F.col("c_custkey") == F.col("ckey"))
            & (F.col("p_partkey") == F.col("pkey")),
            "left_anti",
        )
        .select("c_custkey", "sample_idx", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Per-user session features (composed from the sessionize definition)
# ---------------------------------------------------------------------------

from data_ingestion_lambda_spark.plans.registry import REGISTRY as _REGISTRY

_SESSIONIZE_ORACLE = _REGISTRY["events_sessionize"].oracle


@register(
    "feature_user_session_stats",
    oracle=f"""
    WITH sessions AS ({_SESSIONIZE_ORACLE}),
    agg AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS total_events,
               CAST(SUM(epoch_us(session_end) - epoch_us(session_start))
                    AS BIGINT) AS total_us,
               CAST(MAX(epoch_us(session_end) - epoch_us(session_start))
                    AS BIGINT) AS max_us
        FROM sessions GROUP BY user_id
    )
    SELECT user_id, n_sessions, total_events,
           CAST(total_events AS DOUBLE) / n_sessions AS events_per_session,
           CAST(total_us AS DOUBLE) / (n_sessions * 1000000)
               AS mean_session_sec,
           CAST(max_us AS DOUBLE) / 1000000e0 AS max_session_sec
    FROM agg
    """,
    tags=("features", "events", "sessionization"),
)
def feature_user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session-level features: session count, events per
    session, mean and max session length — the behavioral half of the
    entity feature set (feature_user_vectors carries the value/activity
    half; a trainer joins both on user_id). Session boundaries are the
    registered events_sessionize lane's OWN builder and oracle (imported
    and composed — the 30-min gap constant cannot drift between the
    feature and the sessionization it summarizes).

    Determinism: durations are integer epoch-µs; each emitted rate is
    ONE double division of exact integers (the µs→sec scaling rides the
    divisor, so there is no second rounding step).

    Scale: sessionize's one user-keyed exchange, then a user-keyed
    rollup that reuses the same partitioning (no second exchange for
    the groupBy — the session aggregate is already user-partitioned).
    Output is |users| rows."""
    from data_ingestion_lambda_spark.plans.events_queries import events_sessionize

    sessions = events_sessionize(spark, sf_dir)
    dur_us = F.unix_micros("session_end") - F.unix_micros("session_start")
    agg = sessions.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("total_events"),
        F.sum(dur_us).cast("long").alias("total_us"),
        F.max(dur_us).cast("long").alias("max_us"),
    )
    return agg.select(
        "user_id",
        "n_sessions",
        "total_events",
        (F.col("total_events").cast("double") / F.col("n_sessions")).alias(
            "events_per_session"
        ),
        (
            F.col("total_us").cast("double")
            / (F.col("n_sessions") * F.lit(1000000))
        ).alias("mean_session_sec"),
        (F.col("max_us").cast("double") / F.lit(1000000.0)).alias(
            "max_session_sec"
        ),
    )


# ---------------------------------------------------------------------------
# Time-decayed activity (recency-weighted engagement feature)
# ---------------------------------------------------------------------------

_DECAY_ASOF = "2024-01-30"  # the corpus's last day — the scoring reference
_DECAY_WMAX = 8  # truncate beyond 8 half-lives (< 0.4% residual weight)


@register(
    "feature_user_decayed_activity",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    weighted AS (
        SELECT user_id,
               CAST(DATE '{_DECAY_ASOF}' - d AS BIGINT) // 7 AS w, n
        FROM daily
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN w < {_DECAY_WMAX}
                         THEN n * (1 << ({_DECAY_WMAX} - w))
                         ELSE 0 END) AS DOUBLE) / {1 << _DECAY_WMAX}
               AS decayed_activity,
           CAST(SUM(CASE WHEN w = 0 THEN n ELSE 0 END) AS BIGINT)
               AS events_last_week
    FROM weighted GROUP BY user_id
    """,
    tags=("features", "events"),
)
def feature_user_decayed_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement: per user, Σ n_events(day) ×
    2^(−weeks_old) at the corpus's last day (half-life one week,
    week-step decay, truncated past 8 half-lives) plus the current
    week's hard count — the "is this user active NOW" features a
    lifetime counter can't express. Day-granular decay is the designed
    fit for the feature store's date-keyed moment ledger: the SAME
    number is served store-side by weighting each date partition's
    n_events at read time (tests pin ledger == one-shot), so recency
    features need no new persisted state at all.

    Determinism — the EWMA lane's dyadic discipline: a smooth
    2^(−days/7) weight is irrational, and an UNORDERED double sum of
    such terms hash-mismatched in the last ulp on the first try
    (engines add in different orders; double addition is not
    associative). Week-step weights 2^(−w) are dyadic, so each term is
    the exact integer n·2^(WMAX−w); the per-user sum is exact integer
    arithmetic, and ONE final division by the constant 2^WMAX (itself a
    power of two — exact scaling) produces the double. The truncation
    at w ≥ 8 is what bounds the numerator — the documented cost of
    engine-exactness, as in events_ewma_daily.

    Scale: volume collapses at the (user, day) rollup — the decay
    arithmetic touches |users| × |days| rows, never raw events; one
    user-keyed exchange."""
    asof = F.lit(_DECAY_ASOF).cast("date")
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    weekly = daily.withColumn(
        "w", (F.datediff(asof, F.col("d")).cast("long") / F.lit(7)).cast("long")
    )
    num = F.expr(
        f"CASE WHEN w < {_DECAY_WMAX} THEN "
        f"n * shiftleft(CAST(1 AS BIGINT), CAST({_DECAY_WMAX} - w AS INT)) "
        "ELSE CAST(0 AS BIGINT) END"
    )
    return weekly.groupBy("user_id").agg(
        (
            F.sum(num).cast("double") / F.lit(float(1 << _DECAY_WMAX))
        ).alias("decayed_activity"),
        F.sum(F.when(F.col("w") == 0, F.col("n")).otherwise(0))
        .cast("long")
        .alias("events_last_week"),
    )


# ---------------------------------------------------------------------------
# Recency-weighted downsampling (training-set thinning with exact IPW)
# ---------------------------------------------------------------------------

_SAMP_WMAX = 8  # acceptance floor: weeks >= 8 keep 1/256 of events
_SAMP_P = 1000000007


@register(
    "sample_recency_decayed",
    oracle=f"""
    WITH w AS (
        SELECT event_id, user_id, event_type,
               GREATEST(LEAST(
                   CAST(DATE '{_DECAY_ASOF}' - CAST(ts AS DATE) AS BIGINT) // 7,
                   {_SAMP_WMAX}), 0) AS weeks_old
        FROM events
    )
    SELECT event_id, user_id, event_type,
           CAST(weeks_old AS BIGINT) AS weeks_old,
           CAST(1 << weeks_old AS BIGINT) AS ipw_weight
    FROM w
    WHERE ((event_id % {_SAMP_P}) * {_NEG_A} % {_SAMP_P}) % (1 << weeks_old) = 0
    """,
    tags=("features", "sampling", "events"),
)
def sample_recency_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted training-set thinning: keep an event with
    probability 2^(−weeks_old) (week-step half-life, floored at
    2^−{_SAMP_WMAX}) via a DETERMINISTIC hash draw, and attach the exact
    inverse-propensity weight 2^weeks_old so any downstream aggregate
    over the sample is unbiased for the full set. The standard move
    when recent behavior matters most but old history is too big to
    keep: the sample's expected volume is geometric in age while every
    epoch, engine, and retry draws the SAME rows (rand() gives none of
    that).

    Determinism: acceptance is ((event_id % P)·A % P) mod 2^w == 0 —
    the negative-sampling lane's overflow-safe Knuth hash, compared
    against dyadic thresholds, so both the draw and the weight are pure
    integers; there is no floating point in the lane at all. The
    acceptance sets are NESTED (x mod 2^(w+1) == 0 implies
    x mod 2^w == 0): an event that survives at age w would also have
    survived at any younger age, so re-running the sampler as the
    corpus ages only ever REMOVES rows — an incremental thinning pass
    can delete in place, never resample.

    Scale: a pure filter inside the scan stage — no shuffle, no window,
    predicate-pushdown-friendly; the hash and the mod run in
    whole-stage codegen per row."""
    # clamp at BOTH ends: events past the as-of would otherwise produce a
    # NEGATIVE shift count — Spark's shiftleft wraps it (count & 63) while
    # DuckDB errors, so the bit-exact twin contract breaks the first time
    # the corpus gains a day past the constant. Age < 0 keeps everything.
    w = F.greatest(
        F.least(
            (F.datediff(F.lit(_DECAY_ASOF).cast("date"), F.to_date("ts")).cast("long")
             / F.lit(7)).cast("long"),
            F.lit(_SAMP_WMAX).cast("long"),
        ),
        F.lit(0).cast("long"),
    )
    draw = (F.col("event_id") % F.lit(_SAMP_P)) * F.lit(_NEG_A) % F.lit(_SAMP_P)
    # shiftleft with a COLUMN shift count needs the SQL form (the PySpark
    # wrapper only takes a literal int)
    pow2 = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(weeks_old AS INT))")
    return (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            w.alias("weeks_old"),
        )
        .filter(draw % pow2 == 0)
        .withColumn("ipw_weight", pow2.cast("long"))
    )
