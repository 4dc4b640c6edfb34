"""Event-time queries over the ``events`` table (SURVEY.md §2.9 EXT rows).

These are the *batch* twins of the streaming semantics implemented in
``streaming/``: tumbling/sliding windows, sessionization, as-of joins.
The same expressions run under ``readStream`` with a watermark — the
batch form is what the DuckDB oracle can check.

Timestamps: parquet stores ns, both engines truncate to µs; all bucket
arithmetic is integer epoch-µs → deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans.decimals import dsum
from data_ingestion_lambda_spark.plans.registry import pin, register
from data_ingestion_lambda_spark.plans._util import t

# Ordering-safe: plans/__init__.py imports llm_ops BEFORE events_queries,
# so this import never changes the registry's registration order.
from data_ingestion_lambda_spark.plans.llm_ops import SQL_POLYHASH, polyhash


@register(
    "events_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window-agg", "streaming-twin"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute event-time windows (epoch-aligned, same as the
    streaming `F.window` + watermark pipeline in streaming/windows.py)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@register(
    "events_sliding_window",
    oracle="""
    SELECT window_start, COUNT(*) AS n_events
    FROM (
        SELECT time_bucket(INTERVAL 5 MINUTE, ts) - (k * INTERVAL 5 MINUTE) AS window_start, ts
        FROM events CROSS JOIN (VALUES (0), (1)) offsets(k)
    )
    GROUP BY window_start
    """,
    tags=("events", "window-agg", "streaming-twin"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 10-minute length, 5-minute slide (each event lands
    in exactly 2 windows; the oracle enumerates both membership offsets)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


@register(
    "events_sessionize",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tagged AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM seq
    )
    SELECT user_id, session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM tagged GROUP BY user_id, session_seq
    """,
    tags=("events", "sessionization", "streaming-twin"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative-sum
    session ids — the batch twin of `session_window(ts, '30 minutes')`.

    Scale: one shuffle on user_id; integer epoch-µs arithmetic only."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    new_session = F.when(
        prev_us.isNull() | (F.unix_micros("ts") - prev_us > gap_us), 1
    ).otherwise(0)
    tagged = e.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return tagged.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


@register(
    "events_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
           ) AS last_click_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    tags=("events", "asof-join"),
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.3 — the one join needing a composed recipe):
    for each purchase, the most recent click by the same user at-or-before.

    Recipe: union both sides, sort within user by (ts, side-order), carry
    the last click timestamp forward with last(ignorenulls) — ONE shuffle
    on user_id, no range explosion; scales linearly in events per user.
    At equal ts the click sorts first (side=0), matching `<=` semantics.
    """
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("side"), F.lit(None).cast("bigint").alias("event_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id",
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 1).select("event_id", "user_id", "ts", "last_click_ts")


@register(
    "events_asof_join_tolerance",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
           ) AS last_click_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    tags=("events", "asof-join"),
)
def events_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas ``merge_asof(tolerance=...)``):
    the most recent same-user click at-or-before each purchase, but only
    if it falls within the last hour — older matches become NULL (stale
    attribution is worse than none). Same one-shuffle union recipe as
    events_asof_join; the tolerance is a row-local post-filter on the
    carried timestamp, so the plan — and its scaling — is identical to
    the unbounded variant's single user-keyed sort."""
    matched = events_asof_join(spark, sf_dir)
    within = F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return matched.select(
        "event_id", "user_id", "ts",
        F.when(within, F.col("last_click_ts")).alias("last_click_ts"),
    )


@register(
    "events_asof_join_forward",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT MIN(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts >= p.ts
           ) AS next_click_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    tags=("events", "asof-join"),
)
def events_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — the mirror of events_asof_join: for each
    purchase, the EARLIEST click by the same user at-or-after it (the
    direction a "what did the user do next" attribution needs; pandas
    calls this merge_asof(direction='forward')).

    Recipe mirrors the backward one with the frame reversed: union both
    sides, one user-keyed sort, and carry the next click timestamp with
    ``first(click_ts, ignorenulls=True)`` over (currentRow,
    unboundedFollowing). At equal ts the click sorts first (side=0)
    INSIDE the forward frame, matching ``>=``. Still ONE shuffle on
    user_id, no range join, linear in events per user."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("side"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id",
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("side"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "next_click_ts", F.first("click_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id", "user_id", "ts", "next_click_ts"
    )


@register(
    "events_json_topk",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY total_k DESC, user_id
    LIMIT 10
    """,
    tags=("events", "json", "topk"),
)
def events_json_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-payload aggregation + top-k (integer sums — exact)."""
    e = t(spark, sf_dir, "events")
    return (
        e.withColumn("k_val", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("user_id")
        .agg(F.sum("k_val").alias("total_k"), F.count("*").alias("n_events"))
        .orderBy(F.desc("total_k"), F.asc("user_id"))
        .limit(10)
    )


@register(
    "events_pivot_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) FILTER (event_type = 'click')    AS click,
           COUNT(*) FILTER (event_type = 'error')    AS error,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup')   AS signup,
           COUNT(*) FILTER (event_type = 'view')     AS view
    FROM events GROUP BY 1
    """,
    tags=("events", "pivot"),
)
def events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily event counts by type (explicit value list → stable
    schema, single-pass conditional aggregation)."""
    e = t(spark, sf_dir, "events")
    return (
        e.withColumn("day", F.to_date(F.date_trunc("day", "ts")))
        .groupBy("day")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "events_interval_join",
    oracle="""
    SELECT a.event_id AS click_id,
           b.event_id AS purchase_id,
           a.user_id,
           CAST(b.value AS DOUBLE) AS purchase_value
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts
     AND b.ts <= a.ts + INTERVAL 10 MINUTE
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    """,
    tags=("events", "join", "streaming-twin"),
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/events.py::stream_stream_interval_join —
    click→purchase attribution within 10 minutes, per user.

    Scale: equi-key on user_id carries the join (shuffle-hash/sort-merge
    on the key), with the time range as a residual condition — NOT a
    broadcast-nested-loop; state/skew behavior is the per-user fan-out.
    The streaming form is identical plus watermarks bounding buffered
    state on both sides."""
    e = t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").alias("a")
    b = e.filter(F.col("event_type") == "purchase").alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") >= F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTE")),
    ).select(
        F.col("a.event_id").alias("click_id"),
        F.col("b.event_id").alias("purchase_id"),
        F.col("a.user_id").alias("user_id"),
        F.col("b.value").alias("purchase_value"),
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "events_unpivot_daily",
    oracle=f"""
    WITH days AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
    types AS (
        SELECT UNNEST([{", ".join(f"'{t_}'" for t_ in _EVENT_TYPES)}]) AS event_type),
    counts AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2)
    SELECT d.day, t.event_type, COALESCE(c.n, 0) AS n
    FROM days d
    CROSS JOIN types t
    LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
    """,
    tags=("events", "agg"),
)
def events_unpivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the daily pivot table back to long form — one
    (day, event_type, n) row per cell INCLUDING the explicit zeros the
    pivot's fill created, which is what distinguishes unpivot semantics
    from a plain re-aggregation (the oracle rebuilds the dense grid with
    a days x types cross join). Wide->long is a per-row Expand, no
    shuffle beyond the upstream pivot's."""
    wide = events_pivot_daily(spark, sf_dir)
    return wide.unpivot("day", list(_EVENT_TYPES), "event_type", "n")


_ENRICH_DIM = (
    ("click", "engagement"),
    ("view", "engagement"),
    ("purchase", "revenue"),
    ("signup", "growth"),
    # 'error' deliberately unmapped -> left-join NULL category
)


@register(
    "events_enrich_static",
    oracle=f"""
    WITH dim(event_type, category) AS (
        VALUES {", ".join(f"('{et}', '{cat}')" for et, cat in _ENRICH_DIM)}
    )
    SELECT d.category, e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events e LEFT JOIN dim d USING (event_type)
    GROUP BY 1, 2
    """,
    tags=("events", "join", "streaming-twin"),
)
def events_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.events.stream_static_enrich — the SAME
    operator function (broadcast left join against a small static
    dimension), aggregated per (category, event_type) so the oracle pins
    the join semantics including the unmapped-type NULL row. Under
    readStream the identical expression runs per micro-batch; the pytest
    suite pins the plan shape (BroadcastHashJoin, stream side
    unshuffled), this row pins the values."""
    from data_ingestion_lambda_spark.streaming.events import stream_static_enrich

    e = t(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        list(_ENRICH_DIM), "event_type string, category string"
    )
    return (
        stream_static_enrich(e, dim, on="event_type", how="left")
        .groupBy("category", "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
    )


@register(
    "events_funnel",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)                            AS n_users,
           CAST(count(*) FILTER (t1 IS NOT NULL) AS BIGINT)    AS n_viewed,
           CAST(count(*) FILTER (t2 IS NOT NULL) AS BIGINT)    AS n_clicked_after_view,
           CAST(count(*) FILTER (t3 IS NOT NULL) AS BIGINT)    AS n_purchased_after_click
    FROM (
        SELECT user_id, max(t1) AS t1, max(t2) AS t2,
               min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END) AS t3
        FROM (
            SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                          OVER (PARTITION BY user_id) AS t2
            FROM (
                SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
                              OVER (PARTITION BY user_id) AS t1
                FROM events
            )
        )
        GROUP BY user_id
    )
    """,
    tags=("events", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): per user, the first
    view, the first click strictly after it, the first purchase strictly
    after that; global stage counts.

    Plan (reformulated r6 after the scale probe measured the two-window
    shape 9.7x wall at 30x data): ONE conditional aggregation per user —
    t1 is a plain ``min(when(view))``; the later stages need the
    already-resolved earlier timestamp, so the aggregation collects the
    user's click/purchase timestamps as sorted arrays and the chain
    ``t2 = array_min(filter(clicks, c > t1))``,
    ``t3 = array_min(filter(purchases, p > t2))`` resolves row-locally
    after the shuffle. No window, no per-user sort of all events, one
    user-keyed exchange with map-side partial aggregation, then a
    singleton count — where the old shape buffered every user's FULL
    event rows twice through two WindowExecs. Agg state per user is its
    click/purchase timestamps only (not rows, not views); a NULL earlier
    stage propagates as an empty filter -> NULL array_min, exactly the
    oracle's semantics. Measured 1.37x wall at 10x and 1.95x at 30x
    (SCALE.md) vs 9.7x at 30x for the windowed shape.
    events_funnel_users keeps the windowed formulation as the per-user
    detail twin."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1"),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
        ).alias("clicks"),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("purchases"),
    )
    stepped = per_user.withColumn(
        "t2", F.array_min(F.filter("clicks", lambda c: c > F.col("t1")))
    ).withColumn("t3", F.array_min(F.filter("purchases", lambda p: p > F.col("t2"))))
    return stepped.agg(
        F.count("*").alias("n_users"),
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after_view"),
        F.count("t3").alias("n_purchased_after_click"),
    )


@register(
    "events_retention_cohorts",
    oracle="""
    SELECT cohort_day, offset_days,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
    FROM (
        SELECT user_id,
               CAST(min(ts) OVER (PARTITION BY user_id) AS DATE) AS cohort_day,
               CAST(datediff('day', CAST(min(ts) OVER (PARTITION BY user_id) AS DATE),
                             CAST(ts AS DATE)) AS INTEGER) AS offset_days
        FROM events
    )
    GROUP BY cohort_day, offset_days
    """,
    tags=("events", "retention"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by the date of their first
    event, counted distinct on each day-offset they return. One
    user_id-keyed exchange for the first-seen window, one agg shuffle on
    the (cohort, offset) grid — the output is bounded by days², never by
    row count."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    cohort = F.to_date(F.min("ts").over(w))
    return (
        e.select(
            "user_id",
            cohort.alias("cohort_day"),
            F.datediff(F.to_date("ts"), cohort).cast("int").alias("offset_days"),
        )
        .groupBy("cohort_day", "offset_days")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "events_retention_cohorts_approx",
    oracle=None,  # HLL sketches don't hash-match across engines (the
    # profile_table_approx precedent); rows-only checked, exact twin above
    tags=("events", "retention", "approx"),
)
def events_retention_cohorts_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of events_retention_cohorts: identical cohort grid
    with ``approx_count_distinct`` (HyperLogLog++, 1% rsd) replacing the
    exact distinct — the exact variant shuffles every (grid-cell,
    user_id) pair to deduplicate (its measured growth term: 7.4× wall at
    100× events), while HLL sketches merge map-side so the shuffle
    carries one ~kB sketch per grid cell regardless of user count. Same
    exact-is-the-gauge / sketch-is-the-scale-path pairing as
    profile_table vs profile_table_approx."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    cohort = F.to_date(F.min("ts").over(w))
    return (
        e.select(
            "user_id",
            cohort.alias("cohort_day"),
            F.datediff(F.to_date("ts"), cohort).cast("int").alias("offset_days"),
        )
        .groupBy("cohort_day", "offset_days")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("n_active_approx"))
    )


@register(
    "events_funnel_users",
    oracle="""
    SELECT user_id,
           t1 AS first_view, t2 AS first_click, t3 AS first_purchase,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS INTEGER) AS stage
    FROM (
        SELECT user_id, max(t1) AS t1, max(t2) AS t2,
               min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END) AS t3
        FROM (
            SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                          OVER (PARTITION BY user_id) AS t2
            FROM (
                SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
                              OVER (PARTITION BY user_id) AS t1
                FROM events
            )
        )
        GROUP BY user_id
    )
    """,
    tags=("events", "funnel"),
)
def events_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel detail (the row-level twin of events_funnel's global
    counts): each user's first view, first click strictly after it, first
    purchase strictly after that, and the reached stage 0-3. Same
    single-user-exchange plan as events_funnel; also the batch reference
    for the streaming stateful funnel (stream_funnel_progress) — a
    single-trigger stream over the same events must reproduce these rows
    exactly (pinned in tests/test_streaming_events.py)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = e.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    s2 = s1.withColumn("t2", t2)
    per_user = s2.groupBy("user_id").agg(
        F.max("t1").alias("first_view"),
        F.max("t2").alias("first_click"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).alias("first_purchase"),
    )
    stage = (
        F.when(F.col("first_purchase").isNotNull(), 3)
        .when(F.col("first_click").isNotNull(), 2)
        .when(F.col("first_view").isNotNull(), 1)
        .otherwise(0)
        .cast("int")
    )
    return per_user.select(
        "user_id", "first_view", "first_click", "first_purchase", stage.alias("stage")
    )


_MAD_K = 1.5


@register(
    "events_anomaly_mad",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    j AS (
        SELECT e.event_type, abs(e.value - m.med) AS dev, m.med
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(dev, 0.5) AS mad
        FROM j GROUP BY event_type
    )
    SELECT j.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (j.dev > {_MAD_K} * mad.mad) AS BIGINT) AS n_anomalies,
           max(j.med) AS med,
           max(mad.mad) AS mad
    FROM j JOIN mad USING (event_type)
    GROUP BY j.event_type
    """,
    tags=("events", "anomaly"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event type: flag events whose value
    deviates from the type median by more than K x MAD (median absolute
    deviation — outlier-resistant where stddev is not). Exact interpolated
    percentiles (Spark `percentile` == DuckDB `quantile_cont`, the parity
    agg_approx_percentile established); no double SUM anywhere, so the
    whole query is engine-deterministic. Three aggregations over the
    5-value type key with broadcast joins back to the stream — at 100 TB
    the only full-data passes are scan-parallel, but each type's exact
    median buffers that type's full value multiset in one task; the
    distributed swap is SHIPPED as events_anomaly_mad_hist
    (cent-resolution bucket histogram), with this exact variant kept as
    its interpolated gauge."""
    e = t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    j = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("dev"), "med"
    )
    mad = j.groupBy("event_type").agg(F.percentile("dev", 0.5).alias("mad"))
    return (
        j.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("dev") > _MAD_K * F.col("mad"), 1)).alias("n_anomalies"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
        )
    )


@register(
    "events_user_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purchases,
           CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_cents,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY user_id
    """,
    tags=("events",),
)
def events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime stats — the batch reference for the Spark 4
    ``transformWithStateInPandas`` streaming operator (stream_user_stats):
    a single-trigger stream over the same events must reproduce these rows
    exactly, which works because monetary values aggregate as integer
    cents via floor(x*100 + 0.5) (associative exact arithmetic — a double
    SUM would make stream-batch equality ulp-fragile). One user-keyed
    exchange; counts and the max combine map-side."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("value_cents"),
        F.max("ts").alias("last_ts"),
    )


@register(
    "events_resample_hourly_ff",
    oracle="""
    WITH e AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    hourly AS (
        SELECT event_type, h, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS c
        FROM e GROUP BY event_type, h
    ),
    b AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM e),
    grid AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM e) t,
             b,
             UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS g(h)
    )
    SELECT grid.event_type,
           grid.h AS hour_ts,
           CAST(COALESCE(hourly.n, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(hourly.c, 0) AS BIGINT) AS cents_in_hour,
           last_value(hourly.c IGNORE NULLS) OVER (
               PARTITION BY grid.event_type ORDER BY grid.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS ff_cents
    FROM grid LEFT JOIN hourly
      ON grid.event_type = hourly.event_type AND grid.h = hourly.h
    """,
    tags=("events", "timeseries"),
)
def events_resample_hourly_ff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap-fill: project the event stream onto
    a dense hourly grid per event type and forward-fill the last observed
    hourly total across empty hours (``last(..., ignorenulls=True)`` over
    an ordered frame — the carry-forward every monitoring/feature pipeline
    needs, since a missing hour means "nothing arrived", not "zero
    signal"). Empty hours keep n_events = 0 and a NULL forward-fill before
    the first observation — both semantics pinned by the oracle.

    Scale: one (type, hour) shuffle for the hourly rollup; the grid is a
    broadcast 1-row bounds aggregate crossed with the distinct types, so
    its size is types x span-hours — bounded by the CLOCK, not the event
    volume; the forward-fill window partitions by type and orders over
    grid rows only. Resampling per-entity instead (user, sensor) keeps
    the identical plan with the window partitioned by entity — each
    partition is that entity's own span, never the corpus. Monetary sums
    are integer cents (floor(x*100 + 0.5)), engine-deterministic."""
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("h"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    hourly = e.groupBy("event_type", "h").agg(
        F.count("*").alias("n"), F.sum("cents").alias("c")
    )
    bounds = e.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("hour_ts"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("cents_in_hour"),
            F.last("c", ignorenulls=True).over(w).alias("ff_cents"),
        )
    )


@register(
    "events_resample_hourly_interp",
    oracle="""
    WITH e AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    hourly AS (
        SELECT event_type, h, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS c
        FROM e GROUP BY event_type, h
    ),
    b AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM e),
    grid AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM e) t,
             b,
             UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS g(h)
    ),
    j AS (
        SELECT grid.event_type, grid.h, hourly.n, hourly.c,
               row_number() OVER (
                   PARTITION BY grid.event_type ORDER BY grid.h) AS rn
        FROM grid LEFT JOIN hourly
          ON grid.event_type = hourly.event_type AND grid.h = hourly.h
    ),
    w AS (
        SELECT *,
            last_value(c IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c0,
            last_value(CASE WHEN c IS NOT NULL THEN rn END IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rn0,
            first_value(c IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS c1,
            first_value(CASE WHEN c IS NOT NULL THEN rn END IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rn1
        FROM j
    )
    SELECT event_type, h AS hour_ts,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           CASE WHEN c IS NOT NULL THEN CAST(c AS DOUBLE)
                WHEN c0 IS NOT NULL AND c1 IS NOT NULL
                THEN c0 + CAST((c1 - c0) * (rn - rn0) AS DOUBLE) / (rn1 - rn0)
           END AS interp_cents
    FROM w
    """,
    tags=("events", "timeseries"),
)
def events_resample_hourly_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation twin of events_resample_hourly_ff: empty grid
    hours get the straight line between the PREVIOUS and NEXT observed
    hourly totals instead of a carry-forward — the gap-fill a trend
    feature wants where forward-fill builds staircases. Hours outside the
    observed span (before the first / after the last observation) stay
    NULL, and observed hours pass through exactly — both pinned by the
    oracle.

    Determinism of the double result: the interpolation distance is the
    ROW offset on the dense grid (integer row_number deltas — no
    timestamp arithmetic), the numerator (c1-c0)*(rn-rn0) is exact
    BIGINT, and the expression performs exactly ONE rounding step (the
    cast-then-divide) in both engines, so the IEEE result hash-matches.

    Scale: identical shape to the ff variant — one (type, hour) rollup
    exchange; grid bounded by the clock; all four ignorenulls window
    passes share one (event_type, h) sort, partitions are each type's own
    span, never event volume."""
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("h"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    hourly = e.groupBy("event_type", "h").agg(
        F.count("*").alias("n"), F.sum("cents").alias("c")
    )
    bounds = e.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    wn = Window.partitionBy("event_type").orderBy("h")
    wp = wn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = wn.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    j = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type", "h", "n", "c", F.row_number().over(wn).alias("rn")
    )
    obs_rn = F.when(F.col("c").isNotNull(), F.col("rn"))
    w = j.select(
        "event_type",
        "h",
        "n",
        "c",
        "rn",
        F.last("c", ignorenulls=True).over(wp).alias("c0"),
        F.last(obs_rn, ignorenulls=True).over(wp).alias("rn0"),
        F.first("c", ignorenulls=True).over(wf).alias("c1"),
        F.first(obs_rn, ignorenulls=True).over(wf).alias("rn1"),
    )
    num = (F.col("c1") - F.col("c0")) * (F.col("rn") - F.col("rn0"))
    interp = F.when(F.col("c").isNotNull(), F.col("c").cast("double")).otherwise(
        F.when(
            F.col("c0").isNotNull() & F.col("c1").isNotNull(),
            F.col("c0") + num.cast("double") / (F.col("rn1") - F.col("rn0")),
        )
    )
    return w.select(
        "event_type",
        F.col("h").alias("hour_ts"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        interp.alias("interp_cents"),
    )


# Shared SQL text: the full SCD2 derivation — used verbatim by the lane
# below and composed into the as-of read's oracle so the two can never
# drift.
_SCD2_SQL = """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type AS segment,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_segment
        FROM events
    ),
    changes AS (
        SELECT user_id, ts AS valid_from, segment
        FROM ordered
        WHERE prev_segment IS NULL OR prev_segment <> segment
    )
    SELECT user_id, segment, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               IS NULL AS is_current
    FROM changes
"""


@register(
    "scd2_user_segments",
    oracle=_SCD2_SQL,
    tags=("events", "scd"),
)
def scd2_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 derived from a change stream: each
    user's event_type is treated as a tracked attribute; consecutive
    repeats collapse (lag over (ts, event_id) — the unique tiebreak), and
    every surviving change opens a version row with ``valid_from`` /
    ``valid_to`` = next change (NULL + ``is_current`` on the open row).
    This batch derivation is ALSO the semantic spec for the incremental
    ``operators/scd2.py::apply_scd2`` sink: applying the same events in
    chronological batches must produce exactly these rows (pinned in
    tests/test_scd2.py) — the same stream-batch equivalence discipline as
    the funnel and user-stats lanes.

    Scale: two windows over one user-keyed exchange (lag and lead share
    the partitioning); no joins, no driver state."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select(
            "user_id", "ts", "event_id", F.col("event_type").alias("segment")
        )
        .withColumn("prev_segment", F.lag("segment").over(w))
        .filter(
            F.col("prev_segment").isNull()
            | (F.col("prev_segment") != F.col("segment"))
        )
        .select("user_id", F.col("ts").alias("valid_from"), "segment")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return changes.select(
        "user_id",
        "segment",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


@register(
    "events_seasonality_profile",
    oracle="""
    SELECT CAST(dayofweek(ts) AS INTEGER) AS dow,
           CAST(hour(ts) AS INTEGER) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events
    GROUP BY dayofweek(ts), hour(ts)
    """,
    tags=("events", "timeseries"),
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal load profile: the day-of-week × hour-of-day grid of event
    volume, active users, and integer-cent value — the seasonality
    fingerprint capacity planning and anomaly baselines read (the MAD
    detector flags outliers; this is the shape normal load follows).
    Output is a fixed 7×24-bounded grid regardless of stream size; one
    grid-keyed aggregation with map-side combine (the distinct-user count
    is the only term that shuffles raw keys). Convention note: Spark's
    dayofweek is Sunday=1, DuckDB's is Sunday=0 — the Spark side
    subtracts 1 so both emit 0-6; alignment is pinned by the hash
    check."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.dayofweek("ts") - F.lit(1)).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000  # the sessionize gap this op justifies


@register(
    "events_interarrival_stats",
    oracle=f"""
    WITH deltas AS (
        SELECT CAST(epoch_us(ts) -
                    LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
               AS BIGINT) AS gap_us
        FROM events
    )
    SELECT CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           quantile_cont(gap_us, 0.5) AS p50_us,
           quantile_cont(gap_us, 0.9) AS p90_us,
           quantile_cont(gap_us, 0.99) AS p99_us,
           CAST(COUNT(*) FILTER (WHERE gap_us < {_SESSION_GAP_US}) AS BIGINT)
               AS n_within_session_gap
    FROM deltas WHERE gap_us IS NOT NULL
    """,
    tags=("events", "timeseries"),
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival distribution of per-user event gaps — the measurement
    that JUSTIFIES the sessionize gap (events_sessionize cuts sessions at
    30 minutes; this table says where that threshold sits against the
    real p50/p90/p99 gap distribution, and how many observed gaps fall
    inside it). Session-gap choices made without this table are folklore;
    with it they are a percentile.

    Deltas are exact integer microseconds from a lag over the same
    (user_id, (ts, event_id)) ordering sessionize uses; the exact
    interpolated percentiles ride the Spark `percentile` == DuckDB
    `quantile_cont` parity the MAD detector established. One user-keyed
    exchange for the lag, then a single-row global aggregate.

    Scale cap, stated plainly: EXACT interpolated percentiles buffer the
    full delta multiset in the final aggregation (that exactness is what
    makes the oracle hash-match) — fine to ~10^8 gaps, not at 10^11.
    The 100 TB path is SHIPPED as events_interarrival_hist (integer
    bucket histogram: exact at second resolution, fully distributed,
    still oracle-hashable); this exact variant stays registered as its
    interpolated-percentile gauge, the same exact-vs-scale pairing as
    profile_table / profile_table_approx."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = (F.unix_micros(F.col("ts")))
    deltas = e.select(
        (us - F.lag(us).over(w)).cast("long").alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return deltas.agg(
        F.count("gap_us").alias("n_gaps"),
        F.percentile("gap_us", 0.5).alias("p50_us"),
        F.percentile("gap_us", 0.9).alias("p90_us"),
        F.percentile("gap_us", 0.99).alias("p99_us"),
        F.count(F.when(F.col("gap_us") < _SESSION_GAP_US, 1)).alias(
            "n_within_session_gap"
        ),
    )


_HIST_BUCKET_US = 1_000_000  # second-resolution buckets; coarsen to scale
_SESSION_GAP_S = _SESSION_GAP_US // _HIST_BUCKET_US
_CUM_COARSE = 86_400  # buckets per local-cumsum partition (one day of seconds)


@register(
    "events_interarrival_hist",
    oracle=f"""
    WITH deltas AS (
        SELECT CAST(epoch_us(ts) -
                    LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
               AS BIGINT) AS gap_us
        FROM events
    ),
    hist AS (
        SELECT gap_us // {_HIST_BUCKET_US} AS gap_s, COUNT(*) AS cnt
        FROM deltas WHERE gap_us IS NOT NULL GROUP BY 1
    ),
    cum AS (
        SELECT gap_s, cnt,
               SUM(cnt) OVER (ORDER BY gap_s ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist
    ),
    tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_gaps,
               CAST(COALESCE(SUM(CASE WHEN gap_s < {_SESSION_GAP_S}
                                      THEN cnt END), 0) AS BIGINT) AS n_within
        FROM hist
    )
    SELECT tot.n_gaps,
           CAST(MIN(CASE WHEN cum.cum * 100 >= tot.n_gaps * 50
                         THEN cum.gap_s END) AS BIGINT) AS p50_s,
           CAST(MIN(CASE WHEN cum.cum * 100 >= tot.n_gaps * 90
                         THEN cum.gap_s END) AS BIGINT) AS p90_s,
           CAST(MIN(CASE WHEN cum.cum * 100 >= tot.n_gaps * 99
                         THEN cum.gap_s END) AS BIGINT) AS p99_s,
           tot.n_within AS n_within_session_gap
    FROM cum, tot
    GROUP BY tot.n_gaps, tot.n_within
    """,
    tags=("events", "timeseries"),
)
def events_interarrival_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-safe twin of events_interarrival_stats: the SAME
    per-user gap distribution, but with percentiles computed from an
    integer-bucket HISTOGRAM instead of an exact-interpolation aggregate
    that buffers every gap in one task. Gaps bucket to whole seconds
    (gaps are integer µs, so ``gap_us div 1e6`` is exact flooring), the
    bucket counts roll up distributed with map-side combine, and the
    p-th percentile is the smallest bucket whose cumulative count covers
    p% of gaps (type-1 lower quantile — exact AT SECOND RESOLUTION, and
    all-integer, so the oracle hash-matches where a t-digest sketch
    could not).

    Scale: the full-data passes are the lag (one user-keyed exchange,
    shared with sessionize) and the bucket rollup (map-side combined to
    one row per distinct gap-second). Only BUCKET rows survive that —
    bounded by the observed gap SPAN in seconds, never by event volume —
    and the cumulative count over them is a TWO-PHASE distributed prefix
    sum: partition-local cumsum within day-sized coarse ranges
    (_CUM_COARSE buckets per window partition), plus a prefix over the
    days-sized per-range totals; no task ever windows more than one
    day's worth of second buckets, so even a decade-long gap span never
    concentrates in one task. _HIST_BUCKET_US stays the resolution knob.
    The within-session count is derivable exactly from the histogram
    because the session gap (30 min) is a whole-bucket boundary. This
    row flips events_interarrival_stats' documented cap into a shipped,
    oracle-checked operator; the exact variant stays registered as the
    interpolated-percentile gauge."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    hist = (
        e.select((us - F.lag(us).over(w)).cast("long").alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
        .groupBy(F.expr(f"gap_us div {_HIST_BUCKET_US}").alias("gap_s"))
        .agg(F.count("*").alias("cnt"))
    )
    return gap_hist_quantiles(hist)


def gap_hist_quantiles(hist: DataFrame) -> DataFrame:
    """The percentile stage of events_interarrival_hist, factored over any
    (gap_s, cnt) second-bucket histogram — the batch derivation above and
    the streaming gap LEDGER (streaming/events.py::gap_quantiles_from_ledger)
    both feed it, so the stream→ledger→compact path provably yields the
    registered operator's numbers (pinned in tests/test_streaming_events.py).
    Two-phase distributed prefix sum as documented on the caller."""
    hist = hist.withColumn("coarse", F.expr(f"gap_s div {_CUM_COARSE}"))
    wl = (
        Window.partitionBy("coarse")
        .orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # offsets: cumulative count of all STRICTLY EARLIER coarse ranges —
    # a tiny (days-sized) table, windowed whole and broadcast back
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
    tot = hist.agg(
        F.sum("cnt").cast("long").alias("n_gaps"),
        F.coalesce(
            F.sum(F.when(F.col("gap_s") < _SESSION_GAP_S, F.col("cnt"))), F.lit(0)
        )
        .cast("long")
        .alias("n_within"),
    )

    def pctl(p: int) -> F.Column:
        return F.min(
            F.when(F.col("cum") * 100 >= F.col("n_gaps") * p, F.col("gap_s"))
        ).cast("long")

    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_gaps", "n_within")
        .agg(
            pctl(50).alias("p50_s"),
            pctl(90).alias("p90_s"),
            pctl(99).alias("p99_s"),
        )
        .select(
            "n_gaps", "p50_s", "p90_s", "p99_s",
            F.col("n_within").alias("n_within_session_gap"),
        )
    )


@register(
    "events_anomaly_mad_hist",
    oracle=f"""
    WITH c AS (
        SELECT event_type,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    h1 AS (SELECT event_type, cents, COUNT(*) AS cnt FROM c GROUP BY 1, 2),
    n1 AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_events
           FROM h1 GROUP BY 1),
    med AS (
        SELECT h.event_type,
               MIN(CASE WHEN 2 * h.cum >= n1.n_events THEN h.cents END) AS med_cents
        FROM (SELECT event_type, cents, cnt,
                     SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                                    ROWS UNBOUNDED PRECEDING) AS cum
              FROM h1) h
        JOIN n1 USING (event_type)
        GROUP BY h.event_type
    ),
    h2 AS (
        SELECT c.event_type, abs(c.cents - med.med_cents) AS dev, COUNT(*) AS cnt
        FROM c JOIN med USING (event_type) GROUP BY 1, 2
    ),
    mad AS (
        SELECT h.event_type,
               MIN(CASE WHEN 2 * h.cum >= n1.n_events THEN h.dev END) AS mad_cents
        FROM (SELECT event_type, dev, cnt,
                     SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev
                                    ROWS UNBOUNDED PRECEDING) AS cum
              FROM h2) h
        JOIN n1 USING (event_type)
        GROUP BY h.event_type
    )
    SELECT h2.event_type,
           n1.n_events,
           CAST(COALESCE(SUM(CASE WHEN 2 * h2.dev > 3 * mad.mad_cents
                                  THEN h2.cnt END), 0) AS BIGINT) AS n_anomalies,
           CAST(MAX(med.med_cents) AS BIGINT) AS med_cents,
           CAST(MAX(mad.mad_cents) AS BIGINT) AS mad_cents
    FROM h2 JOIN mad USING (event_type) JOIN med USING (event_type)
            JOIN n1 USING (event_type)
    GROUP BY h2.event_type, n1.n_events
    """,
    tags=("events", "anomaly"),
)
def events_anomaly_mad_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed-percentile twin of events_anomaly_mad: K×MAD
    outlier flagging with the median and the MAD both computed from
    integer CENT-resolution histograms (the same bucket-cumulative-count
    recipe as events_interarrival_hist) instead of exact-interpolation
    percentile aggregates that buffer a type's full value multiset in
    one task. ``floor(value*100 + 0.5)`` is the engine-deterministic
    cents cast the ingest lanes already use; the median is the smallest
    cent bucket covering half the type's rows (type-1 — exact at cent
    resolution); dev > 1.5×MAD is tested as the all-integer
    ``2*dev > 3*mad``, so every emitted number is integer-exact.

    Scale: three full-data passes, all scan-parallel with map-side
    combine (two bucket rollups + the final anomaly count); the
    cumulative windows run per event type over BUCKET rows — bounded by
    the VALUE DOMAIN in cents (49k buckets here), never by row count,
    which is exactly the cap the exact variant couldn't shed. A skewed
    type with 10^10 events costs the same window width as a small one."""
    e = t(spark, sf_dir, "events")
    c = e.select(
        "event_type",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    h1 = c.groupBy("event_type", "cents").agg(F.count("*").alias("cnt"))
    n1 = h1.groupBy("event_type").agg(F.sum("cnt").cast("long").alias("n_events"))
    wt = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    med = (
        h1.withColumn("cum", F.sum("cnt").over(wt))
        .join(F.broadcast(n1), "event_type")
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(2 * F.col("cum") >= F.col("n_events"), F.col("cents"))
            ).alias("med_cents")
        )
    )
    h2 = (
        c.join(F.broadcast(med), "event_type")
        .select("event_type", F.abs(F.col("cents") - F.col("med_cents")).alias("dev"))
        .groupBy("event_type", "dev")
        .agg(F.count("*").alias("cnt"))
    )
    wd = (
        Window.partitionBy("event_type")
        .orderBy("dev")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    mad = (
        h2.withColumn("cum", F.sum("cnt").over(wd))
        .join(F.broadcast(n1), "event_type")
        .groupBy("event_type")
        .agg(
            F.min(F.when(2 * F.col("cum") >= F.col("n_events"), F.col("dev"))).alias(
                "mad_cents"
            )
        )
    )
    return (
        h2.join(F.broadcast(mad), "event_type")
        .join(F.broadcast(med), "event_type")
        .join(F.broadcast(n1), "event_type")
        .groupBy("event_type", "n_events")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(2 * F.col("dev") > 3 * F.col("mad_cents"), F.col("cnt"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_anomalies"),
            F.max("med_cents").cast("long").alias("med_cents"),
            F.max("mad_cents").cast("long").alias("mad_cents"),
        )
        .select("event_type", "n_events", "n_anomalies", "med_cents", "mad_cents")
    )


@register(
    "events_trend_slope",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx,
               SUM(y) AS sy,
               SUM(x * y) AS sxy,
               SUM(x * x) AS sxx
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
               CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope_per_day,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
               (CAST(sy AS DOUBLE)
                - CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE)
           END AS intercept_at_epoch
    FROM s
    """,
    tags=("events", "timeseries"),
)
def events_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of DAILY volume: slope
    (events/day/day) and intercept — the drift detector behind traffic
    dashboards ("is purchase volume growing or decaying, and how fast").

    Determinism: the classic closed form slope = (n·Σxy − Σx·Σy) /
    (n·Σx² − (Σx)²) over (x = epoch day, y = daily count) — every moment
    is an exact integer aggregate (associative, partition-order-free;
    Spark sums in decimal(38,0), DuckDB in HUGEINT — Σxy crosses 2^63
    within ~a year of 1e12-events-per-day history, so 8-byte moments
    would silently wrap), and the only floating-point steps are the
    final divisions, identical single IEEE operations in both engines.
    No avg()/covar() built-ins, whose double accumulation order differs
    per engine/partitioning.

    Scale: two map-side-combinable aggregations — (type, day) rollup,
    then 5 integer moments over the day rows (|types|·|days| rows, data-
    volume-free); one exchange each."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("long").alias("x"),
        )
        .groupBy("event_type", "x")
        .agg(F.count("*").alias("y"))
    )
    DEC38 = "decimal(38,0)"
    s = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(DEC38)).alias("sx"),
        F.sum(F.col("y").cast(DEC38)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(DEC38)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(DEC38)).alias("sxx"),
    )
    nd = F.col("n").cast(DEC38)
    den = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = num.cast("double") / den.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.when(den != 0, slope).alias("slope_per_day"),
        F.when(den != 0, intercept).alias("intercept_at_epoch"),
    )


# Half-life-one-day smoothing, truncated at 7 taps: weights 2^-k are
# represented as INTEGER weights 2^(6-k) over the numerator AND the
# denominator, so the whole kernel is exact integer arithmetic and the
# only floating-point step is the final division. 7 taps carry >= 99.2%
# of the untruncated geometric mass.
_EWMA_TAPS = 7


@register(
    "events_ewma_daily",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, day, n_events,
               {', '.join(f"lag(n_events, {k}) OVER (PARTITION BY event_type ORDER BY day) AS y{k}" for k in range(1, _EWMA_TAPS))}
        FROM daily
    )
    SELECT event_type, day, n_events,
           CAST(n_events * {2 ** (_EWMA_TAPS - 1)}
                + {' + '.join(f"COALESCE(y{k} * {2 ** (_EWMA_TAPS - 1 - k)}, 0)" for k in range(1, _EWMA_TAPS))}
                AS DOUBLE)
           / ({2 ** (_EWMA_TAPS - 1)}
              + {' + '.join(f"CASE WHEN y{k} IS NOT NULL THEN {2 ** (_EWMA_TAPS - 1 - k)} ELSE 0 END" for k in range(1, _EWMA_TAPS))})
           AS ewma
    FROM lagged
    """,
    tags=("events", "timeseries"),
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event volume per
    type (half-life one day, 7-tap truncation) — the smoothed trend line
    ops dashboards draw over noisy daily counts, and the baseline the
    anomaly lanes compare spikes against.

    Determinism: the geometric weights 1/2^k are dyadic, so the kernel is
    computed as integer numerator Σ y_{t-k}·2^(6-k) over integer
    denominator Σ 2^(6-k) (missing leading taps drop out of BOTH sums —
    the standard adjusted-EWMA debias) and ONE final IEEE division —
    hash-identical across engines, unlike any accumulate-in-double
    formulation.

    Scale: volume collapses at the (type, day) rollup (map-side combine,
    one exchange); the 7 lag taps share ONE window sort over day rows —
    |types| x |days| = calendar-bounded, independent of event volume."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lags = [F.col("n_events")] + [
        F.lag("n_events", k).over(w) for k in range(1, _EWMA_TAPS)
    ]
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for k, yk in enumerate(lags):
        wt = 2 ** (_EWMA_TAPS - 1 - k)
        num = num + F.coalesce(yk * wt, F.lit(0))
        den = den + F.when(yk.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
    return daily.select(
        "event_type",
        "day",
        "n_events",
        (num.cast("double") / den).alias("ewma"),
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type AS from_type, event_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    outdeg AS (
        SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS n_out
        FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n_trans,
           CAST(t.n_trans AS DOUBLE) / o.n_out AS p
    FROM trans t JOIN outdeg o USING (from_type)
    """,
    tags=("events", "behavioral"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current type), estimated from every adjacent pair
    in each user's timeline — the behavioral model behind next-action
    prediction, funnel leak diagnosis ("where do users go after
    view?"), and bot detection (near-deterministic rows).

    Determinism: adjacency comes from lag() over (ts, event_id) — the
    same unique-tiebreak ordering contract the sessionize lane pins —
    and the probability is ONE IEEE division of two exact counts.

    Scale: one user-keyed window sort (the same single exchange every
    per-user lane pays), then the matrix collapses to |types|^2 rows —
    the outdegree join and division touch matrix rows, not events."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    # Persisted: |types|^2 rows, but BOTH the outdegree aggregate and the
    # output join consume it — unpersisted, each branch would re-run the
    # user-keyed window sort over all events (the plan pin counts windows).
    trans = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n_trans"))
        .transform(pin)
    )
    outdeg = trans.groupBy("from_type").agg(F.sum("n_trans").alias("n_out"))
    return trans.join(F.broadcast(outdeg), "from_type").select(
        "from_type",
        "to_type",
        "n_trans",
        (F.col("n_trans").cast("double") / F.col("n_out")).alias("p"),
    )


@register(
    "events_changepoint_cusum",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, day, y,
               CAST(row_number() OVER w AS BIGINT) AS d,
               CAST(SUM(y) OVER w AS BIGINT) AS cum,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
               CAST(SUM(y) OVER (PARTITION BY event_type) AS BIGINT) AS sy
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day AS changepoint_day,
           abs(n_days * cum - d * sy) AS cusum_abs,
           n_days,
           CAST(cum AS DOUBLE) / d AS mean_before,
           CASE WHEN n_days > d
                THEN CAST(sy - cum AS DOUBLE) / (n_days - d) END AS mean_after
    FROM c
    QUALIFY row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(n_days * cum - d * sy) DESC, day ASC) = 1
    """,
    tags=("events", "timeseries"),
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per event type: the day d maximizing
    |N·cum_d − d·ΣY| — the scaled-by-N cumulative deviation from the
    global daily mean, whose argmax is the classic single-changepoint
    estimator (where the series' level shifted). mean_before/mean_after
    quantify the regime shift.

    Determinism: the statistic is pure BIGINT (scaling by N instead of
    dividing by it keeps the mean-deviation sum integer); the argmax
    tie-breaks on earliest day via an explicit (stat DESC, day ASC)
    row_number in both engines; the two means are single IEEE divisions.

    Scale: volume collapses at the (type, day) rollup; every window runs
    over day rows — |types| x |days|, calendar-bounded, one exchange."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("event_type")
    c = daily.select(
        "event_type",
        "day",
        F.row_number().over(w).cast("long").alias("d"),
        F.sum("y").over(wcum).cast("long").alias("cum"),
        F.count("*").over(wall).cast("long").alias("n_days"),
        F.sum("y").over(wall).cast("long").alias("sy"),
    )
    stat = F.abs(F.col("n_days") * F.col("cum") - F.col("d") * F.col("sy"))
    ranked = c.withColumn("cusum_abs", stat).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.col("cusum_abs").desc(), F.col("day").asc())
        ),
    )
    return ranked.where(F.col("rn") == 1).select(
        F.col("event_type"),
        F.col("day").alias("changepoint_day"),
        "cusum_abs",
        "n_days",
        (F.col("cum").cast("double") / F.col("d")).alias("mean_before"),
        F.when(
            F.col("n_days") > F.col("d"),
            (F.col("sy") - F.col("cum")).cast("double") / (F.col("n_days") - F.col("d")),
        ).alias("mean_after"),
    )


@register(
    "events_distribution_drift",
    oracle="""
    WITH h AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(FLOOR(value) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2, 3
    ),
    tot AS (
        SELECT event_type, day, CAST(SUM(cnt) AS BIGINT) AS total
        FROM h GROUP BY 1, 2
    ),
    pairs AS (
        SELECT COALESCE(a.event_type, b.event_type) AS event_type,
               COALESCE(a.day, b.day + 1) AS day,
               COALESCE(a.cnt, 0) AS cnt_cur,
               COALESCE(b.cnt, 0) AS cnt_prev
        FROM h a FULL OUTER JOIN h b
          ON a.event_type = b.event_type AND a.bucket = b.bucket
         AND a.day = b.day + 1
    ),
    agg AS (
        SELECT p.event_type, p.day,
               tc.total AS total_cur, tp.total AS total_prev,
               SUM(abs(CAST(p.cnt_cur AS HUGEINT) * tp.total
                       - CAST(p.cnt_prev AS HUGEINT) * tc.total)) AS l1_scaled
        FROM pairs p
        JOIN tot tc ON tc.event_type = p.event_type AND tc.day = p.day
        JOIN tot tp ON tp.event_type = p.event_type
                   AND tp.day = p.day - 1
        GROUP BY 1, 2, 3, 4
    )
    SELECT event_type, day, total_cur, total_prev,
           CAST(l1_scaled AS DOUBLE)
               / (CAST(total_cur AS DOUBLE) * CAST(total_prev AS DOUBLE)) AS l1_drift
    FROM agg
    """,
    tags=("events", "quality", "drift"),
)
def events_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day L1 distance between per-type value distributions
    (integer-dollar buckets): the drift monitor a training pipeline runs
    on each day's batch before it joins the corpus — l1_drift ∈ [0, 2],
    0 = identical shape, 2 = disjoint support; a spike says the batch's
    value distribution shifted (schema break, upstream bug, regime
    change) even when volume looks normal.

    Determinism: shares are never materialized as doubles — the L1 sum
    is computed scaled by both days' totals (|cnt_d·N_{d-1} −
    cnt_{d-1}·N_d|, exact in decimal(38,0)/HUGEINT: the cross products
    pass 2^63 once daily volume nears ~10^9.5), with one final
    double-by-double division per (type, day). Days missing a bucket contribute through the full-outer
    join's zero side, so support changes are counted, not skipped.

    Scale: volume collapses at the (type, day, bucket) rollup (map-side
    combine); the self-join and the two total joins run over histogram
    rows — |types| x |days| x |value-domain buckets|, data-volume-free.
    The drift stat is one number per (type, day-pair): the table a
    monitoring dashboard reads directly."""
    e = t(spark, sf_dir, "events")
    h = (
        e.select("event_type", F.to_date("ts").alias("day"), value_bucket())
        .groupBy("event_type", "day", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    return drift_from_histograms(h)


def value_bucket() -> Column:
    """The drift family's ONE bucketization (integer-dollar FLOOR of
    events.value) — shared by the registered operator, the maintained
    daily index (operators/drift_monitor.py), and the streaming ledger
    (streaming/events.py), so the three can never desynchronize."""
    return F.floor("value").cast("long").alias("bucket")


def drift_from_histograms(h: DataFrame) -> DataFrame:
    """(event_type, day, bucket, cnt) histogram rows -> the drift table.

    Shared by the registered one-shot operator above and the maintained
    per-day histogram index (operators/drift_monitor.py), so the two
    compute IDENTICAL arithmetic by construction — the vocab/postings
    shared-expression discipline."""
    h = h.transform(pin)
    tot = h.groupBy("event_type", "day").agg(F.sum("cnt").alias("total")).transform(pin)
    a = h.alias("a")
    b = h.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.day") == F.date_add(F.col("b.day"), 1)),
        "full_outer",
    ).select(
        F.coalesce(F.col("a.event_type"), F.col("b.event_type")).alias("event_type"),
        F.coalesce(F.col("a.day"), F.date_add(F.col("b.day"), 1)).alias("day"),
        F.coalesce(F.col("a.cnt"), F.lit(0)).alias("cnt_cur"),
        F.coalesce(F.col("b.cnt"), F.lit(0)).alias("cnt_prev"),
    )
    tc = tot.select(
        F.col("event_type"), F.col("day"), F.col("total").alias("total_cur")
    )
    tp = tot.select(
        F.col("event_type"),
        F.date_add(F.col("day"), 1).alias("day"),
        F.col("total").alias("total_prev"),
    )
    agg = (
        pairs.join(tc, ["event_type", "day"])
        .join(tp, ["event_type", "day"])
        .groupBy("event_type", "day", "total_cur", "total_prev")
        .agg(
            # decimal(38,0): cnt x total crosses 2^63 near 1e9.5 events
            # per (type, day) — the oracle mirrors with HUGEINT
            F.sum(
                F.abs(
                    F.col("cnt_cur").cast("decimal(38,0)") * F.col("total_prev")
                    - F.col("cnt_prev").cast("decimal(38,0)") * F.col("total_cur")
                )
            ).alias("l1_scaled")
        )
    )
    return agg.select(
        "event_type",
        "day",
        "total_cur",
        "total_prev",
        (
            F.col("l1_scaled").cast("double")
            / (F.col("total_cur").cast("double") * F.col("total_prev").cast("double"))
        ).alias("l1_drift"),
    )


@register(
    "events_asof_join_nearest",
    oracle="""
    WITH prevn AS (
        SELECT p.event_id, p.user_id, p.ts,
               (SELECT MAX(c.ts) FROM events c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND c.ts <= p.ts) AS prev_ts,
               (SELECT MIN(c.ts) FROM events c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND c.ts >= p.ts) AS next_ts
        FROM events p WHERE p.event_type = 'purchase'
    )
    SELECT event_id, user_id, ts,
           CASE
               WHEN prev_ts IS NULL THEN next_ts
               WHEN next_ts IS NULL THEN prev_ts
               WHEN epoch_us(next_ts) - epoch_us(ts)
                    < epoch_us(ts) - epoch_us(prev_ts) THEN next_ts
               ELSE prev_ts
           END AS nearest_click_ts
    FROM prevn
    """,
    tags=("events", "asof-join"),
)
def events_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — completes the direction family (pandas
    ``merge_asof(direction='nearest')``): for each purchase, the click
    by the same user minimizing |click_ts − purchase_ts|; equidistant
    ties take the PRIOR click (pandas' backward preference).

    Both candidates come from ONE union + ONE user-keyed exchange: the
    backward carry (last click ≤ ts) and the forward carry (first click
    ≥ ts) are two frames over the same hash partition — Spark re-sorts
    within partitions between them (the tie-orderings differ at equal
    ts) but never re-shuffles, so the family's one-user-exchange pin
    holds. The winner is picked row-locally with exact epoch-µs integer
    comparisons. No range join, linear in events per user."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("side"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id",
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    # backward frame: click sorts BEFORE the purchase at equal ts (<=)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward frame: click sorts AFTER the purchase at equal ts (>=)
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("side"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = (
        clicks.unionByName(purchases)
        .withColumn("prev_ts", F.last("click_ts", ignorenulls=True).over(wb))
        .withColumn("next_ts", F.first("click_ts", ignorenulls=True).over(wf))
    )
    prev_us = F.unix_micros("prev_ts")
    next_us = F.unix_micros("next_ts")
    ts_us = F.unix_micros("ts")
    nearest = (
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(next_us - ts_us < ts_us - prev_us, F.col("next_ts"))
        .otherwise(F.col("prev_ts"))
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id", "user_id", "ts", nearest.alias("nearest_click_ts")
    )


@register(
    "events_cumulative_reach",
    oracle="""
    WITH first_touch AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS dau
        FROM events GROUP BY 1
    ),
    new_users AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new FROM first_touch GROUP BY day
    )
    SELECT d.day, d.dau,
           COALESCE(n.n_new, 0) AS n_new_users,
           CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY d.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cumulative_reach
    FROM daily d LEFT JOIN new_users n USING (day)
    """,
    tags=("events", "growth"),
)
def events_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, new users, and cumulative reach (running
    DISTINCT user count since launch) — the growth-dashboard triple.

    The running distinct is NOT a window-distinct (no engine supports a
    distributable one): each user collapses to a first-touch day, new
    users roll up per day, and reach is a prefix sum over day rows —
    the first-occurrence trick that turns an O(n·days) running distinct
    into two linear aggregations plus a calendar-bounded cumsum.

    Scale: both rollups are map-side-combinable over user/day keys; the
    only window runs over |days| rows. The global day ordering is a
    single-task window over CALENDAR rows — bounded by the date domain,
    never by volume (the same boundedness argument as the coarse-range
    offsets tables), and at decades-long horizons the two-phase
    coarse-range prefix sum generalizes."""
    e = t(spark, sf_dir, "events")
    first_touch = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("day"))
    daily = (
        e.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("dau"))
    )
    new_users = first_touch.groupBy("day").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.join(new_users, "day", "left")
        .select(
            "day",
            "dau",
            F.coalesce("n_new", F.lit(0)).alias("n_new_users"),
        )
        .withColumn(
            "cumulative_reach", F.sum("n_new_users").over(w).cast("long")
        )
    )


# ---------------------------------------------------------------------------
# Autocorrelation function (temporal feature screening)
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7
_DAY_US = 86_400_000_000


@register(
    "events_autocorrelation",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(epoch_us(ts) // {_DAY_US} AS BIGINT) AS dayn,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type, g.lag,
               a.cnt AS x, b.cnt AS y
        FROM daily a
        CROSS JOIN generate_series(1, {_ACF_MAX_LAG}) AS g(lag)
        JOIN daily b ON b.event_type = a.event_type
                    AND b.dayn = a.dayn + g.lag
    ),
    m AS (
        SELECT event_type, lag,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, lag, n_pairs,
           CAST(n_pairs * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS acf
    FROM m
    """,
    tags=("events", "timeseries", "features"),
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event volume per type, at
    lags 1..7 days — the periodicity screen run before fitting any
    forecasting or anomaly model on a metric (a weekly-seasonal series
    spikes at lag 7; a trend decays slowly across all lags). Defined as
    the lag-k Pearson correlation over the (day t, day t+k) pairs where
    BOTH days observed events — the standard sample-ACF variant that
    stays exact under missing days.

    Determinism: daily counts are exact integers; each (type, lag)
    cell's five co-moments (Σx, Σy, Σx², Σy², Σxy) aggregate as
    decimal(38,0) in Spark / HUGEINT in DuckDB (a 100 TB feed's daily
    count ~1e9 squares past 2⁶³ within a year of days), and the closed
    form r = (nΣxy − ΣxΣy)/(√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) runs as
    single correctly-rounded IEEE ops in identical written order — the
    profile_correlation_exact recipe pointed at a self-join.

    Scale: event volume collapses in the FIRST map-side-combinable
    rollup to (type × day) rows; the lag explode (×7) and the self
    equi-join on (type, day+lag) operate on calendar-cardinality rows
    only — a decade of days is ~3,650 rows per type no matter how many
    trillion events fed them. One fact exchange total."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            (F.unix_micros(F.col("ts")).cast("long") / F.lit(_DAY_US))
            .cast("long")
            .alias("dayn"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    a = daily.select(
        "event_type",
        "dayn",
        "cnt",
        F.explode(F.sequence(F.lit(1).cast("long"), F.lit(_ACF_MAX_LAG).cast("long"))).alias("lag"),
    )
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.col("dayn").alias("b_dayn"),
        F.col("cnt").alias("y"),
    )
    pairs = a.join(
        b,
        (F.col("b_type") == F.col("event_type"))
        & (F.col("b_dayn") == F.col("dayn") + F.col("lag")),
    ).select("event_type", "lag", F.col("cnt").alias("x"), "y")

    def dsum38(c: Column) -> Column:
        return F.sum(c.cast("decimal(38,0)"))

    m = pairs.groupBy("event_type", "lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        dsum38(F.col("x")).alias("sx"),
        dsum38(F.col("y")).alias("sy"),
        dsum38(F.col("x") * F.col("x")).alias("sxx"),
        dsum38(F.col("y") * F.col("y")).alias("syy"),
        dsum38(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n_pairs").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    tx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ty = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        "event_type",
        "lag",
        "n_pairs",
        (num / (F.sqrt(tx) * F.sqrt(ty))).alias("acf"),
    )


# ---------------------------------------------------------------------------
# Rolling median of daily volume (trailing-window robust baseline)
# ---------------------------------------------------------------------------


@register(
    "events_rolling_median_daily",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(epoch_us(ts) // {_DAY_US} AS BIGINT) AS dayn,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, dayn, cnt,
               list_sort(list(cnt) OVER (PARTITION BY event_type ORDER BY dayn
                                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
               AS win,
               CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY dayn
                                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_win
        FROM daily
    )
    SELECT event_type, dayn, cnt, n_win,
           win[CAST((n_win + 1) // 2 AS INTEGER)] AS rolling_median
    FROM w
    """,
    tags=("events", "timeseries"),
)
def events_rolling_median_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling MEDIAN of daily event volume per type — the
    robust baseline an alerting pipeline compares today's count against
    (a mean baseline moves with the spike it should flag; the median
    doesn't). Median = lower-middle element (type-1) of the sorted
    trailing window, so short leading windows are well-defined.

    Determinism: daily counts are exact integers and the median is an
    element SELECTED from them (never averaged) — no IEEE arithmetic
    anywhere in the lane.

    Scale: event volume collapses in the first map-side-combinable
    rollup; the rolling window runs over (type × day) CALENDAR rows —
    a decade is ~3,650 rows per type regardless of event volume — and
    buffers at most 7 longs per row. One fact exchange total."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        (F.unix_micros(F.col("ts")).cast("long") / F.lit(_DAY_US))
        .cast("long")
        .alias("dayn"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("dayn")
        .rowsBetween(-6, Window.currentRow)
    )
    win = F.sort_array(F.collect_list("cnt").over(w))
    n_win = F.count("*").over(w).cast("long")
    return daily.select(
        "event_type",
        "dayn",
        "cnt",
        n_win.alias("n_win"),
        F.element_at(win, ((n_win + 1) / 2).cast("int")).alias("rolling_median"),
    )


# ---------------------------------------------------------------------------
# A/B funnel significance (two-proportion z-test)
# ---------------------------------------------------------------------------


@register(
    "events_funnel_ab_significance",
    oracle="""
    WITH per_user AS (
        SELECT user_id, max(t1) AS t1, max(t2) AS t2,
               min(CASE WHEN event_type = 'purchase' AND ts > t2
                        AND ts <= t2 + INTERVAL 24 HOUR THEN ts END) AS t3
        FROM (
            SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                          OVER (PARTITION BY user_id) AS t2
            FROM (
                SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
                              OVER (PARTITION BY user_id) AS t1
                FROM events
            )
        )
        GROUP BY user_id
    ),
    arms AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(count(*) FILTER (t1 IS NOT NULL) AS BIGINT) AS n_viewed,
               CAST(count(*) FILTER (t3 IS NOT NULL) AS BIGINT) AS n_converted
        FROM per_user GROUP BY user_id % 2
    ),
    wide AS (
        SELECT
            CAST(SUM(CASE WHEN arm = 0 THEN n_viewed END) AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN arm = 0 THEN n_converted END) AS BIGINT) AS c_a,
            CAST(SUM(CASE WHEN arm = 1 THEN n_viewed END) AS BIGINT) AS n_b,
            CAST(SUM(CASE WHEN arm = 1 THEN n_converted END) AS BIGINT) AS c_b
        FROM arms
    )
    SELECT n_a, c_a, n_b, c_b,
           CAST(c_a AS DOUBLE) / n_a AS conv_a,
           CAST(c_b AS DOUBLE) / n_b AS conv_b,
           (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
             / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1e0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1e0 / n_a + 1e0 / n_b)) AS z_score,
           abs((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
             / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1e0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1e0 / n_a + 1e0 / n_b))) > 1.959963985e0 AS significant
    FROM wide
    """,
    tags=("events", "funnel", "abtest"),
)
def events_funnel_ab_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B readout for the ordered funnel: users split into two arms by
    the deterministic user_id parity (the hash-split idiom of the
    sampling lanes — in production the assignment column), attributed
    conversion (purchase within 24 HOURS after the first qualifying
    click, over viewers — unwindowed conversion saturates at 100% on
    this dense corpus, making the z-denominator literally zero) per
    arm, and the pooled
    two-proportion z-test at α=0.05 — the analytics-side answer to "did
    the B arm actually convert better, or is that noise?". On the
    synthetic corpus the arms are exchangeable by construction, so the
    expected readout is non-significance — which is itself the pin: a
    biased split or a broken funnel stage shows up as a spurious z.

    Determinism: all counts exact integers through ONE user-keyed
    exchange (the funnel recipe's per-user stage resolution — this lane
    deliberately reuses the pre-r6 windowed per-user form in the ORACLE
    for readability, and the same form in Spark, since the per-arm
    rollup is count-sized either way); the z-statistic is a fixed
    written-once IEEE sequence over four integers (each division and
    the sqrt spelled identically in both engines; the 1.96 critical
    value carried to 9 decimals with an e0 suffix).

    Scale: the per-user window shape is the funnel-users twin's (one
    user exchange); everything after is a 2-row rollup and a scalar
    projection."""
    e = t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu)
    with_t1 = e.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(wu)
    with_t2 = with_t1.withColumn("t2", t2)
    per_user = with_t2.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2"))
                & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOURS")),
                F.col("ts"),
            )
        ).alias("t3"),
    )
    arms = per_user.groupBy((F.col("user_id") % 2).cast("long").alias("arm")).agg(
        F.count(F.col("t1")).cast("long").alias("n_viewed"),
        F.count(F.col("t3")).cast("long").alias("n_converted"),
    )
    wide = arms.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n_viewed"))).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("n_converted")))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_viewed"))).cast("long").alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_converted")))
        .cast("long")
        .alias("c_b"),
    )
    conv_a = F.col("c_a").cast("double") / F.col("n_a")
    conv_b = F.col("c_b").cast("double") / F.col("n_b")
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (conv_a - conv_b) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        conv_a.alias("conv_a"),
        conv_b.alias("conv_b"),
        z.alias("z_score"),
        (F.abs(z) > F.lit(1.959963985)).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Cohort revenue triangle (value-based LTV companion of retention_cohorts)
# ---------------------------------------------------------------------------


@register(
    "events_cohort_revenue",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(min(ts) OVER (PARTITION BY user_id) AS DATE) AS first_day,
               CAST(ts AS DATE) AS d,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents,
               event_type
        FROM events
    )
    SELECT first_day - CAST((dayofweek(first_day) + 6) % 7 AS INTEGER)
               AS cohort_week,
           CAST(datediff('day',
                         first_day - CAST((dayofweek(first_day) + 6) % 7 AS INTEGER),
                         d) AS BIGINT) // 7 AS age_weeks,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
                AS BIGINT) AS revenue_cents,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
                AS DOUBLE) / count(DISTINCT user_id) AS cents_per_active_user
    FROM u
    GROUP BY 1, 2
    """,
    tags=("events", "retention", "revenue"),
)
def events_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cohort REVENUE triangle: users grouped by their first-seen
    week (Monday-anchored), purchase value summed per (cohort_week,
    age_weeks) cell, normalized per active user — the value-based LTV
    companion of events_retention_cohorts (which counts presence; a
    growth team reads the two side by side to see whether retained
    users also keep SPENDING). Weeks anchor to Monday; the two engines
    NUMBER weekdays differently (Spark Sunday=1, DuckDB Sunday=0), so
    the Monday fold is (dow + 5) % 7 in Spark and (dow + 6) % 7 in the
    oracle — same dates out.

    Determinism: values quantize to integer cents at the row
    (floor(x·100 + 0.5) — associative exact addition from there), the
    distinct-user count is an integer, and the per-user rate is ONE
    final IEEE division. No double accumulates across rows.

    Scale: one user-keyed window computes each user's first day (the
    same exchange retention_cohorts pays), then the triangle rollup is
    map-side combinable to |cohorts| x |ages| cells — calendar-bounded
    output regardless of event volume."""
    first_day = F.min(F.to_date("ts")).over(Window.partitionBy("user_id"))
    u = t(spark, sf_dir, "events").select(
        "user_id",
        first_day.alias("first_day"),
        F.to_date("ts").alias("d"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
        "event_type",
    )
    cohort_week = F.date_sub(
        F.col("first_day"), ((F.dayofweek("first_day") + 5) % 7).cast("int")
    )
    rev = F.sum(
        F.when(F.col("event_type") == "purchase", F.col("cents")).otherwise(0)
    ).cast("long")
    return (
        u.withColumn("cohort_week", cohort_week)
        .withColumn(
            "age_weeks",
            F.expr("CAST(datediff(d, cohort_week) AS BIGINT) div 7"),
        )
        .groupBy("cohort_week", "age_weeks")
        .agg(
            F.count_distinct("user_id").cast("long").alias("n_active"),
            rev.alias("revenue_cents"),
        )
        .select(
            "cohort_week",
            "age_weeks",
            "n_active",
            "revenue_cents",
            (F.col("revenue_cents").cast("double") / F.col("n_active")).alias(
                "cents_per_active_user"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal (weekday-conditioned) anomaly screen
# ---------------------------------------------------------------------------


@register(
    "events_seasonal_anomaly",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    ranked AS (
        SELECT *, dayofweek(d) AS dow,
               ROW_NUMBER() OVER (PARTITION BY event_type, dayofweek(d)
                                  ORDER BY cnt, d) AS rn,
               CAST(count(*) OVER (PARTITION BY event_type, dayofweek(d))
                    AS BIGINT) AS n
        FROM daily
    ),
    med AS (
        SELECT event_type, dow,
               CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN cnt ELSE 0 END)
                    + sum(CASE WHEN rn = (n + 2) // 2 THEN cnt ELSE 0 END)
                    AS BIGINT) AS med2
        FROM ranked GROUP BY event_type, dow
    )
    SELECT r.event_type, r.d AS day, r.cnt,
           CAST(med2 AS DOUBLE) / 2 AS weekday_baseline,
           r.cnt - CAST(med2 AS DOUBLE) / 2 AS deviation,
           2 * abs(2 * r.cnt - med2) > med2 AS anomalous
    FROM ranked r JOIN med USING (event_type, dow)
    """,
    tags=("events", "anomaly", "timeseries"),
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-conditioned anomaly screen: each (event_type, day)'s count
    against the MEDIAN of its own weekday's daily counts — the seasonal
    refinement of events_anomaly_mad, whose single global baseline flags
    every ordinary Saturday on a traffic profile with weekly shape
    (weekend dips read as anomalies). Conditioning the baseline on
    day-of-week removes exactly that; a day is flagged when it deviates
    from its weekday's median by more than 50%.

    Determinism: the median is computed as the SUM of the lower and
    upper middle elements (2x the median — exact integers under an
    explicit (cnt, day) total order; the single-sample cell doubles its
    one value), so baseline and deviation are one IEEE division/
    subtraction off exact integers, and the flag is a pure integer
    comparison (2·|2·cnt − med2| > med2 ⇔ |cnt − median| > median/2).
    The engines number weekdays differently (Spark Sunday=1, DuckDB
    Sunday=0), so the dow is an INTERNAL group key only — it groups the
    same calendar days either way and never reaches the output.

    Scale: volume collapses at the (type, day) rollup; every window
    runs over |types| x |days| rows — calendar-bounded, the
    trend/EWMA/CUSUM family's profile."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    wspec = Window.partitionBy("event_type", "dow")
    ranked = daily.withColumn("dow", F.dayofweek("d")).select(
        "event_type",
        "d",
        "cnt",
        "dow",
        F.row_number()
        .over(wspec.orderBy(F.asc("cnt"), F.asc("d")))
        .alias("rn"),
        F.count("*").over(wspec).cast("long").alias("n"),
    )
    # med2 = 2x the median: lower and upper middle summed as SEPARATE
    # terms, so an odd cell's single middle row contributes TWICE (a
    # combined rn-matches-either CASE counts it once and halves the
    # baseline — found by hand-checking an odd cell)
    med = ranked.groupBy("event_type", "dow").agg(
        (
            F.sum(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("cnt")).otherwise(0)
            )
            + F.sum(
                F.when(F.col("rn") == F.expr("(n + 2) div 2"), F.col("cnt")).otherwise(0)
            )
        )
        .cast("long")
        .alias("med2")
    )
    return ranked.join(med, ["event_type", "dow"]).select(
        "event_type",
        F.col("d").alias("day"),
        "cnt",
        (F.col("med2").cast("double") / 2).alias("weekday_baseline"),
        (F.col("cnt") - F.col("med2").cast("double") / 2).alias("deviation"),
        (2 * F.abs(2 * F.col("cnt") - F.col("med2")) > F.col("med2")).alias(
            "anomalous"
        ),
    )


# ---------------------------------------------------------------------------
# DAU / WAU / MAU (trailing-window distinct actives)
# ---------------------------------------------------------------------------


@register(
    "events_dau_wau_mau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud)
    SELECT days.d AS day,
           CAST(count(DISTINCT CASE WHEN ud.d = days.d
                                    THEN ud.user_id END) AS BIGINT) AS dau,
           CAST(count(DISTINCT CASE WHEN ud.d > days.d - 7
                                    THEN ud.user_id END) AS BIGINT) AS wau,
           CAST(count(DISTINCT ud.user_id) AS BIGINT) AS mau,
           CAST(count(DISTINCT CASE WHEN ud.d = days.d
                                    THEN ud.user_id END) AS DOUBLE)
             / count(DISTINCT CASE WHEN ud.d > days.d - 7
                                   THEN ud.user_id END) AS dau_over_wau
    FROM days JOIN ud
      ON ud.d <= days.d AND ud.d > days.d - 30
    GROUP BY days.d
    """,
    tags=("events", "engagement"),
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engagement dashboard's headline row: per calendar day, the
    EXACT distinct active users that day (DAU), over the trailing 7
    days (WAU), and the trailing 30 (MAU), plus the DAU/WAU stickiness
    ratio. Exact trailing-window DISTINCT does not decompose into
    per-day aggregates (a user active twice in a week must count once),
    so the lane materializes the (user, day) presence rollup ONCE and
    range-joins it against the day spine — each day counts its own
    window's users.

    Determinism: counts are integers; the stickiness ratio is one IEEE
    division (WAU >= DAU >= 1 on any day that exists, so no /0 under
    ANSI).

    Scale: volume collapses at the DISTINCT (user, day) rollup — one
    exchange over events. The trailing windows are then realized by
    EXPLODING each presence pair into the <= 30 future days it counts
    toward (sequence + explode in-row) and equi-grouping on the day —
    a plain hash shuffle of 30x|pairs| rows, never a non-equi
    nested-loop join (the oracle spells the same windows as a range
    join; the equi rewrite is the distributed plan). Days past the
    corpus's last real day are dropped by a broadcast semi join against
    the day spine. At extreme user counts the exact form's shuffle
    grows with actives/day; the corpus's HLL sketch discipline
    (events_retention_cohorts_approx) is the documented swap when a
    +-2% MAU suffices."""
    ud = (
        t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .transform(pin)
    )
    days = ud.select("d").distinct().withColumnRenamed("d", "day")
    exploded = ud.select(
        "user_id",
        "d",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 29))
        ).alias("day"),
    ).join(F.broadcast(days), "day", "left_semi")
    return (
        exploded.groupBy("day")
        .agg(
            F.count_distinct(
                F.when(F.col("d") == F.col("day"), F.col("user_id"))
            )
            .cast("long")
            .alias("dau"),
            F.count_distinct(
                F.when(F.col("d") > F.date_sub(F.col("day"), 7), F.col("user_id"))
            )
            .cast("long")
            .alias("wau"),
            F.count_distinct("user_id").cast("long").alias("mau"),
        )
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            (F.col("dau").cast("double") / F.col("wau")).alias("dau_over_wau"),
        )
    )


# ---------------------------------------------------------------------------
# Last-touch attribution (marketing analytics over the event stream)
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 7 * 86400 * 1_000_000  # 7-day attribution window


@register(
    "events_attribution_last_touch",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    tagged AS (
        SELECT *,
               max(CASE WHEN event_type = 'click'
                        THEN {{'cts': ts_us, 'cid': event_id}} END)
                 OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS last_click
        FROM e
    )
    SELECT event_id AS purchase_id, user_id, cents AS purchase_cents,
           CASE WHEN attributed THEN last_click.cid END AS click_id,
           CASE WHEN attributed
                THEN CAST(ts_us - last_click.cts AS BIGINT) END AS gap_us,
           attributed
    FROM (
        SELECT *,
               last_click IS NOT NULL
               AND ts_us - last_click.cts <= {_ATTR_WINDOW_US} AS attributed
        FROM tagged
    ) WHERE event_type = 'purchase'
    """,
    tags=("events", "attribution"),
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent PRECEDING click within a 7-day window — the standard
    marketing-attribution primitive, and the classic case where a naive
    purchase x clicks range join explodes (every purchase against every
    earlier click). Here it is ONE pass: a running max over the user's
    time-ordered events carries the latest click as a (ts_us, event_id)
    STRUCT (lexicographic max — both engines compare structs field by
    field; a packed ts·10^k + id integer would overflow int64 at real
    timestamps), so each purchase reads its attribution from window
    state — the as-of-join recipe specialized to "same stream, typed
    events".

    Determinism: integer microseconds and ids throughout; the window's
    (ts_us, event_id) order is total; gap and the 7-day cutoff are
    integer arithmetic. NULL last_click (no prior click, or none within
    the window) yields attributed=false with NULL click columns.

    Scale: one user-keyed exchange + one ordered window; output is
    purchase-count rows. No self-join, no candidate explosion."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("ts_us"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(
            F.col("event_type") == "click",
            F.struct(
                F.col("ts_us").alias("cts"), F.col("event_id").alias("cid")
            ),
        )
    ).over(w)
    tagged = e.withColumn("last_click", last_click)
    attributed = F.col("last_click").isNotNull() & (
        F.col("ts_us") - F.col("last_click.cts") <= F.lit(_ATTR_WINDOW_US)
    )
    return (
        tagged.withColumn("attributed", attributed)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("cents").alias("purchase_cents"),
            F.when(F.col("attributed"), F.col("last_click.cid")).alias("click_id"),
            F.when(
                F.col("attributed"),
                (F.col("ts_us") - F.col("last_click.cts")).cast("long"),
            ).alias("gap_us"),
            "attributed",
        )
    )


@register(
    "events_attribution_linear",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    tagged AS (
        SELECT *,
               CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END)
                 OVER (PARTITION BY user_id ORDER BY ts_us
                       RANGE BETWEEN {_ATTR_WINDOW_US} PRECEDING
                             AND 1 PRECEDING), 0) AS BIGINT) AS n_clicks
        FROM e
    )
    SELECT event_id AS purchase_id, user_id, cents AS purchase_cents,
           n_clicks AS n_clicks_window,
           CASE WHEN n_clicks > 0
                THEN CAST(cents AS DOUBLE) / n_clicks END AS credit_per_click,
           n_clicks > 0 AS attributed
    FROM tagged WHERE event_type = 'purchase'
    """,
    tags=("events", "attribution"),
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-credit) attribution: each purchase's value splits
    evenly across ALL of the user's clicks in the preceding 7-day
    window — the multi-touch companion of the last-touch lane, reported
    per purchase as (window click count, credit per click). The naive
    form is a purchase x clicks range join; here the click count comes
    from a VALUE-RANGE window frame over the time-ordered stream
    (RANGE BETWEEN 7d-in-µs PRECEDING AND 1 PRECEDING on the integer
    ts_us order), so the plan stays one exchange + one window and emits
    purchase-count rows. A per-(purchase, click) credit table would
    re-introduce the explosion — derive it downstream only for the
    purchases you audit.

    Determinism: integer microsecond bounds, integer counts, ONE IEEE
    division for the credit (guarded by n_clicks > 0 — ANSI /0).
    Same-instant click-purchase ties are excluded by the 1-µs frame end
    in both engines."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("ts_us"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_ATTR_WINDOW_US, -1)
    )
    n_clicks = F.coalesce(
        F.sum(F.when(F.col("event_type") == "click", 1)).over(w), F.lit(0)
    ).cast("long")
    return (
        e.withColumn("n_clicks", n_clicks)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("cents").alias("purchase_cents"),
            F.col("n_clicks").alias("n_clicks_window"),
            F.when(
                F.col("n_clicks") > 0,
                F.col("cents").cast("double") / F.col("n_clicks"),
            ).alias("credit_per_click"),
            (F.col("n_clicks") > 0).alias("attributed"),
        )
    )


# ---------------------------------------------------------------------------
# Activity concentration (Lorenz curve from the frequency spectrum)
# ---------------------------------------------------------------------------


@register(
    "events_user_lorenz",
    oracle="""
    WITH per_user AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
    ),
    spectrum AS (
        SELECT n, CAST(count(*) AS BIGINT) AS n_users FROM per_user GROUP BY n
    ),
    tot AS (
        SELECT CAST(sum(n_users) AS BIGINT) AS total_users,
               CAST(sum(n * n_users) AS BIGINT) AS total_events
        FROM spectrum
    )
    SELECT n AS events_per_user, n_users,
           CAST(sum(n_users) OVER (ORDER BY n DESC) AS BIGINT) AS cum_users,
           CAST(sum(n * n_users) OVER (ORDER BY n DESC) AS BIGINT) AS cum_events,
           CAST(sum(n_users) OVER (ORDER BY n DESC) AS DOUBLE)
             / (SELECT total_users FROM tot) AS user_share,
           CAST(sum(n * n_users) OVER (ORDER BY n DESC) AS DOUBLE)
             / (SELECT total_events FROM tot) AS event_share
    FROM spectrum
    """,
    tags=("events", "engagement"),
)
def events_user_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration as a Lorenz curve: for each activity level
    (events per user, descending), the cumulative share of USERS at or
    above it vs the cumulative share of EVENTS they carry — "the top 7%
    of users generate 40% of traffic", the capacity-planning and
    whale-detection read, and the Zipf-spectrum twin of
    text_token_spectrum applied to users.

    Scale — the reason this is a SPECTRUM walk, not a user sort: the
    per-user rollup collapses volume at one user-keyed exchange; the
    count-of-counts rollup collapses |users| rows to |distinct activity
    levels| (tens here, bounded by max activity, never user count), and
    the cumulative window runs over THOSE rows — a global user sort at
    100 TB is exactly what this shape avoids. Shares are two IEEE
    divisions per spectrum row off exact integer prefix sums."""
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n"))
    )
    spectrum = per_user.groupBy("n").agg(
        F.count("*").cast("long").alias("n_users")
    ).transform(pin)
    tot = spectrum.agg(
        F.sum("n_users").cast("long").alias("total_users"),
        F.sum(F.col("n") * F.col("n_users")).cast("long").alias("total_events"),
    )
    w = Window.orderBy(F.desc("n")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spectrum.withColumn("cum_users", F.sum("n_users").over(w).cast("long"))
        .withColumn(
            "cum_events",
            F.sum(F.col("n") * F.col("n_users")).over(w).cast("long"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").alias("events_per_user"),
            "n_users",
            "cum_users",
            "cum_events",
            (F.col("cum_users").cast("double") / F.col("total_users")).alias(
                "user_share"
            ),
            (F.col("cum_events").cast("double") / F.col("total_events")).alias(
                "event_share"
            ),
        )
    )


_SCD2_ASOF = "2024-01-15 00:00:00"  # mid-corpus instant


@register(
    "scd2_as_of_read",
    oracle=f"""
    WITH scd AS ({_SCD2_SQL})
    SELECT user_id, segment, valid_from
    FROM scd
    WHERE valid_from <= TIMESTAMP '{_SCD2_ASOF}'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_SCD2_ASOF}')
    """,
    tags=("events", "scd"),
)
def scd2_as_of_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The point-in-time dimension read the SCD2 history exists FOR:
    every user's segment valid at one instant (each user contributes at
    most one row — the version whose [valid_from, valid_to) interval
    covers the as-of). This is what a training-set builder joins facts
    against to avoid label leakage (the batch twin of the feature
    store's as-of read, on categorical attributes instead of moments);
    oracle composed from the SCD2 lane's own SQL so the interval
    semantics can never drift between the two.

    Scale: a pure filter over the version table (version-count rows —
    bounded by change count, not event count); on a persisted SCD2 sink
    (operators/scd2.py) the same predicate partition-prunes."""
    asof = F.lit(_SCD2_ASOF).cast("timestamp")
    scd = scd2_user_segments(spark, sf_dir)
    return scd.filter(
        (F.col("valid_from") <= asof)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > asof))
    ).select("user_id", "segment", "valid_from")


# ---------------------------------------------------------------------------
# Funnel conversion latency (view -> purchase time-to-convert, histogram form)
# ---------------------------------------------------------------------------


@register(
    "events_funnel_latency_hist",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t1
        FROM events GROUP BY user_id
    ),
    conv AS (
        SELECT e.user_id,
               CAST((epoch_us(CAST(min(e.ts) AS TIMESTAMP))
                     - epoch_us(CAST(p.t1 AS TIMESTAMP))) // 1000000 AS BIGINT)
                   AS gap_s
        FROM events e JOIN per_user p ON e.user_id = p.user_id
        WHERE e.event_type = 'purchase' AND p.t1 IS NOT NULL AND e.ts > p.t1
        GROUP BY e.user_id, p.t1
    ),
    hist AS (SELECT gap_s, CAST(count(*) AS BIGINT) AS cnt FROM conv GROUP BY gap_s),
    cum AS (
        SELECT gap_s, cnt,
               sum(cnt) OVER (ORDER BY gap_s) AS cum
        FROM hist
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_converters,
                   CAST(coalesce(sum(CASE WHEN gap_s < {_SESSION_GAP_S} THEN cnt END), 0)
                        AS BIGINT) AS n_same_session
            FROM hist)
    SELECT (SELECT n_converters FROM tot) AS n_converters,
           CAST(min(CASE WHEN cum * 100 >= (SELECT n_converters FROM tot) * 50
                         THEN gap_s END) AS BIGINT) AS p50_s,
           CAST(min(CASE WHEN cum * 100 >= (SELECT n_converters FROM tot) * 90
                         THEN gap_s END) AS BIGINT) AS p90_s,
           CAST(min(CASE WHEN cum * 100 >= (SELECT n_converters FROM tot) * 99
                         THEN gap_s END) AS BIGINT) AS p99_s,
           (SELECT n_same_session FROM tot) AS n_same_session
    FROM cum
    """,
    tags=("events", "funnel", "timeseries"),
)
def events_funnel_latency_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: per converting user, seconds from FIRST VIEW to
    the first purchase after it, summarized as exact type-1 p50/p90/p99
    at second resolution plus the count converting within one session
    gap — the growth metric next to the funnel's stage counts ("how
    many convert" there; "how fast" here).

    Scale — the distributed-percentile discipline
    (events_interarrival_hist's recipe): per-user latencies collapse at
    one user-keyed aggregate (sorted purchase-ts array + array_min
    filter, the funnel lane's no-window shape), the histogram rollup is
    map-side combinable, and the quantile stage runs over BUCKET rows
    (bounded by the latency span in seconds, never by users). The
    shared gap_hist_quantiles stage is reused verbatim, so this lane's
    arithmetic is the pinned stream-ledger-compatible one."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1"),
        F.array_sort(
            F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("purchases"),
    )
    conv = (
        per_user.filter(F.col("t1").isNotNull())
        .withColumn(
            "tp", F.array_min(F.filter("purchases", lambda p: p > F.col("t1")))
        )
        .filter(F.col("tp").isNotNull())
        .select(
            (
                (F.unix_micros("tp") - F.unix_micros("t1"))
                / F.lit(1_000_000)
            )
            .cast("long")
            .alias("gap_s")
        )
    )
    hist = conv.groupBy("gap_s").agg(F.count("*").cast("long").alias("cnt"))
    q = gap_hist_quantiles(hist)
    return q.select(
        F.col("n_gaps").alias("n_converters"),
        "p50_s",
        "p90_s",
        "p99_s",
        F.col("n_within_session_gap").alias("n_same_session"),
    )


@register(
    "events_attribution_position",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    tagged AS (
        SELECT *,
               min(CASE WHEN event_type = 'click'
                        THEN {{'cts': ts_us, 'cid': event_id}} END)
                 OVER w AS first_click,
               max(CASE WHEN event_type = 'click'
                        THEN {{'cts': ts_us, 'cid': event_id}} END)
                 OVER w AS last_click,
               CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END)
                 OVER w, 0) AS BIGINT) AS n_window
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN {_ATTR_WINDOW_US} PRECEDING
                           AND 1 PRECEDING)
    )
    SELECT event_id AS purchase_id, user_id, cents AS purchase_cents,
           n_window AS n_clicks_window,
           CASE WHEN n_window > 0 THEN first_click.cid END AS first_click_id,
           CASE WHEN n_window > 0 THEN last_click.cid END AS last_click_id,
           CASE WHEN n_window >= 2 THEN 40 * cents END AS first_credit_x100,
           CASE WHEN n_window >= 2 THEN 40 * cents END AS last_credit_x100,
           CASE WHEN n_window > 2 THEN 20 * cents END AS middle_pool_x100,
           n_window > 0 AS attributed
    FROM tagged WHERE event_type = 'purchase'
    """,
    tags=("events", "attribution"),
)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) attribution: within the 7-day window,
    the FIRST touch and the LAST touch each earn 40% of the purchase
    value and the middle clicks split the remaining 20% — the standard
    compromise between first-touch (discovery) and last-touch (closing)
    credit. With exactly one window click it takes everything (the
    credits collapse — reported here as NULL first/last splits, the
    single-click case the last-touch lane already covers); with two,
    the middle pool is empty.

    Determinism: credits are reported as exact INTEGER
    hundredths-of-cents (40·cents / 20·cents) rather than divided
    doubles — the division by n_middle belongs to the consumer joining
    actual middle clicks, and keeping the pool integral keeps the lane
    float-free. The windows are the last-touch lane's running struct
    extremes plus the linear lane's value-range count, all over one
    user exchange.

    Scale: identical profile to the other attribution lanes — one user
    exchange, purchase-count output rows, no purchase x clicks join."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("ts_us"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    # ALL window state is value-range scoped (the 7-day µs frame ending
    # 1 µs before the purchase), so first/last/count agree on exactly the
    # clicks the window admits — the rows-frame struct extremes of the
    # last-touch lane would include out-of-window history here.
    w_range = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_ATTR_WINDOW_US, -1)
    )
    click_struct = F.when(
        F.col("event_type") == "click",
        F.struct(F.col("ts_us").alias("cts"), F.col("event_id").alias("cid")),
    )
    n_window = F.coalesce(
        F.sum(F.when(F.col("event_type") == "click", 1)).over(w_range), F.lit(0)
    ).cast("long")
    tagged = (
        e.withColumn("first_click", F.min(click_struct).over(w_range))
        .withColumn("last_click", F.max(click_struct).over(w_range))
        .withColumn("n_window", n_window)
    )
    hit = F.col("n_window") > 0
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("cents").alias("purchase_cents"),
            F.col("n_window").alias("n_clicks_window"),
            F.when(hit, F.col("first_click.cid")).alias("first_click_id"),
            F.when(hit, F.col("last_click.cid")).alias("last_click_id"),
            F.when(
                F.col("n_window") >= 2, (F.lit(40) * F.col("cents")).cast("long")
            ).alias("first_credit_x100"),
            F.when(
                F.col("n_window") >= 2, (F.lit(40) * F.col("cents")).cast("long")
            ).alias("last_credit_x100"),
            F.when(
                F.col("n_window") > 2, (F.lit(20) * F.col("cents")).cast("long")
            ).alias("middle_pool_x100"),
            hit.alias("attributed"),
        )
    )


# _DAY_US is defined once near the resample lanes (line ~1908); the decay
# bucket count lives here and is IMPORTED by operators/attribution_store —
# one definition, so the store/lane bit-parity cannot drift (review r9)
_DECAY_BUCKETS = 7  # ages 0..6 whole days inside the 7-day window


@register(
    "events_attribution_time_decay",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    tagged AS (
        SELECT *,
               {", ".join(
                   f'''CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END)
                 OVER (PARTITION BY user_id ORDER BY ts_us
                       RANGE BETWEEN {(a + 1) * _DAY_US} PRECEDING
                             AND {a * _DAY_US + 1} PRECEDING), 0) AS BIGINT)
                 AS n_age{a}'''
                   for a in range(_DECAY_BUCKETS)
               )}
        FROM e
    )
    SELECT event_id AS purchase_id, user_id, cents AS purchase_cents,
           CAST({" + ".join(f"n_age{a}" for a in range(_DECAY_BUCKETS))} AS BIGINT)
               AS n_clicks_window,
           CAST({" + ".join(f"n_age{a} * {1 << (_DECAY_BUCKETS - 1 - a)}" for a in range(_DECAY_BUCKETS))} AS BIGINT)
               AS weight_total,
           CASE WHEN {" + ".join(f"n_age{a}" for a in range(_DECAY_BUCKETS))} > 0
                THEN CAST(cents AS DOUBLE)
                     / ({" + ".join(f"n_age{a} * {1 << (_DECAY_BUCKETS - 1 - a)}" for a in range(_DECAY_BUCKETS))})
           END AS credit_per_weight,
           {" + ".join(f"n_age{a}" for a in range(_DECAY_BUCKETS))} > 0 AS attributed
    FROM tagged WHERE event_type = 'purchase'
    """,
    tags=("events", "attribution"),
)
def events_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution — the fourth industry-standard multi-touch
    model beside last-touch / linear / position: a click's credit halves
    for every whole DAY of age, so weight = 2^(6 − age_days) over the
    7-day window (newest bucket 64, oldest 1 — DYADIC, hence exact in
    both engines; the repo's decayed-activity discipline). The naive
    form is again a purchase × clicks join; here each purchase reads 7
    bucket COUNTS from 7 constant-bound value-RANGE frames over the one
    user-keyed sort (bucket a = clicks with elapsed µs in
    (a·86400e6, (a+1)·86400e6], i.e. RANGE BETWEEN (a+1)·D PRECEDING AND
    a·D+1 PRECEDING — same-instant clicks excluded like the linear
    lane), so the plan stays ONE exchange + window aggregations and
    emits purchase-count rows.

    Reported per purchase: the window click count (identical to the
    linear lane's by construction — the buckets partition its frame),
    the INTEGER total weight, and credit-per-weight-unit (cents/Σw, the
    lane's ONE division, guarded) — a consumer joins actual clicks and
    pays weight·credit_per_weight each; materializing the per-click
    credit table here would re-introduce the explosion.

    Scale: identical profile to the other attribution lanes — one user
    exchange; Spark evaluates all 7 frames off the same sorted
    partition stream. Cross-engine: integer RANGE bounds and integer
    weights; DuckDB runs the same 7 frames."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("ts_us"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    click_flag = F.when(F.col("event_type") == "click", 1)
    tagged = e
    for a in range(_DECAY_BUCKETS):
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts_us")
            .rangeBetween(-(a + 1) * _DAY_US, -(a * _DAY_US + 1))
        )
        tagged = tagged.withColumn(
            f"n_age{a}",
            F.coalesce(F.sum(click_flag).over(w), F.lit(0)).cast("long"),
        )
    n = sum(F.col(f"n_age{a}") for a in range(_DECAY_BUCKETS))
    weight = sum(
        F.col(f"n_age{a}") * F.lit(1 << (_DECAY_BUCKETS - 1 - a))
        for a in range(_DECAY_BUCKETS)
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("cents").alias("purchase_cents"),
            n.cast("long").alias("n_clicks_window"),
            weight.cast("long").alias("weight_total"),
            F.when(n > 0, F.col("cents").cast("double") / weight).alias(
                "credit_per_weight"
            ),
            (n > 0).alias("attributed"),
        )
    )

@register(
    "events_attribution_shapley",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view'   THEN 1 ELSE 0 END)
             + 2 * MAX(CASE WHEN event_type = 'click'  THEN 1 ELSE 0 END)
             + 4 * MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                 AS mask,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS converted
        FROM events GROUP BY user_id
    ),
    coal AS (
        SELECT mask, COUNT(*) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_conv
        FROM per_user GROUP BY mask
    ),
    full8 AS (
        SELECT m.mask,
               COALESCE(c.n_users, 0) AS n_users,
               COALESCE(c.n_conv, 0) AS n_conv,
               CASE WHEN COALESCE(c.n_users, 0) > 0
                    THEN (COALESCE(c.n_conv, 0) * 1000000000) // c.n_users
                    ELSE 0 END AS rate_ppb
        FROM (SELECT CAST(UNNEST(generate_series(0, 7)) AS INTEGER) AS mask) m
        LEFT JOIN coal c ON m.mask = c.mask
    ),
    chan(channel, bit) AS (VALUES ('view', 1), ('click', 2), ('signup', 4)),
    contrib AS (
        SELECT ch.channel,
               (CASE (s.mask % 2) + ((s.mask // 2) % 2) + ((s.mask // 4) % 2)
                     WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END)
               * (tt.rate_ppb - s.rate_ppb) AS c_ppb_x6
        FROM chan ch
        JOIN full8 s ON (s.mask // ch.bit) % 2 = 0
        JOIN full8 tt ON tt.mask = s.mask + ch.bit
    ),
    touched AS (
        SELECT ch.channel,
               CAST(SUM(f.n_users) AS BIGINT) AS users_touched,
               CAST(SUM(f.n_conv) AS BIGINT) AS conv_touched
        FROM chan ch JOIN full8 f ON (f.mask // ch.bit) % 2 = 1
        GROUP BY ch.channel
    )
    SELECT g.channel,
           CAST(SUM(g.c_ppb_x6) AS BIGINT) AS shapley_ppb_x6,
           CAST(SUM(g.c_ppb_x6) AS DOUBLE) / 6.0e9 AS shapley_rate,
           tch.users_touched, tch.conv_touched
    FROM contrib g JOIN touched tch ON g.channel = tch.channel
    GROUP BY g.channel, tch.users_touched, tch.conv_touched
    """,
    tags=("events", "attribution"),
)
def events_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value (data-driven) attribution — the fifth industry
    model beside last-touch / linear / position / time-decay, and the
    only one that is GAME-THEORETIC rather than positional: each
    channel's credit is its average marginal lift in conversion rate
    across every coalition of the other channels (Shapley 1953; the
    model behind Google Analytics' "data-driven attribution").

    Formulation: channels N = {view, click, signup} (the three
    touchable event types; 'purchase' is the conversion, 'error' is
    noise). A user's coalition is the SET of channels that ever touched
    them, the characteristic value v(S) is the conversion rate of users
    with coalition exactly S, and

        phi_i = SUM over S not containing i of
                |S|!(n-1-|S|)!/n! * (v(S + i) - v(S)).

    Determinism: v(S) is quantized to integer PARTS-PER-BILLION by one
    integer division (n_conv * 1e9 div n_users — floor in both
    engines), the n=3 factorial weights are scaled by 6 to the integer
    set {2, 1, 2}, and phi is an exact BIGINT sum of integer products
    (no float reassociation anywhere); the convenience double is ONE
    IEEE division of that exact integer by the exact constant 6.0e9 —
    bit-identical across engines, the repo's rational-arithmetic
    discipline.

    Scale: stage 1 is one map-side-combinable user-keyed exchange over
    a 2-column projection of events (the only data-sized shuffle);
    stage 2 collapses to AT MOST 2^n = 8 coalition rows; the Shapley
    cross-walk is a constant 3 x 4 x 2 row join — driver-trivial at any
    corpus size. Generalizing to n channels grows stage 2 as 2^n rows,
    independent of event count: at 20 channels that is 1M aggregate
    rows, still dwarfed by the scan. Reference parity: the reference
    has no attribution engine; this extends its event-rollup surface
    (src/s3_processor.py:118-160) the way a marketing warehouse would."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type")
    flag = lambda ty: F.max(F.when(F.col("event_type") == ty, 1).otherwise(0))  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        (flag("view") + 2 * flag("click") + 4 * flag("signup")).alias("mask"),
        flag("purchase").alias("converted"),
    )
    return shapley_from_user_state(spark, per_user)


def shapley_from_user_state(spark: SparkSession, per_user: DataFrame) -> DataFrame:
    """The exact-integer coalition walk shared by the lane above and the
    maintained touch store (operators/touch_store.py) — per_user carries
    (user_id or any identity, mask, converted); everything after the
    coalition rollup is constant-size."""
    coal = {
        int(r.mask): (int(r.n_users), int(r.n_conv))
        for r in per_user.groupBy("mask")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("converted").cast("long").alias("n_conv"),
        )
        .collect()  # <= 2^n coalition rows — channel-bounded, ONE scan
    }
    # the coalition table is referenced three times below (S side, T
    # side, touched rollup); rebuilding it as a local relation keeps the
    # events scan single without pinning anything in the block cache
    # (review r9 — a persisted plan here leaked one InMemoryRelation per
    # store read). Rates use the same integer arithmetic as the oracle.
    full8 = spark.createDataFrame(
        [
            (
                m,
                coal.get(m, (0, 0))[0],
                coal.get(m, (0, 0))[1],
                (coal[m][1] * 1_000_000_000) // coal[m][0]
                if coal.get(m, (0, 0))[0] > 0
                else 0,
            )
            for m in range(8)
        ],
        "mask int, n_users long, n_conv long, rate_ppb long",
    )
    chan = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4)], "channel string, bit int"
    )
    s, tt = full8.alias("s"), full8.alias("tt")
    w6 = F.expr(
        "CASE (s.mask % 2) + ((s.mask div 2) % 2) + ((s.mask div 4) % 2)"
        " WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END"
    )
    # Explicit broadcast hints on the non-equi joins (r10): local
    # relations carry no size statistics, so without the hint Spark
    # plans these 3x8-row joins as a CartesianProduct whose partition
    # count is the PRODUCT of the sides' (default-parallelism-sized)
    # partitioning — ~1000 task launches, measured ~10 s each on
    # local[32], for 24 rows. Hinted, each is one sub-second
    # BroadcastNestedLoopJoin.
    contrib = (
        chan.join(F.broadcast(s), F.expr("(s.mask div bit) % 2 = 0"))
        .join(F.broadcast(tt), F.expr("tt.mask = s.mask + bit"))
        .select(
            "channel",
            (w6 * (F.col("tt.rate_ppb") - F.col("s.rate_ppb"))).alias("c_ppb_x6"),
        )
        .groupBy("channel")
        .agg(F.sum("c_ppb_x6").cast("long").alias("shapley_ppb_x6"))
    )
    touched = (
        chan.join(F.broadcast(full8), F.expr("(mask div bit) % 2 = 1"))
        .groupBy("channel")
        .agg(
            F.sum("n_users").cast("long").alias("users_touched"),
            F.sum("n_conv").cast("long").alias("conv_touched"),
        )
    )
    return contrib.join(touched, "channel").select(
        "channel",
        "shapley_ppb_x6",
        (F.col("shapley_ppb_x6").cast("double") / F.lit(6.0e9)).alias("shapley_rate"),
        "users_touched",
        "conv_touched",
    )


_MARKOV_K = 12  # truncated-absorption horizon (steps from 'start')
_MARKOV_STATES = 6  # 0=start 1=view 2=click 3=signup 4=conv 5=null


def _markov_iter_ctes() -> str:
    """Unrolled K-step value iteration (one CTE per step) — the DuckDB
    twin of the builder's integer iteration, generated from the same K
    so the two cannot drift."""
    steps = []
    for k in range(1, _MARKOV_K + 1):
        steps.append(f"""
    v{k} AS (
        SELECT vs.vname, vs.state,
               CAST(CASE WHEN vs.state = 4 THEN 1000000000
                         WHEN vs.state = 5 THEN 0
                         ELSE COALESCE(agg.nv, 0) END AS BIGINT) AS v
        FROM vstates vs
        LEFT JOIN (
            SELECT m.vname, m.src AS state,
                   SUM(m.p_ppb * pv.v) // 1000000000 AS nv
            FROM mats m
            JOIN v{k - 1} pv ON pv.vname = m.vname AND pv.state = m.dst
            GROUP BY m.vname, m.src
        ) agg ON agg.vname = vs.vname AND agg.state = vs.state
    )""")
    return ",".join(steps)


@register(
    "events_attribution_markov",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        FROM events
    ),
    first_p AS (
        SELECT user_id, MIN(ts_us) AS fp_us
        FROM e WHERE event_type = 'purchase' GROUP BY user_id
    ),
    users AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM e GROUP BY user_id
    ),
    touches AS (
        SELECT t.user_id, t.ts_us, t.event_id,
               CASE t.event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                    ELSE 3 END AS state
        FROM e t LEFT JOIN first_p fp ON t.user_id = fp.user_id
        WHERE t.event_type IN ('view', 'click', 'signup')
          AND (fp.fp_us IS NULL OR t.ts_us < fp.fp_us)
    ),
    seq AS (
        SELECT user_id, state,
               LAG(state) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id) AS prev,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts_us DESC, event_id DESC) AS rdesc
        FROM touches
    ),
    trans AS (
        SELECT COALESCE(prev, 0) AS src, state AS dst FROM seq
        UNION ALL
        SELECT s.state AS src, CASE WHEN u.conv = 1 THEN 4 ELSE 5 END AS dst
        FROM seq s JOIN users u ON s.user_id = u.user_id WHERE s.rdesc = 1
        UNION ALL
        SELECT 0 AS src, CASE WHEN u.conv = 1 THEN 4 ELSE 5 END AS dst
        FROM users u
        LEFT JOIN (SELECT DISTINCT user_id FROM touches) tu
               ON u.user_id = tu.user_id
        WHERE tu.user_id IS NULL
    ),
    cnts AS (SELECT src, dst, COUNT(*) AS cnt FROM trans GROUP BY src, dst),
    probs AS (
        SELECT src, dst,
               (cnt * 1000000000) // SUM(cnt) OVER (PARTITION BY src) AS p_ppb
        FROM cnts
    ),
    variants(vname, removed) AS
        (VALUES ('full', -1), ('view', 1), ('click', 2), ('signup', 3)),
    mats AS (
        SELECT v.vname, p.src, p.dst, p.p_ppb
        FROM probs p CROSS JOIN variants v
        WHERE p.src <> v.removed AND p.dst <> v.removed
    ),
    vstates AS (
        SELECT vname, s.state FROM variants
        CROSS JOIN (SELECT CAST(UNNEST(generate_series(0, 5)) AS INTEGER)
                        AS state) s
    ),
    v0 AS (
        SELECT vname, state,
               CAST(CASE WHEN state = 4 THEN 1000000000 ELSE 0 END AS BIGINT)
                   AS v
        FROM vstates
    ),
    {_markov_iter_ctes()},
    reach AS (SELECT vname, v FROM v{_MARKOV_K} WHERE state = 0),
    re AS (
        SELECT c.channel,
               rf.v AS reach_full_ppb,
               rr.v AS reach_removed_ppb,
               CASE WHEN rf.v > 0
                    THEN 1000000000 - (rr.v * 1000000000) // rf.v
               END AS removal_effect_ppb
        FROM (VALUES ('view'), ('click'), ('signup')) c(channel)
        JOIN reach rr ON rr.vname = c.channel
        CROSS JOIN (SELECT v FROM reach WHERE vname = 'full') rf
    )
    SELECT channel, reach_full_ppb, reach_removed_ppb, removal_effect_ppb,
           CASE WHEN SUM(removal_effect_ppb) OVER () > 0
                THEN CAST(removal_effect_ppb AS DOUBLE)
                     / CAST(SUM(removal_effect_ppb) OVER () AS DOUBLE)
           END AS credit_share
    FROM re
    """,
    tags=("events", "attribution"),
)
def events_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution — the SECOND industry
    data-driven model beside events_attribution_shapley (Shapley is
    Google Analytics' algorithm; removal effect is Adobe's and the
    academic standard, Anderl et al. 2014): journeys become a
    first-order Markov chain over states {start, view, click, signup}
    with absorbing {{conv, null}}, and a channel's credit is how much
    the chain's conversion reach DROPS when the channel's state is
    removed (its transitions redirected to null — the "what if this
    channel didn't exist" counterfactual that position rules can't ask).

    Semantics: each user's touch sequence (events before their first
    purchase, in (ts, event_id) order) contributes transitions
    start→first, touch→next, last→conv/null; touchless users contribute
    start→conv/null directly, so the baseline conversion rate anchors
    the chain exactly as the Shapley lane's empty coalition does.

    Determinism: transition probabilities quantize to integer ppb (one
    integer division per matrix cell); conversion reach is K=12-step
    truncated absorption computed by integer value iteration —
    v'(s) = (Σ_t p(s,t)·v(t)) div 1e9 with v(conv)=1e9, v(null)=0 —
    every step an exact BIGINT sum followed by ONE floor division, so
    the builder's Python iteration and the oracle's unrolled CTE chain
    (generated from the same K) produce bit-identical integers; the
    credit share is one IEEE division of exact integers. Removal is
    monotone (a submatrix iterates to a smaller v, floor preserves
    order), so effects are provably in [0, 1e9].

    Scale: the data-sized work is two column-pruned events scans (the
    merged user rollup, then the touch rows) and one user-keyed window
    pass that dual-emits step and terminal edges, down to a ≤6×6
    transition count grid; the collect ships ≤36 integers (channel-bounded, the
    Shapley coalition-table discipline) and the 4-variant × K-step
    solve is O(K·n²) driver arithmetic. n channels grow the grid as
    (n+3)², never with event count. Reference parity: extends the
    reference's event rollups (src/s3_processor.py:118-160) like the
    rest of the attribution family."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", us.alias("ts_us")
    )
    # ONE user rollup carries both the first-purchase instant and the
    # conversion flag (merging them halves the events scans)
    ua = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts_us"))
        ).alias("fp_us"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    # pre-purchase touches, conv carried through so the terminal edge
    # needs no second join; persisted because the touchless anti-join
    # below re-reads the distinct touch users
    touches = (
        e.filter(F.col("event_type").isin("view", "click", "signup"))
        .join(ua, "user_id")
        .filter(F.col("fp_us").isNull() | (F.col("ts_us") < F.col("fp_us")))
        .select(
            "user_id",
            "ts_us",
            "event_id",
            "conv",
            F.when(F.col("event_type") == "view", 1)
            .when(F.col("event_type") == "click", 2)
            .otherwise(3)
            .alias("state"),
        )
        .transform(pin)
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    end_state = F.when(F.col("conv") == 1, 4).otherwise(5)
    # ONE window pass emits both the step edge and (on the last touch,
    # detected by a null lead) the terminal edge — no second branch over
    # the data
    seq = touches.select(
        "state",
        "conv",
        F.lag("state").over(w).alias("prev"),
        F.lead("state").over(w).alias("nxt"),
    )
    step = F.struct(
        F.coalesce("prev", F.lit(0)).alias("src"), F.col("state").alias("dst")
    )
    term = F.struct(F.col("state").alias("src"), end_state.alias("dst"))
    edges = seq.select(
        F.explode(
            F.when(F.col("nxt").isNull(), F.array(step, term)).otherwise(
                F.array(step)
            )
        ).alias("tr")
    ).select("tr.src", "tr.dst")
    touchless = ua.join(
        touches.select("user_id").distinct(), "user_id", "left_anti"
    ).select(F.lit(0).alias("src"), end_state.alias("dst"))
    cnt_rows = edges.unionAll(touchless).groupBy("src", "dst").count().collect()
    touches.unpersist()
    return markov_from_transition_counts(spark, cnt_rows)


def markov_from_transition_counts(spark: SparkSession, cnt_rows) -> DataFrame:
    """The channel-bounded exact-integer removal-effect solve shared by
    the lane above and the maintained Markov store
    (operators/markov_store.py): cnt_rows carries (src, dst, count)
    rows — at most (n_channels+3)^2 of them. Mirrors the oracle CTEs."""
    PPB = 10**9
    cnts: dict[int, dict[int, int]] = {}
    for r in cnt_rows:
        cnts.setdefault(int(r.src), {})[int(r.dst)] = int(r["count"])
    p = {
        src: {dst: (c * PPB) // sum(row.values()) for dst, c in row.items()}
        for src, row in cnts.items()
    }

    def reach(removed: int) -> int:
        v = [0] * _MARKOV_STATES
        v[4] = PPB
        for _ in range(_MARKOV_K):
            nv = list(v)
            for i in range(4):  # transient states only; 4/5 stay fixed
                if i == removed:
                    nv[i] = 0
                    continue
                nv[i] = (
                    sum(
                        pij * v[j]
                        for j, pij in p.get(i, {}).items()
                        if j != removed
                    )
                    // PPB
                )
            v = nv
        return v[0]

    rf = reach(-1)
    chans = (("view", 1), ("click", 2), ("signup", 3))
    rr = {name: reach(code) for name, code in chans}
    re = {
        name: (PPB - (rr[name] * PPB) // rf) if rf > 0 else None
        for name, _ in chans
    }
    total = sum(x for x in re.values() if x is not None)
    rows = [
        (
            name,
            rf,
            rr[name],
            re[name],
            (float(re[name]) / float(total))
            if re[name] is not None and total > 0
            else None,
        )
        for name, _ in chans
    ]
    return spark.createDataFrame(
        rows,
        "channel string, reach_full_ppb long, reach_removed_ppb long, "
        "removal_effect_ppb long, credit_share double",
    )


@register(
    "events_ab_cuped",
    oracle=f"""
    WITH e AS (
        SELECT user_id,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents,
               CAST(ts AS DATE) < DATE '2024-01-16' AS pre
        FROM events
    ),
    u AS (
        SELECT user_id,
               CAST(COALESCE(SUM(cents) FILTER (WHERE pre), 0) AS BIGINT) AS x,
               CAST(COALESCE(SUM(cents) FILTER (WHERE NOT pre), 0) AS BIGINT)
                   AS y,
               {SQL_POLYHASH.format(s="CAST(user_id AS VARCHAR)")} % 2 AS variant
        FROM e GROUP BY user_id
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx
        FROM u
    ),
    th AS (
        SELECT n, sx,
               CASE WHEN n * sxx - CAST(sx AS HUGEINT) * sx > 0
                    THEN CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                         / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                    ELSE 0.0 END AS theta
        FROM mom
    )
    SELECT u.variant,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(u.x) AS BIGINT) AS sum_x_cents,
           CAST(SUM(u.y) AS BIGINT) AS sum_y_cents,
           CAST(SUM(u.y) AS DOUBLE) / COUNT(*) AS mean_y_cents,
           CAST(SUM(u.y) AS DOUBLE) / COUNT(*)
             - th.theta * (CAST(SUM(u.x) AS DOUBLE) / COUNT(*)
                           - CAST(th.sx AS DOUBLE) / th.n)
               AS adj_mean_y_cents,
           th.theta AS theta
    FROM u CROSS JOIN th
    GROUP BY u.variant, th.theta, th.sx, th.n
    """,
    tags=("events", "experiment"),
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM 2013 —
    public method, used by every large experimentation platform): the
    post-period metric Y per user is adjusted by the PRE-period
    covariate X, Y' = Y − θ(X − X̄) with θ = cov(X,Y)/var(X), shrinking
    variance by the X–Y correlation² without biasing the treatment
    contrast. Variant assignment is the deterministic identity-hash
    split (corpus_split_assign's polyhash % 2): reproducible across
    engines and re-runs, no stored assignment table.

    Determinism discipline: per-user X/Y are exact integer cents;
    the θ co-moments n·Σxy − Σx·Σy and n·Σx² − (Σx)² accumulate in
    decimal(38,0)/HUGEINT (order-independent integer sums — per-user
    cents ~1e7 squared ×1e8 users stays inside 38 digits); θ and the
    adjusted means are then produced by the IDENTICAL IEEE sequence in
    both engines (integer→double casts, one division each, one
    multiply-subtract). No float accumulation anywhere.

    Scale: one groupBy(user_id) over the scan (the per-user ledger),
    one single-row co-moment agg cross-joined back (broadcast), one
    two-row groupBy(variant). Output is ≤2 rows."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
        (F.col("ts").cast("date") < F.lit("2024-01-16").cast("date")).alias("pre"),
    )
    u = e.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("pre"), F.col("cents"))), F.lit(0))
        .cast("long")
        .alias("x"),
        F.coalesce(F.sum(F.when(~F.col("pre"), F.col("cents"))), F.lit(0))
        .cast("long")
        .alias("y"),
    ).select(
        "x",
        "y",
        (polyhash(F.col("user_id").cast("string")) % 2).cast("long").alias("variant"),
    )
    mom = u.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
    )
    th = mom.select(
        "n",
        "sx",
        F.when(
            F.expr("n * sxx - CAST(sx AS DECIMAL(38,0)) * sx") > 0,
            F.expr("CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)")
            / F.expr("CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"),
        )
        .otherwise(F.lit(0.0))
        .alias("theta"),
    )
    g = u.groupBy("variant").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("sum_x_cents"),
        F.sum("y").cast("long").alias("sum_y_cents"),
    )
    return g.crossJoin(F.broadcast(th)).select(
        "variant",
        "n_users",
        "sum_x_cents",
        "sum_y_cents",
        (F.col("sum_y_cents").cast("double") / F.col("n_users")).alias(
            "mean_y_cents"
        ),
        (
            F.col("sum_y_cents").cast("double") / F.col("n_users")
            - F.col("theta")
            * (
                F.col("sum_x_cents").cast("double") / F.col("n_users")
                - F.col("sx").cast("double") / F.col("n")
            )
        ).alias("adj_mean_y_cents"),
        "theta",
    )
