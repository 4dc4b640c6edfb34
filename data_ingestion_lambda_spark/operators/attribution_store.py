"""Maintained last-touch attribution — the PRODUCTION form of the
registered ``events_attribution_last_touch`` lane, which re-sorts the
whole event stream per run. Attribution state decomposes by calendar
day the same way sessions decompose into chains:

- a purchase's winning click is either (a) the latest SAME-DAY click
  before it — computable inside the day's own batch with the lane's
  running struct max — or (b) some PREVIOUS day's latest click by that
  user, in which case only that day's LAST click can win (any earlier
  click of that day is dominated by it, and cross-day dominance is
  resolved read-side by the struct max over days).

So each daily apply persists THREE artifacts in the batch date's own
partition (``date=<batch>`` — the replay-idempotence key, day-pure
like the session store's calendar ledger):

  {index}/purchases : (purchase_id, user_id, ts_us, cents,
                       same-day candidate click struct or NULL,
                       same-day prior click count)
  {index}/last_clicks : one (user_id, cts, cid) row per user who
                        clicked that day — |active users| rows,
                        NEVER event-count rows
  {index}/clicks : (user_id, cts) — the day's click timestamps, the
                   one event-bounded artifact (a 2-column projection):
                   the LINEAR read needs exact timestamps because a
                   per-day count cannot resolve the partial boundary
                   day of the microsecond window; the last-touch read
                   never touches it

``read_attribution`` then joins each purchase against its user's
last-click rows from the preceding {_LOOKBACK_DAYS} day partitions
(partition-pruned by date), takes the struct max of those and the
same-day candidate, and applies the 7-day cutoff — EXACTLY the
one-shot lane's winner (pinned row-equal in
tests/test_attribution_store.py for any day split, including replays).

Economics: a day's apply scans only its own events (one user-keyed
window); the read joins purchase-count rows against <= {_LOOKBACK_DAYS}
x |clicking users/day| last-click rows — the 100 TB event history is
never re-read to attribute today's purchases.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.upsert import (
    _hadoop_fs,
    replace_partitions,
)
from data_ingestion_lambda_spark.plans.events_queries import _ATTR_WINDOW_US

_LOOKBACK_DAYS = 7  # matches _ATTR_WINDOW_US = 7 days


def apply_attribution_batch(
    spark: SparkSession, index_dir: str, batch_events: DataFrame, batch_date: str
) -> dict:
    """Land one DAY-PURE batch's purchases (with same-day candidates)
    and per-user last clicks under ``date=<batch_date>``. Re-running the
    same (batch, date) overwrites only its own partitions — idempotent.
    Day purity is the replay discipline (the date key must own all of
    its day's events), exactly the session store's contract."""
    _dt.date.fromisoformat(batch_date)
    stray = batch_events.filter(
        F.col("ts").isNull()
        | (F.to_date("ts") != F.lit(batch_date).cast("date"))
    ).limit(1)
    if stray.count() > 0:
        raise ValueError(
            f"apply_attribution_batch: batch contains events outside "
            f"{batch_date} (or NULL ts); the calendar ledger requires "
            "day-pure batches — re-apply the other date(s) separately"
        )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = batch_events.select(
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
    click_struct = F.when(
        F.col("event_type") == "click",
        F.struct(F.col("ts_us").alias("cts"), F.col("event_id").alias("cid")),
    )
    click_flag = F.when(F.col("event_type") == "click", 1).otherwise(0)
    purchases = (
        e.withColumn("same_day_click", F.max(click_struct).over(w))
        # same-day PRIOR click count rides the same window — the linear
        # read needs it (prior days contribute via the clicks artifact;
        # same-day clicks after the purchase must not count)
        .withColumn(
            "same_day_prior_clicks",
            F.coalesce(F.sum(click_flag).over(w), F.lit(0)).cast("long"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "ts_us",
            "cents",
            "same_day_click",
            "same_day_prior_clicks",
        )
        .withColumn("date", F.lit(batch_date))
    )
    last_clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(
            F.max(
                F.struct(F.col("ts_us").alias("cts"), F.col("event_id").alias("cid"))
            ).alias("last_click")
        )
        .select("user_id", "last_click.cts", "last_click.cid")
        .withColumn("date", F.lit(batch_date))
    )
    # The LINEAR read needs every prior-window click's exact timestamp
    # (a per-day count cannot resolve the partial boundary day), so the
    # day's clicks persist as (user_id, cts) rows — a two-column
    # projection of the day's click events, the one event-bounded
    # artifact in the store (documented cost of exact equal-credit; the
    # last-touch read never touches it).
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts_us").alias("cts"))
        .withColumn("date", F.lit(batch_date))
    )
    replace_partitions(spark, f"{index_dir}/purchases", purchases, [batch_date])
    replace_partitions(spark, f"{index_dir}/last_clicks", last_clicks, [batch_date])
    replace_partitions(spark, f"{index_dir}/clicks", clicks, [batch_date])
    return {"index": index_dir, "date": batch_date}


def read_attribution(spark: SparkSession, index_dir: str) -> DataFrame:
    """The attribution table — row-equal to
    ``events_attribution_last_touch`` over the same events: per
    purchase, the struct max of its same-day candidate and its user's
    last clicks from the preceding {_LOOKBACK_DAYS} day partitions,
    under the 7-day cutoff. The cross-day join is user-keyed against
    last-click rows only (user-bounded, partition-pruned to the
    lookback window per purchase date read-side via the date
    inequality)."""
    fs, path_cls = _hadoop_fs(spark, index_dir)
    if not fs.exists(path_cls(f"{index_dir}/purchases")):
        raise ValueError(f"read_attribution: no purchases ledger at {index_dir}")
    p = spark.read.parquet(f"{index_dir}/purchases").withColumn(
        "pdate", F.col("date").cast("date")
    )
    have_clicks = fs.exists(path_cls(f"{index_dir}/last_clicks"))
    if have_clicks:
        c = spark.read.parquet(f"{index_dir}/last_clicks").select(
            "user_id",
            "cts",
            "cid",
            F.col("date").cast("date").alias("cdate"),
        )
        # prior-day candidates: strictly earlier date, within the lookback
        joined = p.join(
            c,
            (p["user_id"] == c["user_id"])
            & (c["cdate"] < p["pdate"])
            & (c["cdate"] >= F.date_sub(p["pdate"], _LOOKBACK_DAYS)),
            "left",
        ).select(
            p["purchase_id"],
            p["user_id"],
            p["ts_us"],
            p["cents"],
            p["same_day_click"],
            F.when(
                c["cts"].isNotNull(),
                F.struct(c["cts"].alias("cts"), c["cid"].alias("cid")),
            ).alias("prior_click"),
        )
    else:
        joined = p.select(
            "purchase_id",
            "user_id",
            "ts_us",
            "cents",
            "same_day_click",
            F.lit(None)
            .cast("struct<cts:bigint,cid:bigint>")
            .alias("prior_click"),
        )
    # struct max resolves cross-day dominance; F.greatest skips NULLs, so
    # a purchase with only one side present keeps it (same_day_click is
    # constant across a purchase's joined rows — first() just picks it)
    best = joined.groupBy("purchase_id", "user_id", "ts_us", "cents").agg(
        F.greatest(F.max("prior_click"), F.first("same_day_click")).alias(
            "best_click"
        )
    )
    attributed = F.col("best_click").isNotNull() & (
        F.col("ts_us") - F.col("best_click.cts") <= F.lit(_ATTR_WINDOW_US)
    )
    return best.withColumn("attributed", attributed).select(
        F.col("purchase_id"),
        "user_id",
        F.col("cents").alias("purchase_cents"),
        F.when(F.col("attributed"), F.col("best_click.cid")).alias("click_id"),
        F.when(
            F.col("attributed"),
            (F.col("ts_us") - F.col("best_click.cts")).cast("long"),
        ).alias("gap_us"),
        "attributed",
    )


def read_attribution_linear(spark: SparkSession, index_dir: str) -> DataFrame:
    """The equal-credit attribution table — row-equal to
    ``events_attribution_linear`` over the same events: per purchase,
    the window click count is its SAME-DAY prior count (persisted at
    apply time from the day's own window) plus the exact count of
    prior-day clicks inside the 7-day microsecond window, read from the
    store's (user_id, cts) click rows with a date-pruned, user-keyed
    join. One guarded division for the per-click credit."""
    fs, path_cls = _hadoop_fs(spark, index_dir)
    if not fs.exists(path_cls(f"{index_dir}/purchases")):
        raise ValueError(
            f"read_attribution_linear: no purchases ledger at {index_dir}"
        )
    p = spark.read.parquet(f"{index_dir}/purchases").withColumn(
        "pdate", F.col("date").cast("date")
    )
    if fs.exists(path_cls(f"{index_dir}/clicks")):
        c = spark.read.parquet(f"{index_dir}/clicks").select(
            "user_id", "cts", F.col("date").cast("date").alias("cdate")
        )
        joined = p.join(
            c,
            (p["user_id"] == c["user_id"])
            & (c["cdate"] < p["pdate"])
            & (c["cdate"] >= F.date_sub(p["pdate"], _LOOKBACK_DAYS))
            & (c["cts"] < p["ts_us"])
            & (p["ts_us"] - c["cts"] <= F.lit(_ATTR_WINDOW_US)),
            "left",
        ).select(
            p["purchase_id"],
            p["user_id"],
            p["ts_us"],
            p["cents"],
            p["same_day_prior_clicks"],
            c["cts"].alias("prior_cts"),
        )
    else:
        joined = p.select(
            "purchase_id",
            "user_id",
            "ts_us",
            "cents",
            "same_day_prior_clicks",
            F.lit(None).cast("bigint").alias("prior_cts"),
        )
    counted = joined.groupBy(
        "purchase_id", "user_id", "ts_us", "cents", "same_day_prior_clicks"
    ).agg(F.count("prior_cts").cast("long").alias("n_prior"))
    n = (F.col("same_day_prior_clicks") + F.col("n_prior")).cast("long")
    return counted.select(
        "purchase_id",
        "user_id",
        F.col("cents").alias("purchase_cents"),
        n.alias("n_clicks_window"),
        F.when(n > 0, F.col("cents").cast("double") / n).alias("credit_per_click"),
        (n > 0).alias("attributed"),
    )
