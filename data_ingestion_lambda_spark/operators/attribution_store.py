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

So each daily apply persists TWO user-bounded artifacts in the batch
date's own partition (``date=<batch>`` — the replay-idempotence key,
day-pure like the session store's calendar ledger):

  {index}/purchases : (purchase_id, user_id, ts_us, cents,
                       same-day candidate click struct or NULL)
  {index}/last_clicks : one (user_id, cts, cid) row per user who
                        clicked that day — |active users| rows,
                        NEVER event-count rows

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
    purchases = (
        e.withColumn("same_day_click", F.max(click_struct).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "ts_us",
            "cents",
            "same_day_click",
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
    replace_partitions(spark, f"{index_dir}/purchases", purchases, [batch_date])
    replace_partitions(spark, f"{index_dir}/last_clicks", last_clicks, [batch_date])
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
