"""Keyed idempotent upsert — the reference's core sink (S7), Spark-first.

Reference: per-row ``INSERT … ON CONFLICT (date, client_id) DO UPDATE``
over a single psycopg2 connection (src/db_operations.py:56-106) — one SQL
round-trip per row, sequential.

Here: a partition-pruned last-writer-wins MERGE over a parquet table
partitioned by the key's date component.

Scale design (the part that must survive 100 TB):
- The target is date-partitioned. A batch only ever touches the partitions
  for dates it contains, so the merge reads+rewrites ONLY those partitions
  (dynamic partition overwrite), never the whole table. Daily ingest over
  years of history rewrites one day, not 100 TB.
- Within affected partitions the winner per key is picked with one window
  (`row_number` over key, newest first) — a single shuffle on the upsert
  key, map-side combinable nowhere but linear in partition size.
- `created_at` semantics (set once on first insert, src/db_operations.py:79)
  are preserved by carrying the existing row's created_at through the merge.
- Idempotence: re-running the same batch yields the same table state (the
  reference gets this accidentally from ON CONFLICT; here it is explicit),
  which is what makes foreachBatch retries exactly-once end-to-end.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.schemas import UPSERT_KEYS

PARTITION_COL = "date"


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path-class) for ``path``'s own scheme
    (s3a/hdfs/file/...) via the JVM Hadoop FS API — the FS-agnostic
    replacement for os.path operations."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    return path_cls(path).getFileSystem(hconf), path_cls


def _target_exists(spark: SparkSession, path: str) -> bool:
    fs, path_cls = _hadoop_fs(spark, path)
    return fs.exists(path_cls(path))


def merge_last_writer_wins(
    existing: DataFrame | None,
    batch: DataFrame,
    keys: list[str] = UPSERT_KEYS,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Pure merge: the winner per key is picked by ``order_cols``.

    Two ordering regimes, split by column-name convention:

    - **Provenance order cols** (underscore-prefixed, e.g. the default
      ``_ingest_seq``): only batch rows carry them, so ``_is_new`` ranks
      first — batch beats stored, later batch row beats earlier (classic
      last-writer-wins ingest).
    - **Payload order cols** (e.g. the rollup's ``n_events``): BOTH sides
      carry real values, so they rank *before* ``_is_new`` — a stored row
      with a larger value survives a stale batch. This is what makes a
      monotone continuous-aggregate MERGE idempotent under replay from an
      older/rebuilt checkpoint: a re-emitted smaller count can never
      regress the stored window. ``_is_new`` stays as the tie-break so an
      equal-valued re-merge refreshes the batch copy (same table state).

    Expects ``batch`` with columns: key cols + payload + updated_at;
    ``existing`` additionally has created_at.
    """
    order_cols = order_cols or ["_ingest_seq"]
    b = batch
    if "_ingest_seq" in order_cols and "_ingest_seq" not in b.columns:
        b = b.withColumn("_ingest_seq", F.monotonically_increasing_id())
    b = b.withColumn("_is_new", F.lit(1))
    if "created_at" not in b.columns:
        b = b.withColumn("created_at", F.col("updated_at"))

    if existing is None:
        merged = b
    else:
        e = existing.withColumn("_is_new", F.lit(0))
        # Existing rows never carry ingest-provenance columns; NULL loses
        # every comparison but _is_new=0 already ranks them last.
        for c in order_cols:
            if c not in e.columns:
                e = e.withColumn(c, F.lit(None))
        merged = b.unionByName(e.select(*b.columns))

    # One shuffle on the upsert key. Payload order cols outrank _is_new
    # (both sides have real values; NULLs sort last under desc so a NULL
    # payload value never beats a real one); provenance cols rank after it.
    payload_order = [c for c in order_cols if not c.startswith("_")]
    provenance_order = [c for c in order_cols if c.startswith("_")]
    w = Window.partitionBy(*keys).orderBy(
        *[F.desc(c) for c in payload_order],
        F.desc("_is_new"),
        *[F.desc(c) for c in provenance_order],
    )
    first_created = F.min("created_at").over(Window.partitionBy(*keys))
    # Drop bookkeeping columns; an order col that is real payload (e.g.
    # ordering by updated_at) stays — only underscore-prefixed plumbing
    # columns are internal by convention.
    internal = [c for c in order_cols if c.startswith("_")]
    return (
        merged.withColumn("created_at", first_created)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_new", "_ingest_seq", *internal)
    )


def list_partition_dates(spark: SparkSession, target_dir: str) -> list[str]:
    """Date values present in ``target_dir`` (from partition directory
    names — one LIST, no file reads)."""
    fs, path_cls = _hadoop_fs(spark, target_dir)
    root = path_cls(target_dir)
    if not fs.exists(root):
        return []
    out = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith(f"{PARTITION_COL}="):
            out.append(name.split("=", 1)[1])
    return sorted(out)


def _align_schemas(existing: DataFrame, batch: DataFrame):
    """Additive schema evolution for the upsert target: a NEW batch column
    widens the stored table (old rows read as NULL); a column the batch
    stopped sending stays, NULL on the batch side, so history is never
    dropped by a producer change. A TYPE change on a shared column is
    rejected loudly — silent cross-type coercion is how a long-lived
    table corrupts (the reference has no schema contract at all beyond
    name presence, SURVEY §1.3; this is the managed version)."""
    e_types = dict(existing.dtypes)
    b_types = dict(batch.dtypes)
    conflicts = {
        c: (e_types[c], b_types[c])
        for c in e_types.keys() & b_types.keys()
        # PARTITION_COL is excluded: partition-directory inference types it
        # (date vs the batch's string) and the merge has always normalized
        # it — not a producer schema change.
        if e_types[c] != b_types[c] and not c.startswith("_") and c != PARTITION_COL
    }
    if conflicts:
        raise ValueError(
            f"incompatible schema evolution — column type changes: {conflicts}; "
            "cast the batch explicitly or migrate the table"
        )
    for c, dt in b_types.items():
        if c not in e_types:
            existing = existing.withColumn(c, F.lit(None).cast(dt))
    for c, dt in e_types.items():
        if c not in b_types and not c.startswith("_"):
            batch = batch.withColumn(c, F.lit(None).cast(dt))
    return existing, batch


def upsert_into_parquet(
    spark: SparkSession,
    target_dir: str,
    batch: DataFrame,
    keys: list[str] = UPSERT_KEYS,
    order_cols: list[str] | None = None,
) -> list:
    """MERGE ``batch`` into the date-partitioned parquet table at
    ``target_dir``, touching only the partitions present in the batch.
    Returns the list of date values written (empty for an empty batch).

    Commit protocol: the merged result is fully materialized into a hidden
    staging directory first (dot-prefixed → invisible to readers), then
    each touched date partition is swapped in with a delete+rename. The
    full-job failure mode (crash during the merge write) therefore leaves
    the target untouched; the remaining non-atomic window is the instant
    between one partition's delete and its rename — a crash exactly there
    requires re-running the batch for that date (the merge is idempotent,
    so the re-run converges). Per-file, the reference has the same shape
    via DB transactions (src/db_operations.py:29)."""
    batch = batch.cache()
    try:
        batch_dates = [r[0] for r in batch.select(PARTITION_COL).distinct().collect()]
        if not batch_dates:
            return []

        # Partition listing through the Hadoop FS API so the same code
        # works on s3a://, hdfs://, abfss:// and file:// targets. Gating
        # the read on actual date=* partitions (not bare dir existence)
        # also survives a target emptied by retention or a crashed swap —
        # a bare spark.read.parquet on an empty dir throws and would wedge
        # every subsequent ingest run.
        existing = None
        if list_partition_dates(spark, target_dir):
            # Partition pruning: read only the dates this batch touches.
            # mergeSchema: partitions written before an additive schema
            # evolution carry the narrower schema; the union read widens
            # them with NULLs.
            existing = (
                spark.read.option("mergeSchema", "true")
                .parquet(target_dir)
                .filter(F.col(PARTITION_COL).isin(batch_dates))
            )
            existing, batch = _align_schemas(existing, batch)

        merged = merge_last_writer_wins(existing, batch, keys=keys, order_cols=order_cols)
        # (No extra repartition: the merge window already shuffled by key,
        # and AQE coalesces output partitions.)
        replace_partitions(spark, target_dir, merged, batch_dates)
        return batch_dates
    finally:
        batch.unpersist()


_NULL_DIGEST = "-" * 32  # fixed-width, not hex: unreachable by md5


def _row_digest(
    df: DataFrame, keys: list[str], alias: str, ignore: tuple = ()
) -> DataFrame:
    """(keys..., <alias>) with one md5 digest over every non-key,
    non-internal, non-ignored column — the snapshot-diff discipline
    (each column hashed independently, NULL → a fixed-width non-hex
    sentinel, digests concatenated) so change detection never confuses
    NULL with a literal or shifts field boundaries on separator
    characters."""
    cols = sorted(
        c
        for c in df.columns
        if c not in keys and c not in ignore and not c.startswith("_")
    )
    per_col = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit(_NULL_DIGEST))
        for c in cols
    ]
    digest = F.md5(F.concat(*per_col)) if per_col else F.lit(_NULL_DIGEST)
    return df.select(*keys, digest.alias(alias))


def upsert_into_parquet_with_cdc(
    spark: SparkSession,
    target_dir: str,
    batch: DataFrame,
    change_key: str,
    changes_dir: str | None = None,
    keys: list[str] = UPSERT_KEYS,
    order_cols: list[str] | None = None,
    ignore_cols: tuple = (),
) -> dict:
    """MERGE like ``upsert_into_parquet`` and ALSO persist the batch's
    CHANGE FEED: one row per key the merge actually touched, labeled
    ``insert`` (key new to its partition) or ``update`` (key existed,
    any payload column changed), carrying the full post-merge row.
    Unchanged keys (a stale batch row losing last-writer-wins, or a
    bit-identical re-send) emit NOTHING — the feed is the merge's
    effect, not its input. Deletes cannot occur under this merge.

    This is the change-data-capture contract downstream incrementals
    need: applying the feed rows (upsert by key) to any copy of the
    PRE-merge table reproduces the POST-merge table exactly — pinned in
    tests/test_upsert_cdc.py. The feed lands under
    ``changes_dir`` (default ``{target}/_changes`` — underscore-hidden
    from readers of the table itself) in its own
    ``date=<change_key>`` partition via the staged swap, so a replayed
    (batch, change_key) overwrites only its own feed partition —
    idempotent end to end.

    ``ignore_cols`` excludes columns from change DETECTION (the feed row
    still carries their post-merge values) — pass the processing-time
    audit columns (updated_at/created_at) so an identical re-send whose
    only difference is a refreshed ingest timestamp is a no-op, not an
    update; the documented cost is that the apply-feed-to-pre
    equivalence then holds up to those columns on unchanged-payload
    rows.

    Plan cost over the plain upsert: the merged result is persisted and
    compared against the pre-merge rows of the touched partitions with
    ONE keys-equi left join of row DIGESTS (never payload) — partition-
    pruned exactly like the merge read itself."""
    batch = batch.cache()
    try:
        batch_dates = [r[0] for r in batch.select(PARTITION_COL).distinct().collect()]
        if not batch_dates:
            return {"dates": [], "inserts": 0, "updates": 0}

        existing = None
        if list_partition_dates(spark, target_dir):
            existing = (
                spark.read.option("mergeSchema", "true")
                .parquet(target_dir)
                .filter(F.col(PARTITION_COL).isin(batch_dates))
            )
            existing, batch_aligned = _align_schemas(existing, batch)
        else:
            batch_aligned = batch

        merged = merge_last_writer_wins(
            existing, batch_aligned, keys=keys, order_cols=order_cols
        ).persist()
        try:
            # The CDC rows must be MATERIALIZED before the partition swap:
            # `existing` lazily reads the very files the swap deletes.
            if existing is None:
                cdc = merged.withColumn("_op", F.lit("insert"))
            else:
                pre = _row_digest(existing, keys, "_pre_digest", ignore=ignore_cols)
                post = _row_digest(merged, keys, "_post_digest", ignore=ignore_cols)
                changed = (
                    post.join(pre, keys, "left")
                    .filter(
                        F.col("_pre_digest").isNull()
                        | (F.col("_post_digest") != F.col("_pre_digest"))
                    )
                    .select(
                        *keys,
                        F.when(F.col("_pre_digest").isNull(), "insert")
                        .otherwise("update")
                        .alias("_op"),
                    )
                )
                cdc = merged.join(changed, keys)
            feed_dir = changes_dir or f"{target_dir}/_changes"
            # Persisted: the digest comparison reads the pre-merge
            # partitions and hashes both sides — without the cache, the
            # emptiness probe and the feed write would each pay that
            # pipeline in full.
            feed = (
                cdc.select(
                    F.col("_op").alias("op"),
                    *[c for c in merged.columns if c != PARTITION_COL],
                    # pinned to string: the merged frame's date type differs
                    # between the first batch (no existing table — the
                    # batch's own string) and later ones (the union coerces
                    # toward the stored partition column's DATE), and a
                    # feed whose partitions disagree on row_date's physical
                    # type breaks every multi-partition read (erasure,
                    # subscribers reading a batch range)
                    F.col(PARTITION_COL).cast("string").alias("row_date"),
                )
                .withColumn(PARTITION_COL, F.lit(change_key))
                .persist()
            )
            if feed.limit(1).count() == 0:
                # Nothing changed. Either this logical batch genuinely had
                # no effect (every row lost last-writer-wins or re-sent
                # identical payloads) — no feed partition to write — or
                # this is an at-least-once REPLAY of a batch whose effect
                # already applied: the recompute against the post-apply
                # state is empty, and overwriting the feed with it would
                # destroy the logical batch's recorded effect. Keep any
                # existing partition; the table swap below still re-merges
                # (idempotent either way).
                counts = {}
            else:
                replace_partitions(spark, feed_dir, feed, [change_key])
                counts = {
                    r["op"]: r["n"]
                    for r in spark.read.parquet(
                        f"{feed_dir}/{PARTITION_COL}={change_key}"
                    )
                    .groupBy("op")
                    .agg(F.count("*").alias("n"))
                    .collect()
                }
            replace_partitions(spark, target_dir, merged, batch_dates)
        finally:
            merged.unpersist()
            try:
                feed.unpersist()
            except NameError:
                pass  # existing is None path never built a feed frame
        return {
            "dates": batch_dates,
            "inserts": counts.get("insert", 0),
            "updates": counts.get("update", 0),
            "changes_dir": feed_dir,
        }
    finally:
        batch.unpersist()


def replace_partitions(
    spark: SparkSession,
    target_dir: str,
    df: DataFrame,
    dates,
    extra_partition_cols: tuple[str, ...] = (),
    part_col: str = PARTITION_COL,
) -> None:
    """Staged per-partition commit: materialize ``df`` into a hidden
    staging directory (dot-prefixed → invisible to readers), then swap
    each listed date partition in with delete+rename.

    ``extra_partition_cols`` adds secondary Hive partition levels UNDER
    the date (e.g. ``date=D/cell=C/``) so readers can partition-prune on
    them; the commit protocol is unchanged — the swap still moves whole
    ``date=D`` directories (sub-partitions ride along atomically), so the
    idempotence and failure contracts below hold regardless.

    Empty partitions REPLACE too (ADVICE r9): a listed date for which
    ``df`` stages no rows means "this partition's new content is
    empty" — the old partition is deleted outright, mirroring the
    fully-erased-partition handling in ``erasure.erase_keys``. Without
    this, re-applying a corrected store batch that now produces zero
    rows would silently leave the stale partition in place. (Callers
    that want "empty recompute keeps the old partition" — the CDC
    feed's replay guard — must skip the call, as that caller does.)

    Stage 1 fully consumes any snapshot reads of the live partitions
    before stage 2 touches them; rename is atomic on HDFS-like stores, so
    the non-atomic window is one partition's delete→rename instant.
    Failure safety: Hadoop rename reports most failures by RETURNING
    FALSE, not raising — a failed or crashed swap raises and PRESERVES the
    staging directory (it holds the only copy of that partition's merged
    data, including pre-existing rows); the error names the path for
    manual recovery or a re-run."""
    staging_dir = f"{target_dir}/.staging-{uuid.uuid4().hex}"
    df.write.mode("overwrite").partitionBy(
        part_col, *extra_partition_cols
    ).parquet(staging_dir)

    fs, path_cls = _hadoop_fs(spark, target_dir)
    fs.mkdirs(path_cls(target_dir))
    for d in dates:
        part = f"{part_col}={d}"
        src = path_cls(f"{staging_dir}/{part}")
        dst = path_cls(f"{target_dir}/{part}")
        if fs.exists(src):
            if fs.exists(dst) and not fs.delete(dst, True):
                raise IOError(
                    f"partition swap failed: delete {dst} returned false; "
                    f"staged data preserved under {staging_dir}"
                )
            if not fs.rename(src, dst):
                raise IOError(
                    f"partition swap failed: rename {src} -> {dst} returned false; "
                    f"staged data preserved under {staging_dir}"
                )
        elif fs.exists(dst):
            # df staged nothing for this listed date: its new content is
            # empty — replace means delete, not keep (ADVICE r9). Hadoop
            # FS reports most failures by RETURNING FALSE, not raising —
            # a swallowed false here would keep serving the stale rows
            # this branch exists to remove (review r10).
            if not fs.delete(dst, True):
                raise IOError(
                    f"empty-partition replace failed: delete {dst} returned false"
                )
    # All swaps succeeded — only now discard staging. (On failure the
    # staging dir is deliberately left in place; it is dot-prefixed, so
    # readers never see it.)
    fs.delete(path_cls(staging_dir), True)


def read_consumptions(spark: SparkSession, target_dir: str) -> DataFrame:
    return spark.read.parquet(target_dir)
