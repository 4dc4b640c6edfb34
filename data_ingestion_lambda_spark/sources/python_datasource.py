"""Custom source on the Spark 4 Python DataSource API (SURVEY §2.1 EXT).

The reference hard-codes its one source (boto3 S3 listing + pandas CSV,
`/root/reference/src/s3_processor.py:10-110`). Spark's extension point for
"a source the built-in formats don't cover" is the Python DataSource API
(SPARK-44076): schema + partition planning + per-partition readers, with
filter pushdown (SPARK-48788) so predicates prune work before it is
scheduled. This module implements it end-to-end with a deterministic
synthetic events source — the shape any custom REST/queue/tenant-API
connector takes:

- ``partitions()`` returns one ``InputPartition`` per logical day, so a
  1000-executor cluster reads 1000 days concurrently — planning, not
  data, flows through the driver.
- ``pushFilters()`` receives Catalyst's conjunctive predicates; bounds on
  the partition column ``day`` prune whole partitions (observable from
  the outside: the filtered scan plans fewer RDD partitions). Pushed
  filters are also RETURNED as unhandled, so Spark re-evaluates them —
  advisory pushdown, the same contract as parquet's PushedFilters, which
  keeps the source trivially correct.
- ``read()`` yields plain tuples; content is a pure function of
  (day, i) in exact integer arithmetic, so the same rows are
  reproducible in any engine — the registered query's DuckDB oracle
  replays the formula with generate_series and hash-matches.

At 100 TB the equivalent source points each partition at one object/
shard/day and the pushed bounds prune the listing itself; nothing here
buffers more than one row at a time.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    DataSourceWriter,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.session import SparkSession

_SCHEMA = "day int, event_id bigint, user_id bigint, event_type string, value_cents bigint"
_EVENT_TYPES = ("view", "click", "purchase")


def _rows_for_day(day: int, rows_per_day: int) -> Iterator[tuple]:
    for i in range(rows_per_day):
        event_id = day * rows_per_day + i
        yield (
            day,
            event_id,
            (event_id * 7919) % 97,
            _EVENT_TYPES[event_id % 3],
            (event_id * 31) % 10_000,
        )


class _DayPartition(InputPartition):
    def __init__(self, day: int):
        self.day = day


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self._days = int(options.get("days", 4))
        self._rows_per_day = int(options.get("rows_per_day", 500))
        self._lo = 0  # inclusive bound on day, tightened by pushed filters
        self._hi = self._days - 1

    def pushFilters(self, filters: Sequence[Filter]):
        for f in filters:
            if getattr(f, "attribute", None) == ("day",):
                if isinstance(f, EqualTo):
                    self._lo = max(self._lo, f.value)
                    self._hi = min(self._hi, f.value)
                elif isinstance(f, GreaterThan):
                    self._lo = max(self._lo, f.value + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self._lo = max(self._lo, f.value)
                elif isinstance(f, LessThan):
                    self._hi = min(self._hi, f.value - 1)
                elif isinstance(f, LessThanOrEqual):
                    self._hi = min(self._hi, f.value)
            # every filter is returned unhandled: the bounds above only
            # PRUNE partitions; Spark still applies the predicate row-wise
            yield f

    def partitions(self):
        return [_DayPartition(d) for d in range(self._lo, self._hi + 1)]

    def read(self, partition: _DayPartition | None) -> Iterator[tuple]:
        # contradictory pushed bounds make partitions() empty; Spark then
        # schedules one task with partition=None — emit nothing
        if partition is None:
            return iter(())
        return _rows_for_day(partition.day, self._rows_per_day)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> _SyntheticEventsReader:
        return _SyntheticEventsReader(self.options)


def register_python_sources(spark: SparkSession) -> None:
    """Idempotent registration (re-registering the same name is allowed).
    Python-source filter pushdown ships disabled by default in 4.1
    (SPARK-48788 rollout flag) and a reader that implements
    ``pushFilters`` fails fast when it is off, so enable it alongside —
    a runtime SQL conf, session-scoped."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(SyntheticTicksDataSource)
    spark.dataSource.register(ManifestJsonDataSource)


# --- streaming side: SimpleDataSourceStreamReader ----------------------------

_TICK_SCHEMA = "batch int, tick_id bigint, sensor_id bigint, reading_milli bigint"


def _ticks_for_batch(batch: int, rows_per_batch: int) -> Iterator[tuple]:
    for i in range(rows_per_batch):
        tick_id = batch * rows_per_batch + i
        yield (batch, tick_id, (tick_id * 101) % 13, (tick_id * 37) % 5_000)


class _TickStreamReader(SimpleDataSourceStreamReader):
    """Offset-checkpointed incremental reader — the modern-API form of the
    reference's hand-rolled checkpoint + backfill loop
    (/root/reference/src/s3_processor.py:113-210): the engine persists the
    offset dict in the streaming checkpoint (replacing the S3 text-file
    checkpoint), ``read`` advances it one batch per trigger, and
    ``readBetweenOffsets`` replays any committed range EXACTLY — which is
    what upgrades the reference's at-least-once accounting to exactly-once
    on recovery. A production connector swaps the arithmetic for a queue/
    API cursor; the offset contract is identical."""

    def __init__(self, options):
        self._batches = int(options.get("batches", 3))
        self._rows = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict):
        # contract: return ALL data available after `start` plus the end
        # offset (one trigger drains everything outstanding — availableNow
        # then terminates after a single microbatch). A LIST iterator, not
        # a generator: the engine prefetch-caches the iterator, next()s it
        # and copy.copy()s it when planning partitions — list iterators
        # support copy/pickle, generators do not.
        b = start["batch"]
        if b >= self._batches:
            return iter(()), start
        rows = [r for k in range(b, self._batches) for r in _ticks_for_batch(k, self._rows)]
        return iter(rows), {"batch": self._batches}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for b in range(start["batch"], end["batch"]):
            yield from _ticks_for_batch(b, self._rows)

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up: replay derives from arithmetic


class SyntheticTicksDataSource(DataSource):
    """``spark.readStream.format("synthetic_ticks")`` after registration.
    ``batches`` bounds currently-available data: a restarted query with a
    LARGER ``batches`` drains only the delta from its checkpointed offset
    — the incremental-pickup semantics of the reference's missing-dates
    backfill, minus the hand-rolled bookkeeping."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> str:
        return _TICK_SCHEMA

    def simpleStreamReader(self, schema) -> _TickStreamReader:
        return _TickStreamReader(self.options)


# --- write side: DataSourceWriter (two-phase commit) -------------------------


class _ManifestCommitMessage(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class _ManifestJsonWriter(DataSourceWriter):
    """Two-phase-commit JSONL sink with manifest-last visibility — the
    engine-native form of the reference's checkpoint audit twin
    (`*_detailed.json`, /root/reference/src/s3_processor.py:147-154), with
    the transactionality the reference lacks (§1.4.2: it advances
    tracking state before writes land). Protocol:

    1. every task writes its rows to a part file and returns a commit
       message (filename + row count) — executor-side, parallel;
    2. the DRIVER, only after ALL tasks succeed, writes one
       ``_MANIFEST-<uuid>.json`` listing the committed files;
    3. on any task failure ``abort`` deletes the staged part files.

    Readers trust only manifested files, so a crashed write is invisible
    no matter how many part files it strands — the same manifest-last
    rule as operators/snapshot.py, here expressed through the DataSource
    API's commit/abort hooks."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("manifest_json requires a save path")

    def write(self, iterator) -> _ManifestCommitMessage:
        import json as _json
        import os as _os
        import uuid as _uuid

        _os.makedirs(self._path, exist_ok=True)
        name = f"part-{_uuid.uuid4().hex}.jsonl"
        n = 0
        with open(_os.path.join(self._path, name), "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _ManifestCommitMessage(name, n)

    def commit(self, messages) -> None:
        import json as _json
        import os as _os
        import uuid as _uuid

        manifest = {
            "files": [
                {"filename": m.filename, "n_rows": m.n_rows}
                for m in messages
                if m is not None
            ],
        }
        manifest["total_rows"] = sum(f["n_rows"] for f in manifest["files"])
        final = _os.path.join(self._path, f"_MANIFEST-{_uuid.uuid4().hex}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(manifest, f)
        _os.rename(tmp, final)  # visibility flips atomically, manifest-last

    def abort(self, messages) -> None:
        import os as _os

        for m in messages:
            if m is not None:
                try:
                    _os.remove(_os.path.join(self._path, m.filename))
                except FileNotFoundError:
                    pass


# --- stream write side: DataSourceStreamWriter (epoch manifests) -------------


class _EpochManifestStreamWriter(DataSourceStreamWriter):
    """Streaming half of the manifest-last sink — the fourth quadrant of
    the Python DataSource API (batch read / stream read / batch write /
    stream write). Tasks stage part files exactly like the batch writer;
    the driver's ``commit(messages, batchId)`` publishes ONE
    ``_EPOCH-<batchId>.json`` manifest per epoch, written tmp+rename so
    visibility flips atomically.

    Exactly-once under epoch REPLAY (the failure mode streaming adds over
    batch): if epoch N crashes between staging and the engine's offset
    commit, the restart re-runs epoch N with fresh task attempts and the
    rename REPLACES ``_EPOCH-N.json`` wholesale — the superseded attempt's
    part files are stranded on disk but invisible, because readers trust
    only manifested filenames. Idempotent-by-replacement is the same
    contract Spark's own file sink implements with its compact log
    (public FileStreamSink semantics), expressed through the DataSource
    API's per-epoch commit hook."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("manifest_json requires a save path")

    def write(self, iterator) -> _ManifestCommitMessage:
        # identical staging protocol to the batch writer: uuid part file,
        # commit message carries (filename, row count)
        return _ManifestJsonWriter({"path": self._path}).write(iterator)

    def commit(self, messages, batchId: int) -> None:
        import json as _json
        import os as _os

        manifest = {
            "epoch": batchId,
            "files": [
                {"filename": m.filename, "n_rows": m.n_rows}
                for m in messages
                if m is not None
            ],
        }
        manifest["total_rows"] = sum(f["n_rows"] for f in manifest["files"])
        final = _os.path.join(self._path, f"_EPOCH-{batchId:020d}.json")
        tmp = final + f".tmp-{_os.getpid()}"
        with open(tmp, "w") as f:
            _json.dump(manifest, f)
        _os.rename(tmp, final)  # replays REPLACE the epoch atomically

    def abort(self, messages, batchId: int) -> None:
        import os as _os

        for m in messages:
            if m is not None:
                try:
                    _os.remove(_os.path.join(self._path, m.filename))
                except FileNotFoundError:
                    pass


class ManifestJsonDataSource(DataSource):
    """``df.write.format("manifest_json").save(path)`` after registration;
    ``df.writeStream.format("manifest_json")`` for the epoch-manifest
    streaming form."""

    @classmethod
    def name(cls) -> str:
        return "manifest_json"

    def writer(self, schema, overwrite: bool) -> _ManifestJsonWriter:
        if overwrite:
            raise NotImplementedError(
                "manifest_json is append-only: visibility is governed by "
                "manifests, not file replacement"
            )
        return _ManifestJsonWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> _EpochManifestStreamWriter:
        return _EpochManifestStreamWriter(self.options)


def read_manifested(spark: SparkSession, path: str, schema=None):
    """Read back ONLY manifested part files (the reader half of the
    manifest-last contract).

    ``schema`` (DDL string or StructType) pins the result schema; without
    it an empty sink has no rows to infer from, so the empty read returns
    a zero-COLUMN DataFrame rather than inventing a bogus one — callers
    that need stable downstream column references on the empty case must
    pass the sink's schema."""
    import glob as _glob
    import json as _json
    import os as _os

    files: list[str] = []
    manifests = sorted(_glob.glob(_os.path.join(path, "_MANIFEST-*.json"))) + sorted(
        _glob.glob(_os.path.join(path, "_EPOCH-*.json"))  # streaming epochs
    )
    for mf in manifests:
        with open(mf) as f:
            files += [_os.path.join(path, e["filename"]) for e in _json.load(f)["files"]]
    if not files:
        return spark.createDataFrame([], schema=schema if schema is not None else "struct<>")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(files)
