"""Command-line entry point — the operational twin of the reference's
``main.py`` / ``lambda_handler.handler`` (one invocation = drain all new
files, merge, report), plus a ``compact`` maintenance subcommand.

Reference shape (src/lambda_handler.py:38-102): a scheduled invocation
runs the whole pipeline and returns ``{statusCode, message,
processed_dates}``. Here the same contract prints one JSON line; progress
tracking is the stream's checkpoint, so re-invoking is always safe.

Usage:
  python -m data_ingestion_lambda_spark ingest \
      --source /data/drops --target /data/consumptions \
      --checkpoint /data/ckpt [--quarantine DIR] [--log DIR] \
      [--max-files-per-trigger N]
  python -m data_ingestion_lambda_spark compact --target /data/consumptions \
      [--dates 2025-05-01,2025-05-02] [--target-file-mb 128]
"""

from __future__ import annotations

import argparse
import json
import sys

from data_ingestion_lambda_spark.operators.compact import (
    compact_partitions,
    expire_partitions,
)
from data_ingestion_lambda_spark.session import get_spark
from data_ingestion_lambda_spark.streaming.ingest import (
    IngestPaths,
    run_ingest_available_now,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="data_ingestion_lambda_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help="drain new files, merge, report")
    ing.add_argument("--source", required=True)
    ing.add_argument("--target", required=True)
    ing.add_argument("--checkpoint", required=True)
    ing.add_argument("--quarantine", default=None)
    ing.add_argument("--log", default=None)
    ing.add_argument("--max-files-per-trigger", type=int, default=None)
    ing.add_argument("--glob", default="*.csv")

    cmp_ = sub.add_parser("compact", help="rewrite small files per partition")
    cmp_.add_argument("--target", required=True)
    cmp_.add_argument("--dates", default=None, help="comma-separated; default all")
    cmp_.add_argument("--target-file-mb", type=int, default=128)

    exp = sub.add_parser("expire", help="drop date partitions older than --keep-from")
    exp.add_argument("--target", required=True)
    exp.add_argument("--keep-from", required=True, help="ISO date; partitions < this are deleted")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark("data-ingestion-cli")

    if args.cmd == "ingest":
        paths = IngestPaths(
            source_dir=args.source,
            target_dir=args.target,
            checkpoint_dir=args.checkpoint,
            quarantine_dir=args.quarantine,
            log_dir=args.log,
        )
        processed = run_ingest_available_now(
            spark,
            paths,
            max_files_per_trigger=args.max_files_per_trigger,
            path_glob=args.glob,
        )
        # Response contract of the reference handler (lambda_handler.py:96-102):
        # the dates THIS invocation wrote; a no-op run reports [].
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "message": "ingestion complete",
                    "processed_dates": processed,
                }
            )
        )
        return 0

    if args.cmd == "compact":
        dates = args.dates.split(",") if args.dates else None
        result = compact_partitions(
            spark, args.target, dates=dates, target_file_bytes=args.target_file_mb << 20
        )
        print(json.dumps({"statusCode": 200, "compacted": result}))
        return 0

    expired = expire_partitions(spark, args.target, keep_from=args.keep_from)
    print(json.dumps({"statusCode": 200, "expired": expired}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
