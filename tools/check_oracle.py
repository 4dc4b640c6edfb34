#!/usr/bin/env python
"""Local pre-flight replica of the driver's correctness gate.

Runs every registered query on Spark and (when an oracle exists) the
equivalent SQL on DuckDB over the same parquet, then compares:
  - row count
  - column-name set
  - per-column canonical Arrow dtype (int width, float width, decimal
    precision/scale, timestamp unit — the driver's hasher is
    dtype-sensitive, so an equal-valued int32/int64 or HUGEINT/BIGINT
    pair still fails there; tz-awareness is normalized away)
  - order-insensitive value hash (columns sorted by name, rows sorted,
    values canonicalized)

Usage:  python tools/check_oracle.py [--sf /root/testdata/sf0.01] [--only name[,name]]
        python tools/check_oracle.py --schema-only    # fast dtype sweep (LIMIT 0)
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import threading
import time
from datetime import date, datetime

import duckdb
import pyarrow as pa

sys.path.insert(0, ".")

from data_ingestion_lambda_spark import get_spark  # noqa: E402
from data_ingestion_lambda_spark.plans import all_specs  # noqa: E402
from data_ingestion_lambda_spark.sources.catalog import TABLES  # noqa: E402


def canon(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, (datetime, date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "l:[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "y:" + v.hex()
    return f"{type(v).__name__[0]}:{v}"


def canon_type(t: pa.DataType) -> str:
    """Canonical dtype label: keeps the distinctions a dtype-sensitive
    hasher sees (int width, decimal precision, timestamp unit) and drops
    the ones it shouldn't (tz annotation — Spark exports UTC-tagged
    timestamps, DuckDB naive ones, same µs values; large_* offsets)."""
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_dictionary(t):
        return canon_type(t.value_type)
    return str(t)


def arrow_schema_types(schema: pa.Schema) -> dict[str, str]:
    return {f.name: canon_type(f.type) for f in schema}


def dtype_problems(s_schema: pa.Schema, o_schema: pa.Schema) -> list[str]:
    st, ot = arrow_schema_types(s_schema), arrow_schema_types(o_schema)
    out = []
    for col in sorted(set(st) & set(ot)):
        if st[col] != ot[col]:
            out.append(f"dtype {col}: spark={st[col]} oracle={ot[col]}")
    return out


def table_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


# Plan BUILDERS are where all session-global mutation happens
# (createOrReplaceTempView in the SQL lanes and the catalog's t(),
# spark.conf.set in pandas_udfs/catalog, dedup_gate's conf
# save-restore) — under --jobs, two builders racing a view replace or
# interleaving a set/restore pair can produce spurious cross-lane
# failures (review r11). Serialize the build; the expensive phases
# (Spark collect, DuckDB execute) stay parallel and are thread-safe.
_BUILD_LOCK = threading.Lock()


def check_one(name, spec, spark, cur, sf: str, schema_only: bool) -> tuple[str, str]:
    """One query's full comparison → (status in pass/fail/rows, message).
    ``cur`` is a per-caller duckdb cursor (cursors share the connection's
    catalog but are independently usable — the unit of thread safety)."""
    t0 = time.time()
    try:
        with _BUILD_LOCK:
            sdf = spec.builder(spark, sf)
        scols = sdf.columns
        srows = [] if schema_only else [tuple(r) for r in sdf.collect()]
        # Arrow schema via LIMIT 0 — Catalyst collapses the plan, so
        # this costs ~nothing and carries the exact result dtypes.
        s_schema = sdf.limit(0).toArrow().schema
    except Exception as e:
        return "fail", f"FAIL  {name}: spark error: {e}"
    t_spark = time.time() - t0
    if spec.oracle is None:
        if schema_only:
            return "rows", f"skip  {name}: no oracle"
        return "rows", f"rows  {name}: {len(srows)} rows (no oracle) [{t_spark:.1f}s]"
    t1 = time.time()
    try:
        o_schema = cur.execute(
            f"SELECT * FROM ({spec.oracle}) __o LIMIT 0"
        ).arrow().schema
        if schema_only:
            ocols = list(o_schema.names)
            orows = []
        else:
            res = cur.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
    except Exception as e:
        return "fail", f"FAIL  {name}: duckdb error: {e}"
    t_duck = time.time() - t1

    problems = []
    if not schema_only and len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if sorted(scols) != sorted(o_schema.names):
        problems.append(f"cols spark={sorted(scols)} oracle={sorted(o_schema.names)}")
    else:
        problems.extend(dtype_problems(s_schema, o_schema))
    if schema_only:
        pass
    elif not problems:
        sh, oh = table_hash(srows, scols), table_hash(orows, ocols)
        if sh != oh:
            problems.append(f"hash spark={sh} oracle={oh}")
            # print the first differing canonical row for debugging
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
            s_set = sorted("|".join(canon(r[i]) for i in so) for r in srows)
            o_set = sorted("|".join(canon(r[i]) for i in oo) for r in orows)
            for a, b in zip(s_set, o_set):
                if a != b:
                    problems.append(f"  first diff:\n    spark  {a[:300]}\n    oracle {b[:300]}")
                    break
    if problems:
        return "fail", f"FAIL  {name}: " + "; ".join(problems)
    return "pass", (
        f"PASS  {name}: {len(srows)} rows "
        f"[spark {t_spark:.1f}s, duckdb {t_duck:.1f}s]"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--schema-only",
        action="store_true",
        help="compare dtypes only, via LIMIT-0 plans (fast hazard sweep)",
    )
    ap.add_argument(
        "--jobs",
        type=int,
        default=1,
        help="concurrent queries (opt-in; Spark actions are thread-safe "
        "on one session and each worker gets its own duckdb cursor — "
        "per-query walls overlap under contention, so keep the default "
        "when the printed timings matter). Plan BUILDS are serialized "
        "under a lock because builders mutate shared session state "
        "(temp views, session confs); collects/DuckDB stay parallel",
    )
    args = ap.parse_args()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{args.sf}/{name}.parquet'"
        )

    specs = all_specs()
    if args.only:
        wanted = args.only.split(",")
        specs = {k: v for k, v in specs.items() if k in wanted}

    ordered = sorted(specs.items())
    if args.jobs > 1:
        from concurrent.futures import ThreadPoolExecutor

        def _job(kv):
            # one cursor per TASK, closed when done (a duckdb cursor is a
            # connection clone — leaving 270+ open for the sweep's
            # lifetime holds catalog/allocator state for nothing)
            cur = con.cursor()
            try:
                return check_one(kv[0], kv[1], spark, cur, args.sf, args.schema_only)
            finally:
                cur.close()

        pool = ThreadPoolExecutor(max_workers=args.jobs)
        results = pool.map(_job, ordered)
    else:
        from data_ingestion_lambda_spark.plans.registry import release_pinned

        def _serial():
            for name, spec in ordered:
                yield check_one(name, spec, spark, con, args.sf, args.schema_only)
                # drop the lane's pinned caches before the next lane —
                # the sweep is the longest-lived consumer of the pin
                # registry (VERDICT r11 #3). Under --jobs the release
                # happens once at the end instead: actions run
                # concurrently and an early release would only force
                # another thread's in-flight lane to recompute.
                release_pinned()

        results = _serial()

    n = {"pass": 0, "fail": 0, "rows": 0}
    # NAME order in both modes (pool.map yields in submission order, so
    # a slow early query holds back later lines — deterministic logs
    # were chosen over print-as-completed; failures still count the same)
    for status, msg in results:
        print(msg, flush=True)
        n[status] += 1

    if args.jobs > 1:
        from data_ingestion_lambda_spark.plans.registry import release_pinned

        release_pinned()

    print(f"\n{n['pass']} pass, {n['fail']} fail, {n['rows']} rows-only")
    return 1 if n["fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
