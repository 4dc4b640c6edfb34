"""Execution-level tests for the JDBC MERGE statements (operators/jdbc_upsert.py).

The existing unit tests pin the generated SQL as text; these run it
against real SQL engines:

- ``build_pg_on_conflict_sql`` executes verbatim on stdlib sqlite3
  (SQLite >= 3.24 implements PostgreSQL's exact
  ``ON CONFLICT (cols) DO UPDATE SET c = EXCLUDED.c`` dialect), proving
  the statement's update-vs-insert semantics and idempotence on a live
  engine with a real unique constraint — no container database needed;
- the true-PostgreSQL test (both the ON CONFLICT form and the ANSI
  MERGE form, which SQLite lacks) runs wherever ``POSTGRES_DSN`` points
  at a reachable database with psycopg2 installed, and skips cleanly
  here. Reference parity: the per-row twin is
  /root/reference/src/db_operations.py:77-84.
"""

from __future__ import annotations

import os
import sqlite3

import pytest

from data_ingestion_lambda_spark.operators.jdbc_upsert import (
    build_merge_sql,
    build_pg_on_conflict_sql,
)

KEYS = ["date", "client_id"]
UPDATE_COLS = ["client_name", "total_consumed_tokens"]
INSERT_COLS = ["date", "client_id", "client_name", "total_consumed_tokens"]

_DDL = """
CREATE TABLE {name} (
    date TEXT NOT NULL,
    client_id INTEGER NOT NULL,
    client_name TEXT,
    total_consumed_tokens INTEGER{pk}
)
"""


def _sqlite_with_tables():
    con = sqlite3.connect(":memory:")
    con.execute(_DDL.format(name="consumptions", pk=", PRIMARY KEY (date, client_id)"))
    con.execute(_DDL.format(name="consumptions_staging", pk=""))
    con.execute(
        "INSERT INTO consumptions VALUES ('2025-06-01', 1, 'acme', 100),"
        " ('2025-06-01', 2, 'globex', 50)"
    )
    return con


def test_pg_on_conflict_statement_upserts_on_live_engine():
    con = _sqlite_with_tables()
    con.execute(
        "INSERT INTO consumptions_staging VALUES ('2025-06-01', 1, 'acme corp', 175),"
        " ('2025-06-01', 3, 'initech', 20)"
    )
    sql = build_pg_on_conflict_sql(
        "consumptions", "consumptions_staging", KEYS, UPDATE_COLS, INSERT_COLS
    )
    con.execute(sql)
    want = [
        ("2025-06-01", 1, "acme corp", 175),  # matched -> updated
        ("2025-06-01", 2, "globex", 50),  # untouched
        ("2025-06-01", 3, "initech", 20),  # new -> inserted
    ]
    got = sorted(con.execute("SELECT * FROM consumptions").fetchall())
    assert got == want

    # replaying the same staging content converges (idempotent MERGE)
    con.execute(sql)
    assert sorted(con.execute("SELECT * FROM consumptions").fetchall()) == want


@pytest.mark.skipif(
    not os.environ.get("POSTGRES_DSN"),
    reason="set POSTGRES_DSN to run the live-PostgreSQL MERGE integration test",
)
def test_merge_statements_on_postgres():
    psycopg2 = pytest.importorskip("psycopg2")
    con = psycopg2.connect(os.environ["POSTGRES_DSN"])
    con.autocommit = True
    cur = con.cursor()
    try:
        cur.execute("DROP TABLE IF EXISTS consumptions, consumptions_staging")
        cur.execute(_DDL.format(name="consumptions", pk=", PRIMARY KEY (date, client_id)"))
        cur.execute(_DDL.format(name="consumptions_staging", pk=""))
        cur.execute("INSERT INTO consumptions VALUES ('2025-06-01', 1, 'acme', 100)")
        cur.execute(
            "INSERT INTO consumptions_staging VALUES ('2025-06-01', 1, 'acme corp', 175),"
            " ('2025-06-01', 3, 'initech', 20)"
        )
        # PostgreSQL-dialect form
        cur.execute(
            build_pg_on_conflict_sql(
                "consumptions", "consumptions_staging", KEYS, UPDATE_COLS, INSERT_COLS
            )
        )
        cur.execute("SELECT * FROM consumptions ORDER BY client_id")
        assert cur.fetchall() == [
            ("2025-06-01", 1, "acme corp", 175),
            ("2025-06-01", 3, "initech", 20),
        ]
        # ANSI MERGE form (PostgreSQL 15+)
        cur.execute("UPDATE consumptions_staging SET total_consumed_tokens = 200")
        cur.execute(
            build_merge_sql(
                "consumptions", "consumptions_staging", KEYS, UPDATE_COLS, INSERT_COLS
            )
        )
        cur.execute("SELECT total_consumed_tokens FROM consumptions ORDER BY client_id")
        assert [r[0] for r in cur.fetchall()] == [200, 200]
    finally:
        cur.close()
        con.close()
