"""LIVE execution smoke for the generated upsert text: SQLite implements
the same ``INSERT ... ON CONFLICT (keys) DO UPDATE SET col = EXCLUDED.col``
upsert shape as postgres (SQLite >= 3.24, incl. ``INSERT INTO t AS alias``
and double-quoted identifiers), so the ``dialect='postgres'`` statement can
be driven end-to-end against a real engine from the stdlib — no container
database needed.  The staging schema maps onto an ATTACHed in-memory
database, mirroring the cross-schema staging->target flow.

This covers what the text goldens cannot: that the emitted SQL parses, the
key-conflict branch actually updates, the absent-key branch actually
inserts, target-only rows survive (the reference's no-DELETE contract,
``/root/reference/df_to_azure/db.py:36-53``), and the all-keys DO NOTHING
branch really is a no-op on conflict rather than an error.
"""

from __future__ import annotations

import sqlite3

import pytest

from df_to_azure_spark.operators.merge import merge_statement


@pytest.fixture()
def db():
    conn = sqlite3.connect(":memory:")
    conn.execute("ATTACH ':memory:' AS staging")
    yield conn
    conn.close()


def test_postgres_shape_upsert_executes_on_sqlite(db):
    db.execute('CREATE TABLE main."sales" ("id" INTEGER PRIMARY KEY, "region" TEXT, "amount" REAL)')
    db.execute('CREATE TABLE staging."sales" ("id" INTEGER, "region" TEXT, "amount" REAL)')
    db.executemany(
        'INSERT INTO main."sales" VALUES (?, ?, ?)',
        [(1, "east", 10.0), (2, "west", 20.0)],
    )
    # staging: updates row 2, inserts row 3; row 1 is target-only
    db.executemany(
        'INSERT INTO staging."sales" VALUES (?, ?, ?)',
        [(2, "north", 25.0), (3, "south", 30.0)],
    )
    sql = merge_statement(
        "sales", ["id", "region", "amount"], ["id"],
        target_schema="main", dialect="postgres",
    )
    db.execute(sql)
    rows = sorted(db.execute('SELECT * FROM main."sales"').fetchall())
    assert rows == [
        (1, "east", 10.0),    # target-only row survives: no DELETE clause
        (2, "north", 25.0),   # matched: every non-key column updated
        (3, "south", 30.0),   # absent: inserted
    ]


def test_postgres_shape_all_keys_do_nothing_on_sqlite(db):
    db.execute('CREATE TABLE main."m" ("a" INTEGER, "b" INTEGER, PRIMARY KEY ("a", "b"))')
    db.execute('CREATE TABLE staging."m" ("a" INTEGER, "b" INTEGER)')
    db.executemany('INSERT INTO main."m" VALUES (?, ?)', [(1, 1)])
    db.executemany('INSERT INTO staging."m" VALUES (?, ?)', [(1, 1), (2, 2)])
    sql = merge_statement(
        "m", ["a", "b"], ["a", "b"], target_schema="main", dialect="postgres"
    )
    db.execute(sql)  # duplicate (1,1) must be a silent no-op, not an error
    rows = sorted(db.execute('SELECT * FROM main."m"').fetchall())
    assert rows == [(1, 1), (2, 2)]


def test_postgres_shape_hostile_identifiers_execute(db):
    # reserved word table + column and an embedded-quote column, all
    # double-quoted by the generator — must round-trip through a real parser
    db.execute('CREATE TABLE main."select" ("user" INTEGER PRIMARY KEY, "va""l" TEXT)')
    db.execute('CREATE TABLE staging."select" ("user" INTEGER, "va""l" TEXT)')
    db.execute('INSERT INTO main."select" VALUES (1, \'old\')')
    db.executemany(
        'INSERT INTO staging."select" VALUES (?, ?)', [(1, "new"), (2, "x")]
    )
    sql = merge_statement(
        "select", ["user", 'va"l'], ["user"],
        target_schema="main", dialect="postgres",
    )
    db.execute(sql)
    rows = sorted(db.execute('SELECT * FROM main."select"').fetchall())
    assert rows == [(1, "new"), (2, "x")]
