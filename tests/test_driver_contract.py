"""Simulates the driver's correctness gate: run every ``queries()`` entry
at sf0.01 and compare against its ``oracle_sql()`` via DuckDB —
row-count + schema + order-insensitive exact value match (the driver
hashes values, so we compare exactly, not approximately)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.6f}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


ALL = sorted(entrymod.queries().keys())


def test_every_query_has_an_oracle():
    """Locks in the 28/28 bar: every queries() entry MUST carry a DuckDB
    oracle — a future query can't silently ship oracle-less."""
    missing = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))
    assert not missing, f"queries without oracle_sql: {missing}"


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    qfn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = qfn(spark, SF_DIR)
    cols = sorted(sdf.columns)
    spark_rows = [[getattr(r, c) for c in cols] for r in sdf.collect()]
    ordf = duck.sql(sql)
    o_cols_all = list(ordf.columns)
    o_order = sorted(range(len(o_cols_all)), key=lambda i: o_cols_all[i])
    assert sorted(o_cols_all) == cols, (
        f"{name}: column mismatch spark={cols} oracle={sorted(o_cols_all)}"
    )
    oracle_rows = [[row[i] for i in o_order] for row in ordf.fetchall()]
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(oracle_rows)}"
    )
    s, o = _norm(spark_rows), _norm(oracle_rows)
    mismatches = [(a, b) for a, b in zip(s, o) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score"}
