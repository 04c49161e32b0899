"""Local mirror of the driver's correctness gate: run every ``queries()``
entry at sf0.01 next to its ``oracle_sql()`` in DuckDB and compare row count,
column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("POPPY_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


QUERIES = sorted(entry_mod.queries())


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="sf0.01 testdata missing")
@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(name, spark, ddb):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    df = q(spark, SF_DIR)
    got_cols = list(df.columns)
    got_rows = [tuple(r) for r in df.collect()]
    assert sql is not None, f"{name} has no oracle"
    res = ddb.execute(sql)
    exp_cols = [d[0] for d in res.description]
    exp_rows = res.fetchall()
    assert sorted(got_cols) == sorted(exp_cols), (got_cols, exp_cols)
    gc, gr = _canon(got_cols, got_rows)
    ec, er = _canon(exp_cols, exp_rows)
    assert len(gr) == len(er), f"{name}: {len(gr)} rows vs oracle {len(er)}"
    assert gr == er, f"{name}: value mismatch\nfirst got: {gr[:3]}\nfirst exp: {er[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
