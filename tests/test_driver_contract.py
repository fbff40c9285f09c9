"""Mini-driver: run every queries() entry and its oracle_sql() via
DuckDB on the same parquet, compare row counts + column names +
order-insensitive values — the same gate the round driver applies."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from sitecrawler_spark.queries import TABLES

import os
SF = os.environ.get("CONTRACT_SF", "/root/testdata/sf0.001")


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    return str(v)


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in idx) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


ORACLE_KEYS = sorted(set(entrymod.oracle_sql().keys()))


def test_every_query_has_callable():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, f"oracle {name} lacks a query"


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"
    sn, dn = _norm_rows(scols, srows), _norm_rows(dcols, drows)
    if sn != dn:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "url", "url_clean", "host"}


def test_crawl_e2e_query_runs(spark):
    df = entrymod.queries()["q_crawl_e2e"](spark, SF)
    assert df.count() > 5
