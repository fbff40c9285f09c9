"""Mini-driver: run every queries() entry and its oracle_sql() via
DuckDB on the same parquet, compare row counts + column names +
order-insensitive values — the same gate the round driver applies."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entrymod
from sitecrawler_spark.queries import TABLES

import os
SF = os.environ.get("CONTRACT_SF", "/root/testdata/sf0.001")


def _norm_cell(v):
    """Dtype-faithful normalization: floats and ints normalize to DIFFERENT
    strings so an oracle whose Arrow rendering drifts to float64 (e.g. DuckDB
    HUGEINT sums through fetchdf) fails HERE before the round driver sees it
    (VERDICT r02 "make the local gate predict the driver gate")."""
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        return f"f:{v:.6g}"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
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
    spd = sdf.toPandas()
    scols = list(spd.columns)
    srows = list(spd.itertuples(index=False, name=None))

    # fetchdf (Arrow dtypes), NOT fetchall (Python ints): the round driver
    # consumes the oracle through pandas, where DuckDB HUGEINT renders as
    # float64 — fetchall would mask that class of mismatch.
    dpd = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    dcols = list(dpd.columns)
    drows = list(dpd.itertuples(index=False, name=None))

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
