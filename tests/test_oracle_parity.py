"""Replicates the driver's correctness gate locally: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables, then compare row count, column names, and
order-insensitive values (exact match after the registry's own
round(...,6) convention)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    try:  # Decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except ImportError:
        pass
    return v


def _norm_rows(cols, rows):
    # sort columns by name (the driver sorts columns before hashing)
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    # gate functions may cache() intermediates for within-query reuse;
    # the harness owns the session-level cleanup (same contract as
    # bench.py), otherwise 51 gates' caches accumulate eviction pressure
    spark.catalog.clearCache()
    if name not in oracles:
        assert len(srows) >= 0  # rows-only check, mirrors driver behavior
        return
    res = duck.sql(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    ncols_s, nrows_s = _norm_rows(scols, srows)
    ncols_d, nrows_d = _norm_rows(dcols, drows)
    assert ncols_s == ncols_d, f"{name}: columns {ncols_s} != {ncols_d}"
    mism = [
        (i, a, b) for i, (a, b) in enumerate(zip(nrows_s, nrows_d)) if a != b
    ]
    assert not mism, f"{name}: {len(mism)} mismatched rows, first 3: {mism[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
