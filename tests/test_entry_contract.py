"""Smoke tests for the driver contract (__spark_entry__.py) + a fast oracle
cross-check of every query at sf0.001 using DuckDB locally."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from tools.oracle_check import TABLES, compare  # noqa: E402


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_queries_and_oracles_align():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert qs, "no queries declared"
    missing = set(os_) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, sf_dir).toPandas()
    if name not in os_:
        assert len(sdf) >= 0  # rows-only check
        return
    ddf = duck.execute(os_[name]).df()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"
