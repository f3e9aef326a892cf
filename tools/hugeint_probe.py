"""Find the whole HUGEINT-oracle class at once.

The driver's correctness gate hashes the DuckDB oracle result with dtype
fidelity: a bare ``SUM(bigint_col)`` in DuckDB yields HUGEINT, which
pandas surfaces as float64 and hashes differently from Spark's BIGINT —
the exact failure seen for ``t4_source_rollup`` (r01) and
``t13_rarity_stats`` (r02).  This probe runs EVERY declared oracle SQL
against DuckDB at a small sf and reports any output column whose declared
DuckDB type is not a hash-stable one (BIGINT/INT/.../DOUBLE/FLOAT/
VARCHAR/BOOLEAN/DATE/TIMESTAMP...), so the class is killed once instead
of whack-a-mole per driver sample.

Usage: python tools/hugeint_probe.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# Types whose pandas/hash representation matches Spark's result types.
SAFE = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE",
    "BLOB",
}


def type_names(con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple[str, str]]:
    rel = con.sql(sql)
    return list(zip(rel.columns, [str(t) for t in rel.types]))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    bad = 0
    for name, sql in entrymod.oracle_sql().items():
        try:
            cols = type_names(con, sql)
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {e}")
            bad += 1
            continue
        unsafe = [(c, t) for c, t in cols
                  if t not in SAFE and not t.startswith("STRUCT")
                  and not t.endswith("[]")]
        if unsafe:
            print(f"FLAG {name}: {unsafe}")
            bad += 1
    print(f"== {bad} flagged of {len(entrymod.oracle_sql())} oracles ==")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
