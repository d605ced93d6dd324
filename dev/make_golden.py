#!/usr/bin/env python3
"""Generate golden CSVs for the scalatest parity mirror (dev tool).

Runs every SparkEntry.oracleSql query in DuckDB on sf0.001 and writes
src/test/resources/golden/<name>.csv. Re-run whenever a query's oracle
changes; commit the results.

Usage: python3 dev/make_golden.py <verifyOutDirWithOracleJson>
(The oracle_sql.json is produced by `runMain graft.Verify`.)
"""
import json
import sys
from pathlib import Path

import duckdb

SF_DIR = "/root/testdata/sf0.001"
OUT = Path("src/test/resources/golden")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main():
    oracle = json.loads(
        (Path(sys.argv[1]) / "oracle_sql.json").read_text())
    OUT.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    # drop goldens for queries that no longer exist
    for stale in OUT.glob("*.csv"):
        if stale.stem not in oracle:
            stale.unlink()
            print(f"removed stale {stale.name}")
    for name, sql in sorted(oracle.items()):
        path = OUT / f"{name}.csv"
        con.execute(
            f"COPY ({sql}) TO '{path}' (FORMAT CSV, HEADER)")
        n = con.execute(f"SELECT COUNT(*) FROM ({sql})").fetchone()[0]
        print(f"golden {name}: {n} rows")


if __name__ == "__main__":
    main()
