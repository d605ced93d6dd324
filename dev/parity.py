#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the
engine itself is pure Scala/Spark; this script just lets us check
DuckDB parity before the driver does).

Usage:
  python3 dev/parity.py <sfDir> <verifyOutDir> [query ...]

Expects <verifyOutDir> to contain <name>/ parquet dirs written by
graft.Verify plus oracle_sql.json. Creates DuckDB views for each
testdata table, runs each oracle SQL, and compares against the Spark
parquet output: columns sorted by name, rows in written order,
values compared exactly (with a float-tolerance diagnostic).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        # driver hash-compares; NaN != NaN guard + -0.0 fold
        if math.isnan(v):
            return "NaN"
        return v + 0.0
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no Spark output dir")
            n_fail += 1
            continue
        def dtypes(q):
            return {r[0]: r[1] for r in
                    con.execute(f"DESCRIBE {q}").fetchall()}
        try:
            exp = con.execute(sql).fetch_df()
            exp_types = dtypes(sql)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        spark_q = f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"
        got = con.execute(spark_q).fetch_df()
        got_types = dtypes(spark_q)
        type_diffs = {
            c: (got_types.get(c), exp_types.get(c))
            for c in exp_types
            if got_types.get(c) != exp_types.get(c)}
        if type_diffs:
            print(f"WARN {name}: column type mismatch {type_diffs}")
        exp = exp[sorted(exp.columns)]
        gcols = sorted(got.columns)
        if sorted(exp.columns) != gcols:
            print(f"FAIL {name}: columns {gcols} != oracle "
                  f"{sorted(exp.columns)}")
            n_fail += 1
            continue
        got = got[gcols]
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(exp)}")
            n_fail += 1
            continue
        bad = None
        ev, gv = exp.values.tolist(), got.values.tolist()
        for i, (er, gr) in enumerate(zip(ev, gv)):
            for c, (e, g) in enumerate(zip(er, gr)):
                ne, ng = norm(e), norm(g)
                if ne != ng:
                    # allow pandas NaT/None mismatch shapes
                    if (ne != ne) and (ng != ng):
                        continue
                    bad = (i, gcols[c], e, g)
                    break
            if bad:
                break
        if bad:
            i, c, e, g = bad
            tol = ""
            if isinstance(e, float) and isinstance(g, float):
                tol = f" (|diff|={abs(e - g):.3g})"
            print(f"FAIL {name}: row {i} col {c}: spark={g!r} "
                  f"oracle={e!r}{tol}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
