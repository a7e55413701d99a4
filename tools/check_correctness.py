#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json under DuckDB with every
TESTDATA table registered as a view, and compares values column-name-sorted
(the driver sorts columns by name before hashing).
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, bool):
        return bool(v)
    return v


def table_rows(con, sql):
    cur = con.sql(sql)
    cols = [c.lower() for c in cur.columns]
    types = [str(t) for t in cur.types]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return ([cols[i] for i in order], [types[i] for i in order],
            [tuple(canon(r[i]) for i in order) for r in rows])


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.loads(Path(out_dir, "oracle_sql.json").read_text())

    n_pass = n_fail = 0
    results = sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir())
    # A DECLARED query whose result dir is missing means Verify failed to
    # produce it — that is a gate failure, not an absence. (Verify writes
    # oracle_sql.json only for the queries it attempted, so this is exact
    # for filtered runs too.)
    for name in sorted(set(oracles) - set(results)):
        print(f"[FAIL] {name}: declared oracle but no Spark result "
              f"(Verify failed? see failures.json)")
        n_fail += 1
    for name in results:
        spark_sql = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
        if name not in oracles:
            n = con.sql(spark_sql).fetchone() is not None
            print(f"[rows-only] {name}: nonempty={n}")
            continue
        try:
            scols, stypes, srows = table_rows(con, spark_sql)
            ocols, otypes, orows = table_rows(con, oracles[name])
        except Exception as e:
            print(f"[ERROR] {name}: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"[FAIL] {name}: columns {scols} vs oracle {ocols}")
            n_fail += 1
            continue
        # Dtype drift (e.g. DuckDB sum(BIGINT) -> HUGEINT vs Spark's long)
        # hashes differently in the driver even when Python values compare
        # equal — treat any type mismatch as a failure.
        if stypes != otypes:
            diffs = [f"{c}: {a} vs {b}"
                     for c, a, b in zip(scols, stypes, otypes) if a != b]
            print(f"[FAIL] {name}: column types differ ({'; '.join(diffs)})")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"[FAIL] {name}: {len(srows)} rows vs oracle {len(orows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"[FAIL] {name}: {len(bad)}/{len(srows)} rows differ; first at {i}:")
            print(f"        spark : {a}")
            print(f"        oracle: {b}")
            n_fail += 1
        else:
            print(f"[pass] {name}: {len(srows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(results)} results")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
