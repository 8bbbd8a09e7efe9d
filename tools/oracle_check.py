#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark result parquet, run the
oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in sfDir),
sort columns by name, sort rows, and compare cell values.
"""
import json
import math
import os
import sys

import duckdb


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def table(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # driver testdata ships single-file tables; Spark-written tiers
        # (e.g. the synthetic sf1 from graft.tools.ScaleUp) are directories
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            duck_rel = con.sql(sql)
            s_cols = [c.lower() for c in spark_rel.columns]
            d_cols = [c.lower() for c in duck_rel.columns]
            if sorted(s_cols) != sorted(d_cols):
                print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
                n_fail += 1
                continue
            # Arrow-level dtype check: fetchall() hides e.g. DuckDB HUGEINT
            # (sum over BIGINT) vs Spark BIGINT — both become Python ints —
            # but the driver hashes through arrow/pandas where they differ.
            s_arrow = {c.lower(): str(t) for c, t in
                       zip(spark_rel.columns, spark_rel.arrow().schema.types)}
            d_arrow = {c.lower(): str(t) for c, t in
                       zip(duck_rel.columns, duck_rel.arrow().schema.types)}
            mism = {c: (s_arrow[c], d_arrow[c]) for c in s_arrow
                    if s_arrow[c] != d_arrow[c]}
            if mism:
                print(f"FAIL {name}: dtype mismatch {mism}")
                n_fail += 1
                continue
            s = table(spark_rel.fetchall(), s_cols)
            d = table(duck_rel.fetchall(), d_cols)
            if len(s) != len(d):
                print(f"FAIL {name}: rowcount spark={len(s)} duck={len(d)}")
                n_fail += 1
                continue
            bad = [(a, b) for a, b in zip(s, d) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)}/{len(s)} differing rows; first: spark={bad[0][0]} duck={bad[0][1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(s)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
