#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <outDir> <sfDir>

Reads <outDir>/<name>/ parquet dirs written by graft.Verify plus
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB against views over
<sfDir>/*.parquet, and compares: row count, column names (sorted), and
values (rows sorted by all columns, column order = sorted names).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql, label):
    df = con.execute(rel_sql).fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return cols, df


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_cols, got = canon(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'", name)
            exp_cols, exp = canon(con, sql, name)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            failures += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        mismatched = []
        for c in got_cols:
            a, b = got[c], exp[c]
            if str(a.dtype) != str(b.dtype):
                mismatched.append(f"{c}: dtype {a.dtype} != {b.dtype}")
                continue
            if a.dtype.kind == "f":
                import numpy as np
                bad = ~((a.isna() & b.isna()) | (a == b))
                if bad.any():
                    i = bad.idxmax()
                    mismatched.append(
                        f"{c}: {int(bad.sum())} diffs, first row {i}: "
                        f"{a[i]!r} != {b[i]!r}")
            else:
                eq = (a.astype(str).where(~a.isna(), "\0NULL") ==
                      b.astype(str).where(~b.isna(), "\0NULL"))
                if not eq.all():
                    i = (~eq).idxmax()
                    mismatched.append(
                        f"{c}: {int((~eq).sum())} diffs, first row {i}: "
                        f"{a[i]!r} != {b[i]!r}")
        if mismatched:
            print(f"FAIL {name}: " + "; ".join(mismatched[:4]))
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"== {len(oracle) - failures}/{len(oracle)} passed ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
