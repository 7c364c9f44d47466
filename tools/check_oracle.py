#!/usr/bin/env python3
"""Dev-loop replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the sfDir
tables, sorts columns by name and rows by all columns, and diffs values.
Exit code 1 if any query mismatches.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    # timestamps/dates compare via str to dodge ns-vs-us dtype mismatch
    if type(a) is not type(b):
        return str(a) == str(b)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols, got = norm_rows(got_rel.columns, got_rel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            exp_rel = con.sql(sql)
            exp_cols, exp = norm_rows(exp_rel.columns, exp_rel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns differ\n  spark={got_cols}\n  duck ={exp_cols}")
            n_fail += 1
            continue
        # dtype drift warning (the driver's hash may be dtype-aware)
        gt = dict(zip(got_rel.columns, [str(t) for t in got_rel.types]))
        et = dict(zip(exp_rel.columns, [str(t) for t in exp_rel.types]))
        for c in got_rel.columns:
            if gt[c] != et.get(c):
                print(f"WARN {name}: dtype {c}: spark={gt[c]} duck={et.get(c)}")
        if len(got) != len(exp):
            print(f"FAIL {name}: row count {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got, exp)):
            if not all(cells_equal(a, b) for a, b in zip(g, e)):
                bad = (i, g, e)
                break
        if bad:
            print(f"FAIL {name}: first diff at sorted row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} oracle queries match")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
