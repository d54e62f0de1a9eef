#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare graft.Verify's
parquet dumps against the declared DuckDB oracle SQL on the same sf dir.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            failures += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            failures += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        mismatch = None
        for col in got.columns:
            g = [norm_cell(v) for v in got[col].tolist()]
            e = [norm_cell(v) for v in exp[col].tolist()]
            if g != e:
                idx = next(i for i in range(len(g)) if g[i] != e[i])
                mismatch = (col, idx, g[idx], e[idx])
                break
        if mismatch:
            col, idx, gv, ev = mismatch
            print(f"FAIL {name}: col={col} row={idx} spark={gv} oracle={ev}")
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
