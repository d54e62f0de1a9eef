#!/usr/bin/env python3
"""Subset variant of selfcheck.py for local iteration: check only the
comma-separated query names in argv[3] (all others in oracle_sql.json are
skipped, so a SPARK_GRAFT_VERIFY_ONLY dump can be compared in isolation).

Usage: python3 tools/checkone.py <sfDir> <verifyOutDir> <name[,name...]>
"""
import json
import sys

sys.path.insert(0, __import__("os").path.dirname(__file__))
import selfcheck  # noqa: E402


def main(sf_dir, out_dir, names):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    keep = set(n.strip() for n in names.split(","))
    subset = {k: v for k, v in oracle.items() if k in keep}
    missing = keep - set(subset)
    for n in sorted(missing):
        print(f"NOTE {n}: no oracle declared (rows-only query)")
    json.dump(subset, open(f"{out_dir}/oracle_sql.json", "w"))
    try:
        return selfcheck.main(sf_dir, out_dir)
    finally:
        json.dump(oracle, open(f"{out_dir}/oracle_sql.json", "w"))


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
