#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet dumped by graft.Verify, runs the matching SQL
from oracle_sql.json in DuckDB over the sf tables, sorts columns by name +
rows by all columns, and value-compares.
"""
import json
import math
import sys

import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for tname in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracle = json.load(f)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(values_equal(x, y) for x, y in zip(la, lb))
    return str(a) == str(b)


n_pass = n_fail = 0
# optional 3rd arg: comma-separated name substrings — check only those
pats = sys.argv[3].split(",") if len(sys.argv) > 3 else None
for name, sql in sorted(oracle.items()):
    if pats and not any(p in name for p in pats):
        continue
    try:
        got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        want = canon(con.sql(sql).df())
        ok = got.shape == want.shape
        detail = f"shape got={got.shape} want={want.shape}"
        if ok:
            bad = None
            for c in got.columns:
                for i in range(len(got)):
                    if not values_equal(got[c].iloc[i], want[c].iloc[i]):
                        bad = (c, i, got[c].iloc[i], want[c].iloc[i])
                        break
                if bad:
                    break
            ok = bad is None
            detail = f"first mismatch {bad}" if bad else ""
        print(("PASS " if ok else "FAIL ") + name + ("  " + detail if not ok else ""))
        n_pass += ok
        n_fail += not ok
    except Exception as e:
        print(f"ERROR {name}: {type(e).__name__}: {e}")
        n_fail += 1
print(f"\n{n_pass} pass / {n_fail} fail")
