#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet dump (written by graft.Verify),
runs the matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB
with views named after the parquet tables in <sfDir>, and compares:
  - schema (column names, sorted)
  - row count
  - exact values after sorting columns by name and rows by all columns

Strict on purpose: value comparison is string-exact (no float tolerance)
to emulate the worst-case hash compare.
"""
import json
import sys
from pathlib import Path

import duckdb
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cell(v):
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output dumped")
            n_fail += 1
            continue
        try:
            got = ds.dataset(str(qdir)).to_table().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        mismatch = None
        for c in g.columns:
            gv = [cell(v) for v in g[c]]
            wv = [cell(v) for v in w[c]]
            if gv != wv:
                for i, (a, b) in enumerate(zip(gv, wv)):
                    if a != b:
                        mismatch = (c, i, a, b)
                        break
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={a} oracle={b}")
            # dtype hint
            print(f"     dtypes: spark={g[c].dtype} oracle={w[c].dtype}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
