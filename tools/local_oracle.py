#!/usr/bin/env python3
"""Local replica of the driver's correctness gate for fast iteration:
run `sbt "runMain graft.Verify <sfDir> <outDir>"` (optionally with
SPARK_GRAFT_ONLY=q113_...,q115_...) first, then:

    python3 tools/local_oracle.py <sfDir> <outDir> [query ...]

Compares each dumped parquet against the DuckDB run of the recorded
oracle SQL: row count, column names (sorted), and values (rows sorted,
doubles compared to 1e-9 relative). Exit 1 on any mismatch.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return float(f"{v:.9g}")  # 9 significant digits
    return v


def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(norm(r[i]) for i in order) for r in cur.fetchall()]
    return sorted(cols), sorted(data, key=repr)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failed = []
    names = sorted(only or [d.name for d in Path(out_dir).iterdir() if d.is_dir()])
    for name in names:
        spark_dir = Path(out_dir) / name
        if not spark_dir.is_dir():
            print(f"{name}: NO SPARK DUMP")
            failed.append(name)
            continue
        cur = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        s_cols, s_rows = rows_of(cur)
        if name not in oracle:
            print(f"{name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            cur = con.execute(oracle[name])
            o_cols, o_rows = rows_of(cur)
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR {e}")
            failed.append(name)
            continue
        ok = s_cols == o_cols and len(s_rows) == len(o_rows) and s_rows == o_rows
        if ok:
            print(f"{name}: PASS ({len(s_rows)} rows)")
        else:
            print(f"{name}: FAIL cols={s_cols==o_cols} rows={len(s_rows)}/{len(o_rows)} "
                  f"vals={s_rows == o_rows}")
            if s_cols != o_cols:
                print(f"  spark cols {s_cols}\n  oracle cols {o_cols}")
            else:
                diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
                for a, b in diff:
                    print(f"  spark  {a}\n  oracle {b}")
            failed.append(name)
    print(f"{len(names) - len(failed)}/{len(names)} pass")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
