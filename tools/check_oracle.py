#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/graft_verify

Assumes graft.Verify already wrote <out>/<name>/ parquet dirs and
<out>/oracle_sql.json. Runs each oracle SQL in DuckDB against views over
the same parquet tables, then compares (columns sorted by name, rows
sorted by all columns, exact values).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            gcols, grows = canon(got.fetchall(), got.columns)
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            continue
        try:
            want = con.sql(sql)
            wcols, wrows = canon(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            continue
        if gcols != wcols:
            print(f"FAIL {name}: schema mismatch spark={gcols} duckdb={wcols}")
        elif grows != wrows:
            diffs = [(a, b) for a, b in zip(grows, wrows) if a != b]
            print(f"FAIL {name}: {len(grows)} vs {len(wrows)} rows, "
                  f"first diffs: {diffs[:3]}"
                  + (f" extra_spark={grows[len(wrows):][:2]}" if len(grows) > len(wrows) else "")
                  + (f" extra_duck={wrows[len(grows):][:2]}" if len(wrows) > len(grows) else ""))
        else:
            n_ok += 1
            print(f"OK   {name} ({len(grows)} rows)")
    print(f"== {n_ok}/{len(oracle)} queries match")


if __name__ == "__main__":
    main()
