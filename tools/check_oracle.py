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
    import os
    for t in TABLES:
        # driver testdata is one file per table; MakeScale-scaled dirs
        # are parquet DIRECTORIES of part files
        pat = (f"{sfdir}/{t}.parquet/*.parquet"
               if os.path.isdir(f"{sfdir}/{t}.parquet") else f"{sfdir}/{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    # scaled dirs (graft.tools.MakeScale) store events.ts as int64
    # epoch-nanos (Spark cannot write TIMESTAMP(NANOS)); mirror
    # TableCatalog.events exactly: integer-divide to micros, convert
    (tstype,) = con.sql("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
    if tstype == "BIGINT":
        evpat = (f"{sfdir}/events.parquet/*.parquet"
                 if os.path.isdir(f"{sfdir}/events.parquet") else f"{sfdir}/events.parquet")
        con.sql("DROP VIEW events")
        con.sql(f"CREATE VIEW events AS SELECT * REPLACE"
                f" (make_timestamp(ts // 1000) AS ts)"
                f" FROM read_parquet('{evpat}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            gcols, grows = canon(got.fetchall(), got.columns)
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            try:  # a missing-file IO error can abort the implicit txn
                con.execute("ROLLBACK")
            except Exception:
                pass
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
