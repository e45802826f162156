#!/usr/bin/env python3
"""Pandas-based mimic of the DRIVER's compare (stricter than
check_oracle.py): reads the Spark output with pyarrow->pandas and the
oracle with duckdb .df(), sorts columns by name, lexsorts rows over all
columns (errors on unhashable cells, like the driver), then compares the
per-cell string rendering — so a DuckDB HUGEINT arriving as float64
("123.0" vs "123") or an unsortable ndarray column fails here the same
way it fails in the driver.

Usage: python3 tools/driver_compare.py /root/testdata/sf0.01 /tmp/gv \
           [correctness_out.json]

The optional third argument writes a CORRECTNESS_r-style JSON artifact
(per-query rows/schema/hash match) for committed scale-factor sweeps.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    # driver-style lexsort over all columns (raises on ndarray cells)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df.astype(str)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    report_path = sys.argv[3] if len(sys.argv) > 3 else None
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
    report = {}
    for name, sql in sorted(oracle.items()):
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        report[name] = rec
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            got = canon(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
            want = canon(con.sql(sql).df())
        except Exception as e:
            rec["err"] = f"{type(e).__name__}: {str(e)[:160]}"
            print(f"FAIL {name}: {rec['err']}")
            continue
        rec["spark_rows"], rec["oracle_rows"] = len(got), len(want)
        rec["schema_match"] = list(got.columns) == list(want.columns)
        rec["rows_match"] = len(got) == len(want)
        rec["hash_match"] = (rec["schema_match"] and rec["rows_match"]
                             and got.equals(want))
        if not rec["schema_match"]:
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(want.columns)}")
        elif not rec["rows_match"]:
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        elif not rec["hash_match"]:
            neq = (got != want).any(axis=1)
            idx = got.index[neq][:3]
            print(f"FAIL {name}: {int(neq.sum())} differing rows, first:")
            for i in idx:
                print(f"  spark={got.loc[i].to_dict()}")
                print(f"  duck ={want.loc[i].to_dict()}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(got)} rows)")
    print(f"== {n_ok}/{len(oracle)} queries match (driver-style)")
    if report_path:
        with open(report_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
