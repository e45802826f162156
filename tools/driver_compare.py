#!/usr/bin/env python3
"""Pandas-based mimic of the DRIVER's compare (stricter than
check_oracle.py): reads the Spark output with pyarrow->pandas and the
oracle with duckdb .df(), sorts columns by name, lexsorts rows over all
columns (errors on unhashable cells, like the driver), then compares the
per-cell string rendering — so a DuckDB HUGEINT arriving as float64
("123.0" vs "123") or an unsortable ndarray column fails here the same
way it fails in the driver.

Usage: python3 tools/driver_compare.py /root/testdata/sf0.01 /tmp/gv
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
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            got = canon(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}")
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(want.columns)}")
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        elif not got.equals(want):
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


if __name__ == "__main__":
    main()
