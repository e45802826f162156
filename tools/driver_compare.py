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

ORACLE_TIMEOUT=<seconds> runs each query's compare in a killable child
process: a handful of DuckDB oracles are deliberately O(n^2) (the full
pair-graph dedup CTEs) and infeasible at sf1+ in the ORACLE engine —
the engine output exists either way; the artifact records
"oracle timeout" for those instead of hanging the sweep.

EXPECT_EXCLUDE=<name,name,...> marks queries whose CONTRACT is out of
scope at the sweep's scale factor (e.g. dedup_ngram_jaccard fixes the
full quadratic pair graph — SURVEY §2 F3's sf<=0.1 disposition; its
bounded twin dedup_ngram_topk is the at-scale path). They are recorded
as {"excluded": reason} rather than failures and skipped entirely.
"""
import glob
import json
import multiprocessing as mp
import os
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


def connect(sfdir):
    con = duckdb.connect()
    # parallel sweep splits each get a RAM budget and a spill dir —
    # without these, N concurrent compares each assume 80% of the box
    # and the heavy oracles OOM each other
    mem = os.environ.get("DUCKDB_MEMLIMIT")
    if mem:
        # per-process default: concurrent sweep splits sharing one
        # spill dir race on temp-file cleanup (observed IOException:
        # "Could not remove file .../duckdb_temp_storage-0.tmp")
        tmp = os.environ.get("DUCKDB_TMP", f"/tmp/duckdb_spill_{os.getpid()}")
        os.makedirs(tmp, exist_ok=True)
        con.sql(f"SET memory_limit='{mem}'")
        con.sql(f"SET temp_directory='{tmp}'")
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
    return con


def compare_one(sfdir, outdir, name, sql, con=None):
    """One query's compare -> (rec, lines-to-print)."""
    rec = {"rows_match": False, "schema_match": False,
           "hash_match": False, "spark_rows": None,
           "oracle_rows": None, "err": None}
    lines = []
    # SCALED_ORACLES=1: sweep-only restructurings of the oracles that
    # are structurally infeasible in DuckDB at 100x replication
    # (identical results — self-tested against the registry SQL at
    # small SF: python3 tools/scaled_oracles.py <sfdir> <outdir>)
    if os.environ.get("SCALED_ORACLES") == "1":
        try:
            import scaled_oracles
            fn = scaled_oracles.get(name)
        except ImportError:
            fn = None
        if fn is not None:
            try:
                # split view dirs hold a SUBSET oracle_sql.json; the
                # restructurings need other queries' SQL as dependency
                # fragments — the sweep drops the full map alongside
                full = f"{outdir}/oracle_sql_full.json"
                oracle_sql = json.load(open(
                    full if os.path.exists(full)
                    else f"{outdir}/oracle_sql.json"))
                return fn(sfdir, outdir, oracle_sql, name)
            except Exception as e:
                rec["err"] = f"{type(e).__name__}: {str(e)[:160]}"
                return rec, [f"FAIL {name}: {rec['err']}"]
    try:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        got = canon(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        c = con or connect(sfdir)  # bind: an unreferenced connection is GC-closed mid-query
        want = canon(c.sql(sql).df())
    except Exception as e:
        rec["err"] = f"{type(e).__name__}: {str(e)[:160]}"
        return rec, [f"FAIL {name}: {rec['err']}"]
    rec["spark_rows"], rec["oracle_rows"] = len(got), len(want)
    rec["schema_match"] = list(got.columns) == list(want.columns)
    rec["rows_match"] = len(got) == len(want)
    rec["hash_match"] = (rec["schema_match"] and rec["rows_match"]
                         and got.equals(want))
    if not rec["schema_match"]:
        lines.append(f"FAIL {name}: cols spark={list(got.columns)} duck={list(want.columns)}")
    elif not rec["rows_match"]:
        lines.append(f"FAIL {name}: rows {len(got)} vs {len(want)}")
    elif not rec["hash_match"]:
        neq = (got != want).any(axis=1)
        lines.append(f"FAIL {name}: {int(neq.sum())} differing rows, first:")
        for i in got.index[neq][:3]:
            lines.append(f"  spark={got.loc[i].to_dict()}")
            lines.append(f"  duck ={want.loc[i].to_dict()}")
    else:
        lines.append(f"OK   {name} ({len(got)} rows)")
    return rec, lines


def _worker(sfdir, outdir, name, sql, q):
    q.put(compare_one(sfdir, outdir, name, sql))


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    report_path = sys.argv[3] if len(sys.argv) > 3 else None
    timeout = float(os.environ["ORACLE_TIMEOUT"]) if "ORACLE_TIMEOUT" in os.environ else None
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    excluded = set(filter(None, os.environ.get("EXPECT_EXCLUDE", "").split(",")))
    con = None if timeout else connect(sfdir)
    n_ok = 0
    report = {}
    # resumable (OPT-IN via RESUME_REPORT=1): a prior interrupted run's
    # report seeds the decided set. Opt-in because /tmp persists across
    # rounds — an unconditional seed would let a NEXT round's sweep
    # skip queries against STALE verdicts from a previous round's code.
    if (report_path and os.path.exists(report_path)
            and os.environ.get("RESUME_REPORT") == "1"):
        prior = json.load(open(report_path))
        # reconcile prior verdicts with the CURRENT excluded set: a
        # previously-green query that is now excluded must not inflate
        # n_ok past n_run, and a previously-excluded now-active query
        # must actually run rather than skip on its stale record
        report = {n: r for n, r in prior.items()
                  if (r.get("hash_match") and n not in excluded)
                  or ("excluded" in r and n in excluded)}
        if report:
            print(f"= resuming: {len(report)} queries already decided",
                  flush=True)
    for name, sql in sorted(oracle.items()):
        if name in report:
            n_ok += 1 if report[name].get("hash_match") else 0
            continue
        if name in excluded:
            report[name] = {"excluded":
                            "contract out of scope at this scale factor "
                            "(see SURVEY.md SS2 disposition)"}
            print(f"EXCL {name}: expect-excluded at this scale", flush=True)
            continue
        if timeout is None:
            rec, lines = compare_one(sfdir, outdir, name, sql, con)
        else:
            ctx = mp.get_context("spawn")  # fork inherits unusable duckdb state
            q = ctx.Queue()
            p = ctx.Process(target=_worker, args=(sfdir, outdir, name, sql, q))
            p.start()
            try:
                rec, lines = q.get(timeout=timeout)
                p.join()
            except Exception:
                p.kill()
                p.join()
                rec = {"rows_match": False, "schema_match": False,
                       "hash_match": False, "spark_rows": None,
                       "oracle_rows": None,
                       "err": f"oracle timeout after {timeout:.0f}s "
                              "(DuckDB-side cost; engine output produced)"}
                lines = [f"SKIP {name}: {rec['err']}"]
        report[name] = rec
        n_ok += 1 if rec["hash_match"] else 0
        for ln in lines:
            print(ln, flush=True)
        # incremental write: an interrupted split resumes from here
        if report_path:
            with open(report_path, "w") as f:
                json.dump(report, f, indent=1, sort_keys=True)
    n_run = len(oracle) - len(excluded & set(oracle))
    suffix = f" ({len(excluded & set(oracle))} expect-excluded)" if excluded else ""
    print(f"== {n_ok}/{n_run} queries match (driver-style){suffix}")
    if report_path:
        with open(report_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
