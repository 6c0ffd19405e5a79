#!/usr/bin/env python3
"""Dev-only differential checker mirroring the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [skipName,skipName,...]

The optional third argument names oracles to SKIP (reported as
"skipped"): used for the sf0.1 gate, where a handful of DuckDB replays
are themselves quadratic/recursive (all-pairs similarity, recursive-CTE
closures) and would run for hours on 10x data — their engine side is
hash-verified at sf0.01.

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s parquet
tables, sorts columns by name, and compares row counts + values.

This script is NOT part of the engine (driver-side python is allowed for
verification only); the shipped library is pure Scala/Spark.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"  # -0.0 == 0.0 (IEEE); repr would split them
        # Large magnitudes compare at 12 significant digits: absolute
        # rounding alone flags last-ulp noise there (a 3.4e9 SUM at sf1
        # differs in the 2nd decimal purely from double fold order —
        # 3e-12 relative), while 12 sig figs stays far stricter than the
        # ~4e-10 relative error a million-row double sum can legitimately
        # accumulate. The cutoff is abs(v) > 1e3 — EXACTLY where 12 sig
        # figs becomes the coarser (more tolerant) of the two rules: at
        # 1e3 they coincide (1e-9 absolute), above it 9-decimal rounding
        # would flag legitimate fold-order noise on ~1e5-scale double
        # sums (the round-12 advice note). Below 1e3 the strict 9-decimal
        # comparison is the tolerant one anyway, so nothing is lost.
        if abs(v) > 1e3:
            return repr(float(f"{round(v, 9):.12g}"))
        return repr(round(v, 9))
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    import os
    failed = []

    def reset(c):
        # some errors leave the connection's implicit transaction aborted,
        # which would fail every later query with TransactionContext Error
        try:
            c.execute("ROLLBACK")
        except Exception:
            pass
    for name in sorted(os.listdir(out_dir)):
        if name in oracles or not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            n = con.sql(
                f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            status = f"rows-only {name} ({n} rows)"
            print(f"OK    {status}" if n > 0 else f"WARN  {status} — EMPTY")
        except Exception as e:
            reset(con)
            failed.append((name, f"non-oracle output unreadable: {e}"))
    for name, sql in sorted(oracles.items()):
        if name in skip:
            # the DuckDB replay is skipped, but the engine dump must still
            # be readable and non-empty — otherwise a broken skipped query
            # would pass silently
            try:
                n = con.sql(
                    f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'"
                ).fetchone()[0]
                if n > 0:
                    print(f"SKIP  {name} (quadratic DuckDB replay; "
                          f"{n} rows readable)")
                else:
                    failed.append((name, "skipped oracle but output EMPTY"))
            except Exception as e:
                reset(con)
                failed.append((name, f"skipped oracle output unreadable: {e}"))
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in spark_cols) +
                f" FROM '{out_dir}/{name}/*.parquet'").fetchall()
        except Exception as e:
            reset(con)
            failed.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            oracle_rel = con.sql(sql)
            ocols = oracle_rel.columns
            order = sorted(range(len(ocols)), key=lambda i: ocols[i])
            oracle_cols = [ocols[i] for i in order]
            oracle_rows = [tuple(r[i] for i in order)
                           for r in oracle_rel.fetchall()]
        except Exception as e:
            reset(con)
            failed.append((name, f"oracle failed: {e}"))
            continue
        if spark_cols != oracle_cols:
            failed.append((name, f"columns {spark_cols} != {oracle_cols}"))
            continue
        if len(spark_rows) != len(oracle_rows):
            failed.append(
                (name, f"rows {len(spark_rows)} != {len(oracle_rows)}"))
            continue
        mism = 0
        first = None
        for a, b in zip(spark_rows, oracle_rows):
            if tuple(map(norm, a)) != tuple(map(norm, b)):
                mism += 1
                if first is None:
                    first = (a, b)
        if mism:
            failed.append((name, f"{mism} value mismatches; first: "
                           f"spark={first[0]} oracle={first[1]}"))
        else:
            print(f"OK    {name} ({len(spark_rows)} rows)")
    for name, why in failed:
        print(f"FAIL  {name}: {why}")
    n_skipped = len(skip & set(oracles))
    n_run = len(oracles) - n_skipped
    tail = f" ({n_skipped} skipped)" if n_skipped else ""
    print(f"\n{n_run - len(failed)}/{n_run} oracle queries match{tail}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
