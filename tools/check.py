#!/usr/bin/env python3
"""Local rehearsal of the driver's correctness gate (dev tool only; the
shipped library has no Python dependency).

Usage: python3 tools/check.py <outDir> [sfDir]
  where <outDir> is what `graft.Verify` wrote (one parquet dir per query +
  oracle_sql.json). Registers each testdata table as a DuckDB view, runs the
  oracle SQL, and compares against the Spark result: columns sorted by name,
  rows compared in order, exact equality (floats reported with diff
  magnitude when unequal).
"""
import json
import os
import math
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # Decimal vs Decimal compares by value; Decimal vs int too.
    try:
        return a == b
    except Exception:
        return str(a) == str(b)


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        # driver tables are single files; Spark-generated rehearsal
        # corpora (tools.GenData) are <t>.parquet/ directories of parts
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    timings = {}
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}.parquet'").fetchdf()
            t0 = time.monotonic()
            want = con.execute(sql).fetchdf()
            timings[name] = round(time.monotonic() - t0, 2)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns spark={gcols} oracle={wcols}")
            n_fail += 1
            continue
        got, want = got[gcols], want[wcols]
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        bad = []
        grows = got.itertuples(index=False)
        wrows = want.itertuples(index=False)
        for i, (gr, wr) in enumerate(zip(grows, wrows)):
            for c, (gv, wv) in zip(gcols, zip(gr, wr)):
                if not eq(norm(gv), norm(wv)):
                    bad.append((i, c, gv, wv))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        # REPRESENTATION check, harsher than value equality: the driver
        # hashes rendered values, so a Spark decimal128 '101951.00' vs a
        # DuckDB float64 '101951.0' (equal values) still hash-fails — as do
        # timestamp[ns] vs [us] dtypes. Compare pandas dtypes + repr(),
        # reading the Spark side the way a hasher would (pyarrow-backed).
        rep = None
        if not bad:
            try:
                import pandas as pd
                g2 = pd.read_parquet(f"{out_dir}/{name}.parquet")[gcols]
                if list(g2.dtypes.astype(str)) != list(want.dtypes.astype(str)):
                    rep = (f"dtypes spark={dict(g2.dtypes.astype(str))} "
                           f"duck={dict(want.dtypes.astype(str))}")
                else:
                    for i, (gr, wr) in enumerate(zip(
                            g2.itertuples(index=False),
                            want.itertuples(index=False))):
                        for c, (gv, wv) in zip(gcols, zip(gr, wr)):
                            if repr(gv) != repr(wv):
                                rep = f"row {i} {c}: {gv!r} != {wv!r}"
                                break
                        if rep:
                            break
            except ImportError:  # pandas missing: value check stands
                rep = None
            except Exception as e:
                # any OTHER failure is itself a representation problem
                # (wrong columns, unreadable parquet, dtype compare crash)
                # — surface it instead of letting a regression pass unseen
                rep = f"representation check errored: {e!r}"
        if bad:
            print(f"FAIL {name}: {len(bad)}+ value diffs, first: {bad}")
            n_fail += 1
        elif rep:
            print(f"FAIL {name}: values equal but representations differ "
                  f"(driver hash would mismatch): {rep}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, "
                  f"oracle {timings.get(name, 0)}s)")
            n_pass += 1
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    print("== slowest oracles: "
          + ", ".join(f"{n}={s}s" for n, s in slow) + " ==")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
