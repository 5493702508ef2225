#!/usr/bin/env python3
"""Driver-replica hash compare (strict): mimics the t2 harness more
closely than oracle_check.py by going through *pandas* on both sides
(pd.read_parquet for Spark output, duckdb .df() for the oracle),
sorting columns by name, sorting rows by all columns, then comparing
dtypes and several candidate hash canonicalizations. A query passes
here only if every plausible driver hash would match.

Usage: hashcheck.py [SF_DIR] [OUT_DIR] [query ...]
"""
import sys, json, glob, hashlib

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def prep(df):
    """Sort columns by name, then rows by all columns (driver-style)."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def hash_csv(df):
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def hash_pd(df):
    try:
        h = pd.util.hash_pandas_object(df, index=False)
        return hashlib.md5(h.values.tobytes()).hexdigest()
    except TypeError:
        return "unhashable"


def hash_str(df):
    return hashlib.md5(
        "\n".join(",".join(map(repr, r)) for r in df.itertuples(index=False))
        .encode()).hexdigest()


oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
n_fail = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        n_fail += 1
        continue
    if not glob.glob(f"{out_dir}/{name}/*.parquet"):
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    sdf = pd.read_parquet(f"{out_dir}/{name}")

    if sorted(c.lower() for c in sdf.columns) != sorted(
            c.lower() for c in odf.columns):
        print(f"FAIL {name}: columns spark={sorted(sdf.columns)} "
              f"oracle={sorted(odf.columns)}")
        n_fail += 1
        continue
    # normalize case to spark's casing for the compare
    odf.columns = [c.lower() for c in odf.columns]
    sdf.columns = [c.lower() for c in sdf.columns]
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
        n_fail += 1
        continue
    try:
        sdf, odf = prep(sdf), prep(odf)
    except Exception as e:
        print(f"FAIL {name}: sort error: {type(e).__name__} {e}")
        n_fail += 1
        continue

    # Gate = csv-style value rendering (empirically matches the driver's
    # hash: round-1 csv-hash failures == driver's hash_match:false set).
    # dtype diffs that don't change the rendering (int32/int64, ns/us,
    # date-object/datetime64) are warnings; tz-aware dtypes fail (the
    # driver flagged tz-aware oracle output as a schema mismatch).
    problems = []
    warns = []
    for c in sdf.columns:
        sd, od = str(sdf[c].dtype), str(odf[c].dtype)
        if sd != od:
            msg = f"dtype[{c}]: spark={sd} oracle={od}"
            if "UTC" in sd or "UTC" in od or "," in sd or "," in od:
                problems.append(msg)
            else:
                warns.append(msg)
    if hash_csv(sdf) != hash_csv(odf):
        problems.append("hash:csv")
    if problems:
        # find first differing cell for context
        detail = ""
        for c in sdf.columns:
            a, b = sdf[c], odf[c]
            try:
                neq = ~(a.astype(str) == b.astype(str))
            except Exception:
                continue
            if neq.any():
                i = int(np.argmax(neq.values))
                detail = (f" | first diff col={c} row={i}: "
                          f"spark={a.iloc[i]!r} oracle={b.iloc[i]!r}")
                break
        print(f"FAIL {name}: " + "; ".join(problems[:6]) + detail)
        n_fail += 1
    else:
        w = ("  [warn " + "; ".join(warns[:4]) + "]") if warns else ""
        print(f"OK   {name} ({len(sdf)} rows){w}")

print(f"\n{n_fail} strict failures")
sys.exit(1 if n_fail else 0)
