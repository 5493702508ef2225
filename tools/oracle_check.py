#!/usr/bin/env python3
"""Local replica of the driver's t2 gate (SURVEY.md §5.3): for each
query output under OUT_DIR, run the matching oracle SQL from
oracle_sql.json in DuckDB over the same sf tables and compare values
column-by-column after sorting columns by name.

Usage: oracle_check.py [SF_DIR] [OUT_DIR] [query ...]
"""
import sys, json, glob, math, decimal, datetime

import duckdb
import pyarrow.parquet as pq

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def canon(v):
    """Canonical string for a cell value, tolerant of container types
    but strict on numeric value (floats compared bit-exactly)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)  # scale preserved: (38,4) both sides renders equal
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
n_fail = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    try:
        rel = con.sql(sql)
        ocols, orows = rel.columns, rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        n_fail += 1
        continue
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    tbl = pq.read_table(files[0] if len(files) == 1 else files)
    scols = tbl.column_names
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
        print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
        n_fail += 1
        continue
    # sort columns by (lower) name, like the driver
    s_order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    o_order = sorted(range(len(ocols)), key=lambda i: ocols[i].lower())
    sdata = [tbl.column(i).to_pylist() for i in s_order]
    srows = list(zip(*sdata)) if sdata and sdata[0] else ([] if not sdata else [])
    orows2 = [tuple(r[i] for i in o_order) for r in orows]
    if len(srows) != len(orows2):
        print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows2)}")
        n_fail += 1
        continue
    bad = None
    for ri, (sr, orr) in enumerate(zip(srows, orows2)):
        cs, co = tuple(map(canon, sr)), tuple(map(canon, orr))
        if cs != co:
            bad = (ri, cs, co)
            break
    if bad:
        ri, cs, co = bad
        cols_sorted = [scols[i] for i in s_order]
        diffs = [f"{c}: spark={a} oracle={b}"
                 for c, a, b in zip(cols_sorted, cs, co) if a != b]
        print(f"FAIL {name}: row {ri}: " + "; ".join(diffs[:4]))
        n_fail += 1
    else:
        print(f"OK   {name} ({len(srows)} rows)")

sys.exit(1 if n_fail else 0)
