#!/usr/bin/env python3
"""Static dtype audit of every oracle query: DESCRIBE each oracle's
SQL in DuckDB (plans only, no execution) and flag output columns whose
DuckDB type will render differently from Spark's through pandas —
the bug class behind the round-4 hash failures:

  - HUGEINT / UHUGEINT   (DuckDB sum() over BIGINT promotes; pandas
                          renders float `25.0` vs Spark int64 `25`)
  - TIMESTAMP WITH TIME ZONE (tz-aware pandas dtype; driver flags it)

This catches the *time bombs* too: an uncast integer sum whose current
values happen to compare equal still carries the wrong declared type
and breaks whenever the data or pandas version shifts.

Usage: dtype_audit.py [SF_DIR] [ORACLE_JSON]
Exit 1 if any query is flagged.
"""
import sys, json

import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
oracle_path = (sys.argv[2] if len(sys.argv) > 2
               else "/tmp/verify_out/oracle_sql.json")

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

BAD = ("HUGEINT", "UHUGEINT", "TIME ZONE")

oracle = json.load(open(oracle_path))
n_flag = 0
for name in sorted(oracle):
    try:
        desc = con.sql(f"DESCRIBE {oracle[name]}").fetchall()
    except Exception as e:
        print(f"FLAG {name}: describe error: {e}")
        n_flag += 1
        continue
    bad = [(c, ty) for c, ty, *_ in desc if any(b in ty.upper() for b in BAD)]
    if bad:
        print(f"FLAG {name}: " + ", ".join(f"{c}:{ty}" for c, ty in bad))
        n_flag += 1

print(f"\n{n_flag} queries flagged out of {len(oracle)}")
sys.exit(1 if n_flag else 0)
