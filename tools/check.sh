#!/bin/bash
# Fast local correctness loop: compile once, run Verify via plain java
# (skipping sbt-run startup), then diff against the DuckDB oracle.
# Gate = tools/hashcheck.py (strict driver-replica csv-hash); the
# value-level oracle_check.py runs first only for readable diffs.
# A query is NOT declared done until hashcheck passes here.
# Usage: tools/check.sh [sf_dir] [query ...]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
shift || true
# private OUT per invocation via env: two concurrent check.sh runs
# sharing /tmp/verify_out silently cross-compare each other's dumps
OUT=${SPARK_GRAFT_VERIFY_OUT:-/tmp/verify_out}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# heap override (SPARK_DRIVER_MEM, default 8g) mirrors build.sbt's run
# options — the low-memory certification (BASELINE.md round 10) runs
# the same sweep at 2g to prove the suite spills instead of OOMing
java $OPENS -Xmx${SPARK_DRIVER_MEM:-16g} -XX:ReservedCodeCacheSize=1g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Verify "$SF" "$OUT" "$@"
python3 tools/oracle_check.py "$SF" "$OUT" "$@"
python3 tools/hashcheck.py "$SF" "$OUT" "$@"
