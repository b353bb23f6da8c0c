#!/bin/bash
# Local imitation of the driver's correctness gate:
# run graft.Verify at $1 (default sf0.01) -> a per-invocation out dir,
# then compare with DuckDB. The default OUT embeds the PID so two
# concurrent invocations (e.g. sf0.001 smoke while an sf0.01 run is in
# flight) can't clobber each other's parquet dumps and report phantom
# "spark output missing" failures.
set -e
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_out_$$}
# clean up the default out dir ONLY on success: a failing compare's
# parquet dumps are exactly what you need to diff against the oracle
trap '[ "$?" -eq 0 ] && [ -z "${2:-}" ] && rm -rf "$OUT"' EXIT
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
rm -rf "$OUT"
# The grep filter must not mask graft.Verify's exit code (its post-run
# SELF-CHECK exits 2 on a missing dump): capture PIPESTATUS[0] before
# anything else overwrites it.
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} java $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Verify "$SF" "$OUT" ${3:+"$3"} 2>&1 | { grep -v '^2[0-9]' | grep -iv 'warn'; true; }
JV=${PIPESTATUS[0]}
if [ "$JV" -ne 0 ]; then
  echo "graft.Verify FAILED (exit $JV) — see self-check output above" >&2
  exit "$JV"
fi
python3 /root/repo/scripts/compare.py "$SF" "$OUT" ${3:+"$3"}
