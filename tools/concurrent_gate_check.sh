#!/usr/bin/env bash
# Proves the fixture machinery is cross-JVM race-free: runs the Bench
# main and the Verify main CONCURRENTLY on the same sfDir (the exact
# scenario that used to race on shared /tmp/graft_wh wipe-and-rebuild
# roots), then runs the DuckDB oracle compare on the concurrent Verify
# dump. Every key must PASS, same as a sequential run.
#
# The two mains run as RAW java processes (sbt would serialize them on
# the project lock, defeating the concurrency); the --add-opens flags
# mirror build.sbt's javaOptions (Spark 4 on JDK 17).
#
# Usage: tools/concurrent_gate_check.sh [sfDir]   (default sf0.001)
set -u
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
OUT=$(mktemp -d /tmp/graft_conc_verify.XXXXXX)

echo "[concurrent] compiling + exporting classpath"
sbt -batch compile > "$OUT/compile.log" 2>&1 || {
  echo "[concurrent] FAIL: compile (see $OUT/compile.log)"; exit 1; }
CP=$(sbt -batch -error "export Runtime/fullClasspath" | tail -1)

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JAVA_FLAGS="$ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g"

echo "[concurrent] sfDir=$SF verify-out=$OUT — launching bench || verify"
SPARK_GRAFT_SF_DIR="$SF" java $JAVA_FLAGS -cp "$CP" graft.Bench \
  > "$OUT/bench.log" 2>&1 &
BENCH_PID=$!
java $JAVA_FLAGS -cp "$CP" graft.Verify "$SF" "$OUT" \
  > "$OUT/verify.log" 2>&1 &
VERIFY_PID=$!

wait $BENCH_PID; BENCH_RC=$?
wait $VERIFY_PID; VERIFY_RC=$?
echo "[concurrent] bench rc=$BENCH_RC verify rc=$VERIFY_RC"
grep -h '"metric"' "$OUT/bench.log" | tail -1

if [ $BENCH_RC -ne 0 ] || [ $VERIFY_RC -ne 0 ]; then
  echo "[concurrent] FAIL: a main exited nonzero (logs in $OUT)"
  exit 1
fi

python3 tools/verify_local.py "$SF" "$OUT"
RC=$?
if [ $RC -eq 0 ]; then
  echo "[concurrent] PASS: oracle compare green under bench||verify concurrency"
else
  echo "[concurrent] FAIL: oracle compare red under concurrency (logs in $OUT)"
fi
exit $RC
