#!/bin/bash
# Run a graft main straight from the compiled classes — no sbt lock, so a
# long Spark job (scale generation, the x10 sweep's Verify, Bench) can run
# concurrently with an sbt compile/test cycle. Compile first (`sbt compile`);
# this script does NOT build. The add-opens set mirrors Spark's own JDK-17
# launcher flags (org.apache.spark.launcher.JavaModuleOptions).
#
# Usage: tools/run_main.sh graft.ScaleProbe ops_entropy
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
WH="${RUN_MAIN_WAREHOUSE:-/tmp/graft_wh_$$}"
# a per-invocation warehouse can hold corpus-scale rebuilt artifacts —
# clean it up unless the caller pinned a shared one to keep
if [ -z "${RUN_MAIN_WAREHOUSE:-}" ]; then
  trap 'rm -rf "$WH"' EXIT
fi
java \
  -XX:+IgnoreUnrecognizedVMOptions \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  --enable-native-access=ALL-UNNAMED \
  -Djdk.reflect.useDirectMethodHandle=false \
  -Dio.netty.tryReflectionSetAccessible=true \
  -Dspark.sql.warehouse.dir="$WH" \
  ${RUN_MAIN_JAVA_OPTS:-} \
  -cp "$CP" "$@"
# The isolated warehouse (one per invocation unless RUN_MAIN_WAREHOUSE pins
# it) keeps a side-run's ensure-style artifact rebuilds from yanking files
# out from under a concurrently-running sbt test JVM that shares the repo's
# spark-warehouse — the catalog is in-memory per JVM, so cross-run artifact
# reuse never existed to lose.
