#!/bin/bash
# Run a graft main class against the compiled classes + Spark jars.
# Usage: tools/run.sh <mainClass> [args...]   (env vars pass through)
# Heap is overridable: RUN_XMX=32g tools/run.sh ...
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
SPARK_JARS="${SPARK_JARS_DIR:-/opt/spark/jars}"
shopt -s nullglob
jars=("$SPARK_JARS"/*.jar)
if [ ${#jars[@]} -eq 0 ]; then
  echo "no jars found in $SPARK_JARS" >&2
  exit 1
fi
CP="$REPO_ROOT/target/scala-2.13/classes"
for j in "${jars[@]}"; do CP="$CP:$j"; done
exec java -Xmx"${RUN_XMX:-96g}" \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Dio.netty.tryReflectionSetAccessible=true \
  -cp "$CP" "$@"
