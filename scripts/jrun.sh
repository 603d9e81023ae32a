#!/bin/bash
# Direct-JVM runner for graft mains against the last `sbt compile` output —
# lets long measurement jobs (ScaleGen / Verify / Bench at sf1+) run while
# sbt iterates on code, instead of serializing on the sbt build lock.
# Usage: scripts/jrun.sh <mainClass> [args...]   (env: SPARK_DRIVER_MEM, SPARK_GRAFT_*)
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
