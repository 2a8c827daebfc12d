#!/bin/bash
# Run a graft main class directly against the compiled classes + Spark jars
# (avoids sbt JVM startup). Usage: tools/run.sh graft.Verify <args...>
set -e
MAIN="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$(ls -d "$REPO"/target/scala-*/classes 2>/dev/null | head -1)"
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "$MAIN" "$@"
