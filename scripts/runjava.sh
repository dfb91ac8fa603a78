#!/bin/bash
# Dev helper: run a graft main class with the same JVM flags sbt's fork
# uses (add-opens, UTC, no UI, -Xmx8g), against an arbitrary classes dir.
# Usage: CLASSES=/path/to/classes scripts/runjava.sh graft.Bench [args...]
# Defaults: CLASSES=target/scala-2.13/classes, SPARK_DRIVER_MEM=8g.
set -u
CLASSES="${CLASSES:-target/scala-2.13/classes}"
MEM="${SPARK_DRIVER_MEM:-8g}"
ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -Xmx"$MEM" \
  -cp "$CLASSES:$(echo /opt/spark/jars/*.jar | tr ' ' ':')" "$@"
