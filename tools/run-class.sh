#!/bin/bash
# Run a graft main class against the compiled classes + Spark jars,
# with the same JVM flags build.sbt uses for forked runs. Lets heavy
# tools (ScaleUp, Bench at alternate SFs, Verify) run without taking
# the sbt lock. Usage: run-class.sh <mainClass> [args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
exec java $OPENS --add-modules=jdk.incubator.vector \
  -XX:+UseParallelGC -Xmx"${SPARK_DRIVER_MEM:-12g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
