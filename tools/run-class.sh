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
# GC geometry mirrors build.sbt's fork flags exactly (ParallelGC,
# Xms=Xmx pinned heap, adaptive sizing off, pre-touched pages, 4g
# young gen at the default heap) — see the build.sbt comments for the
# measured rationale; a drift here silently un-pins the bench's
# collection geometry.
MEM="${SPARK_DRIVER_MEM:-12g}"
GCFLAGS="-XX:+UseParallelGC -Xmx$MEM -Xms$MEM -XX:-UseAdaptiveSizePolicy -XX:+AlwaysPreTouch"
if [ "$MEM" = "12g" ]; then GCFLAGS="$GCFLAGS -Xmn4g"; fi
exec java $OPENS --add-modules=jdk.incubator.vector \
  $GCFLAGS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
