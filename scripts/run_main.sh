#!/bin/bash
# Plain-java runner for any graft main (Verify/Bench) against the
# already-compiled target/scala-2.13/classes — no sbt lock, so a
# long-running sweep can proceed while sbt test/compile runs elsewhere.
# Usage: run_main.sh <mainClass> [args...]   (env vars pass through)
cd /root/repo
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
MAIN=$1; shift
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-32g} -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$MAIN" "$@"
