#!/bin/bash
# Plain-java runner for any graft main (Verify/Bench) against the
# already-compiled target/scala-2.13/classes — no sbt lock, so a
# long-running sweep can proceed while sbt test/compile runs elsewhere.
# Usage: run_main.sh <mainClass> [args...]   (env vars pass through)
#
# Staleness guard (ADVICE r13): a sweep run after source edits but before
# recompile would silently measure old code and commit its artifacts as
# evidence. Refuse to run if any file under src/main is newer than the
# newest compiled class; SPARK_GRAFT_ALLOW_STALE=1 overrides (with a
# warning) for the rare deliberate old-build run.
cd /root/repo
if [ "${SPARK_GRAFT_ALLOW_STALE:-0}" != "1" ]; then
  newest_class=$(find target/scala-2.13/classes -type f -name '*.class' -printf '%T@\n' 2>/dev/null | sort -n | tail -1)
  newest_src=$(find src/main -type f -printf '%T@\n' 2>/dev/null | sort -n | tail -1)
  if [ -z "$newest_class" ]; then
    echo "[run_main] no compiled classes under target/scala-2.13/classes — run 'sbt compile' first" >&2
    exit 2
  fi
  if [ -n "$newest_src" ] && awk -v s="$newest_src" -v c="$newest_class" 'BEGIN{exit !(s>c)}'; then
    echo "[run_main] STALE BUILD: src/main has edits newer than the newest class file." >&2
    echo "[run_main] Run 'sbt compile' first (or set SPARK_GRAFT_ALLOW_STALE=1 to measure the old build anyway)." >&2
    exit 2
  fi
else
  echo "[run_main] WARNING: SPARK_GRAFT_ALLOW_STALE=1 — skipping the src-vs-classes staleness check" >&2
fi
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
MAIN=$1; shift
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-32g} -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$MAIN" "$@"
