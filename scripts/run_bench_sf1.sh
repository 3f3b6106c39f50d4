#!/bin/bash
cd /root/repo
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=${1:-/tmp/sf1} SPARK_GRAFT_BENCH_OUT=${2:-target/bench_full_sf1.json} \
java $OPENS -Xmx32g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
rc=$?
echo "BENCH_EXIT=$rc"
exit $rc
