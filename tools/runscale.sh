#!/bin/bash
# Run graft.ScaleBench with a raw java invocation.
# Usage: runscale.sh <factor> <queryCsv> <logfile>
set -u
FACTOR="$1"; QUERIES="$2"; LOG="$3"
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
  -cp "$CP" graft.ScaleBench "$FACTOR" "$QUERIES" > "$LOG" 2>&1
echo "exit=$? log=$LOG"
