#!/bin/bash
# Scale sweep with valid measurement methodology: one JVM per point, bench
# JVM flags (see ScaleBench scaladoc / SCALE.md). Output: one JSON line per
# point on stdout.
set -e
cd /root/repo
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
FLAGS="-Xmx48g -XX:ReservedCodeCacheSize=2g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
BASE="${1:-/root/testdata/sf0.1}"
WORK="${2:-/root/repo/target/scale}"
for p in x1 x3 x10 x30; do
  java $ADDOPENS $FLAGS -cp "$CP" graft.tools.ScaleBench "$BASE" "$WORK" "$p" \
    2> "target/scale_${p}.log"
done
