#!/bin/bash
# Dev aid (r20): run a graft main directly with java -cp, bypassing
# sbt's JVM startup and build lock, so profiling runs can iterate while
# sbt test runs elsewhere. Classpath comes from
#   sbt -batch "export Runtime/fullClasspath" > /tmp/graft_cp.txt
# (regenerate after dependency changes; recompile with sbt compile).
# Usage: scripts/run_main.sh graft.ProfileQueries /root/testdata/sf0.1 q1_agg 2
set -e
CP=$(cat /tmp/graft_cp.txt)
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "$CP" "$@"
