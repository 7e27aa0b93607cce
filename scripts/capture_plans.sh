#!/bin/bash
# Dev aid (r20): capture .explain("formatted") for the round's touched
# queries from the BEFORE worktree (pre-optimization HEAD) and the
# current tree into plans/r20/<q>_{before,after}.txt.
# Usage: scripts/capture_plans.sh q1,q2,...   (runs two Spark sessions)
set -e
QS="$1"
SF=${2:-/root/testdata/sf0.1}
mkdir -p plans/r20
run() { # $1=classpath-file $2=suffix
  CP=$(cat "$1")
  java --add-opens java.base/java.lang=ALL-UNNAMED \
    --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
    --add-opens java.base/java.io=ALL-UNNAMED \
    --add-opens java.base/java.net=ALL-UNNAMED \
    --add-opens java.base/java.nio=ALL-UNNAMED \
    --add-opens java.base/java.util=ALL-UNNAMED \
    --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
    --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens java.base/sun.security.action=ALL-UNNAMED \
    --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g \
    -cp "$CP" graft.Explain "$SF" "$QS" 2>/dev/null |
  awk -v sfx="$2" '
    /^==========/ { q=$2; f="plans/r20/" q "_" sfx ".txt"; print "" > f; next }
    q { print >> f }'
}
run /tmp/graft_before_cp.txt before
run /tmp/graft_cp.txt after
ls -la plans/r20/ | tail -5
