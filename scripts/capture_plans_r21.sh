#!/bin/bash
# Dev aid (r21): capture .explain("formatted") for the round's touched
# queries from the CURRENT tree into plans/r21/<q>_<suffix>.txt.
# Run once with suffix=before at the pre-optimization HEAD, and again
# with suffix=after once a change lands (recompile + regenerate
# /tmp/graft_cp.txt first if dependencies changed).
# Usage: scripts/capture_plans_r21.sh q1,q2,... [before|after] [sfDir]
set -e
QS="$1"
SFX=${2:-after}
SF=${3:-/root/testdata/sf0.1}
mkdir -p plans/r21
CP=$(cat /tmp/graft_cp.txt)
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g \
  -cp "$CP" graft.Explain "$SF" "$QS" 2>/dev/null |
awk -v sfx="$SFX" '
  /^==========/ { q=$2; f="plans/r21/" q "_" sfx ".txt"; print "" > f; next }
  q { print >> f }'
ls plans/r21/ | tail -20
