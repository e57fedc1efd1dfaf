#!/bin/bash
# Run a graft main from a FROZEN copy of the compiled classes so that
# `sbt compile` iterations in the repo cannot disturb a long bench run
# (classes load lazily; recompiling into target/ mid-run is a race).
#   tools/run_frozen.sh snapshot          # refresh /tmp/graft_frozen from target/
#   tools/run_frozen.sh graft.Bench [args...]
set -euo pipefail
FROZEN=/tmp/graft_frozen
if [ "${1:-}" = snapshot ]; then
  rm -rf "$FROZEN"; mkdir -p "$FROZEN"
  cp -r /root/repo/target/scala-2.13/classes "$FROZEN/classes"
  # Resources (media fixture images) live in src/main/resources and are NOT
  # copied into target/classes by plain `sbt compile` — without them the 12
  # media queries fail to load their fixtures under the frozen classpath.
  cp -r /root/repo/src/main/resources/. "$FROZEN/classes/"
  echo "snapshot: $(date) $(git -C /root/repo rev-parse --short HEAD)" > "$FROZEN/STAMP"
  cat "$FROZEN/STAMP"
  exit 0
fi
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -XX:ReservedCodeCacheSize=512m \
  -cp "$FROZEN/classes:/opt/spark/jars/*" "$MAIN" "$@"
