#!/bin/bash
# Dev-only: run graft.tools.MegaProbe in a taskset-confined JVM, exactly as
# graft.Bench.crawlBenchIsolated does (same heap, GC, add-opens), so crawl
# A/B measurements ride the identical protocol as the frozen bench.
# Usage: tools/mega_run.sh <cpus> <n> [extra JVM props...]
set -u
CPUS=$1; N=$2; shift 2
CP=$(cat /tmp/graft_cp.txt)
MEM=${SPARK_GRAFT_BENCH_MEM:-20g}
XMN=$(( ${MEM%g} * 7 / 10 ))g
ADD=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD="$ADD --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD="$ADD --add-opens java.base/$p=ALL-UNNAMED"; done
exec taskset -c 0-$((CPUS-1)) "$JAVA_HOME/bin/java" $ADD \
  -Xmx$MEM -Xms$MEM -Xmn$XMN -XX:+UseParallelGC -XX:-DontCompileHugeMethods \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "$@" -cp "$CP" graft.tools.MegaProbe "$CPUS" "$N"
