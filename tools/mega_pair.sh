#!/bin/bash
# Dev-only: run MegaProbe crawl waves at the given core widths back-to-back
# (same weather window), with the exact JVM confinement graft.Bench uses.
# Usage: tools/mega_pair.sh <n> <cpus...>    e.g. tools/mega_pair.sh 800000 4 16
set -u
N="$1"; shift
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
JAVA="${JAVA_HOME:-/usr/lib/jvm/java-17-openjdk-amd64}/bin/java"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MEM="${SPARK_GRAFT_BENCH_MEM:-20g}"
# SPARK_GRAFT_BENCH_MEM must be whole gigabytes with a 'g' suffix (e.g. 20g):
# the -Xmn derivation below is integer-GB arithmetic
case "$MEM" in
  *g) XMN="$(( ${MEM%g} * 7 / 10 ))g" ;;
  *)  echo "mega_pair.sh: SPARK_GRAFT_BENCH_MEM must look like '20g' (got '$MEM')" >&2
      exit 2 ;;
esac
for CPUS in "$@"; do
  taskset -c "0-$((CPUS - 1))" "$JAVA" $OPENS \
    -Xmx"$MEM" -Xms"$MEM" -Xmn"$XMN" -XX:+UseParallelGC \
    -XX:-DontCompileHugeMethods \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.tools.MegaProbe "$CPUS" "$N" 2>>/tmp/mega_pair.err.log | grep '^MEGA' \
    || echo "mega_pair.sh: no MEGA line at cpus=$CPUS (see /tmp/mega_pair.err.log)" >&2
done
