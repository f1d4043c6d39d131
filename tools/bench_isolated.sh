#!/bin/bash
# Fresh-JVM-per-query bench: isolates operator cost from shared-JVM state
# (block-cache churn + GC interactions dominate a 20-query single-JVM run
# at sf1 — see SCALING.md §GC). Each query gets its own JVM running
# graft.RunOne (3 in-JVM iterations: iter1 = cold incl. family build,
# iter2/3 = warm). Output: one line per query per iteration.
#
# Usage: tools/bench_isolated.sh <sfDir> <heap> [query...]
set -u
SF=${1:?sfDir}
HEAP=${2:?heap e.g. 8g}
shift 2
QUERIES=${@:-$(cat /tmp/bench_queries.txt)}
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for q in $QUERIES; do
  SPARK_GRAFT_CPUS=32 java -Xmx$HEAP -Xms$HEAP -XX:+UseParallelGC $OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.RunOne "$q" "$SF" 2>/dev/null | grep '\[runone\]'
done
