#!/bin/bash
# round-18 job-level attribution: one JVM, graft.TimeAudit <query> [warmReps]
# usage: tools/timeaudit_r18.sh q216_composed_rollforward 1
set -u
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
cd /root/repo
SPARK_GRAFT_SF_DIR=${SOLO_SF:-/root/testdata/sf0.1} SPARK_GRAFT_CPUS=${SOLO_CPUS:-32} \
  java -Xmx96g -XX:ReservedCodeCacheSize=2g \
    --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens java.base/java.nio=ALL-UNNAMED \
    --add-opens java.base/java.util=ALL-UNNAMED \
    --add-opens java.base/java.lang=ALL-UNNAMED \
    --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens java.base/sun.security.action=ALL-UNNAMED \
    -cp "$CP" graft.TimeAudit "$@" 2>/dev/null
