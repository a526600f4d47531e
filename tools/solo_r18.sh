#!/bin/bash
# round-18 solo measurements: one JVM per (query, sf), min-of-2 reps.
# SOLO_ONLY=q218,q216 [SOLO_SFS=...] tools/solo_r18.sh
set -u
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
cd /root/repo
for sf in ${SOLO_SFS:-/root/testdata/sf0.1}; do
  for q in ${SOLO_ONLY//,/ }; do
    echo "=== SOLO $q @ $sf ==="
    SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=${SOLO_REPS:-2} \
      SPARK_GRAFT_ONLY=$q \
      java -Xmx96g -XX:ReservedCodeCacheSize=2g \
        --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
        --add-opens java.base/java.nio=ALL-UNNAMED \
        --add-opens java.base/java.util=ALL-UNNAMED \
        --add-opens java.base/java.lang=ALL-UNNAMED \
        --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
        --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
        --add-opens java.base/sun.security.action=ALL-UNNAMED \
        -cp "$CP" graft.Bench 2>/dev/null | grep total_detail
  done
done
