#!/bin/bash
# three-decade sweep; default cohort = the round-12 additions.
# Runs graft.Bench from the PRE-BUILT classpath (no sbt) so concurrent
# source edits can't leak into the measured binary.
set -u
ONLY="${SWEEP_ONLY:-q172,q173,q174,q175,q176,q177,q178,q179,q180}"
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
cd /root/repo
for sf in ${SWEEP_SFS:-/root/testdata/sf0.1 /root/repo/tmp/sf1 /root/repo/tmp/sf3}; do
  echo "=== SWEEP $sf ==="
  SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=$ONLY \
    java -Xmx96g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
      --add-opens java.base/java.nio=ALL-UNNAMED \
      --add-opens java.base/java.util=ALL-UNNAMED \
      --add-opens java.base/java.lang=ALL-UNNAMED \
      --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
      --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
      --add-opens java.base/sun.security.action=ALL-UNNAMED \
      -cp "$CP" graft.Bench 2>&1 | grep -E '^\{"metric|WARMUP'
done
