#!/bin/bash
# Run graft.Bench outside sbt (classpath = compiled classes + spark jars).
export SPARK_GRAFT_SF_DIR=${1:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}
CPUS=${SPARK_GRAFT_CPUS:-32}
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_CPUS=$CPUS java $ADD_OPENS -Xmx${SPARK_GRAFT_XMX:-16g} -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
