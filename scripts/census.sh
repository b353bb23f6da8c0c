#!/bin/bash
# Regenerate GATES.md from Registry.all (the registered gate inventory).
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
java -Dfile.encoding=UTF-8 -cp "$CP" graft.Census > GATES.md
echo "wrote GATES.md:"
head -7 GATES.md
