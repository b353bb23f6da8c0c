#!/bin/bash
# Regenerate GATES.md from Registry.all (the registered gate inventory).
# Writes to a temp file first so a failed census can never clobber the
# committed GATES.md with a partial dump (the pre-commit guard would
# then silently stage the damage).
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
java -Dfile.encoding=UTF-8 -cp "$CP" graft.Census > GATES.md.tmp
mv GATES.md.tmp GATES.md
echo "wrote GATES.md:"
head -7 GATES.md
