#!/bin/bash
# Run graft.tools.SqlProbe with statements from a file (one per line, | separated alternative)
# usage: tools/probe.sh <sfDir> <stmtsFile>
set -e
cd /root/repo
SF="$1"; FILE="$2"
ARGS=("$SF")
while IFS= read -r line; do
  [ -z "$line" ] && continue
  ARGS+=("$line")
done < "$FILE"
printf -v CMD 'runMain graft.tools.SqlProbe'
for a in "${ARGS[@]}"; do
  CMD+=" \"${a//\"/\\\"}\""
done
exec sbt -batch "$CMD"
