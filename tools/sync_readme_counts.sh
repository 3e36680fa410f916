#!/usr/bin/env bash
# Patch README.md's test-count line from a real `sbt test` log, so the
# number can never drift from the harness again.
#
# Usage: sbt -batch test 2>&1 | tee /tmp/sbt_test.log
#        tools/sync_readme_counts.sh /tmp/sbt_test.log
set -euo pipefail
log="${1:?usage: sync_readme_counts.sh <sbt-test-log>}"
total=$(grep -Eo 'Tests: succeeded [0-9]+' "$log" | grep -Eo '[0-9]+' |
  awk '{s+=$1} END {print s}')
suites=$(grep -Ec 'Tests: succeeded [0-9]+' "$log")
[ -n "$total" ] && [ "$total" -gt 0 ]
sed -i -E "s|^sbt test .*# .*$|sbt test                # $total checks across $suites suites (generated: tools/sync_readme_counts.sh)|" README.md
echo "README.md test count set to $total ($suites suites)"
