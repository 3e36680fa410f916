#!/usr/bin/env bash
# Patch README.md's test-count line from a real `sbt test` log, so the
# number can never drift from the harness again.
#
# Usage: sbt -batch test 2>&1 | tee /tmp/sbt_test.log
#        tools/sync_readme_counts.sh /tmp/sbt_test.log
set -euo pipefail
log="${1:?usage: sync_readme_counts.sh <sbt-test-log>}"
# sbt's final summary: "Passed: Total 111, Failed 0, Errors 0, Passed 111"
total=$(grep -Eo 'Passed: Total [0-9]+' "$log" | tail -1 | grep -Eo '[0-9]+')
# ScalaTest's aggregate: "Suites: completed 19, aborted 0"
suites=$(grep -Eo 'Suites: completed [0-9]+' "$log" | tail -1 | grep -Eo '[0-9]+')
[ -n "$total" ] && [ "$total" -gt 0 ] && [ -n "$suites" ]
grep -Eq '^sbt test .*# ' README.md || {
  echo "ERROR: README.md has no '^sbt test ... # ...' line to patch" >&2; exit 1; }
sed -i -E "s|^sbt test .*# .*$|sbt test                # $total checks across $suites suites (generated: tools/sync_readme_counts.sh)|" README.md
grep -Fq "$total checks across $suites suites" README.md || {
  echo "ERROR: substitution did not take" >&2; exit 1; }
echo "README.md test count set to $total ($suites suites)"
