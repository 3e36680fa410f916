#!/usr/bin/env bash
# Regenerate docs/EXPLAIN.md from graft.ExplainAudit, normalized so the
# committed dump is diff-stable: JVM identity hashes ([J@6e8cf16c,
# [[D@135ddb56 — array-typed literals in expression trees print their
# object address) change every run and would bury real plan-shape
# changes in address noise.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.ExplainAudit" 2>/dev/null \
  | sed 's/^\[info\] //' \
  | grep -v '^\[error\]' \
  | sed -E 's/@[0-9a-f]{6,}/@ADDR/g' \
  > docs/EXPLAIN.md
echo "docs/EXPLAIN.md regenerated ($(grep -c '^## ' docs/EXPLAIN.md) plans)"
