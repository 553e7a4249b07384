#!/usr/bin/env bash
# Full validation sweep: unit/conformance/dist tests, native sanitizers,
# a differential fuzz round vs the upstream implementation, the multi-chip
# dry-run, and a bench smoke. Everything must exit 0.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest (4 tiers, 8-device virtual CPU mesh, subprocess shards) =="
bash scripts/test_shards.sh

echo "== native sanitizers (ASan + TSan) =="
bash scripts/asan_check.sh

echo "== differential fuzz vs upstream (60 s budget) =="
python scripts/fuzz_cross.py 60

echo "== multi-chip dry-run (virtual devices) =="
python __graft_entry__.py

echo "== bench smoke =="
python bench.py

echo "ALL CHECKS PASSED"
