#!/usr/bin/env bash
# CI tiers (VERDICT r3 #9). One runner, three tiers:
#
#   ci/run.sh fast      per-commit: the non-slow suite (~6 min CPU)
#   ci/run.sh nightly   full suite incl. slow-marked compile-heavy and
#                       multi-process tests (~90 min CPU) + the
#                       multichip dryrun
#   ci/run.sh bench     weekly, REAL TPU: bench.py + the PERF.json
#                       regeneration suite (bench_suite.py) + the
#                       serving load bench
#
# All CPU tiers force the virtual 8-device CPU mesh (tests/conftest.py
# does this internally; the env here covers bare script invocations).
set -euo pipefail
cd "$(dirname "$0")/.."
tier="${1:-fast}"

case "$tier" in
  fast)
    python -m pytest tests/ -x -q -m "not slow"
    ;;
  nightly)
    python -m pytest tests/ -q
    python __graft_entry__.py 8
    ;;
  bench)
    python bench.py
    python scripts/bench_suite.py
    SLOTS=12 BLOCK=16 LOADS=1,4,8,16,32 python scripts/bench_serving_load.py
    ;;
  *)
    echo "usage: ci/run.sh {fast|nightly|bench}" >&2; exit 2
    ;;
esac
