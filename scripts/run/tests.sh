#!/usr/bin/env bash
# Run the test suite with sane parallelism (SURVEY.md §4: the rebuild's test
# strategy is a first-class deliverable; the reference has no tests at all).
#
# Usage:
#   scripts/run/tests.sh            # full suite (incl. --run-slow)
#   scripts/run/tests.sh quick      # skip the compile-heavy virtual-mesh jobs
#   scripts/run/tests.sh full -k czi   # extra args pass through to pytest
#
# Tests force JAX_PLATFORMS=cpu with a virtual 8-device mesh (tests/conftest.py),
# so this never touches a real TPU. With >1 CPU, pytest-xdist shards by file
# (--dist loadfile keeps each module's jit cache warm within one worker).
set -euo pipefail
cd "$(dirname "$0")/../.."

MODE="${1:-full}"
if [ $# -gt 0 ]; then shift; fi

NPROC=$(python -c "import os; print(len(os.sched_getaffinity(0)))")
XDIST=()
if [ "${NPROC}" -gt 1 ]; then
    XDIST=(-n "${NPROC}" --dist loadfile)
fi

case "${MODE}" in
    quick)
        exec python -m pytest tests/ -q -m "not heavy" "${XDIST[@]}" "$@"
        ;;
    full)
        exec python -m pytest tests/ -q --run-slow --durations=20 "${XDIST[@]}" "$@"
        ;;
    *)
        echo "usage: $0 [quick|full] [pytest args...]" >&2
        exit 2
        ;;
esac
