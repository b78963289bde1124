#!/usr/bin/env bash
# Test tiers (VERDICT r4 item 5 — "a pyramid needs a fast base").
#
#   tools/run_tests.sh fast    # guardrail subset, target < 10 min single-core
#   tools/run_tests.sh full    # everything (~90 min single-core)
#
# The fast tier excludes modules auto-marked `slow` in tests/conftest.py
# (reference-live execution parity waves, e2e pipelines, multi-minute
# drivers). Always run `fast` before committing; run `full` before a
# release or after touching the SQM2 calibration / optimizer step math.
set -euo pipefail
cd "$(dirname "$0")/.."

tier="${1:-fast}"
case "$tier" in
  fast) exec env PYTHONPATH= python -m pytest tests/ -q -m "not slow" ;;
  full) exec env PYTHONPATH= python -m pytest tests/ -q ;;
  *) echo "usage: $0 [fast|full]" >&2; exit 2 ;;
esac
