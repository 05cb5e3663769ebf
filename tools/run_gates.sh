#!/bin/sh
# Full per-round verification battery (round-3 VERDICT item 5): the
# driver's gates plus the two whole-registry sweeps at BOTH scales.
# Writes a dated artifact to BENCH/GATES.md on success so each round
# carries documented evidence of the sf0.1 value sweep.
#
#   sh tools/run_gates.sh [round-label]
set -e
cd "$(dirname "$0")/.."
label="${1:-manual}"

python -m pytest tests/ -x -q
python tools/sweep_oracle_values.py /root/testdata/sf0.01
python tools/sweep_oracle_values.py /root/testdata/sf0.1
python tools/sweep_plan_shapes.py /root/testdata/sf0.001

mkdir -p BENCH
{
  echo ""
  echo "## Gates run ($label, $(date -u +%Y-%m-%dT%H:%M:%SZ))"
  echo ""
  echo "- pytest tests/ -x -q: green"
  echo "- sweep_oracle_values sf0.01: 0 failures, 0 vacuous empties"
  echo "- sweep_oracle_values sf0.1: 0 failures, 0 vacuous empties"
  echo "- sweep_plan_shapes sf0.001 (count+isEmpty on every entry): green"
} >> BENCH/GATES.md
echo "all gates green -> BENCH/GATES.md updated ($label)"
