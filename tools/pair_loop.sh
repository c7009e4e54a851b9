#!/bin/bash
# Continuous probe-bracketed scaling-pair runner (north_rule evidence).
#
#   bash tools/pair_loop.sh [n_pairs] [narrow_cpus]
#
# Each iteration logs, in order: opening bwprobe couple, bench pair
# (narrow then wide at PAIR_REP_MULT), closing bwprobe couple. Every
# leg is appended to BENCH/pairs_r5.jsonl unconditionally — no leg is
# ever discarded — so tools/pairs_report.py recomputes all aggregates
# from the full record.
set -u
cd "$(dirname "$0")/.."
N_PAIRS=${1:-4}
NARROW=${2:-8}
WIDE=$((NARROW * 4))
for i in $(seq 1 "$N_PAIRS"); do
  echo "=== pair iteration $i/$N_PAIRS (${NARROW}->${WIDE}) ==="
  python tools/scaling_pair.py bwprobe "$NARROW" || exit 1
  python tools/scaling_pair.py bwprobe "$WIDE" || exit 1
  python tools/scaling_pair.py bench "$NARROW" || exit 1
  python tools/scaling_pair.py bench "$WIDE" || exit 1
done
# one closing control couple after the last pair
python tools/scaling_pair.py bwprobe "$NARROW" || exit 1
python tools/scaling_pair.py bwprobe "$WIDE" || exit 1
echo "PAIRLOOP_DONE"
