#!/bin/bash
# Wait for the host to exit a degraded window, then run the pair loop.
#
#   bash tools/window_watch.sh [n_pairs] [narrow_cpus] [min_wide_rate]
#
# Probes the 4N width every ~6 min (one bwprobe leg, logged like every
# other control); when two consecutive wide probes clear MIN_RATE
# rows/cpu/s the window is considered live and pair_loop.sh starts.
set -u
cd "$(dirname "$0")/.."
N_PAIRS=${1:-4}
NARROW=${2:-8}
MIN_RATE=${3:-1.0}
WIDE=$((NARROW * 4))
STREAK=0
while true; do
  OUT=$(python tools/scaling_pair.py bwprobe "$WIDE" 2>/dev/null | tail -1)
  RATE=$(echo "$OUT" | python -c "import json,sys;print(json.load(sys.stdin)['rows_per_cpu_sec'])")
  echo "watch: wide bwprobe rate=$RATE (need >=$MIN_RATE twice)"
  if python -c "import sys; sys.exit(0 if float('$RATE') >= float('$MIN_RATE') else 1)"; then
    STREAK=$((STREAK + 1))
  else
    STREAK=0
  fi
  if [ "$STREAK" -ge 2 ]; then
    echo "watch: window live, starting pair loop"
    bash tools/pair_loop.sh "$N_PAIRS" "$NARROW"
    exit $?
  fi
  sleep 300
done
