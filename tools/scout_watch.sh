#!/bin/bash
# Scout-gated pair runner: instead of inferring window health from the
# JVM controls (measured: control ceilings do not predict engine pair
# efficiency — the host's turbo phasing moves them independently), run
# a MINI engine pair (PAIR_REP_MULT=4096, ~1 min) every cycle and
# launch the full-size pair loop when the mini pair itself scales.
# Every scout leg is logged to the record like any other leg.
#
#   bash tools/scout_watch.sh [n_full_pairs] [narrow_cpus] [min_mini_eff]
set -u
cd "$(dirname "$0")/.."
N_PAIRS=${1:-3}
NARROW=${2:-8}
MIN_EFF=${3:-0.70}
WIDE=$((NARROW * 4))
LOGF=${PAIR_LOG:-BENCH/pairs_r5.jsonl}
while true; do
  PAIR_REP_MULT=4096 python tools/scaling_pair.py bench "$NARROW" >/dev/null || exit 1
  PAIR_REP_MULT=4096 python tools/scaling_pair.py bench "$WIDE" >/dev/null || exit 1
  EFF=$(tail -2 "$LOGF" | python -c "
import json, sys
a, b = [json.loads(l) for l in sys.stdin]
print(round(b['docs_per_sec'] / a['docs_per_sec'] / 4, 3))
")
  echo "scout: mini-pair eff=$EFF (need >=$MIN_EFF)"
  if python -c "import sys; sys.exit(0 if float('$EFF') >= float('$MIN_EFF') else 1)"; then
    echo "scout: window live, running $N_PAIRS full pairs"
    bash tools/pair_loop.sh "$N_PAIRS" "$NARROW"
    exit $?
  fi
  sleep 240
done
