#!/bin/bash
# Round-3 pending hardware A/Bs (run sequentially; never alongside pytest):
#   1. cover flat-sweep block size (RT_FLAT_BLK 512-control / 256 / 128):
#      does the per-block cull pay for itself on the 512-row cover scene?
#   2. RT_SWEEP_FMA=1 on cover (fma-chain association of the sweep quadratic).
#   3. RT_CULL=box vs sphere on mesh:3 / stress:2048 / stress:8192.
# Each line of $LOG: the knob env, then bench.py's one JSON line.
set -u
LOG=${1:-/tmp/ab_round3.log}
export PYTHONPATH="/root/.axon_site:."
run() { # run NAME ENVS... -- BENCHARGS...
  local name="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name  [$(date +%H:%M:%S)]" >> "$LOG"
  timeout 3600 env "${envs[@]}" python bench.py "$@" >> "$LOG" 2>/tmp/ab_err.log \
    || echo "FAILED $name (see /tmp/ab_err.log)" >> "$LOG"
}

# --- 1: cover flat block size (control first, then variants, control again)
run cover-ctl-a   RT_DUMMY=0       -- --repeats 3
run cover-blk256  RT_FLAT_BLK=256  -- --repeats 3
run cover-blk128  RT_FLAT_BLK=128  -- --repeats 3
run cover-ctl-b   RT_DUMMY=0       -- --repeats 3
# --- 2: fma association
run cover-fma     RT_SWEEP_FMA=1   -- --repeats 3
# --- 3: box cull gate (paired with sphere control back-to-back)
for sc in mesh:3 stress:2048 stress:8192; do
  run "$sc-sphere" RT_CULL=sphere -- --scene "$sc" --repeats 3
  run "$sc-box"    RT_CULL=box    -- --scene "$sc" --repeats 3
done
echo "=== DONE  [$(date +%H:%M:%S)]" >> "$LOG"
