#!/bin/bash
# Round-3 follow-up: with RT_CULL=box now the default, (a) re-locate the
# flat / two-level sphere regime boundary (the sphere-bound A/B put it at
# 8192 on a noise-level tie; box bounds change the gate cost/benefit), and
# (b) re-test the cover RT_FLAT_BLK=256 rejection, which was measured under
# the SPHERE gate (ab_round3_pending.sh ran it with RT_CULL unset before the
# default flipped) -- the box slab is tight enough at 8192 (+90%) that the
# cover call deserves one box-gated pair. Back-to-back pairs per scene;
# run alone (never alongside pytest).
set -u
LOG=${1:-/tmp/ab_box_threshold.log}
export PYTHONPATH="/root/.axon_site:."
run() {
  local name="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name  [$(date +%H:%M:%S)]" >> "$LOG"
  timeout 3600 env "${envs[@]}" python bench.py "$@" >> "$LOG" 2>/tmp/ab_err.log \
    || echo "FAILED $name (see /tmp/ab_err.log)" >> "$LOG"
}

# --- (b) cover: flat 256-row blocks under the box gate, bracketed by controls
run cover-ctl-a   RT_DUMMY=0       -- --repeats 3
run cover-blk256  RT_FLAT_BLK=256  -- --repeats 3
run cover-ctl-b   RT_DUMMY=0       -- --repeats 3

# --- (a) regime boundary under box (all runs inherit the box default)
# 8192: default = two-level. Force flat via a huge threshold.
run 8192-twolevel RT_DUMMY=0              -- --scene stress:8192 --repeats 3
run 8192-flat     RT_TWO_LEVEL_MIN=16384  -- --scene stress:8192 --repeats 3
# 4096: default = flat. Force two-level via threshold at 4096.
run 4096-flat     RT_DUMMY=0              -- --scene stress:4096 --repeats 3
run 4096-twolevel RT_TWO_LEVEL_MIN=4096   -- --scene stress:4096 --repeats 3
# 2048 / 1024: fresh default-path (flat+box) numbers for the BASELINE table,
# plus the two-level+box side at 2048 for boundary completeness.
run 2048-flat     RT_DUMMY=0              -- --scene stress:2048 --repeats 3
run 2048-twolevel RT_TWO_LEVEL_MIN=2048   -- --scene stress:2048 --repeats 3
run 1024-flat     RT_DUMMY=0              -- --scene stress:1024 --repeats 3
echo "=== DONE  [$(date +%H:%M:%S)]" >> "$LOG"
