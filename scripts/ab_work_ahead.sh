#!/bin/bash
# Hardware A/B for work-ahead regen (RT_WORK_AHEAD): lanes that reach a
# wave's per-slot target keep tracing their OWN slot's later samples toward
# the full budget instead of idling on the tile's stragglers, so the
# within-tile straggler tail is paid once per render, not once per wave.
# Only MULTI-wave renders can differ, so the A/B runs the north-star config
# (1000 spp depth 50 -> ~4 adaptive waves) plus the driver bench config.
# Back-to-back order-alternated pairs to cancel tunnel drift. Never run
# alongside pytest.
set -u
LOG=${1:-/tmp/ab_work_ahead.log}
export PYTHONPATH="/root/.axon_site:."
run() { # run NAME ENVS... -- BENCHARGS...
  local name="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name  [$(date +%H:%M:%S)]" >> "$LOG"
  timeout 5400 env "${envs[@]}" python bench.py "$@" >> "$LOG" 2>/tmp/ab_wa_err.log \
    || echo "FAILED $name (see /tmp/ab_wa_err.log)" >> "$LOG"
}

run ns-wa-a    RT_WORK_AHEAD=1 -- --north-star --repeats 2
run ns-off-a   RT_WORK_AHEAD=0 -- --north-star --repeats 2
run ns-off-b   RT_WORK_AHEAD=0 -- --north-star --repeats 2
run ns-wa-b    RT_WORK_AHEAD=1 -- --north-star --repeats 2
run cover-wa-a  RT_WORK_AHEAD=1 -- --repeats 3
run cover-off-a RT_WORK_AHEAD=0 -- --repeats 3
run cover-off-b RT_WORK_AHEAD=0 -- --repeats 3
run cover-wa-b  RT_WORK_AHEAD=1 -- --repeats 3
echo "=== DONE  [$(date +%H:%M:%S)]" >> "$LOG"
