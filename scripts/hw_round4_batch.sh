#!/bin/bash
# Round-4 hardware batch: runs the pending HW measurements in priority
# order (each phase is independently useful if the wall clock runs out).
#   1. Driver-bench cover sanity (compiles the round-4 id-hoist program).
#   2. Shard (1,1) overhead A/B + HW exactness receipt (verdict task 1c).
#   3. Interactive orbit @1200x705 @1/2 spp (verdict task 2).
#   4. meshes:4 multi-object bench row (verdict task 3).
#   5. RT_SWEEP_LOAD=fused A/B, stress:2048 then cover (op-mix probe).
# Never run alongside pytest (local CPU load inflates walls 2x).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_r4_batch.log}
export PYTHONPATH="/root/.axon_site:."
say() { echo "=== $*  [$(date +%H:%M:%S)]" >> "$LOG"; }
run() { # run NAME TIMEOUT ENVS... -- CMD...
  local name="$1" tmo="$2"; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  say "$name"
  # Both streams into ONE log (shared timeline -- ADVICE r4): stderr
  # lines land next to the phase banner instead of a separate .err file.
  timeout "$tmo" env "${envs[@]}" "$@" >> "$LOG" 2>&1 \
    || echo "FAILED $name (rc=$?)" >> "$LOG"
}

say "phase 1: cover bench (compile + sanity)"
run cover-sanity 3600 RT_DUMMY=0 -- python bench.py --repeats 3

say "phase 2: shard (1,1) overhead + exactness"
run shard-overhead 3600 RT_DUMMY=0 -- python scripts/hw_shard_overhead.py --repeats 2

say "phase 3: orbit 1200x705"
run orbit-1spp 3600 RT_DUMMY=0 -- python examples/orbit_demo.py --width 1200 --spp 1 --frames 60
run orbit-2spp 3600 RT_DUMMY=0 -- python examples/orbit_demo.py --width 1200 --spp 2 --frames 60

say "phase 4: meshes:4 bench row"
run meshes4 3600 RT_DUMMY=0 -- python bench.py --scene meshes:4 --repeats 3

say "phase 5: RT_SWEEP_LOAD A/B (stress:2048 then cover, order-alternated)"
run s2048-split-a 3600 RT_SWEEP_LOAD=split -- python bench.py --scene stress:2048 --repeats 2
run s2048-fused-a 3600 RT_SWEEP_LOAD=fused -- python bench.py --scene stress:2048 --repeats 2
run s2048-fused-b 1200 RT_SWEEP_LOAD=fused -- python bench.py --scene stress:2048 --repeats 2
run s2048-split-b 1200 RT_SWEEP_LOAD=split -- python bench.py --scene stress:2048 --repeats 2
run cover-fused-a 3600 RT_SWEEP_LOAD=fused -- python bench.py --repeats 2
run cover-split-a 1200 RT_SWEEP_LOAD=split -- python bench.py --repeats 2
run cover-split-b 1200 RT_SWEEP_LOAD=split -- python bench.py --repeats 2
run cover-fused-b 1200 RT_SWEEP_LOAD=fused -- python bench.py --repeats 2
say "DONE"
