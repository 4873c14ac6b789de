#!/bin/bash
# Hardware A/B for cross-primitive cull seeding (RT_CULL_HINT): the sphere
# winner's exact t tightens the triangle cull gate, so lanes that hit a
# closer sphere (ground/side spheres) stop voting mesh blocks open.
# Back-to-back, order-alternated pairs on the mesh configs (the only
# scenes with triangle cull blocks). Never run alongside pytest.
set -u
LOG=${1:-/tmp/ab_cull_hint.log}
export PYTHONPATH="/root/.axon_site:."
run() { # run NAME ENVS... -- BENCHARGS...
  local name="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name  [$(date +%H:%M:%S)]" >> "$LOG"
  timeout 3600 env "${envs[@]}" python bench.py "$@" >> "$LOG" 2>/tmp/ab_hint_err.log \
    || echo "FAILED $name (see /tmp/ab_hint_err.log)" >> "$LOG"
}

# mesh:3 = 1280 tris (two-level, 8 cull blocks); mesh:4 = 5120 tris (20
# blocks, more cullable mass). Alternate order to cancel tunnel drift.
run mesh3-hint-a   RT_CULL_HINT=1 -- --scene mesh:3 --repeats 3
run mesh3-off-a    RT_CULL_HINT=0 -- --scene mesh:3 --repeats 3
run mesh3-off-b    RT_CULL_HINT=0 -- --scene mesh:3 --repeats 3
run mesh3-hint-b   RT_CULL_HINT=1 -- --scene mesh:3 --repeats 3
run mesh4-hint-a   RT_CULL_HINT=1 -- --scene mesh:4 --repeats 3
run mesh4-off-a    RT_CULL_HINT=0 -- --scene mesh:4 --repeats 3
run mesh4-off-b    RT_CULL_HINT=0 -- --scene mesh:4 --repeats 3
run mesh4-hint-b   RT_CULL_HINT=1 -- --scene mesh:4 --repeats 3
echo "=== DONE  [$(date +%H:%M:%S)]" >> "$LOG"
