#!/bin/bash
# Hardware A/B for the _tri_key_rows triple-product M-T sweep form
# (packed n' = e2 x e1; h and q crosses replaced by one m = s x d).
# The formulation REPLACED the classic sweep (no env knob), so control
# runs from a git worktree pinned to the pre-change commit:
#
#   git worktree add /tmp/rt_tri_control <pre-change-sha>
#   scripts/ab_tri_form.sh [LOG]
#
# Order-alternated back-to-back pairs on the mesh configs; never run
# alongside pytest. Before timing, hardware bit-exactness of the NEW
# tree's MXU vs radix paths: scripts/hw_hash_paths.py (hashes must match).
set -u
LOG=${1:-/tmp/ab_tri_form.log}
CONTROL=${CONTROL:-/tmp/rt_tri_control}
run() { # run NAME DIR -- BENCHARGS...
  local name="$1" dir="$2"; shift 3
  echo "=== $name  [$(date +%H:%M:%S)]" >> "$LOG"
  (cd "$dir" && PYTHONPATH="/root/.axon_site:." timeout 3600 \
    python bench.py "$@") >> "$LOG" 2>/tmp/ab_tri_err.log \
    || echo "FAILED $name (see /tmp/ab_tri_err.log)" >> "$LOG"
}

run mesh3-new-a /root/repo -- --scene mesh:3 --repeats 3
run mesh3-old-a "$CONTROL" -- --scene mesh:3 --repeats 3
run mesh3-old-b "$CONTROL" -- --scene mesh:3 --repeats 3
run mesh3-new-b /root/repo -- --scene mesh:3 --repeats 3
run mesh4-new-a /root/repo -- --scene mesh:4 --repeats 3
run mesh4-old-a "$CONTROL" -- --scene mesh:4 --repeats 3
run mesh4-old-b "$CONTROL" -- --scene mesh:4 --repeats 3
run mesh4-new-b /root/repo -- --scene mesh:4 --repeats 3
echo "=== DONE  [$(date +%H:%M:%S)]" >> "$LOG"
