"""Toolchain watch: detect jax/jaxlib/libtpu/Mosaic changes and re-probe
the features that currently BLOCK the road to 500 Mrays/s.

Every remaining large kernel win is blocked *on this toolchain* (CLAUDE.md
kernel perf log): per-lane traversal needs efficient dynamic gathers, the
16-bit fold needs i16 mask relayouts that today crash or reject, the bf16
sweep needs bf16 vector compares. The moment a toolchain update lands, this
repo should know the same week -- not a round later. This script:

  1. records the toolchain fingerprint (jax/jaxlib versions, PJRT platform
     + platform_version, device kind) into the ledger ``TOOLCHAIN.json``;
  2. with ``--probes``, re-runs the blocked-feature probe set, each in an
     isolated subprocess (a server-side compiler crash -- the known HTTP
     500 -- must not kill the watcher), and appends the outcomes;
  3. with ``--check`` (default), compares the fingerprint against the last
     ledger entry: exit 0 = unchanged, exit 2 = CHANGED (run --probes).

Probe statuses: ``works`` (compiles AND produces correct values -- a flip
from ``blocked`` is the signal to re-open the corresponding optimization),
``wrong`` (compiles, wrong values), ``blocked`` (compile/runtime error,
first line recorded), ``timeout``, ``skipped(cpu)`` (Mosaic probes need the
real TPU; interpret mode never exercises the lowering).

Deeper context per probe: scripts/probe_fold.py (i16 folds),
scripts/probe_dtype.py (bf16 rates/semantics), CLAUDE.md rejected-ledger.

Usage (real TPU):
  PYTHONPATH=/root/.axon_site:. python scripts/toolchain_watch.py --check
  PYTHONPATH=/root/.axon_site:. python scripts/toolchain_watch.py --probes
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

LEDGER = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "TOOLCHAIN.json")
PROBE_TIMEOUT_S = 2400  # fresh Mosaic shapes compile in 3-25 min


def fingerprint() -> dict:
    import jax
    import jaxlib

    dev = jax.devices()[0]
    client = getattr(dev, "client", None)
    return {
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "platform": dev.platform,
        "platform_version": getattr(client, "platform_version", "?"),
        "device_kind": getattr(dev, "device_kind", "?"),
    }


# --------------------------------------------------------------------------
# Probes. Each runs in a fresh subprocess and prints ONE json line:
# {"status": "works|wrong|blocked", "detail": "..."}.
# --------------------------------------------------------------------------


def _probe_bf16_vector_cmp():
    """bf16 vector compare in Mosaic. Blocked round 2: 'Target does not
    support this comparison' (arith.cmpf on vector<...xbf16>). A flip to
    'works' re-opens bf16 candidacy sweeps (still gated by the conditioning
    analysis, CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        m = x_ref[:, :] > jnp.bfloat16(0.5)
        o_ref[:, :] = jnp.where(m, jnp.float32(1.0), jnp.float32(0.0))

    x = (jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128) / 1024.0)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x.astype(jnp.bfloat16))
    expect = (np.asarray(x.astype(jnp.bfloat16)).astype(np.float32) > 0.5)
    ok = np.array_equal(np.asarray(out), expect.astype(np.float32))
    return "works" if ok else "wrong"


def _probe_i16_mask_relayout():
    """(1,128) i1 mask selecting on a 16-bit-packed view. Blocked round 2:
    'Invalid relayout ... replicated in destination'. A flip re-opens the
    int16 bit-preserving tournament fold (scripts/probe_fold.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, s_ref, o_ref):
        t = pltpu.bitcast(x_ref[:, :], jnp.int16)        # (16,128) i16
        m = s_ref[0:1, :] > 0                            # (1,128) i1
        r = jnp.where(m, t[8:16], t[0:8])                # relayout needed
        o_ref[:, :] = pltpu.bitcast(r, jnp.float32)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128) + 0.5
    s = (jnp.arange(128, dtype=jnp.int32) % 2).reshape(1, 128)
    out = np.asarray(
        pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((4, 128), jnp.float32)
        )(x, s)
    )
    xi = np.asarray(x).view(np.int16).reshape(8, 128, 2)
    # bitcast layout: f32 row r <-> i16 rows 2r (lo), 2r+1 (hi) interleave
    ti = np.zeros((16, 128), np.int16)
    ti[0::2], ti[1::2] = xi[:, :, 0], xi[:, :, 1]
    sel = np.where(np.asarray(s) > 0, ti[8:16], ti[0:8])
    expect = np.zeros((4, 128, 2), np.int16)
    expect[:, :, 0], expect[:, :, 1] = sel[0::2], sel[1::2]
    ok = np.array_equal(out.view(np.int16).reshape(4, 128, 2), expect)
    return "works" if ok else "wrong"


def _probe_i16_hoisted_mask():
    """The round-2 workaround (i32 broadcast -> bitcast -> i16 '< 0' mask,
    then i16 where): CRASHED the server-side compiler (HTTP 500,
    tpu_compile_helper exit 1). A flip re-opens the hoisted-mask i16 fold."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, s_ref, o_ref):
        t = pltpu.bitcast(x_ref[:, :], jnp.int16)        # (16,128)
        m32 = 0 - ((s_ref[0:1, :] >> 1) & 1)             # (1,128) i32
        m32 = jnp.broadcast_to(m32, (8, 128))
        m = pltpu.bitcast(m32, jnp.int16) < 0            # (16? -> 8,128)?
        r = jnp.where(m[0:8], t[8:16], t[0:8])
        o_ref[:, :] = pltpu.bitcast(r, jnp.float32)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128) + 0.5
    s = (jnp.arange(128, dtype=jnp.int32) * 2).reshape(1, 128)
    out = np.asarray(
        pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((4, 128), jnp.float32)
        )(x, s)
    )
    return "works" if np.isfinite(out.view(np.float32)).size else "wrong"


def _probe_dynamic_gather():
    """Per-lane dynamic gather (the per-lane BVH traversal blocker): each
    lane loads tab[idx[lane]] for its own index. The cull-headroom ledger
    prices this at up to 5.8x on stress scenes if it ever lowers
    efficiently (scripts/probe_cull_headroom.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    def kernel(tab_ref, idx_ref, o_ref):
        tab = tab_ref[:, :]                               # (64,128)
        idx = idx_ref[:, :]                               # (8,128) in [0,64)
        o_ref[:, :] = jnp.take_along_axis(tab, idx, axis=0)

    tab = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 37) % 64
    out = np.asarray(
        pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(tab, idx)
    )
    expect = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
    return "works" if np.array_equal(out, expect) else "wrong"


def _probe_tri_blk_512():
    """RT_TRI_BLK=512 scoped-vmem fit: 512-row triangle stage-1 blocks
    over-ran the 16 MB scoped-vmem limit on the round-3 toolchain (22.4 MB
    for the triple form, ~18.6 MB classic). A flip means stage-1 triangle
    loads amortize 2x better (CLAUDE.md RT_TRI_FORM entry)."""
    os.environ["RT_TRI_BLK"] = "512"
    import dataclasses

    import numpy as np

    import raytracing_tpu as rt

    cam0, scene = rt.make_world_mesh(image_width=128, subdivisions=3)
    params = dataclasses.replace(
        cam0, image_width=128, samples_per_pixel=2, max_depth=3
    )
    img = rt.Renderer(scene, params, seed=0).render()
    return "works" if np.asarray(img).any() else "wrong"


PROBES = {
    "bf16_vector_cmp": _probe_bf16_vector_cmp,
    "i16_mask_relayout": _probe_i16_mask_relayout,
    "i16_hoisted_mask": _probe_i16_hoisted_mask,
    "dynamic_gather": _probe_dynamic_gather,
    "tri_blk_512": _probe_tri_blk_512,
}


def _child_env() -> dict:
    """Subprocess env: keep the axon bootstrap (PYTHONPATH *is* the plugin
    registration -- CLAUDE.md) and APPEND the repo root so the probes can
    import raytracing_tpu when invoked as scripts/..."""
    env = dict(os.environ)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = (
        env["PYTHONPATH"] + os.pathsep + root
        if env.get("PYTHONPATH")
        else root
    )
    return env


def run_probe_subprocess(name: str) -> dict:
    """Isolated probe run: compiler crashes / hangs stay in the child."""
    env = _child_env()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run-probe", name],
            capture_output=True,
            text=True,
            timeout=PROBE_TIMEOUT_S,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "detail": f">{PROBE_TIMEOUT_S}s"}
    for line in reversed(proc.stdout.strip().splitlines() or [""]):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                break
    tail = (proc.stderr or proc.stdout).strip().splitlines()
    return {
        "status": "blocked",
        "detail": (tail[-1] if tail else f"exit {proc.returncode}")[:300],
    }


def run_hw_hash_paths() -> dict:
    """Bit-exactness spot check (MXU one-hot gather == radix on HW) via
    scripts/hw_hash_paths.py -- the guard against a toolchain bump silently
    breaking packed-bits exactness between rounds (round-2 lesson: HW-only
    divergence is CPU-invisible)."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)), "hw_hash_paths.py")
    try:
        proc = subprocess.run(
            [sys.executable, script, "--scenes", "mesh:3", "--width", "320",
             "--spp", "2"],
            capture_output=True,
            text=True,
            timeout=2 * PROBE_TIMEOUT_S,
            env=_child_env(),
        )
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "detail": f">{2*PROBE_TIMEOUT_S}s"}
    ok = proc.returncode == 0
    tail = (proc.stdout or proc.stderr).strip().splitlines()
    return {
        "status": "works" if ok else "blocked",
        "detail": (tail[-1] if tail else "")[:300],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="fingerprint only")
    ap.add_argument("--probes", action="store_true", help="run full set")
    ap.add_argument("--probe", help="run one probe by name")
    ap.add_argument("--run-probe", help="(internal) in-process probe")
    args = ap.parse_args()

    if args.run_probe:
        fn = PROBES[args.run_probe]
        try:
            status = fn()
            print(json.dumps({"status": status, "detail": ""}))
        except Exception as e:  # noqa: BLE001
            lines = [ln for ln in str(e).splitlines() if ln.strip()]
            msg = (lines[0] if lines else type(e).__name__)[:300]
            print(json.dumps({"status": "blocked", "detail": msg}))
        return 0

    fp = fingerprint()
    ledger = []
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            ledger = json.load(f)
    last_fp = ledger[-1]["fingerprint"] if ledger else None
    changed = fp != last_fp

    if args.probe or args.probes:
        on_tpu = fp["platform"] in ("tpu", "axon")
        names = [args.probe] if args.probe else list(PROBES)
        results = {}
        for name in names:
            if not on_tpu:
                results[name] = {"status": "skipped(cpu)", "detail": ""}
                continue
            print(f"probe {name} ...", flush=True)
            results[name] = run_probe_subprocess(name)
            print(f"  -> {results[name]}", flush=True)
        if args.probes and on_tpu:
            print("probe hw_hash_paths ...", flush=True)
            results["hw_hash_paths"] = run_hw_hash_paths()
            print(f"  -> {results['hw_hash_paths']}", flush=True)
        entry = {
            "timestamp": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
            "fingerprint": fp,
            "probes": results,
        }
        ledger.append(entry)
        with open(LEDGER, "w") as f:
            json.dump(ledger, f, indent=1)
        print(json.dumps(entry))
        flips = [
            n for n, r in results.items()
            if r["status"] == "works" and n in PROBES
            and n not in ("tri_blk_512",)
        ]
        if flips:
            print(f"TOOLCHAIN FLIP: {flips} now work -- re-open the "
                  "corresponding CLAUDE.md rejected-ledger entries")
        return 0

    print(json.dumps({"fingerprint": fp, "changed": changed}))
    if changed:
        print("toolchain fingerprint CHANGED (or no ledger) -- run "
              "`python scripts/toolchain_watch.py --probes`", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
