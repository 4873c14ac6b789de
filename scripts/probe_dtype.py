"""Probe Mosaic semantics + VPU rates for the v3 sweep design.

Questions this answers (run on real TPU; semantics also in interpret mode):
  1. pltpu.bitcast f32 (R,128) -> int16: what shape, and which sublane gets
     the high/low half of each f32 word?
  2. Do 16-bit selects (jnp.where on int16/bfloat16) run at ~2x the f32
     select rate?  (The radix gather / window collapse is select-bound.)
  3. bf16 fma rate sanity (round-1 measured 2.08x on this chip).

Usage:  python scripts/probe_dtype.py [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def interp(flag):
    return pltpu.InterpretParams() if flag else False


# ---------------------------------------------------------------- semantics
def bitcast_probe(interpret: bool):
    """f32 (8,128) -> int16: report shape + layout mapping."""

    def kernel(x_ref, o_ref):
        o_ref[:, :] = pltpu.bitcast(x_ref[:, :], jnp.int16)

    x = np.arange(8 * 128, dtype=np.uint32) * 65536 + 7  # hi = idx, lo = 7
    xf = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.uint32), jnp.float32)
    xf = xf.reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int16),
        interpret=interp(interpret),
    )(xf)
    out = np.asarray(out)
    # Expected candidate layouts for f32 row r:
    #  A) rows (2r, 2r+1) hold (lo, hi) or (hi, lo)
    #  B) rows (r, r+8) hold (lo, hi) or (hi, lo)
    print("bitcast f32(8,128)->i16 shape:", out.shape)
    hi = (x >> 16).astype(np.int32).reshape(8, 128)
    lo = np.full((8, 128), 7, np.int32)

    def eq(a, b):
        return np.array_equal(a.astype(np.uint16), b.astype(np.uint16))

    for name, m in {
        "interleave(lo,hi)": np.stack([lo, hi], 1).reshape(16, 128),
        "interleave(hi,lo)": np.stack([hi, lo], 1).reshape(16, 128),
        "concat(lo,hi)": np.concatenate([lo, hi], 0),
        "concat(hi,lo)": np.concatenate([hi, lo], 0),
    }.items():
        if eq(out, m):
            print("  layout =", name)
            return
    print("  layout = UNKNOWN; out[:4,:2] =", out[:4, :2].tolist())


# ---------------------------------------------------------------- rates
def rate_probe(dtype, op, iters=2048, rows=None):
    """Chained dependent-free ops on 8 independent (rows,128) tiles."""
    if rows is None:
        rows = 16 if dtype != jnp.float32 else 8

    def kernel(a_ref, b_ref, o_ref):
        b = b_ref[:, :]
        streams = [a_ref[:, :] + (b + b) * i for i in range(8)]
        mask = (b > 0.5) if dtype != jnp.int16 else (b > 0)

        def body(i, st):
            if op == "select":
                return tuple(jnp.where(mask, s, b) + s for s in st)
            return tuple(s * b + s for s in st)  # fma

        streams = jax.lax.fori_loop(0, iters, body, tuple(streams))
        acc = streams[0]
        for s in streams[1:]:
            acc = acc + s if dtype != jnp.int16 else acc ^ s
        o_ref[:, :] = acc

    if dtype == jnp.int16:
        a = jnp.ones((rows, 128), dtype)
        b = jnp.ones((rows, 128), dtype)
    else:
        a = jnp.full((rows, 128), 0.999, dtype)
        b = jnp.full((rows, 128), 0.6, dtype)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
    )
    # ops per run: iters * 8 streams * (2 for select(+add) or 1 fma chain)
    nops = iters * 8 * (2 if op == "select" else 1)
    fj = jax.jit(functools.partial(f))
    fj(a, b).block_until_ready()
    best = 1e30
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            r = fj(a, b)
        r.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / 10)
    # vreg-ops: each (rows,128) op on dtype d = rows/sublanes(d) vregs
    sub = {jnp.float32: 8, jnp.bfloat16: 16, jnp.int16: 16}[dtype]
    vregs = rows / sub
    print(
        f"  {np.dtype(dtype).name:9s} {op:7s} rows={rows:3d}: "
        f"{best*1e6:8.1f} us  -> {nops * vregs / best / 1e9:6.2f} G vreg-op/s"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    print("platform:", jax.devices()[0].platform)
    bitcast_probe(args.interpret)
    if args.interpret:
        return
    for dtype in (jnp.float32, jnp.bfloat16, jnp.int16):
        for op in ("fma", "select") if dtype != jnp.int16 else ("select",):
            rate_probe(dtype, op)


if __name__ == "__main__":
    main()
