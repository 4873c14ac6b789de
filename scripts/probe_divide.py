"""Probe Mosaic f32 divide / reciprocal accuracy on the real TPU.

The per-block AABB cull gate (round 3) computes slab windows as
t = fma(bound, inv_d, -o*inv_d) with inv_d = 1/d produced in-kernel. Its
conservative margins must budget for the TRUE rounding error of Mosaic's
divide lowering (correctly-rounded? Newton-refined approx? raw 2^-12
reciprocal?). This probe measures max ulp error of 1.0/x and a/b on
hardware vs float64, over exponents spanning the renderer's dynamic range.

Usage:  python scripts/probe_divide.py [--interpret]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def interp(flag):
    return pltpu.InterpretParams() if flag else False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(7)
    # Magnitudes 1e-6 .. 1e6 (ray dirs ~1, coords up to ~1e3, squares 1e6),
    # both signs, plus exact powers of two and near-1 values.
    exps = rng.uniform(-20, 20, size=8 * 128).astype(np.float32)
    x = np.ldexp(rng.uniform(1.0, 2.0, size=8 * 128).astype(np.float32), exps.astype(np.int32))
    x *= rng.choice([-1.0, 1.0], size=x.shape).astype(np.float32)
    x[:128] = np.ldexp(np.float32(1.0), rng.integers(-20, 20, 128))
    x = x.reshape(8, 128).astype(np.float32)
    num = np.ldexp(rng.uniform(1.0, 2.0, size=(8, 128)).astype(np.float32),
                   rng.integers(-10, 10, (8, 128)))
    num = num.astype(np.float32)

    def kernel(x_ref, n_ref, recip_ref, div_ref):
        xv = x_ref[:, :]
        recip_ref[:, :] = 1.0 / xv
        div_ref[:, :] = n_ref[:, :] / xv

    recip, div = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        interpret=interp(args.interpret),
    )(jnp.asarray(x), jnp.asarray(num))
    recip = np.asarray(recip.reshape(8, 128))
    div = np.asarray(div.reshape(8, 128))

    def ulp_err(got, want64):
        want = want64.astype(np.float32)
        ulp = np.spacing(np.abs(want)).astype(np.float64)
        return np.abs(got.astype(np.float64) - want64) / ulp

    e_recip = ulp_err(recip, 1.0 / x.astype(np.float64))
    e_div = ulp_err(div, num.astype(np.float64) / x.astype(np.float64))
    print(f"platform={jax.devices()[0].platform} interpret={args.interpret}")
    print(f"1/x   max ulp err = {e_recip.max():.3f}  mean = {e_recip.mean():.4f}")
    print(f"a/x   max ulp err = {e_div.max():.3f}  mean = {e_div.mean():.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
