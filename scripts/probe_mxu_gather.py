"""HW probe: is the one-hot MXU gather bit-exact vs the radix gather?

Compares _gather_cols and _gather_mxu outputs over the packed cover-scene
shade table for a sweep of selection patterns, per column, reporting the
first mismatching (col, group, lane) and the differing bit patterns.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import raytracing_tpu as rt
from raytracing_tpu.ops.pallas import trace as T

def main():
    world = rt.load_world("data/config/world.config.json")
    _, scene = rt.build_world(world)
    geh, gec, shade, n = T.pack_scene(scene)
    n_pad = geh.shape[0]
    n_cols = 6
    planes = T._plane_table(shade, n_cols)
    t_sub = 8

    rng = np.random.default_rng(0)
    sel = rng.integers(0, n_pad, size=(t_sub, 128)).astype(np.int32)
    sel = jnp.asarray(sel)

    def kernel(shade_ref, mxu_ref, sel_ref, out_a, out_b):
        s = sel_ref[...]
        a = T._gather_cols(shade_ref, range(n_cols), s, n_rows=n_pad, t_sub=t_sub)
        b = T._gather_mxu(mxu_ref, s, n_pad=n_pad, t_sub=t_sub, n_cols=n_cols)
        for c in range(n_cols):
            out_a[c] = a[c]
            out_b[c] = b[c]

    interp = jax.devices()[0].platform not in ("tpu", "axon")
    out_a, out_b = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((n_cols, t_sub, 128), jnp.float32)] * 2,
        interpret=T._interp(interp),
    )(shade, planes, sel)

    a = np.asarray(out_a).view(np.int32)
    b = np.asarray(out_b).view(np.int32)
    ok = a == b
    print("platform:", jax.devices()[0].platform, "n_pad:", n_pad)
    print("all equal:", bool(ok.all()), " mismatches:", int((~ok).sum()), "/", ok.size)
    if not ok.all():
        idx = np.argwhere(~ok)
        for c, g, l in idx[:10]:
            r = int(np.asarray(sel)[g, l])
            ref = np.asarray(shade[:, :n_cols]).view(np.int32)[r, c]
            print(f"col {c} grp {g} lane {l} row {r}: radix={a[c,g,l]:#010x} "
                  f"mxu={b[c,g,l]:#010x} table={ref:#010x}")

if __name__ == "__main__":
    main()
