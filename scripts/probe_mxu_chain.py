"""Standalone 2-step dependency chain: gather -> derive sel -> gather.
No loop. If this reproduces the in-kernel albedo corruption, the bug is
multi-dot/dependency scheduling; if exact, the while_loop is implicated."""
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
    _, _, shade, _ = T.pack_scene(scene)
    n_pad = shade.shape[0]
    n_cols = 6
    planes = T._plane_table(shade, n_cols)
    t_sub = 8

    def kernel(shade_ref, mxu_ref, sel_ref, oa, ob):
        s1 = sel_ref[...]
        c1 = T._gather_mxu(mxu_ref, s1, n_pad=n_pad, t_sub=t_sub, n_cols=n_cols)
        # Derive a second selection from the first gather's bits.
        h = pltpu.bitcast(c1[0], jnp.int32) ^ pltpu.bitcast(c1[4], jnp.int32)
        s2 = jnp.abs(h) & (n_pad - 1)
        c2 = T._gather_mxu(mxu_ref, s2, n_pad=n_pad, t_sub=t_sub, n_cols=n_cols)
        r1 = T._gather_cols(shade_ref, range(n_cols), s1, n_rows=n_pad, t_sub=t_sub)
        r2 = T._gather_cols(shade_ref, range(n_cols), s2, n_rows=n_pad, t_sub=t_sub)
        for c in range(n_cols):
            oa[c, 0] = r1[c]; oa[c, 1] = r2[c]
            ob[c, 0] = c1[c]; ob[c, 1] = c2[c]

    rng = np.random.default_rng(3)
    sel = jnp.asarray(rng.integers(0, n_pad, size=(t_sub, 128)), jnp.int32)
    oa, ob = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((n_cols, 2, t_sub, 128), jnp.float32)] * 2,
        interpret=T._interp(jax.devices()[0].platform not in ("tpu", "axon")),
    )(shade, planes, sel)
    a = np.asarray(oa).view(np.int32); b = np.asarray(ob).view(np.int32)
    d = a != b
    print("mismatches:", int(d.sum()), "of", d.size)
    if d.any():
        c, step, g, l = np.nonzero(d)
        for i in range(min(8, len(c))):
            print(f"  col {c[i]} step {step[i]} grp {g[i]} lane {l[i]}: "
                  f"radix={a[c[i],step[i],g[i],l[i]]:#010x} mxu={b[c[i],step[i],g[i],l[i]]:#010x}")

if __name__ == "__main__":
    main()
