"""Minimal reproducer: is the one-hot MXU gather exact when invoked from a
data-dependent while/fori loop (the megakernel's structure)?

Compares compiled-vs-interpret results of an iterated gather whose selection
depends on the previous iteration's output. Exact => hashes match.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import raytracing_tpu as rt
from raytracing_tpu.ops.pallas import trace as T

def build(interpret, iters, use_mxu):
    world = rt.load_world("data/config/world.config.json")
    _, scene = rt.build_world(world)
    _, _, shade, _ = T.pack_scene(scene)
    n_pad = shade.shape[0]
    n_cols = 6
    planes = T._plane_table(shade, n_cols)
    t_sub = 8

    def kernel(shade_ref, mxu_ref, sel_ref, out_ref):
        def body(k, carry):
            sel, acc = carry
            if use_mxu:
                cols = T._gather_mxu(mxu_ref, sel, n_pad=n_pad,
                                     t_sub=t_sub, n_cols=n_cols)
            else:
                cols = T._gather_cols(shade_ref, range(n_cols), sel,
                                      n_rows=n_pad, t_sub=t_sub)
            h = acc
            for c in cols:
                h = h ^ pltpu.bitcast(c, jnp.int32)
            # Data-dependent next selection (stays in [0, n_pad)).
            sel = (jnp.abs(h) + k) & (n_pad - 1)
            return sel, h
        sel0 = sel_ref[...]
        _, h = jax.lax.fori_loop(
            0, iters, body, (sel0, jnp.zeros_like(sel0)))
        out_ref[...] = h

    rng = np.random.default_rng(2)
    sel = jnp.asarray(rng.integers(0, n_pad, size=(t_sub, 128)), jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_sub, 128), jnp.int32),
        interpret=T._interp(interpret),
    )(shade, planes, sel)
    return np.asarray(out)

if __name__ == "__main__":
    use_mxu = sys.argv[1] == "mxu" if len(sys.argv) > 1 else True
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    on_hw = jax.devices()[0].platform in ("tpu", "axon")
    a = build(not on_hw and True or False, iters, use_mxu) if not on_hw else None
    if on_hw:
        hw = build(False, iters, use_mxu)
        it = build(True, iters, use_mxu)
        eq = (hw == it).all()
        print(f"mode={'mxu' if use_mxu else 'radix'} iters={iters} "
              f"hw==interp: {bool(eq)} mismatches={int((hw != it).sum())}/{hw.size}")
    else:
        print("cpu only:", a.sum())
