"""Measure the radix-select fold (the gather's cost core) in f32 vs int16.

The gather/collapse tournament is select-bound. A bitcast int16 view halves
the vregs per level (f32 row r <-> i16 rows 2r, 2r+1, "interleave(lo,hi)"),
but Mosaic cannot relayout an (1,128) i1 mask into 16-bit packing
("Invalid relayout ... replicated in destination"). Workaround probed here:
materialize each level's mask ONCE per group as an i16 tile built by an
i32 broadcast (legal layout) + bitcast (+an i16 `< 0` compare), shared by
every folded column, then plain jnp.where on the i16 view.

Variants:
  f32   -- round-1 fold (baseline)
  i16   -- f32 first level (handles the (n,1) -> (n/2,128) broadcast),
           i16 view + hoisted masks for the rest
  i16f  -- full-i16: data column bitcast to (2n,1) i16, every level 16-bit

Usage: python scripts/probe_fold.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512
REPS = 400  # folds per kernel call per column (amortizes dispatch)
COLS = 6    # columns sharing one selection (the gather's shape)


def _fold8(t, bit):
    for shift in (4, 2, 1):
        rolled = pltpu.roll(t, 8 - shift, axis=0)
        t = jnp.where(bit[shift.bit_length() - 1], rolled, t)
    return t[0:1]


def _masks16(sel, sizes):
    """Per-level i16 select masks: level of i16 size s keeps rows [s//2:) iff
    f32-row bit log2(s//4) of ``sel`` is set. Built by broadcasting the
    all-ones/zero i32 word and bitcasting: both i16 halves inherit it."""
    masks = {}
    for s in sizes:  # s = i16 rows at this level (select operates on s//2)
        k = (s // 4).bit_length() - 1  # f32 bit index
        m32 = 0 - ((sel >> k) & 1)  # (1,128) i32: 0 or 0xFFFFFFFF
        m32 = jnp.broadcast_to(m32, (s // 4, 128))
        masks[s] = pltpu.bitcast(m32, jnp.int16) < 0  # (s//2,128) i1
    return masks


def fold_f32(col, bit, _masks):
    t = col
    size = ROWS
    while size > 8:
        half = size // 2
        t = jnp.where(bit[half.bit_length() - 1], t[half:size], t[:half])
        size = half
    return _fold8(t, bit)


def fold_i16(col, bit, masks):
    # level 1 in f32: (ROWS,1) -> (ROWS//2,128)
    half = ROWS // 2
    t = jnp.where(bit[half.bit_length() - 1], col[half:ROWS], col[:half])
    t = pltpu.bitcast(t, jnp.int16)  # (ROWS,128) i16
    size = ROWS
    while size > 16:
        half = size // 2
        t = jnp.where(masks[size], t[half:size], t[:half])
        size = half
    return _fold8(pltpu.bitcast(t, jnp.float32), bit)


def fold_i16f(col, bit, masks):
    t = pltpu.bitcast(col, jnp.int16)  # (2*ROWS, 1)
    size = 2 * ROWS
    while size > 16:
        half = size // 2
        t = jnp.where(masks[size], t[half:size], t[:half])
        size = half
    return _fold8(pltpu.bitcast(t, jnp.float32), bit)


FOLDS = {"f32": fold_f32, "i16": fold_i16, "i16f": fold_i16f}
SIZES = {"i16": range(5, 10), "i16f": range(5, 11)}  # log2 i16 sizes


def _mask_sizes(mode):
    return [1 << e for e in SIZES.get(mode, ())]


def make_kernel(mode, reps):
    fold = FOLDS[mode]

    def kernel(col_ref, sel_ref, o_ref):
        cols = [col_ref[:, j : j + 1] for j in range(COLS)]
        sel0 = sel_ref[0:1, :]
        acc = jnp.zeros((1, 128), jnp.float32)

        def body(i, acc):
            s = (sel0 * (i + 1)) % ROWS  # vary selection cheaply
            bit = [((s >> k) & 1) > 0 for k in range(9)]
            masks = _masks16(s, _mask_sizes(mode))
            for c in cols:
                acc = acc + fold(c, bit, masks)
            return acc

        o_ref[:, :] = jax.lax.fori_loop(0, reps, body, acc)

    return kernel


def run(mode):
    col = (
        jnp.arange(ROWS * COLS, dtype=jnp.float32).reshape(ROWS, COLS) + 0.5
    )
    sel = jnp.arange(128, dtype=jnp.int32).reshape(1, 128) * 37 % ROWS
    f = pl.pallas_call(
        make_kernel(mode, REPS),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )
    fj = jax.jit(f)
    fj(col, sel).block_until_ready()
    best = 1e30
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(20):
            r = fj(col, sel)
        r.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / 20)
    per_fold = best / (REPS * COLS)
    print(
        f"  fold {mode:5s}: {best*1e6:8.1f} us/call, "
        f"{per_fold*1e9:7.1f} ns/fold  "
        f"({per_fold*0.94e9:5.1f} cyc/fold @940MHz)"
    )


def check_semantics():
    col = (
        jnp.arange(ROWS * COLS, dtype=jnp.float32).reshape(ROWS, COLS) + 0.5
    ) * 3.7
    sel = (jnp.arange(128, dtype=jnp.int32).reshape(1, 128) * 37) % ROWS
    outs = {}
    for mode, fold in FOLDS.items():
        def kernel(col_ref, sel_ref, o_ref, fold=fold, mode=mode):
            s = sel_ref[0:1, :]
            bit = [((s >> k) & 1) > 0 for k in range(9)]
            masks = _masks16(s, _mask_sizes(mode))
            o_ref[:, :] = fold(col_ref[:, 0:1], bit, masks)

        try:
            outs[mode] = np.asarray(
                pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
                )(col, sel)
            )
        except Exception as e:  # noqa: BLE001
            print(f"  {mode}: FAILED to compile/run: {str(e)[:200]}")
    expect = np.asarray(col)[np.asarray(sel)[0], 0]
    for mode, out in outs.items():
        print(f"  {mode}: correct =", np.array_equal(out[0], expect))
    return set(outs)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    ok = check_semantics()
    for mode in FOLDS:
        if mode in ok:
            run(mode)
