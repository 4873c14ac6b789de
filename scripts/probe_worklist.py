"""Price the per-GROUP cull granularities: tile-vote cond (production) vs
per-group conds (round-3 measured-rejected) vs a compacted GROUP WORKLIST
(VERDICT r4 item 2 -- the one structural point between the rejected conds
and the toolchain-blocked per-lane gathers).

The worklist form replaces the 8 scalar per-group conds of a visited block
with: scalar compaction of the 8 vote bits into a 3-bit-packed list (all
scalar-unit ops), then ONE dynamic-trip ``fori_loop`` over the passing
groups whose body extracts the group's ray rows from the (8, 128) tiles by
iota-mask reduction (dynamic group index without per-lane gathers).

Fidelity: the per-(group, block) body is the production sweep quadratic on
a 512-row block (7 column tensors, ~12 fused vector ops per candidate row,
(512, 1) x (1, 128) broadcasting -- the same ~768 vreg-op body the cull
ledger prices); votes come from an SMEM table so all variants schedule the
IDENTICAL pass set and the probe isolates pure scheduling cost. The vote
table's pass fraction is swept (1/8 .. 8/8) to find the crossover.

Lowering risks probed: dynamic-trip fori (traced bound), scalar dynamic
shifts for the packed list, iota-mask row extraction.

Usage: python scripts/probe_worklist.py [--quick]
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

import os

BLK = 512      # rows per block (production _SWEEP_ROWS)
NB = 8         # blocks per pass
T_SUB = 8      # ray groups
# Block passes per kernel call (amortizes dispatch; 1 for interpret checks).
REPS = int(os.environ.get("PROBE_REPS", "40"))
_BIGF = 3.0e38


def _f32_bits(x: float) -> int:
    return int(np.float32(x).view(np.int32))


_NOHIT = _f32_bits(_BIGF) & ~511


def _group_body(cols, ray_rows, g_sl, carry_row):
    """Production-shaped sweep body for ONE ray group against one block:
    quadratic + packed-key min (512 rows -> (1, 128) min)."""
    cx, cy, cz, m2cx, m2cy, m2cz, cm2 = cols
    ox, oy, oz, dx, dy, dz, a, ddo, oo, ta = ray_rows
    h = cx * dx + cy * dy + cz * dz - ddo
    cq = cm2 + m2cx * ox + m2cy * oy + m2cz * oz + oo
    delta = h * h - a * cq
    sq = jnp.sqrt(delta)
    n1 = h - sq
    n2 = h + sq
    nroot = jnp.where(n1 > ta, n1, n2)
    key = jnp.where(nroot > ta, nroot, _BIGF)
    ids = jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)
    ki = (pltpu.bitcast(key, jnp.int32) & ~511) | ids
    return jnp.minimum(carry_row, jnp.min(ki, axis=0, keepdims=True))


def _load_cols(tab_ref, b):
    base = b * BLK
    return tuple(
        tab_ref[pl.ds(base, BLK), j : j + 1] for j in range(7)
    )


def _static_rows(rays, g):
    sl = slice(g, g + 1)
    return tuple(t[sl] for t in rays)


def _extract_rows(rays, g, row_iota):
    """Dynamic group-row extraction: iota-mask reduce (8,128) -> (1,128)."""
    m = row_iota == g
    return tuple(
        jnp.sum(jnp.where(m, t, 0.0), axis=0, keepdims=True) for t in rays
    )


def make_kernel(mode):
    def kernel(tab_ref, ray_ref, vote_ref, o_ref):
        # Per-group ray tensors, stacked (8, 128) so the worklist variant
        # can mask-extract rows; static variants slice rows.
        oxs = ray_ref[0 * T_SUB : 1 * T_SUB, :]
        oys = ray_ref[1 * T_SUB : 2 * T_SUB, :]
        ozs = ray_ref[2 * T_SUB : 3 * T_SUB, :]
        dxs = ray_ref[3 * T_SUB : 4 * T_SUB, :]
        dys = ray_ref[4 * T_SUB : 5 * T_SUB, :]
        dzs = ray_ref[5 * T_SUB : 6 * T_SUB, :]
        a = dxs * dxs + dys * dys + dzs * dzs
        ddo = dxs * oxs + dys * oys + dzs * ozs
        oo = oxs * oxs + oys * oys + ozs * ozs
        ta = 1.0e-4 * a
        rays = (oxs, oys, ozs, dxs, dys, dzs, a, ddo, oo, ta)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (T_SUB, 128), 0)

        def one_pass(_, acc):
            carry = jnp.full((T_SUB, 128), _NOHIT, jnp.int32)

            def blk_step(b, carry):
                votes = [vote_ref[b, g] for g in range(T_SUB)]
                vany = votes[0]
                for v in votes[1:]:
                    vany = vany | v

                if mode == "static":
                    # Production form: ONE cond, all 8 groups swept.
                    def body(carry):
                        cols = _load_cols(tab_ref, b)
                        rows_out = []
                        for g in range(T_SUB):
                            rr = _static_rows(rays, g)
                            rows_out.append(
                                _group_body(
                                    cols, rr, g, carry[g : g + 1]
                                )
                            )
                        return jnp.concatenate(rows_out, axis=0)

                    return jax.lax.cond(
                        vany > 0, body, lambda c: c, carry
                    )

                if mode == "conds":
                    # Round-3 rejected form: 8 scalar conds per block.
                    def body(carry):
                        cols = _load_cols(tab_ref, b)
                        rows_out = []
                        for g in range(T_SUB):
                            def gbody(row, g=g, cols=cols):
                                return _group_body(
                                    cols, _static_rows(rays, g), g, row
                                )

                            rows_out.append(
                                jax.lax.cond(
                                    votes[g] > 0, gbody,
                                    lambda row: row, carry[g : g + 1],
                                )
                            )
                        return jnp.concatenate(rows_out, axis=0)

                    return jax.lax.cond(
                        vany > 0, body, lambda c: c, carry
                    )

                # mode == "worklist": scalar compaction + dynamic-trip fori.
                def body(carry):
                    cols = _load_cols(tab_ref, b)
                    lst = jnp.int32(0)
                    cnt = jnp.int32(0)
                    for g in range(T_SUB):
                        sel = votes[g] > 0
                        lst = jnp.where(
                            sel, lst | (g << (3 * cnt)), lst
                        )
                        cnt = cnt + jnp.where(sel, 1, 0)

                    def gbody(i, carry):
                        g = (lst >> (3 * i)) & 7
                        rr = _extract_rows(rays, g, row_iota)
                        cur = jnp.sum(
                            jnp.where(row_iota == g, carry, 0),
                            axis=0, keepdims=True,
                        )
                        row = _group_body(cols, rr, g, cur)
                        return jnp.where(row_iota == g, row, carry)

                    return jax.lax.fori_loop(0, cnt, gbody, carry)

                return jax.lax.cond(vany > 0, body, lambda c: c, carry)

            carry = jax.lax.fori_loop(0, NB, blk_step, carry)
            return acc + carry

        acc = jnp.zeros((T_SUB, 128), jnp.int32)
        o_ref[:, :] = jax.lax.fori_loop(0, REPS, one_pass, acc)

    return kernel


def _inputs(pass_groups: int, seed=0):
    rng = np.random.default_rng(seed)
    tab = rng.normal(size=(NB * BLK, 7)).astype(np.float32)
    # Real-ish geometry: centers scattered, cq column mostly positive.
    tab[:, 6] = np.abs(tab[:, 6]) * 30.0
    rays = rng.normal(size=(6 * T_SUB, 128)).astype(np.float32)
    votes = np.zeros((NB, T_SUB), np.int32)
    for b in range(NB):
        # pass_groups of 8 pass, rotating which ones per block.
        for k in range(pass_groups):
            votes[b, (b + k) % T_SUB] = 1
    return jnp.asarray(tab), jnp.asarray(rays), jnp.asarray(votes)


def build(mode, interpret=False):
    return jax.jit(
        pl.pallas_call(
            make_kernel(mode),
            out_shape=jax.ShapeDtypeStruct((T_SUB, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            interpret=pltpu.InterpretParams() if interpret else False,
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--interpret", action="store_true",
                    help="semantics check on CPU (no timing)")
    ap.add_argument("--modes", default="static,conds,worklist")
    args = ap.parse_args()
    modes = args.modes.split(",")
    print("platform:", jax.devices()[0].platform)

    # Correctness first: all variants must agree bit-exactly (same votes).
    tab, rays, votes = _inputs(pass_groups=4)
    outs = {}
    fns = {}
    for mode in modes:
        try:
            fns[mode] = build(mode, interpret=args.interpret)
            outs[mode] = np.asarray(fns[mode](tab, rays, votes))
            print(f"  {mode}: compiled + ran")
        except Exception as e:  # noqa: BLE001
            print(f"  {mode}: FAILED: {str(e)[:300]}")
    ref_mode = next(iter(outs))
    for mode, out in outs.items():
        eq = np.array_equal(out, outs[ref_mode])
        print(f"  {mode} == {ref_mode}: {eq}")
    if args.interpret:
        return

    fracs = [1, 2, 4, 8] if not args.quick else [4]
    for pg in fracs:
        tab, rays, votes = _inputs(pass_groups=pg)
        # Input-varied dispatch set: the tunnel DEDUPES identical
        # executions (same executable + same args can return instantly
        # with cached results -- CLAUDE.md), which would corrupt min()
        # timings. Same executable, 40 distinct ray payloads.
        ray_variants = [
            jnp.asarray(np.asarray(rays) * np.float32(1.0 + 1e-4 * i))
            for i in range(40)
        ]
        print(f"pass_groups={pg}/8:")
        for mode, fj in fns.items():
            fj(tab, ray_variants[-1], votes).block_until_ready()
            best = 1e30
            vi = 0
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(8):
                    r = fj(tab, ray_variants[vi % 40], votes)
                    vi += 1
                np.asarray(r)
                best = min(best, (time.perf_counter() - t0) / 8)
            per_blk = best / (REPS * NB)
            print(
                f"  {mode:9s}: {best*1e6:9.1f} us/call  "
                f"{per_blk*1e9:8.1f} ns/block "
                f"({per_blk*0.94e9:7.1f} cyc/block @940MHz)"
            )


if __name__ == "__main__":
    main()
