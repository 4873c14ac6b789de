"""Fused Pallas megakernels: full path tracing in VMEM with path regeneration.

This is the performance layer (SURVEY.md section 7, step 5) replacing the XLA
wavefront's HBM-bound (B, N) intermediates. Design (v2):

  * **Path regeneration**: one kernel program owns a tile of ``TILE`` pixel
    slots; each slot traces its ``spp`` samples back-to-back, regenerating a
    fresh camera ray the moment the previous path dies (miss / absorb / depth
    cap). Occupancy stays near 100% for the whole sample budget instead of
    decaying with the alive fraction each bounce (the v1 kernel's weakness --
    at depth 8 only ~1/3 of lanes did useful work by the end of a wave).
  * **MXU intersection sweep**: the ray-sphere quadratic's inner products
    ``h = d . (c - o)`` and ``-2 c . o + (|c|^2 - r^2) + o . o`` are exactly
    matmuls of the static sphere matrix against per-ray column vectors, so
    the O(N x rays) sweep runs on the systolic array (f32, HIGHEST precision)
    instead of the VPU; only the discriminant/root selection stays
    elementwise.
  * **Packed-key argmin**: sphere id is packed into the low mantissa bits of
    the candidate root (positive-float ordering == integer ordering), so ONE
    integer min-reduction yields both the closest hit and its sphere id;
    the winner's exact root is then recomputed per ray (cheap, O(rays)) so
    the mantissa quantization never reaches the image.
  * **Mask-reduce gather**: the winning sphere's 8-wide shading row
    (cx, cy, cz, r, albedo rgb, param) is fetched by a one-hot
    multiply-reduce against the VMEM shading table -- no scalar loads, no
    HBM. Material kind is folded into ``param``: lambertian -1, metal
    ``fuzz`` (in [0, 2)), dielectric ``4 + ior``.
  * RNG from a counter-based software hash (murmur3 finalizer keyed by
    (seed, absolute slot, absolute sample, bounce, draw)): the drawn sample
    set is independent of the work decomposition -- chunked, resumed, and
    spp-sharded renders trace the identical samples -- and BIT-IDENTICAL
    between compiled Mosaic and TPU-interpret mode (see the PRNG block
    below for why the TPU core PRNG was dropped).

Algorithm parity is with the reference recursion exactly as in
``models/integrator.py`` (ray.tracer.core.cc:236-265, object.defs.cc:41-81,
material.defs.cc:31-87); the RNG *streams* differ from the XLA wavefront path
(TPU PRNG vs threefry), so the two integrators agree distributionally, not
bitwise -- both match the reference within Monte-Carlo noise. On fully
deterministic scenes (fuzz-0 metals) the two paths agree to float roundoff
(tests/test_pallas.py).

Layout contract (host wrappers handle packing; see ``pack_scene``):
  geom_h  f32[N_pad, 8]  cols cx,cy,cz,1,0,0,0,0            (VMEM)
  geom_c  f32[N_pad, 8]  cols -2cx,-2cy,-2cz,(|c|^2-r^2),1,0,0,0
  shade   f32[N_pad, 8]  cols cx,cy,cz,r,alb_r,alb_g,alb_b,param
  meta    i32[8]         regen kernel: [n_actual, seed, 0, map_param,
                          slot_base, spp, max_depth, sample_start];
                          ray kernel: [n_actual, seed, tile_offset, 0...]
                          (SMEM)
  cam     f32[20]        pixel00, pixel_delta_u, pixel_delta_v, center,
                         defocus_disk_u, defocus_disk_v, defocus_angle, pad
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...scene.types import Scene

# Pixel slots (or rays) per kernel program: 8 sublane-rows of 128 lanes.
DEFAULT_TILE_RAYS = 1024
# Scene padding quantum (rows of the sphere tables).
_SPHERE_BLOCK = 128


def _knob(name: str, default: str) -> str:
    """THE single environment read point of the kernel module. Documented
    A/B benchmarking knobs (all optional; defaults are the measured-best
    production configuration -- CLAUDE.md kernel perf log):

      RT_SWEEP_ROWS     sweep block rows (default 512; power of two >= 128)
      RT_WIN            two-level stage-2 window (default 128; power of two
                        in [8, RT_SWEEP_ROWS])
      RT_TWO_LEVEL_MIN  row threshold enabling the two-level closest hit
                        (defaults: spheres 16 * RT_SWEEP_ROWS, triangles
                        RT_SWEEP_ROWS + 1 -- see _two_level_enabled; a
                        huge value disables)
      RT_GATHER         'mxu' (default) | 'radix' winner-fetch backend
      RT_TWO_LEVEL_MXU  '1' (default) | '0' stage-2 window fetch on the MXU
      RT_CULL           '1' (default kind: box) | 'box' | 'sphere' |
                        '0' (off): per-block conservative reject in the
                        multi-block stage-1 sweeps, and which bound shape
                        gates it (box won the round-3 hardware A/B, see
                        _CULL_DEFAULT_KIND)
      RT_CULL_SUB       sub-boxes per cull block for the box gate (power
                        of two in [1, 8]; see _cull_sub for the default).
                        The block's gate becomes "any sub-AABB hittable
                        strictly closer than best" -- K slab tests, still
                        ONE scalar cond per block, so it tightens the
                        bound without the measured-rejected per-group
                        cond overhead. Ignored by the sphere gate.
      RT_CULL_HINT      '1' (default) | '0': cross-primitive cull seeding
                        -- the sphere winner's exact t enters the
                        TRIANGLE cull gate as an extra per-lane upper
                        bound (lanes that hit a closer sphere stop voting
                        mesh blocks open; ~2 extra vector ops per
                        (group, block) vote). Bit-transparent (see
                        _cull_gate_box hint notes + mesh cull A/B tests).
      RT_FLAT_BLK       sweep block rows of the FLAT sphere path only
                        (default RT_SWEEP_ROWS; power of two in
                        [128, RT_SWEEP_ROWS]). Finer blocks turn a
                        <= RT_SWEEP_ROWS scene into a multi-block CULLED
                        sweep (cover's 512 rows at 128 = 4 front-to-back
                        gated blocks) -- measured and REJECTED on cover
                        (112.8 control vs 101.6 at 256 / 98.4 at 128:
                        gate conds cost more than the skipped blocks
                        save on a 1-4 block scene); kept as the probe
                        knob; output is block-size-invariant (absolute
                        row ids; tests/test_sweep_rows.py)
      RT_TRI_BLK        stage-1 block rows of the TWO-LEVEL triangle
                        sweep (default RT_SWEEP_ROWS // 2; power of two
                        in [RT_WIN, RT_SWEEP_ROWS]). 512 over-ran scoped
                        vmem with the classic M-T form (18.6 MB); the
                        triple-product form (_tri_key_rows) is ~6 live
                        tiles/group lighter, so 512 is worth re-probing.
                        Output is block-size-invariant (absolute ids).
      RT_TRI_FORM       'classic' (default) | 'triple': Moller-Trumbore
                        candidate-key form. 'triple' (packed n' = e2 x e1
                        replaces BOTH crosses with one m = s x d; ~10%
                        fewer sweep ops) measured and REJECTED round 3:
                        mesh:3 -4.6%, mesh:4 -2% in order-alternated
                        pairs -- extra column loads + a deeper dependence
                        chain beat the op savings (see _tri_form). Kept
                        as the probe knob; NOT bit-identical across forms
                        (accepted near-tie class); winner re-test is
                        exact classic M-T either way.
      RT_WORK_AHEAD     '1' (default) | '0': work-ahead regen in the
                        RENDERER's wave loop (runtime/renderer.py) --
                        lanes that reach a wave's per-slot target keep
                        tracing their own slot's later samples toward the
                        full budget instead of idling on the tile's
                        stragglers, so the within-tile straggler tail is
                        paid once per render, not once per wave. '0'
                        restores self-contained waves for A/B timing.
                        Sample set and segment totals are identical
                        either way (absolute RNG keys; open paths at a
                        wave boundary are re-traced next wave and their
                        partial depth is subtracted from the wave's
                        segment count).
      RT_SWEEP_FMA      '0' (default) | '1': fma-chain association of the
                        flat sweep quadratic -- measured and REJECTED
                        (91.7 vs 112.8 on cover: Mosaic already schedules
                        the plain form better than the forced chains,
                        which serialize h into a dependent 3-fma chain).
                        Kept as the probe knob for future toolchains;
                        NOT bit-identical to the default (last-ulp
                        rounding moves)

    Import-time knobs (RT_SWEEP_ROWS, RT_WIN) are validated below -- a bad
    value raises instead of silently skipping scene rows. Call-time knobs
    are read per trace; note jit caches by shapes only, so flip them ONLY
    between fresh processes or after jax.clear_caches().
    """
    import os

    return os.environ.get(name, default)


# Sphere rows processed per sweep step (bounds VMEM intermediates:
# ~8-10 live (rows, 128) f32 tiles in the sweep).
_SWEEP_ROWS = int(_knob("RT_SWEEP_ROWS", "512"))
# Stage-2 window of the two-level closest hit (scenes padded past
# _SWEEP_ROWS rows). Smaller windows shrink the collapse accumulators
# (live vregs across the fori) and the stage-2 re-sweep at the cost of one
# more packed window-id bit per halving.
_WIN = int(_knob("RT_WIN", "128"))

if _SWEEP_ROWS < 128 or (_SWEEP_ROWS & (_SWEEP_ROWS - 1)) != 0:
    raise ValueError(
        f"RT_SWEEP_ROWS={_SWEEP_ROWS} must be a power of two >= 128 "
        "(scene tables are padded in power-of-two row counts; a "
        "non-dividing block size would silently skip scene rows)"
    )
if not (8 <= _WIN <= _SWEEP_ROWS) or (_WIN & (_WIN - 1)) != 0:
    raise ValueError(
        f"RT_WIN={_WIN} must be a power of two in [8, {_SWEEP_ROWS}] "
        "(window ids are bit-packed into the sweep keys)"
    )


# Bound shape RT_CULL='1' resolves to (see _cull_kind). 'box' won the
# round-3 hardware A/B (back-to-back pairs, 1080p@64spp d8, Mrays/s:
# stress:8192 14.1 vs 7.4, stress:2048 15.8 vs 12.0, mesh:3 27.6 vs 26.7
# -- Morton-ordered blocks are long thin boxes, so slab windows are far
# tighter than the enclosing sphere) and is bit-transparent by the same
# A/B tests, so it is the default; RT_CULL=sphere keeps the original gate.
_CULL_DEFAULT_KIND = "box"


def _cull_kind() -> str | None:
    """Static (trace-time) selector for the per-block conservative reject
    in the multi-block stage-1 sweeps: None (RT_CULL=0, off), 'sphere'
    (per-block bounding spheres, the round-3 original), or 'box' (per-block
    AABBs -- much tighter for Morton-coherent clusters, especially flat
    triangle clusters, measured round 3). RT_CULL='1' (the default) maps to
    _CULL_DEFAULT_KIND.

    Culling is BIT-TRANSPARENT for every kind: a block is skipped only when
    no lane's ray can produce a candidate key inside the block's (widened)
    bound strictly closer than the lane's current upper bound, so the
    stage-1 minima -- and therefore the image -- are bit-identical with
    culling on or off (tested; see test_pallas.py / test_mesh.py cull A/B
    tests)."""
    v = _knob("RT_CULL", "1")
    if v == "0":
        return None
    if v == "1":
        return _CULL_DEFAULT_KIND
    if v in ("sphere", "box"):
        return v
    raise ValueError(f"RT_CULL={v!r} must be one of '0', '1', 'sphere', 'box'")


def _cull_enabled() -> bool:
    return _cull_kind() is not None


def _cull_hint() -> bool:
    """Static (trace-time) switch for cross-primitive cull seeding
    (RT_CULL_HINT): feed the sphere winner's exact t into the triangle
    cull gate as a per-lane upper bound. Default on (strictly tighter
    gate at ~2 vector ops per vote); '0' opts out for A/B timing."""
    v = _knob("RT_CULL_HINT", "1")
    if v not in ("0", "1"):
        raise ValueError(f"RT_CULL_HINT={v!r} must be '0' or '1'")
    return v == "1"


def _cull_sub(blk: int) -> int:
    """Sub-boxes per cull block for the box gate (RT_CULL_SUB), clamped so
    each sub-box covers >= 64 table rows (finer adds gate arithmetic
    faster than it removes swept rows). Default 1 pending the hardware
    A/B; the headroom simulation (scripts/probe_cull_headroom.py) prices
    candidate K values without the tunnel."""
    v = int(_knob("RT_CULL_SUB", "1"))
    if v < 1 or v > 8 or (v & (v - 1)) != 0:
        raise ValueError(
            f"RT_CULL_SUB={v} must be a power of two in [1, 8]"
        )
    while v > 1 and blk // v < 64:
        v //= 2
    return v


def _tri_blk(m_pad: int) -> int:
    """Stage-1 block rows of the two-level triangle sweep (smaller than the
    sphere path's _SWEEP_ROWS: the CLASSIC Moller-Trumbore live set x 8
    ray groups exceeded the scoped-vmem limit at 512 -- 18.6 MB measured
    in round 2).

    Trace-time knob RT_TRI_BLK (default _SWEEP_ROWS // 2 = 256): the
    round-3 triple-product sweep form (``_tri_key_rows``) dropped ~6 live
    (blk, 128) tiles per ray group, so 512-row blocks may now fit -- a
    probe knob, like RT_FLAT_BLK, until a hardware A/B moves the default.
    Cull bound tables are built at this same granularity
    (_aux_scene_inputs calls this function), so table and sweep cannot
    disagree; keys carry absolute ids, so output is block-size-invariant.
    """
    blk = int(_knob("RT_TRI_BLK", str(_SWEEP_ROWS // 2)))
    if not (_WIN <= blk <= _SWEEP_ROWS) or (blk & (blk - 1)) != 0:
        raise ValueError(
            f"RT_TRI_BLK={blk} must be a power of two in "
            f"[{_WIN}, {_SWEEP_ROWS}]"
        )
    return min(m_pad, max(_WIN, blk))


def _flat_blk(n_pad: int) -> int:
    """Sweep block rows of the FLAT (single-level) sphere closest hit.

    Trace-time knob RT_FLAT_BLK (default _SWEEP_ROWS). Unlike the
    import-time RT_SWEEP_ROWS it touches ONLY the flat sphere sweep --
    triangle block sizes, two-level thresholds and _WIN are unchanged --
    so it is the clean per-path lever: finer blocks turn a
    <= _SWEEP_ROWS scene into a multi-block sweep with the per-block
    conservative cull active (cover's 512 rows at 128 = 4 front-to-back
    gated blocks), trading more scalar gate conds for primary-tile block
    skips. The closest-hit keys carry ABSOLUTE row ids under an
    n_pad-derived mask, so the rendered image is block-size-INVARIANT
    (tests/test_sweep_rows.py; in-process A/B in test_pallas.py).
    _aux_scene_inputs builds the cull bound tables at the same
    granularity -- both read this one function, so the packed table and
    the traced sweep can never disagree."""
    blk = int(_knob("RT_FLAT_BLK", str(_SWEEP_ROWS)))
    if not (128 <= blk <= _SWEEP_ROWS) or (blk & (blk - 1)) != 0:
        raise ValueError(
            f"RT_FLAT_BLK={blk} must be a power of two in "
            f"[128, {_SWEEP_ROWS}] (scene tables are padded in "
            "power-of-two row counts; a non-dividing block size would "
            "silently skip scene rows)"
        )
    return min(n_pad, blk)


def _tri_form() -> str:
    """Trace-time knob RT_TRI_FORM: Moller-Trumbore candidate-key form.

    'classic' (default): h = d x e2 and q = s x e1 crosses, the textbook
    scaled M-T (Moller & Trumbore 1997) -- measured FASTER on hardware.
    'triple': the packed-normal triple-product form (n' = e2 x e1 table
    cols 11-13; det = d.n', u = (s x d).e2, v = -(s x d).e1,
    t = -(s.n')) -- ~10% fewer sweep ops and 6 fewer live tiles per ray
    group, but measured and REJECTED round 3 (order-alternated pairs,
    1080p@64spp d8: mesh:3 26.6/26.6 vs classic 27.9/28.0 = -4.6%;
    mesh:4 13.0/12.6 vs 13.2/13.0 = -2%): the 3 extra column loads per
    256-row stage-1 block (12 vs 9; Mosaic's dynamic-base load relayouts
    were the round-2 stage-1 dominator) and the deeper s -> m -> {u,v}
    dependence chain cost more than the dropped ops save -- the same
    scheduling lesson as RT_SWEEP_FMA. The load-amortization remedy
    (RT_TRI_BLK=512) over-ran scoped vmem (22.4 MB > 16 MB), so the form
    cannot reach the block size where its op savings would win. Kept as
    a probe knob for future toolchains (protocol: scripts/ab_tri_form.sh;
    identity verification in _tri_key_rows's docstring). NOT bit-identical
    across forms (near-tie winner flips at f32 roundoff, the accepted
    class -- 0 validity flips in 2e5 random + 5/1.2e5 aimed-near-edge
    rays); each form is self-consistent across stage 1/stage 2/flat.
    """
    v = _knob("RT_TRI_FORM", "classic")
    if v not in ("classic", "triple"):
        raise ValueError(f"RT_TRI_FORM={v!r} must be 'classic' or 'triple'")
    return v


def _tri_key_cols() -> tuple:
    """Triangle-table column ids the candidate key reads (form-dependent:
    the triple form also loads the packed n' normal, cols 11-13)."""
    if _tri_form() == "triple":
        return (*range(9), 11, 12, 13)
    return tuple(range(9))


def _tri_key_ncols() -> int:
    """Stage-2 collapse width: the 11 _tri_exact columns, plus n' when the
    triple form re-keys the collapsed window (prefix of the 14-column
    win-plane table either way)."""
    return 14 if _tri_form() == "triple" else 11


def _sweep_fma() -> bool:
    """Trace-time selector for the fma-chain association of the flat
    sweep quadratic (RT_SWEEP_FMA; see _knob and the variant comments in
    ``_sweep``). Default OFF -- measured 19% SLOWER on cover (91.7 vs
    112.8 Mrays/s, round-3 A/B): the forced right-associated chains
    serialize what Mosaic otherwise schedules as independent products.
    Kept for retesting on newer toolchains; perturbs last-ulp rounding."""
    v = _knob("RT_SWEEP_FMA", "0")
    if v not in ("0", "1"):
        raise ValueError(f"RT_SWEEP_FMA={v!r} must be '0' or '1'")
    return v == "1"


def _order_bounds(ctr, rad, has, origin):
    """Front-to-back visit order for stage-1 cull blocks: sort by the
    ray-origin proxy's distance to each bound's NEAR surface (|C - origin|
    - R; empty blocks last). Visit order does not affect results -- the
    stage-1 min over candidate keys is order-independent -- but visiting
    near blocks first tightens every lane's current-best bound early so
    far blocks fail the cull's t-test instead of being swept.

    Returns (order int32[(nb,)], bounds_sorted f32[(nb*4,)]).
    """
    bm2 = jnp.where(has, jnp.sum(ctr * ctr, axis=1) - rad * rad, 3.0e38)
    bounds = jnp.concatenate([ctr, bm2[:, None]], axis=1)
    d = jnp.linalg.norm(ctr - origin[None, :], axis=1) - rad
    d = jnp.where(has, d, jnp.float32(3.0e38))
    order = jnp.argsort(d).astype(jnp.int32)
    return order, bounds[order].reshape(-1).astype(jnp.float32)


def _box_block_bounds(row_lo, row_hi, n_valid: int, blk: int, origin,
                      sub: int = 1):
    """Per-block AABBs for the stage-1 cull (RT_CULL=box), visit-ordered
    front-to-back from ``origin``.

    ``row_lo``/``row_hi`` are per-TABLE-ROW conservative AABBs of each
    primitive (sphere: c -+ r; triangle: vertex min/max). Returns
    (order int32[(nb,)], bounds f32[(nb*8*sub,)]) where bounds rows are
    ``sub`` consecutive records [lox, loy, loz, hix, hiy, hiz, bmag,
    valid] -- one per contiguous ``blk // sub``-row Morton sub-range --
    per ``blk`` table rows, blocks in VISIT order: ``bmag`` >= the
    magnitude |p| of every point p in the widened sub-box (scales the
    in-kernel grazing margin, see _cull_gate) and ``valid`` is 1.0 for
    sub-boxes with any live primitive (an all-padding sub-box never
    passes the gate). The gate passes a block when ANY of its sub-boxes
    passes -- same single cond per block, tighter union bound (RT_CULL_SUB).

    The box is widened (absolute + coordinate-relative + extent-relative
    epsilon) so it still contains every primitive after the f32 rounding of
    the pack-side reductions; the gate adds its own margins for the
    in-kernel slab arithmetic and for sweep-side root rounding.
    """
    n_pad = row_lo.shape[0]
    nb = n_pad // blk
    sblk = blk // sub
    nsb = nb * sub
    valid = (jnp.arange(n_pad) < n_valid).reshape(nsb, sblk, 1)
    big = jnp.float32(3.0e37)
    lo = jnp.min(jnp.where(valid, row_lo.reshape(nsb, sblk, 3), big), axis=1)
    hi = jnp.max(jnp.where(valid, row_hi.reshape(nsb, sblk, 3), -big), axis=1)
    has = jnp.any(valid, axis=1)[:, 0]
    pad = (
        1.0e-3
        + 1.0e-6 * jnp.maximum(jnp.abs(lo), jnp.abs(hi))
        + 1.0e-3 * (hi - lo)
    )
    lo_w = jnp.where(has[:, None], lo - pad, 0.0)
    hi_w = jnp.where(has[:, None], hi + pad, 0.0)
    bmag = jnp.sqrt(
        jnp.sum(jnp.maximum(jnp.abs(lo_w), jnp.abs(hi_w)) ** 2, axis=1)
    )
    # Front-to-back: Euclidean distance from the origin proxy to the
    # BLOCK's box (the min over its sub-boxes' gaps; empty sub-boxes are
    # (0,0) points -- excluded via +inf before the min).
    gap = jnp.maximum(
        jnp.maximum(lo_w - origin[None, :], origin[None, :] - hi_w), 0.0
    )
    d = jnp.sqrt(jnp.sum(gap * gap, axis=1))
    d = jnp.where(has, d, jnp.float32(3.0e38))
    d_blk = jnp.min(d.reshape(nb, sub), axis=1)
    order = jnp.argsort(d_blk).astype(jnp.int32)
    rows = jnp.concatenate(
        [
            lo_w, hi_w, bmag[:, None],
            jnp.where(has, 1.0, 0.0)[:, None],
        ],
        axis=1,
    ).reshape(nb, sub * 8)
    return order, rows[order].reshape(-1).astype(jnp.float32)


def _block_bounds(centers, radii, n_valid: int, blk: int, origin, kind):
    """Per-block bounds for the sphere stage-1 cull, visit-ordered
    front-to-back from ``origin`` (the camera center / a ray-origin proxy).

    ``kind`` 'box': per-block AABBs over c -+ r
    (_box_block_bounds layout). Kind 'sphere': bounding spheres --
    (order int32[(nb,)], bounds f32[(nb*4,)]) where bounds rows are
    [Cx, Cy, Cz, |C|^2 - R^2] per ``blk`` table rows in VISIT order and
    ``order[b]`` is the actual block index of visit step b (SMEM layout).

    R is widened (relative + absolute epsilon) so the in-kernel f32 bound
    test is conservative against rounding in both the bound roots and the
    per-sphere candidate roots -- skipping must never lose a true winner.
    Rows >= ``n_valid`` (padding) are excluded; an all-padding block gets
    cm2 = +3e38 so its discriminant is always negative (never passes).
    """
    n_pad = centers.shape[0]
    nb = n_pad // blk
    r3 = radii[:, None]
    if kind == "box":
        return _box_block_bounds(
            centers - r3, centers + r3, n_valid, blk, origin,
            sub=_cull_sub(blk),
        )
    valid = (jnp.arange(n_pad) < n_valid).reshape(nb, blk, 1)
    c = centers.reshape(nb, blk, 3)
    r = radii.reshape(nb, blk, 1)
    big = jnp.float32(3.0e37)
    lo = jnp.min(jnp.where(valid, c - r, big), axis=1)
    hi = jnp.max(jnp.where(valid, c + r, -big), axis=1)
    has = jnp.any(valid, axis=1)[:, 0]
    ctr = jnp.where(has[:, None], 0.5 * (lo + hi), 0.0)
    dist = jnp.sqrt(
        jnp.sum((c - ctr[:, None, :]) ** 2, axis=-1, keepdims=True)
    ) + r
    rad = jnp.max(jnp.where(valid, dist, 0.0), axis=1)[:, 0]
    rad = rad * 1.001 + 1.0e-3
    return _order_bounds(ctr, rad, has, origin)


def _tri_block_bounds(v0, e1, e2, m_valid: int, blk: int, origin, kind):
    """Triangle analog of ``_block_bounds``: per-block bound (``kind``
    'box': AABB; 'sphere': bounding sphere) over the triangles' vertices
    (v0, v0+e1, v0+e2), visit-ordered front-to-back from ``origin``."""
    p1 = v0 + e1
    p2 = v0 + e2
    tlo = jnp.minimum(jnp.minimum(v0, p1), p2)
    thi = jnp.maximum(jnp.maximum(v0, p1), p2)
    if kind == "box":
        return _box_block_bounds(
            tlo, thi, m_valid, blk, origin, sub=_cull_sub(blk)
        )
    m_pad = v0.shape[0]
    nb = m_pad // blk
    valid = (jnp.arange(m_pad) < m_valid).reshape(nb, blk, 1)
    big = jnp.float32(3.0e37)
    lo = jnp.min(jnp.where(valid, tlo.reshape(nb, blk, 3), big), axis=1)
    hi = jnp.max(jnp.where(valid, thi.reshape(nb, blk, 3), -big), axis=1)
    has = jnp.any(valid, axis=1)[:, 0]
    ctr = jnp.where(has[:, None], 0.5 * (lo + hi), 0.0)
    # Farthest corner of each triangle's AABB from the block center.
    dlo = jnp.abs(tlo.reshape(nb, blk, 3) - ctr[:, None, :])
    dhi = jnp.abs(thi.reshape(nb, blk, 3) - ctr[:, None, :])
    dist = jnp.sqrt(
        jnp.sum(jnp.maximum(dlo, dhi) ** 2, axis=-1, keepdims=True)
    )
    rad = jnp.max(jnp.where(valid, dist, 0.0), axis=1)[:, 0]
    rad = rad * 1.001 + 1.0e-3
    return _order_bounds(ctr, rad, has, origin)


def _two_level_enabled(n_pad: int, tri: bool = False) -> bool:
    """Static (trace-time) switch for the two-level closest hit.

    Sphere default: tables of 16 * _SWEEP_ROWS rows (8192) and past. The
    round-3 threshold A/B (1080p@16spp d8, back-to-back pairs; BASELINE.md)
    measured the FLAT block-major sweep + flat MXU winner fetch + per-block
    cull faster at every size up to 4096 rows -- 1024: 45.6 vs 31.6
    Mrays/s; 2048: 26.1 vs 21.3; 4096: 15.0 vs 13.4 -- and a noise-level
    tie at 8192 (flat 8.0 vs 7.7, flat's best-of-3 spread reaching down to
    4.8). 8192+ stays two-level: the flat one-hot winner fetch contracts
    over the FULL n_pad-wide plane table per bounce, so its cost keeps
    growing with N while the two-level fetch touches one collapsed window.

    Triangle default (``tri=True``): past _SWEEP_ROWS. The flat
    Moller-Trumbore block body at 512 rows x 8 ray groups exceeds the
    16 MB scoped-vmem limit (measured 18.6 MB in round 2 -- the reason
    triangle stage 1 runs 256-row blocks), so large flat meshes are not
    viable and the two-level path takes over as soon as blocks multiply.

    RT_TWO_LEVEL_MIN overrides both thresholds (row count; large value
    disables) for A/B benchmarking.
    """
    default = _SWEEP_ROWS + 1 if tri else 16 * _SWEEP_ROWS
    min_rows = int(_knob("RT_TWO_LEVEL_MIN", str(default)))
    # The structure needs >= 2 windows; below that stage 1 is degenerate.
    return n_pad >= max(min_rows, 2 * _WIN)

_T_MIN = 1.0e-4          # hit interval lower bound (core.cc:243)
_BIGF = 3.0e38           # "no hit" key (positive-float == int ordering)
_SELF_HIT_OFFSET = 1.0e-3  # see models/integrator.SELF_HIT_OFFSET
_TWO_PI = 6.2831853071795864

_HIGHEST = jax.lax.Precision.HIGHEST


# Counter-based software PRNG (murmur3-finalizer / splitmix32 family).
#
# Round 1 used the TPU core PRNG (pltpu.prng_seed / prng_random_bits); it was
# replaced because interpret mode has no PRNG emulation (prng_random_bits
# returns ZEROS on CPU), which (a) silently skipped every RNG-dependent
# parity test off-hardware and (b) made the pallas golden image depend on the
# zeros quirk. The software generator is plain 32-bit VPU integer arithmetic,
# so compiled Mosaic and TPU-interpret mode produce BIT-IDENTICAL draws --
# the pallas backend now renders the same image on CPU and TPU. Measured
# cost: ~12 vector ops per (8,128) draw, < 0.1 cyc/segment (noise level).
#
# All shifts are arithmetic-shift + mask (no uint32 vectors needed); int32
# multiplies wrap (two's complement), which is exactly the mod-2^32 product
# the finalizer wants.

_GOLD = -1640531527  # 0x9E3779B9: golden-ratio increment (odd -> bijective)


def _fmix32(h):
    """murmur3 32-bit finalizer: full avalanche on int32 (scalar or vector)."""
    h = h ^ ((h >> 16) & 0xFFFF)
    h = h * jnp.int32(-2048144789)   # 0x85EBCA6B
    h = h ^ ((h >> 13) & 0x7FFFF)
    h = h * jnp.int32(-1028477387)   # 0xC2B2AE35
    h = h ^ ((h >> 16) & 0xFFFF)
    return h


def _lane_hash(tile_shape):
    """Per-lane counter * odd constant; hoisted once per kernel program."""
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, tile_shape, 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, tile_shape, 1)
    )
    return lane * jnp.int32(-1640531535)  # 0x9E3779B1 (odd)


def _uniform01_from(lane_h, stream_key, j: int):
    """U[0,1) draw ``j`` of the (lane, stream) counter: low 24 hash bits."""
    h = _fmix32(lane_h + (stream_key + jnp.int32(j) * jnp.int32(0x632BE5AB)))
    return (h & 0xFFFFFF).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


# Odd multipliers folding the (slot, sample, bounce, draw) coordinates into
# the regen kernel's counter (distinct constants decorrelate the axes before
# the finalizer's avalanche). Draw slots: j 0-2 scatter, j 3-6 camera ray.
# Plain ints (NOT jnp arrays): a module-level jnp constant would be captured
# by the kernel closure, which pallas_call rejects inside shard_map.
_K_SAMPLE = -2048144777   # 0x85EBCA77
_K_BOUNCE = -1028477379   # 0xC2B2AE3D
_K_DRAW = 0x632BE5AB


def _uniform01_keyed(slot_h, sample_v, bounce_v, j: int):
    """U[0,1) draw ``j`` at per-lane (slot, sample, bounce) coordinates.

    Keying by ABSOLUTE sample index (not wave/iteration counters) makes the
    sample set independent of work decomposition: chunked renders, resumed
    renders, and spp-sharded renders all draw the identical sample for a
    given (pixel slot, sample index) -- the pallas analog of the XLA path's
    per-(pixel, sample) threefry keys (core/rng.py).
    """
    j_term = ((j * _K_DRAW + (1 << 31)) % (1 << 32)) - (1 << 31)  # int32 wrap
    h = _fmix32(
        slot_h
        + sample_v * jnp.int32(_K_SAMPLE)
        + bounce_v * jnp.int32(_K_BOUNCE)
        + jnp.int32(j_term)
    )
    return (h & 0xFFFFFF).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _pack_bits(n_pad: int) -> int:
    return max((n_pad - 1).bit_length(), 1)


def _f32_bits(x: float) -> int:
    import struct

    return struct.unpack("<i", struct.pack("<f", x))[0]


def _interp(flag: bool):
    """interpret=True means the TPU interpreter (emulates the core PRNG and
    TPU-only primitives on CPU), not the generic pallas interpreter."""
    return pltpu.InterpretParams() if flag else False


# ---------------------------------------------------------------------------
# Kernel building blocks (shared by the regen and ray-input kernels)
# ---------------------------------------------------------------------------


# Error-scale widening for the per-block cull's bounding-sphere quadratic.
# The radius widening at pack time (1.001 R + 1e-3) is NOT conservative on
# its own: at the scene dynamic range (|C| up to ~1000x R, CLAUDE.md's bf16
# analysis) the gate's h_b = bc.d - d.o and cq_b = bm2 - 2 bc.o + o.o are
# catastrophic cancellations of ~|C|^2-scale intermediates, so the f32
# rounding error of delta_b = h_b^2 - a*cq_b is ~k*eps times the UNCANCELLED
# term magnitudes -- NOT eps*|delta_b| and not even eps*(h^2 + |a cq|)
# (bounce rays have o near C: tiny |o - C| but ~|C|^2-scale intermediates).
# A grazing TRUE hit can then round delta_b negative (sqrt -> NaN -> block
# culled) while the contained sphere's own independently-rounded quadratic
# still hits, breaking bit-transparency (found by a directed search over
# silhouette rays; test_sphere_cull_bit_transparent_dynamic_range pins the
# kill-shot direction). The conservative margins are built from magnitude
# bounds (Cauchy-Schwarz: |bc.d| <= |bc| sqrt(a), |bc.o| <= |bc| |o|):
#   mh  = |bc| sqrt(a) + |d.o]      >= |h_b| and every h_b addend
#   mc  = |bm2| + 2 |bc| |o| + o.o  >= every cq_b addend
#   delta_b += EPS * (mh^2 + a*mc)  (covers ~6 eps accumulation, 14x slack)
#   sq_b    += EPS * mh             (covers h_b's own error in near/far)
# EPS = 84 f32 ulps. Cost: ~10 extra VPU ops per (ray group, block) in the
# gate and a spurious-pass shell around far blocks -- false passes only
# cost a swept block, never correctness.
_CULL_DELTA_EPS = 1.0e-5

# Margins of the AABB (RT_CULL=box) gate. The slab windows are computed as
# t = bound*inv_d - o*inv_d -- a CANCELLING subtraction again, so the same
# lesson applies: widen at the uncancelled term-magnitude scale.
#
# _CULL_GRAZE_EPS (spatial units, scaled by |o| + bmag): covers SWEEP-side
# root rounding. A grazing primitive hit whose f32 discriminant rounds
# across zero places the computed winner root within
# ds ~ sqrt(err_delta)/|d| of the geometric tangent point, with
# err_delta <~ 10 eps * M^2 and M ~ |oc||d| (Cauchy-Schwarz), i.e.
# ds <~ sqrt(2*10*eps) * (|o| + bmag) ~ 1.1e-3 * (|o| + bmag) of EUCLIDEAN
# slack around the primitive (any direction). Expanding each slab's t
# window by ds * |inv_d_axis| PER AXIS contains every such root: the ray
# point at the computed root lies within 2*ds of the primitive, and a point
# within e of a slab has its t within e * |inv_axis| of the slab's window.
# Per-axis (not a global max |inv|) matters: a near-axis-parallel lane gets
# the huge margin ONLY on its parallel axis -- which then simply stops
# constraining -- instead of defeating the whole gate. 4.5x slack.
_CULL_GRAZE_EPS = 5.0e-3
# Relative margin on the gate's OWN slab arithmetic: inv_d's division,
# o*inv_d, and the cancelling fma, each correctly-rounded-or-near f32
# (divide accuracy probed on hardware, scripts/probe_divide.py) -- ~4 eps
# against the uncancelled magnitudes |bound*inv_d| + |o*inv_d|; 84 ulps
# gives ~20x slack.
_CULL_SLAB_EPS = 1.0e-5


def _gate_pre(rows, a, d_dot_o, o_dot_o, ta, kind):
    """Per-sweep precomputes for ``_cull_gate`` under bound kind ``kind``
    (static; from the cull tuple, which carries the SAME kind the bound
    table was packed with -- see _aux_scene_inputs). Hoisted out of the
    per-block fori by every gated sweep so the gate's per-(group, block)
    work stays O(1) vector ops.

    'sphere': Cauchy-Schwarz magnitude inputs for the quadratic bound test.
    'box': safe per-axis reciprocals of d (sign-preserving clamp away from
    zero -- an exactly-axis-parallel ray gets a huge-but-finite window on
    that axis, which conservatively stops constraining) plus o*inv and the
    absolute values the margins need.
    """
    ox, oy, oz, dx, dy, dz = rows
    if kind != "box":
        return (a, d_dot_o, o_dot_o, ta, jnp.sqrt(a), jnp.sqrt(o_dot_o))
    so = jnp.sqrt(o_dot_o)

    def inv(c):
        sign = pltpu.bitcast(c, jnp.int32) & jnp.int32(-0x80000000)
        mag = jnp.maximum(jnp.abs(c), 1.0e-30)
        return 1.0 / pltpu.bitcast(
            pltpu.bitcast(mag, jnp.int32) | sign, jnp.float32
        )

    iv = (inv(dx), inv(dy), inv(dz))
    oi = (ox * iv[0], oy * iv[1], oz * iv[2])
    return (
        a, so, iv,
        tuple(jnp.abs(v) for v in iv),
        oi,
        tuple(jnp.abs(v) for v in oi),
    )


def _cull_gate_box(cull, b, pre, t_sub, carry, *, id_mask, scaled_key,
                   body, hint=None):
    """AABB variant of the per-block conservative reject (RT_CULL=box).

    One scalar ``lax.cond`` per visited block: the block's widened AABB
    (SMEM, 8 scalars per visit row -- see _box_block_bounds) runs a slab
    test per ray group; the block body is skipped only when NO active
    lane's ray can produce a candidate key inside the margined window
    strictly closer than the lane's current best. Margins: per-axis window
    expansion by _CULL_GRAZE_EPS * (|o| + bmag) * |inv_axis| (sweep-side
    root rounding, incl. grazing discriminant flips) plus
    _CULL_SLAB_EPS * (|t1| + |t2| + 2|o*inv|) (the gate's own cancelling
    fma/divide rounding), then the same compare slack vs the packed-key
    upper bound as the sphere gate. Bit-transparent (tested).

    The vote is FAIL-CLOSED under NaN: slab products (coord * clamped
    inv_d, up to 1e30 for an exactly-axis-parallel lane) can overflow f32
    past |coord| ~3e8, and inf - inf = NaN. The pass predicate is written
    as the NEGATION of reject comparisons, so NaN (every compare false)
    means PASS -- a conservatively swept block, never a wrong cull. A
    legitimate miss is a FINITE inverted window (tn > tf) and still
    rejects. (The sphere gate's NaN convention is the opposite -- its NaN
    discriminant genuinely means 'no intersection' -- so each gate
    documents its own.)

    The bound table may carry ``sub`` > 1 AABBs per block (RT_CULL_SUB,
    derived here from the SMEM table shapes so it can never diverge from
    the packed layout): the block passes when ANY sub-box passes for any
    active lane -- a strictly tighter union bound at the same single
    ``lax.cond``.

    ``hint``: optional (t_sub, 128) f32 EXTERNAL upper bound per lane in
    the key's own units, min'd into ``cur_hi`` (cross-primitive cull
    seeding -- the sphere winner's exact t tightens the triangle gate;
    see _bounce_core). Bit-transparency survives because the final merge
    keeps a triangle only at t_t STRICTLY below the same hint value, and
    the gate's compare slack (1% + 1e-3) dwarfs the ~5e-4 relative key
    quantization (approx reciprocal + id-bit packing), so no near-tie
    winner flip can straddle the margin."""
    ord_ref, bnd_ref, act, _ = cull
    sub = bnd_ref.shape[0] // (ord_ref.shape[0] * 8)
    a, so, iv, aiv, oi, aoi = pre
    anyv = jnp.zeros((1, 128), jnp.int32)
    for k in range(sub):
        base = (8 * sub) * b + 8 * k
        lox = bnd_ref[base]
        loy = bnd_ref[base + 1]
        loz = bnd_ref[base + 2]
        hix = bnd_ref[base + 3]
        hiy = bnd_ref[base + 4]
        hiz = bnd_ref[base + 5]
        bmag = bnd_ref[base + 6]
        bval = bnd_ref[base + 7]
        for g in range(t_sub):
            sl = slice(g, g + 1)
            ds = _CULL_GRAZE_EPS * (so[sl] + bmag)

            def axis(lo, hi, k2, sl=sl, ds=ds):
                t1 = lo * iv[k2][sl] - oi[k2][sl]
                t2 = hi * iv[k2][sl] - oi[k2][sl]
                m = ds * aiv[k2][sl] + _CULL_SLAB_EPS * (
                    jnp.abs(t1) + jnp.abs(t2) + 2.0 * aoi[k2][sl]
                )
                return jnp.minimum(t1, t2) - m, jnp.maximum(t1, t2) + m

            tnx, tfx = axis(lox, hix, 0)
            tny, tfy = axis(loy, hiy, 1)
            tnz, tfz = axis(loz, hiz, 2)
            tn = jnp.maximum(jnp.maximum(tnx, tny), tnz)
            tf = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
            cur_hi = pltpu.bitcast(carry[g] | id_mask, jnp.float32)
            if hint is not None:
                cur_hi = jnp.minimum(cur_hi, hint[sl])
            # NEGATED reject form: NaN from slab-product overflow compares
            # false in every reject test, so such lanes PASS (fail-closed).
            if scaled_key:
                # Sphere keys are unscaled roots n = a*t.
                rej = (
                    (tn > tf)
                    | (tf <= _T_MIN * 0.999)
                    | (tn * a[sl]
                       > cur_hi + 1.0e-3 + 1.0e-3 * jnp.abs(cur_hi))
                )
            else:
                # Triangle keys are approximate t (2^-12 reciprocal); same
                # 1% compare slack as the sphere-bound gate's tri regime.
                rej = (
                    (tn > tf)
                    | (tf <= _T_MIN * 0.99)
                    | (tn > cur_hi + 0.01 * jnp.abs(cur_hi) + 1.0e-3)
                )
            # An all-padding sub-box (bval 0.0, never NaN) rejects.
            passg = ~rej & (bval > 0.5)
            if act is not None:
                passg = passg & act[sl]
            anyv = anyv | passg.astype(jnp.int32)
    return jax.lax.cond(
        jnp.max(anyv) > 0,
        lambda kw: body(ord_ref[b], kw), lambda kw: kw,
        carry,
    )


def _cull_gate(cull, b, rows, pre, t_sub, carry, *, id_mask, scaled_key,
               body, hint=None):
    """Shared per-block conservative reject for the four stage-1 sweeps
    (flat/two-level x sphere/triangle).

    One scalar ``lax.cond`` per visited block: the block's bounding sphere
    ``[C, |C|^2 - R^2]`` (SMEM, front-to-back VISIT order -- bounds row
    ``b``, swept block ``ord_ref[b]``) runs the same scaled-root quadratic
    as its primitives; the block body is skipped only when NO active lane's
    ray can hit the widened bound strictly closer than its current best.
    Containment (pack-time R widening) + the delta-space margin above make
    the skip bit-transparent: culling on/off produces identical radiance
    (tested, test_pallas.py cull A/B tests).

    ``carry`` is the per-group tuple of packed-key minima; ``id_mask`` is
    the key's low id-bit mask, so ``carry[g] | id_mask`` bitcast to f32 is
    a >= upper bound on the group's winning root. ``scaled_key`` selects
    the key's unit: sphere keys are UNSCALED-root n = a*t (compare near_b
    directly, tight relative margin); triangle keys are approximate t
    (compare against a * cur_hi with a wider margin covering the
    approx-reciprocal error). Lanes with ``act`` False (stale: all samples
    done, wave draining) are masked out of the vote so they cannot force
    blocks other lanes culled.

    ``pre`` comes from ``_gate_pre`` (hoisted per sweep); the cull tuple's
    static kind tag (matching the packed bound-table layout) picks the
    bound shape -- 'box' dispatches to ``_cull_gate_box``. ``hint``: see
    _cull_gate_box (external per-lane upper bound in the key's units,
    used by the triangle sweeps for cross-primitive seeding).
    """
    if cull[3] == "box":
        return _cull_gate_box(
            cull, b, pre, t_sub, carry,
            id_mask=id_mask, scaled_key=scaled_key, body=body, hint=hint,
        )
    ox, oy, oz, dx, dy, dz = rows
    a, d_dot_o, o_dot_o, ta, sa, so = pre
    ord_ref, bnd_ref, act, _ = cull
    bcx = bnd_ref[4 * b]
    bcy = bnd_ref[4 * b + 1]
    bcz = bnd_ref[4 * b + 2]
    bm2 = bnd_ref[4 * b + 3]
    # Scalar per block: |bc| and the |bm2| + 2|bc||o|-independent pieces of
    # the magnitude bounds (scalar-unit work, overlaps the VPU).
    bc_abs = jnp.sqrt(bcx * bcx + bcy * bcy + bcz * bcz)
    bm2_abs = jnp.abs(bm2)
    anyv = jnp.zeros((1, 128), jnp.int32)
    for g in range(t_sub):
        sl = slice(g, g + 1)
        h_b = bcx * dx[sl] + bcy * dy[sl] + bcz * dz[sl] - d_dot_o[sl]
        cq_b = (
            bm2
            - 2.0 * (bcx * ox[sl] + bcy * oy[sl] + bcz * oz[sl])
            + o_dot_o[sl]
        )
        hh = h_b * h_b
        acq = a[sl] * cq_b
        # Conservative error margins at the UNCANCELLED magnitude scale
        # (see _CULL_DELTA_EPS above): mh >= |h_b| + its addends,
        # mc >= cq_b's addends.
        mh = bc_abs * sa[sl] + jnp.abs(d_dot_o[sl])
        mc = (bm2_abs + 2.0 * bc_abs * so[sl]) + o_dot_o[sl]
        delta_b = hh - acq + _CULL_DELTA_EPS * (mh * mh + a[sl] * mc)
        sq_b = (  # NaN on miss -> compares false
            jnp.sqrt(delta_b) + _CULL_DELTA_EPS * mh
        )
        near_b = h_b - sq_b
        far_b = h_b + sq_b
        cur_hi = pltpu.bitcast(carry[g] | id_mask, jnp.float32)
        if hint is not None:
            cur_hi = jnp.minimum(cur_hi, hint[sl])
        if scaled_key:
            passg = (far_b > ta[sl] * 0.999) & (
                near_b <= cur_hi + 1.0e-3 + 1.0e-3 * jnp.abs(cur_hi)
            )
        else:
            thr = a[sl] * cur_hi
            passg = (far_b > ta[sl] * 0.99) & (
                near_b <= thr + 0.01 * jnp.abs(thr) + 1.0e-3
            )
        if act is not None:
            passg = passg & act[sl]
        anyv = anyv | passg.astype(jnp.int32)
    return jax.lax.cond(
        jnp.max(anyv) > 0,
        lambda kw: body(ord_ref[b], kw), lambda kw: kw,
        carry,
    )


def _sweep(geh_ref, gec_ref, rows, *, n_pad, t_sub, cull=None):
    """Closest-hit over all spheres for a full (t_sub, 128) ray tile.

    Pure VPU broadcast arithmetic: each inner step tests a sphere-block
    column slice against a (1, 128) ray group giving (block, 128) candidate
    roots, folded into a running packed-key minimum -- VMEM stays O(block),
    not O(N), so arbitrarily large scenes fit. (A formulation of the two
    inner products as MXU matmuls was measured SLOWER -- Mosaic pads tiny-K
    matmuls -- so the sweep stays on the VPU.) Padding rows carry
    cq = +1e30 so their discriminant is always negative: no validity mask.

    ``cull``: optional (ord_ref, bnd_ref, act, kind) per-block conservative
    reject, identical to _closest_sphere_two_level's (front-to-back visit
    order, bit-transparent skips; ``kind`` is the static bound-shape tag
    matching the packed table layout) -- used by multi-block FLAT sweeps now
    that the flat path is preferred up to 2048 rows (threshold A/B,
    BASELINE.md round 3).

    Returns ``kmin i32 (t_sub, 128)``: bits of the winning (quantized)
    near-root with the sphere id packed in the low ``_pack_bits`` bits
    (``_BIGF``-based key when no sphere is hit).
    """
    ox, oy, oz, dx, dy, dz = rows
    a = dx * dx + dy * dy + dz * dz
    d_dot_o = dx * ox + dy * oy + dz * oz
    o_dot_o = ox * ox + oy * oy + oz * oz
    ta = _T_MIN * a
    pack_mask = (1 << _pack_bits(n_pad)) - 1
    blk = _flat_blk(n_pad)
    nohit = jnp.full((1, 128), _f32_bits(_BIGF) & ~pack_mask, jnp.int32)

    n_blocks = n_pad // blk
    blk_ids = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)

    fma_form = _sweep_fma()
    if fma_form:
        # Per-group invariants of the fma-chain variant, hoisted out of
        # the block loop: the negated d.o accumulator seeds h's chain and
        # the a-prescaled origin terms let a*cq be built WITHOUT the
        # separate a[sl] * cq product (delta then fuses as one
        # multiply-subtract). Tiny (1, 128) tiles, block-loop-invariant.
        neg_ddo = tuple(-d_dot_o[g : g + 1] for g in range(t_sub))
        aox = tuple(a[g : g + 1] * ox[g : g + 1] for g in range(t_sub))
        aoy = tuple(a[g : g + 1] * oy[g : g + 1] for g in range(t_sub))
        aoz = tuple(a[g : g + 1] * oz[g : g + 1] for g in range(t_sub))
        aoo = tuple(a[g : g + 1] * o_dot_o[g : g + 1] for g in range(t_sub))

    # Block-major: each block's 7 column loads are issued ONCE for all
    # t_sub ray groups (Mosaic does not CSE per-group re-loads; see the
    # two-level stage-1 note -- same restructure, measured +68% on
    # stress scenes there).
    fused_load = _knob("RT_SWEEP_LOAD", "split")
    if fused_load not in ("split", "fused"):
        raise ValueError(
            f"RT_SWEEP_LOAD={fused_load!r} must be 'split' or 'fused'"
        )
    fused_load = fused_load == "fused"

    def blk_body(b, kmins):
        base = pl.multiple_of(b * blk, blk)
        if fused_load:
            # Op-mix probe (round 4): 2 wide loads + lane slices instead of
            # 7 single-column loads (each dynamic-base column load pays a
            # (n,1) -> lane-replicated relayout). Bit-identical values.
            gh = geh_ref[pl.ds(base, blk), 0:3]
            gc = gec_ref[pl.ds(base, blk), 0:4]
            cx, cy, cz = gh[:, 0:1], gh[:, 1:2], gh[:, 2:3]
            m2cx, m2cy, m2cz = gc[:, 0:1], gc[:, 1:2], gc[:, 2:3]
            cm2 = gc[:, 3:4]
        else:
            cx = geh_ref[pl.ds(base, blk), 0:1]
            cy = geh_ref[pl.ds(base, blk), 1:2]
            cz = geh_ref[pl.ds(base, blk), 2:3]
            m2cx = gec_ref[pl.ds(base, blk), 0:1]
            m2cy = gec_ref[pl.ds(base, blk), 1:2]
            m2cz = gec_ref[pl.ds(base, blk), 2:3]
            cm2 = gec_ref[pl.ds(base, blk), 3:4]
        # Group-loop-invariant id column: computed ONCE per block (Mosaic
        # is not relied on to CSE the per-group copies -- same class as
        # the load lesson above, round-4 op-mix probe, bit-identical).
        ids = blk_ids + base
        out = []
        for g in range(t_sub):
            sl = slice(g, g + 1)
            if fma_form:
                # RIGHT-associated mul+add chains so every level is
                # fusable into one fma: h seeds with -d.o, a*cq is built
                # directly from the prescaled terms, and delta needs no
                # standalone a*cq product. Identical mathematics, last
                # ulp moves (RT_SWEEP_FMA A/B candidate, default off).
                h = cx * dx[sl] + (
                    cy * dy[sl] + (cz * dz[sl] + neg_ddo[g])
                )
                acq = cm2 * a[sl] + (
                    m2cx * aox[g]
                    + (m2cy * aoy[g] + (m2cz * aoz[g] + aoo[g]))
                )
            else:
                # h = d.(c-o); cq = |o-c|^2 - r^2 (object.defs.cc:43-46)
                h = cx * dx[sl] + cy * dy[sl] + cz * dz[sl] - d_dot_o[sl]
                cq = (
                    cm2 + m2cx * ox[sl] + m2cy * oy[sl] + m2cz * oz[sl]
                    + o_dot_o[sl]
                )
                acq = a[sl] * cq
            # Unscaled roots n = a*t = h -+ sqrt(h^2 - a*cq): same
            # ordering and sign as t (a > 0 constant per ray), so the
            # interval test t > T_MIN becomes n > T_MIN * a with no
            # per-pair division. No max(delta, 0): sqrt of a negative
            # gives NaN and every compare with NaN is false, so misses
            # fall through to the BIG key free.
            delta = h * h - acq
            sq = jnp.sqrt(delta)
            n1 = h - sq
            n2 = h + sq
            nroot = jnp.where(n1 > ta[sl], n1, n2)
            key = jnp.where(nroot > ta[sl], nroot, _BIGF)
            ki = (pltpu.bitcast(key, jnp.int32) & ~pack_mask) | ids
            out.append(
                jnp.minimum(kmins[g], jnp.min(ki, axis=0, keepdims=True))
            )
        return tuple(out)

    if cull is not None:
        pre = _gate_pre(rows, a, d_dot_o, o_dot_o, ta, cull[3])

    def blk_step_all(b, kmins):
        if cull is None:
            return blk_body(b, kmins)
        # Per-block conservative reject (_cull_gate; the flat key's low
        # pack_mask bits are sphere ids, so |pack_mask gives the same >=
        # upper bound on the winning scaled root as the two-level wmask).
        return _cull_gate(
            cull, b, rows, pre, t_sub, kmins,
            id_mask=pack_mask, scaled_key=True, body=blk_body,
        )

    init = tuple(nohit for _ in range(t_sub))
    if n_blocks == 1:
        kmins = blk_body(0, init)
    else:
        # fori_loop (not unrolled python) so Mosaic's stack allocator
        # reuses one block's intermediates instead of summing them all.
        kmins = jax.lax.fori_loop(0, n_blocks, blk_step_all, init)
    return jnp.concatenate(list(kmins), axis=0)


def _fold_half(t, bit, stop: int = 8):
    """Binary-tournament fold of a bit-pattern tile down to ``stop`` rows.

    ``t`` is (size, 1) or (size, 128) f32; ``bit`` is a list of (1, 128)
    bools, ``bit[k]`` = bit k of each lane's selected row index. Each level
    keeps the half of the rows containing every lane's selection
    (bit-preserving f32 selects -- packed integer columns survive).
    """
    size = t.shape[0]
    while size > stop:
        half = size // 2
        t = jnp.where(bit[half.bit_length() - 1], t[half:size], t[:half])
        size = half
    return t


def _collapse_window_blocked(col_list, bit, start, *, n_rows):
    """Collapse each (n_rows, 1) column of ``col_list`` ((ref, col) pairs)
    to the per-lane winner window as a (_WIN, 128) tile.

    A whole-table tournament would materialize (n_rows/2, 128) first-fold
    tiles for EVERY column and Mosaic keeps them live concurrently --
    measured 30 MB of scoped VMEM at 8192 rows x 7 columns (stack OOM).
    Instead each collapse block is folded down to its window candidate
    and a select keyed on the winner's block index carries the winner
    through one fori pass over the table for ALL columns: live
    intermediates stay O(block) regardless of n_rows.

    ``start`` is the winner window's absolute first row (1, 128); the
    block index is derived HERE from the collapse block size (the caller's
    stage-1 sweep may use a different block size -- e.g. the triangle
    stage 1 runs 256-row blocks -- so it must not be derived there).
    ``bit`` are the winner-start bits; its low bits double as the
    within-block window position, so the same list drives both the
    block-local fold and the final row folds.
    """
    cblk = min(n_rows, _SWEEP_ROWS)
    n_blocks = n_rows // cblk
    if n_blocks == 1:
        return [
            _fold_half(ref[:, c : c + 1], bit, stop=_WIN)
            for ref, c in col_list
        ]
    sblk = start >> (cblk.bit_length() - 1)  # winner's collapse block

    # Structure is measured-optimal on this toolchain (stress:2048 A/B,
    # CLAUDE.md): static-slice unrolling, arithmetic-materialized
    # broadcasts, explicit min trees, split column passes (register
    # pressure), and window sizes 32/64 all measured neutral-to-worse.

    def step(b, carry):
        base = pl.multiple_of(b * cblk, cblk)
        keep = sblk == b
        return tuple(
            jnp.where(
                keep,
                _fold_half(ref[pl.ds(base, cblk), c : c + 1], bit, stop=_WIN),
                acc,
            )
            for (ref, c), acc in zip(col_list, carry)
        )

    z = jnp.zeros((_WIN, 128), jnp.float32)
    return list(
        jax.lax.fori_loop(
            0, n_blocks, step, tuple(z for _ in col_list)
        )
    )


def _fold8(t, bit):
    """Collapse an (8, 128) tile to the per-lane selected row (1, 128) with
    three sublane rotate-select rounds."""
    for shift in (4, 2, 1):
        rolled = pltpu.roll(t, 8 - shift, axis=0)
        t = jnp.where(bit[shift.bit_length() - 1], rolled, t)
    return t[0:1]


def _fold_to_row(t, bit):
    """Full fold: (size, 1|128) f32 tile -> per-lane selected row (1, 128)."""
    return _fold8(_fold_half(t, bit), bit)


def _gather_cols(table_ref, col_ids, sel_rows, *, n_rows, t_sub):
    """Radix-select fetch of per-lane rows from a (n_rows, C) VMEM table.

    A binary tournament on the bits of ``sel_rows`` folds each (n_rows, 1)
    table column in half log2(n_rows) times -- O(N) selects total per
    attribute (vs O(N) multiply + O(N) reduce-add for a one-hot mask-reduce,
    measured ~2x slower) -- then three sublane rotate-select rounds collapse
    the last 8 rows. ``n_rows`` must be a power of two. Beyond the
    ``_SWEEP_ROWS`` window, a bit-preserving select fori first collapses to
    the winner's window so VMEM intermediates stay O(window).

    Returns one (t_sub, 128) f32 array per entry of ``col_ids`` (bit
    patterns preserved -- packed integer columns survive).
    """
    outs = [[] for _ in col_ids]
    full_cols = (
        [table_ref[:, j : j + 1] for j in col_ids]
        if n_rows <= _SWEEP_ROWS
        else None
    )
    win = min(n_rows, _SWEEP_ROWS)
    win_bits = win.bit_length() - 1
    for g in range(t_sub):
        sel = sel_rows[g : g + 1]  # (1, 128)
        bit = [((sel >> k) & 1) > 0 for k in range(win_bits)]
        blk = sel >> win_bits  # winner's window index (1, 128)
        for jj, j in enumerate(col_ids):
            if n_rows > win:
                # Collapse to the winner's ``win``-row window with a
                # bit-preserving select fori over window slices: VMEM
                # intermediates stay O(win), independent of table size.
                nb = n_rows // win

                def wsel(b, t, j=j):
                    base = pl.multiple_of(b * win, win)
                    wcol = table_ref[pl.ds(base, win), j : j + 1]
                    return jnp.where(blk == b, wcol, t)

                t = jax.lax.fori_loop(
                    0, nb, wsel, jnp.zeros((win, 128), jnp.float32)
                )
            else:
                t = full_cols[jj]
            outs[jj].append(_fold_to_row(t, bit))
    return [jnp.concatenate(o, axis=0) for o in outs]


def _bits_i32(w):
    """Bit pattern of ``w`` as int32 (no-op for int32 input -- the MXU
    gather returns packed words as ints to dodge subnormal FTZ)."""
    return w if w.dtype == jnp.int32 else pltpu.bitcast(w, jnp.int32)


def _mat_decode(w1, w2):
    """Decode the 16-bit packed material words (pack_scene encoding):
    w1 = alb_r16 | alb_g16, w2 = alb_b16 | param16. Accepts the words as
    f32 bit patterns (radix gather) or int32 (MXU gather)."""
    w1i = _bits_i32(w1)
    w2i = _bits_i32(w2)
    inv16 = jnp.float32(1.0 / 65535.0)
    albr = ((w1i >> 16) & 0xFFFF).astype(jnp.float32) * inv16
    albg = (w1i & 0xFFFF).astype(jnp.float32) * inv16
    albb = ((w2i >> 16) & 0xFFFF).astype(jnp.float32) * inv16
    param = (w2i & 0xFFFF).astype(jnp.float32) * jnp.float32(1.0 / 4096.0) - 2.0
    return albr, albg, albb, param


def _gather(shade_ref, imin, *, n_pad, t_sub):
    """Winning sphere's 6 shading columns + material decode.

    Returns 8 arrays of shape (t_sub, 128):
    cx, cy, cz, r, alb_r, alb_g, alb_b, param (material words decoded from
    the 16-bit packed columns; see pack_scene).
    """
    cxb, cyb, czb, rb, w1, w2 = _gather_cols(
        shade_ref, range(6), imin, n_rows=n_pad, t_sub=t_sub
    )
    albr, albg, albb, param = _mat_decode(w1, w2)
    return cxb, cyb, czb, rb, albr, albg, albb, param


def _gather_mxu(mxu_ref, sel_rows, *, n_pad, t_sub, n_cols):
    """One-hot MXU gather: bit-exact winner-row fetch on the matrix unit.

    ``mxu_ref`` is the byte-plane table from ``_plane_table``: f32
    (4*n_cols, n_pad) whose row 4c+k holds byte k (value 0..255) of
    ``shade[:, c]``'s f32 bit pattern. Bytes <= 255 are EXACTLY
    representable in bf16, and the one-hot matrix is exact 0/1, so a
    single-pass DEFAULT-precision matmul (bf16 multipliers, f32
    accumulation; only one nonzero product per output) reproduces every
    byte exactly -- no multi-pass precision tax and, unlike raw-bits-as-
    bf16 splits, no operand can encode NaN/Inf. The f32 bit pattern is
    then rebuilt with integer ops. This moves the per-lane gather from
    the (saturated) VPU onto the otherwise-idle MXU; the VPU cost left is
    the one-hot build (compare+select over (n_pad, 128)).

    Returns one (t_sub, 128) f32 array per column, bit patterns preserved
    (same contract as ``_gather_cols``).
    """
    table = mxu_ref[:, :]  # (4*n_cols, n_pad)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
    prods = []
    for g in range(t_sub):
        sel = sel_rows[g : g + 1]  # (1, 128)
        onehot = jnp.where(iota == sel, 1.0, 0.0)  # (n_pad, 128) f32
        pr = jax.lax.dot_general(
            table,
            onehot,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )  # (4*n_cols, 128)
        prods.append(pr)
    cols = []
    c256 = jnp.float32(256.0)
    for c in range(n_cols):
        rows = []
        for g in range(t_sub):
            pr = prods[g]
            p0 = pr[4 * c : 4 * c + 1]
            p1 = pr[4 * c + 1 : 4 * c + 2]
            p2 = pr[4 * c + 2 : 4 * c + 3]
            p3 = pr[4 * c + 3 : 4 * c + 4]
            hi = (p3 * c256 + p2).astype(jnp.int32)
            lo = (p1 * c256 + p0).astype(jnp.int32)
            # Keep the reconstructed word in INT32: packed 16-bit material
            # words can form SUBNORMAL f32 bit patterns (the gray ground
            # sphere's w1 = 0x80008000 is one), and an f32-typed
            # materialization of such a value can be flushed to +-0 by
            # hardware FTZ on an arithmetic move -- zeroing the low 16
            # bits. That flush was the "in-loop albedo corruption" (green
            # channel exactly zero on ground hits) and very likely round
            # 1's unexplained one-hot divergence too. Callers bitcast to
            # f32 only for genuinely-float columns (geometry), whose
            # values are normal-range.
            rows.append((hi << 16) | lo)
        cols.append(jnp.concatenate(rows, axis=0))
    return cols


def _mxu_enabled() -> bool:
    """Static (trace-time) switch for the MXU one-hot gathers
    (default ON; RT_GATHER=radix opts out for A/B).

    Bit-exact on hardware (verified against the radix gather's image hash)
    and measured ~+8% end-to-end on the cover scene plus 127.5 Mrays/s on
    the north-star config. Historical note: one-hot MXU gathers "diverged
    on hardware only" in both round 1 and the first round-2 attempt; the
    root cause (found by forensic byte dumps, scripts/probe_mxu_*.py) was
    NEVER the matmul -- XLA-on-TPU flushes subnormals and canonicalizes
    NaNs in f32 intermediates, so packed 16-bit words whose bit patterns
    happen to encode subnormal/NaN f32 values (gray albedo 0.5 -> w1 =
    0x80008000, dielectric (1,1,1) -> 0xFFFFFFFF) were corrupted on their
    way INTO the plane table. The fix: build byte planes from int32
    words (pack_scene/pack_textures ``with_planes``), never routing
    packed bits through f32-typed ops."""
    return _knob("RT_GATHER", "mxu") != "radix"


def _mxu_gather_cols(n_pad: int, textured: bool) -> int:
    """Static switch: number of shade columns fetched via the MXU one-hot
    gather (0 = keep the VPU radix gather). Applies to the single-level
    (<= _SWEEP_ROWS) closest-hit path."""
    if not _mxu_enabled() or _two_level_enabled(n_pad):
        return 0
    return 10 if textured else 6


def _two_level_mxu(n_pad: int, tri: bool = False) -> bool:
    """Static switch: two-level stage-2 window fetch on the MXU (one-hot
    over windows; default ON, RT_TWO_LEVEL_MXU=0 opts out). Bit-exact vs
    the fori collapse on CPU interpret AND hardware (image-hash A/B)."""
    if not (_mxu_enabled() and _two_level_enabled(n_pad, tri)):
        return False
    return _knob("RT_TWO_LEVEL_MXU", "1") != "0"


def _win_plane_table_int(int_cols, n_pad: int, win: int) -> jnp.ndarray:
    """Window-major byte planes for the stage-2 MXU window fetch: f32
    (4*C*win, n_pad//win) with entry [(c*4 + k)*win + r, w] = byte k of
    column c at scene row w*win + r (int32 sources -- same subnormal/NaN
    rule as _plane_table_int)."""
    n_cols = len(int_cols)
    n_win = n_pad // win
    bits = jnp.stack(int_cols, axis=1)  # (n_pad, C)
    planes = jnp.stack(
        [(bits >> (8 * k)) & 0xFF for k in range(4)], axis=-1
    )  # (n_pad, C, 4)
    t = planes.reshape(n_win, win, n_cols, 4)
    t = t.transpose(2, 3, 1, 0)  # (C, 4, win, n_win)
    return t.reshape(n_cols * 4 * win, n_win).astype(jnp.float32)


def _collapse_window_mxu(win_ref, wid, *, n_win, n_cols, win):
    """Stage-2 window collapse on the MXU: one-hot over the ``n_win``
    windows selects every byte plane of the winner window's ``win`` rows
    in ONE matmul. Returns one (win, 128) int32 WORD tile per column
    (bit patterns of the original f32 columns; callers bitcast
    genuinely-float columns).

    Replaces the select-fori `_collapse_window_blocked` (O(n_blocks)
    VPU folds with materialized lane broadcasts) with (4*C*win, n_win)
    @ (n_win, 128) MXU work. ``win_ref`` may be WIDER than ``n_cols``
    (the triangle win-plane table always carries 14 columns; the classic
    key form reads the 11-column prefix -- column-major plane layout
    makes any prefix read exact).

    VMEM: the product is (4*C*win, 128) f32 = 1.75 MB at C=7 / 2.8 MB at
    C=11 per ray group; Mosaic reuses the buffer across the t_sub group
    loop (hardware-verified: the 11-column triangle path compiles and
    runs at 2048 rows). If a future config trips a scoped-vmem limit,
    shrink RT_WIN (the collapse output scales with win)."""
    table = win_ref[0 : 4 * n_cols * win, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n_win, 1), 0)
    onehot = jnp.where(iota == wid, 1.0, 0.0)  # (n_win, 128)
    prod = jax.lax.dot_general(
        table,
        onehot,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )  # (4*C*win, 128)
    c256 = jnp.float32(256.0)
    out = []
    for c in range(n_cols):
        p0 = prod[(4 * c + 0) * win : (4 * c + 1) * win]
        p1 = prod[(4 * c + 1) * win : (4 * c + 2) * win]
        p2 = prod[(4 * c + 2) * win : (4 * c + 3) * win]
        p3 = prod[(4 * c + 3) * win : (4 * c + 4) * win]
        hi = (p3 * c256 + p2).astype(jnp.int32)
        lo = (p1 * c256 + p0).astype(jnp.int32)
        out.append((hi << 16) | lo)
    return out


def _plane_table(shade: jnp.ndarray, n_cols: int) -> jnp.ndarray:
    """Byte planes from the f32 shade table. PROBE-ONLY (scripts/
    probe_mxu_*.py): production uses ``_plane_table_int`` because packed
    material/texture words can encode subnormal/NaN f32 bit patterns
    that XLA-on-TPU flushes/canonicalizes when the shade table is an f32
    HLO intermediate (see ``_mxu_enabled`` docstring). Safe in the probes
    because there ``shade`` is a concrete input buffer."""
    bits = jax.lax.bitcast_convert_type(shade[:, :n_cols], jnp.int32)
    planes = jnp.stack(
        [(bits >> (8 * k)) & 0xFF for k in range(4)], axis=-1
    )  # (n_pad, n_cols, 4)
    n_pad = shade.shape[0]
    t = planes.reshape(n_pad, 4 * n_cols).T.astype(jnp.float32)
    pad = (-t.shape[0]) % 8
    if pad:
        t = jnp.concatenate(
            [t, jnp.zeros((pad, n_pad), jnp.float32)], axis=0
        )
    return t


def _plane_table_int(int_cols, n_pad: int) -> jnp.ndarray:
    """Byte-plane table from INT32 word columns (the subnormal/NaN-safe
    construction -- see pack_scene's ``with_planes``): f32
    (pad8(4*C), n_pad), row 4c+k = byte k of column c."""
    n_cols = len(int_cols)
    bits = jnp.stack(int_cols, axis=1)  # (n_pad, C) i32
    planes = jnp.stack(
        [(bits >> (8 * k)) & 0xFF for k in range(4)], axis=-1
    )  # (n_pad, C, 4)
    t = planes.reshape(n_pad, 4 * n_cols).T.astype(jnp.float32)
    pad = (-t.shape[0]) % 8
    if pad:
        t = jnp.concatenate(
            [t, jnp.zeros((pad, n_pad), jnp.float32)], axis=0
        )
    return t


def _closest_sphere_two_level(
    geh_ref, gec_ref, shade_ref, rows, *, n_pad, t_sub, textured,
    mxu_win=None, cull=None,
):
    """Two-level closest hit over spheres for scenes past _SWEEP_ROWS rows.

    Round 1's path (global packed-key argmin + per-column radix gather with
    an O(N/window) select-fori collapse) costs O(N) VPU work per gathered
    column and collapses super-linearly past ~2k rows. This version:

      * Stage 1 sweeps every sphere exactly as before (same f32 quadratic,
        ``object.defs.cc:41-66`` semantics) but reduces each ``_WIN``-row
        window to ONE candidate key, packing the window id into the low
        ``log2(n_pad/_WIN)`` key bits -- a per-lane (min key | window).
      * Stage 2 tournament-collapses the 7 needed columns (cx, cy, cz, r,
        cm2, w1, w2; +4 texture words) to the winner window's (WIN, 128)
        per-lane tiles (ONE O(N) fold each), re-runs the identical f32
        quadratic on the 128 collapsed rows with 7-bit row ids, and folds
        the winner's row out of the already-collapsed tiles.

    The stage-2 expressions reuse the stage-1 values bit-for-bit
    (``m2c = -2*c`` is an exact power-of-two multiply, so the collapsed
    centers reproduce geom_c's columns exactly), so the two stages agree on
    every candidate key; closest-hit quantization tightens from
    ``log2(n_pad)`` packed id bits (round 1) to ``log2(n_pad/_WIN) + 7``.

    Returns (hitm, cx, cy, cz, r, alb_r, alb_g, alb_b, param, texcols)
    tiles of shape (t_sub, 128); ``texcols`` is (w3, w4, tinv, w5) when
    ``textured`` else None.
    """
    ox, oy, oz, dx, dy, dz = rows
    a = dx * dx + dy * dy + dz * dz
    d_dot_o = dx * ox + dy * oy + dz * oz
    o_dot_o = ox * ox + oy * oy + oz * oz
    ta = _T_MIN * a

    n_win = n_pad // _WIN
    wbits = _pack_bits(n_win)
    wmask = (1 << wbits) - 1
    win_shift = _WIN.bit_length() - 1
    blk = min(n_pad, _SWEEP_ROWS)
    nwin_blk = blk // _WIN
    n_blocks = n_pad // blk
    nohit_w = jnp.full((1, 128), _f32_bits(_BIGF) & ~wmask, jnp.int32)

    rmask = _WIN - 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (_WIN, 1), 0)
    nohit_r = _f32_bits(_BIGF) & ~rmask
    idx_bits = max((n_pad - 1).bit_length(), win_shift + 1)

    col_list = [
        (shade_ref, 0), (shade_ref, 1), (shade_ref, 2), (shade_ref, 3),
        (gec_ref, 3), (shade_ref, 4), (shade_ref, 5),
    ]
    if textured:
        col_list += [
            (shade_ref, 6), (shade_ref, 7), (shade_ref, 8), (shade_ref, 9)
        ]

    # Stage 1 for ALL ray groups in one block pass: the fori carries a
    # t_sub-tuple of per-group window minima so each block's 7 column
    # loads (dynamic-base pl.ds -> relayout to lane-replicated) are
    # issued ONCE per block instead of once per (group, block).
    def blk_body(bi, kwins):
        base = pl.multiple_of(bi * blk, blk)
        cx = geh_ref[pl.ds(base, blk), 0:1]
        cy = geh_ref[pl.ds(base, blk), 1:2]
        cz = geh_ref[pl.ds(base, blk), 2:3]
        m2cx = gec_ref[pl.ds(base, blk), 0:1]
        m2cy = gec_ref[pl.ds(base, blk), 1:2]
        m2cz = gec_ref[pl.ds(base, blk), 2:3]
        cm2 = gec_ref[pl.ds(base, blk), 3:4]
        out = []
        for g in range(t_sub):
            sl = slice(g, g + 1)
            kwin_g = kwins[g]
            h = cx * dx[sl] + cy * dy[sl] + cz * dz[sl] - d_dot_o[sl]
            cq = (
                cm2 + m2cx * ox[sl] + m2cy * oy[sl] + m2cz * oz[sl]
                + o_dot_o[sl]
            )
            delta = h * h - a[sl] * cq
            sq = jnp.sqrt(delta)
            n1 = h - sq
            n2 = h + sq
            nroot = jnp.where(n1 > ta[sl], n1, n2)
            key = jnp.where(nroot > ta[sl], nroot, _BIGF)
            for j in range(nwin_blk):
                wkey = jnp.min(
                    key[j * _WIN : (j + 1) * _WIN], axis=0, keepdims=True
                )
                ki = (pltpu.bitcast(wkey, jnp.int32) & ~wmask) | (
                    bi * nwin_blk + j
                )
                kwin_g = jnp.minimum(kwin_g, ki)
            out.append(kwin_g)
        return tuple(out)

    if cull is not None:
        pre = _gate_pre(rows, a, d_dot_o, o_dot_o, ta, cull[3])

    def blk_step_all(b, kwins):
        if cull is None:
            return blk_body(b, kwins)
        # Per-block conservative reject (bit-transparent; see _cull_gate).
        return _cull_gate(
            cull, b, rows, pre, t_sub, kwins,
            id_mask=wmask, scaled_key=True, body=blk_body,
        )

    if n_blocks == 1:
        kwins = blk_body(0, tuple(nohit_w for _ in range(t_sub)))
    else:
        kwins = jax.lax.fori_loop(
            0, n_blocks, blk_step_all, tuple(nohit_w for _ in range(t_sub))
        )

    hit_rows = []
    col_rows = [[] for _ in col_list]
    for g in range(t_sub):
        sl = slice(g, g + 1)
        kwin = kwins[g]

        # Stage 2: collapse columns to the winner window, exact re-sweep.
        if mxu_win is not None:
            # One-hot MXU window fetch: int32 word tiles, bit patterns of
            # the original columns (geometry bitcast back below; packed
            # words stay int -- subnormal/NaN rule).
            wid = kwin & wmask
            collapsed = _collapse_window_mxu(
                mxu_win, wid, n_win=n_win, n_cols=len(col_list), win=_WIN
            )
            cxw = pltpu.bitcast(collapsed[0], jnp.float32)
            cyw = pltpu.bitcast(collapsed[1], jnp.float32)
            czw = pltpu.bitcast(collapsed[2], jnp.float32)
            cm2w = pltpu.bitcast(collapsed[4], jnp.float32)
        else:
            start = (kwin & wmask) << win_shift  # absolute first row
            bit = [((start >> k) & 1) > 0 for k in range(idx_bits)]
            collapsed = _collapse_window_blocked(
                col_list, bit, start, n_rows=n_pad
            )
            cxw, cyw, czw, _rw, cm2w, _w1w, _w2w = collapsed[:7]
        h = cxw * dx[sl] + cyw * dy[sl] + czw * dz[sl] - d_dot_o[sl]
        cq = (
            cm2w + (-2.0 * cxw) * ox[sl] + (-2.0 * cyw) * oy[sl]
            + (-2.0 * czw) * oz[sl] + o_dot_o[sl]
        )
        delta = h * h - a[sl] * cq
        sq = jnp.sqrt(delta)
        n1 = h - sq
        n2 = h + sq
        nroot = jnp.where(n1 > ta[sl], n1, n2)
        key = jnp.where(nroot > ta[sl], nroot, _BIGF)
        ki = (pltpu.bitcast(key, jnp.int32) & ~rmask) | row_ids
        kmin = jnp.min(ki, axis=0, keepdims=True)
        hit_rows.append(kmin)  # i1 tiles can't concatenate; compare later
        rbit = [((kmin >> k) & 1) > 0 for k in range(win_shift)]
        for jj, t in enumerate(collapsed):
            col_rows[jj].append(_fold_to_row(t, rbit))

    hitm = jnp.concatenate(hit_rows, axis=0) < nohit_r
    cols = [jnp.concatenate(rws, axis=0) for rws in col_rows]
    if cols[0].dtype == jnp.int32:
        # MXU window-fetch path: geometry columns are raw bits.
        geo = [pltpu.bitcast(c, jnp.float32) for c in cols[:4]]
        cxb, cyb, czb, rb = geo
    else:
        cxb, cyb, czb, rb = cols[0], cols[1], cols[2], cols[3]
    albr, albg, albb, param = _mat_decode(cols[5], cols[6])
    texcols = tuple(cols[7:11]) if textured else None
    return hitm, cxb, cyb, czb, rb, albr, albg, albb, param, texcols


def _tri_key_rows(col, rows, sl):
    """Division-free Moller-Trumbore candidate keys for one (1, 128) ray
    group against a column block: f32 rows of approximate t (``_BIGF`` on
    miss). THE single key formula -- the flat sweep, two-level stage 1 and
    stage 2 all call this, so no pair of paths can desynchronize (they
    duplicated the arithmetic with a "must match" comment before round 3).

    Two forms behind the RT_TRI_FORM trace-time knob (see ``_tri_form``
    for the A/B record; classic won on hardware):

    * classic: h = d x e2, q = s x e1 -- textbook scaled M-T.
    * triple: with the packed plane normal n' = e2 x e1 (pack_triangles
      cols 11-13) and one cross m = s x d (s = o - v0),

          det = d . n'            (= e1 . (d x e2), classic M-T)
          u_raw = m . e2          (= s . (d x e2):  a.(b x c) = (a x b).c)
          v_raw = -(m . e1)       (= d . (s x e1))
          t_raw = -(s . n')       (= e2 . (s x e1))

      replaces BOTH classic crosses with one: ~10% fewer sweep ops and 6
      fewer live (blk, 128) tiles per ray group. Conditioning is
      unchanged (s is formed first, exactly as classic -- deliberately
      NOT the further-reduced m = o x d - v0 x d, whose |o|-scale
      cancellation would poison u/v/t for bounce rays sitting ON the
      mesh). Keys move only at f32 roundoff vs classic (~1e-7 relative;
      0 validity flips in 2e5 random + 5/1.2e5 aimed-near-edge rays) --
      the accepted near-tie class, far inside the cull gate's 1% + 1e-3
      slack.

    Either way the winner's exact hit is recomputed classically in
    ``_tri_exact`` (bitwise-matching the XLA backend).
    """
    ox, oy, oz, dx, dy, dz = rows
    v0x, v0y, v0z = col(0), col(1), col(2)
    e1x, e1y, e1z = col(3), col(4), col(5)
    e2x, e2y, e2z = col(6), col(7), col(8)
    if _tri_form() == "triple":
        nx, ny, nz = col(11), col(12), col(13)
        det = dx[sl] * nx + dy[sl] * ny + dz[sl] * nz
        g_s = jnp.where(det < 0.0, -1.0, 1.0)
        ng_s = -g_s
        dabs = det * g_s
        sx = ox[sl] - v0x
        sy = oy[sl] - v0y
        sz = oz[sl] - v0z
        # m = s x d (per pair; d broadcast over the block rows)
        mx = sy * dz[sl] - sz * dy[sl]
        my = sz * dx[sl] - sx * dz[sl]
        mz = sx * dy[sl] - sy * dx[sl]
        u_s = (mx * e2x + my * e2y + mz * e2z) * g_s
        v_s = (mx * e1x + my * e1y + mz * e1z) * ng_s
        t_s = (sx * nx + sy * ny + sz * nz) * ng_s
    else:
        # h = d x e2 (per pair; d broadcast over the block rows)
        hx = dy[sl] * e2z - dz[sl] * e2y
        hy = dz[sl] * e2x - dx[sl] * e2z
        hz = dx[sl] * e2y - dy[sl] * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        g_s = jnp.where(det < 0.0, -1.0, 1.0)
        dabs = det * g_s
        sx = ox[sl] - v0x
        sy = oy[sl] - v0y
        sz = oz[sl] - v0z
        u_s = (sx * hx + sy * hy + sz * hz) * g_s
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v_s = (dx[sl] * qx + dy[sl] * qy + dz[sl] * qz) * g_s
        t_s = (e2x * qx + e2y * qy + e2z * qz) * g_s
    r = pl.reciprocal(jnp.maximum(dabs, 1e-30), approx=True)
    t_apx = t_s * r
    valid = (
        (dabs > 1e-12)
        & (u_s >= 0.0) & (v_s >= 0.0) & (u_s + v_s <= dabs)
        & (t_apx > _T_MIN) & (t_apx < _BIGF)
    )
    return jnp.where(valid, t_apx, _BIGF)


def _tri_sweep(tri_ref, rows, *, m_pad, t_sub, cull=None, hint=None):
    """Closest-hit Moller-Trumbore over all triangles for a (t_sub, 128)
    ray tile -- the triangle analog of ``_sweep``.

    Division-free valid tests (everything scaled by |det|) via the shared
    ``_tri_key_rows`` formula (RT_TRI_FORM picks the arithmetic form); the
    candidate key's t uses a fast approximate reciprocal (the key is
    already quantized by the id bits; the winner's exact t is recomputed
    in ``_tri_winner``). Padding rows have e1 = e2 = 0 => n' = 0 =>
    det = 0 => never valid.

    ``cull``: optional (ord_ref, bnd_ref, act, kind) per-block conservative
    reject (see _closest_tri_two_level) for multi-block flat sweeps.
    ``hint``: optional (t_sub, 128) f32 per-lane upper bound in t units
    for the gate ONLY (the sphere winner's exact t -- cross-primitive
    seeding, see _cull_gate_box); never folded into the returned keys.

    Returns packed i32 keys (t bits | triangle id), ``_BIGF`` based on miss.
    """
    ox, oy, oz, dx, dy, dz = rows
    pack_mask = (1 << _pack_bits(m_pad)) - 1
    blk = min(m_pad, _SWEEP_ROWS)
    nohit = jnp.full((1, 128), _f32_bits(_BIGF) & ~pack_mask, jnp.int32)
    n_blocks = m_pad // blk
    blk_ids = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)

    # Block-major: load each block's key columns once for all ray groups
    # (see _sweep; 9 classic / 12 triple -- _tri_key_cols).
    def blk_body(bi, kmins):
        base = pl.multiple_of(bi * blk, blk)
        cols = {
            j: tri_ref[pl.ds(base, blk), j : j + 1]
            for j in _tri_key_cols()
        }
        ids = blk_ids + base  # group-loop-invariant (see _sweep)
        out = []
        for g in range(t_sub):
            sl = slice(g, g + 1)
            key = _tri_key_rows(lambda j: cols[j], rows, sl)
            ki = (pltpu.bitcast(key, jnp.int32) & ~pack_mask) | ids
            out.append(
                jnp.minimum(kmins[g], jnp.min(ki, axis=0, keepdims=True))
            )
        return tuple(out)

    a = dx * dx + dy * dy + dz * dz
    d_dot_o = dx * ox + dy * oy + dz * oz
    o_dot_o = ox * ox + oy * oy + oz * oz
    ta = _T_MIN * a

    if cull is not None:
        pre = _gate_pre(rows, a, d_dot_o, o_dot_o, ta, cull[3])

    def blk_step_all(b, kmins):
        if cull is None:
            return blk_body(b, kmins)
        # Per-block conservative reject (_cull_gate; triangle keys are
        # UNSCALED approximate t -> scaled_key=False margin regime).
        return _cull_gate(
            cull, b, rows, pre, t_sub, kmins,
            id_mask=pack_mask, scaled_key=False, body=blk_body, hint=hint,
        )

    init = tuple(nohit for _ in range(t_sub))
    if n_blocks == 1:
        kmins = blk_body(0, init)
    else:
        kmins = jax.lax.fori_loop(0, n_blocks, blk_step_all, init)
    return jnp.concatenate(list(kmins), axis=0)


def _closest_tri_two_level(
    tri_ref, rows, *, m_pad, t_sub, mxu_win=None, cull=None, hint=None
):
    """Two-level Moller-Trumbore closest hit for meshes past _SWEEP_ROWS
    triangles -- the triangle analog of ``_closest_sphere_two_level``.

    Stage 1 runs the division-free candidate test over every triangle
    (``_tri_key_rows`` -- the same code the flat sweep runs) but packs only
    a per-``_WIN`` window minimum (approx-t key | window id). Stage 2
    tournament-collapses the key columns (the 11 ``_tri_exact`` cols, plus
    the n' normal when RT_TRI_FORM=triple re-keys with it) to the winner
    window's per-lane (WIN, 128) tiles, recomputes the identical candidate
    keys there with 7-bit row ids, folds the winner's row out of the
    collapsed tiles, and hands it to the exact f32 re-test
    (``_tri_exact``). Replaces the per-column O(M) gather fori that
    collapsed super-linearly on large meshes.

    Returns what ``_tri_winner`` returns.
    """
    ox, oy, oz, dx, dy, dz = rows
    n_win = m_pad // _WIN
    wbits = _pack_bits(n_win)
    wmask = (1 << wbits) - 1
    win_shift = _WIN.bit_length() - 1
    # Smaller stage-1 blocks than the sphere path: Moller-Trumbore's
    # per-group live set is ~2x the quadratic's, and the block-major loop
    # (all 8 ray groups per block) exceeded the 16 MB scoped-vmem limit at
    # 512-row blocks (18.6 MB measured on the 2048-tri mesh kernel).
    blk = _tri_blk(m_pad)
    nwin_blk = blk // _WIN
    n_blocks = m_pad // blk
    nohit_w = jnp.full((1, 128), _f32_bits(_BIGF) & ~wmask, jnp.int32)
    rmask = _WIN - 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (_WIN, 1), 0)
    nohit_r = _f32_bits(_BIGF) & ~rmask
    idx_bits = max((m_pad - 1).bit_length(), win_shift + 1)

    # Stage 1 for ALL ray groups per block pass (one set of column loads
    # per block -- see _closest_sphere_two_level's blk_step_all).
    def blk_body(bi, kwins):
        base = pl.multiple_of(bi * blk, blk)
        cols = {
            j: tri_ref[pl.ds(base, blk), j : j + 1]
            for j in _tri_key_cols()
        }
        out = []
        for g in range(t_sub):
            sl = slice(g, g + 1)
            kwin_g = kwins[g]
            key = _tri_key_rows(lambda j: cols[j], rows, sl)
            for j in range(nwin_blk):
                wkey = jnp.min(
                    key[j * _WIN : (j + 1) * _WIN], axis=0, keepdims=True
                )
                ki = (pltpu.bitcast(wkey, jnp.int32) & ~wmask) | (
                    bi * nwin_blk + j
                )
                kwin_g = jnp.minimum(kwin_g, ki)
            out.append(kwin_g)
        return tuple(out)

    ox_, oy_, oz_ = ox, oy, oz
    a = dx * dx + dy * dy + dz * dz
    d_dot_o = dx * ox_ + dy * oy_ + dz * oz_
    o_dot_o = ox_ * ox_ + oy_ * oy_ + oz_ * oz_
    ta = _T_MIN * a

    if cull is not None:
        pre = _gate_pre(rows, a, d_dot_o, o_dot_o, ta, cull[3])

    def blk_step_all(b, kwins):
        if cull is None:
            return blk_body(b, kwins)
        # Per-block conservative reject (_cull_gate; UNSCALED approx-t
        # keys -> scaled_key=False margin regime; hint = sphere winner's
        # exact t, gate-only -- see _tri_sweep).
        return _cull_gate(
            cull, b, rows, pre, t_sub, kwins,
            id_mask=wmask, scaled_key=False, body=blk_body, hint=hint,
        )

    if n_blocks == 1:
        kwins = blk_body(0, tuple(nohit_w for _ in range(t_sub)))
    else:
        kwins = jax.lax.fori_loop(
            0, n_blocks, blk_step_all, tuple(nohit_w for _ in range(t_sub))
        )

    hit_rows = []
    col_rows = [[] for _ in range(11)]
    for g in range(t_sub):
        sl = slice(g, g + 1)
        kwin = kwins[g]

        kc = _tri_key_ncols()  # 11 classic / 14 triple (n' for the re-key)
        if mxu_win is not None:
            wid = kwin & wmask
            words = _collapse_window_mxu(
                mxu_win, wid, n_win=n_win, n_cols=kc, win=_WIN
            )
            # Geometry (v0/e1/e2) and n' are genuine floats; material
            # words stay int32 (subnormal/NaN rule -- _tri_exact accepts
            # both).
            collapsed = (
                [pltpu.bitcast(w, jnp.float32) for w in words[:9]]
                + words[9:11]
                + [pltpu.bitcast(w, jnp.float32) for w in words[11:]]
            )
        else:
            start = (kwin & wmask) << win_shift
            bit = [((start >> k) & 1) > 0 for k in range(idx_bits)]
            collapsed = _collapse_window_blocked(
                [(tri_ref, c) for c in range(kc)], bit, start, n_rows=m_pad
            )
        key = _tri_key_rows(lambda j: collapsed[j], rows, sl)
        ki = (pltpu.bitcast(key, jnp.int32) & ~rmask) | row_ids
        kmin = jnp.min(ki, axis=0, keepdims=True)
        hit_rows.append(kmin)  # i1 tiles can't concatenate; compare later
        rbit = [((kmin >> k) & 1) > 0 for k in range(win_shift)]
        # Only the 11 _tri_exact columns fold to the winner row (n' is
        # re-key-only; the exact re-test recomputes the true normal).
        for jj in range(11):
            col_rows[jj].append(_fold_to_row(collapsed[jj], rbit))

    hitk = jnp.concatenate(hit_rows, axis=0) < nohit_r
    cols = [jnp.concatenate(rws, axis=0) for rws in col_rows]
    return _tri_exact(cols, hitk, rows)


def _tri_winner(tri_ref, kmin, rows, *, m_pad, t_sub, mxu_ref=None):
    """Gather the winning triangle's 11 columns and redo Moller-Trumbore
    exactly (f32 divide) -- the id-packed key's quantized t never reaches
    the image. Returns (hit, t, p, outward unit normal, albedo rgb, param).

    With ``mxu_ref`` (the pack_triangles ``with_planes`` byte-plane table)
    the fetch runs as a one-hot matmul on the otherwise-idle MXU instead of
    11 VPU radix folds -- bit-exact (same construction as the sphere
    ``_gather_mxu``; geometry columns bitcast back to f32, packed material
    words stay int32 per the subnormal/NaN rule).
    """
    pack_mask = (1 << _pack_bits(m_pad)) - 1
    nohit_key = _f32_bits(_BIGF) & ~pack_mask
    hitk = kmin < nohit_key
    imin = kmin & pack_mask
    if mxu_ref is not None:
        words = _gather_mxu(
            mxu_ref, imin, n_pad=m_pad, t_sub=t_sub, n_cols=11
        )
        cols = [pltpu.bitcast(w, jnp.float32) for w in words[:9]] + words[9:]
    else:
        cols = _gather_cols(
            tri_ref, range(11), imin, n_rows=m_pad, t_sub=t_sub
        )
    return _tri_exact(cols, hitk, rows)


def _tri_exact(cols, hitk, rows):
    """Exact Moller-Trumbore on the winner's 11 fetched columns
    (t_sub, 128 tiles); shared by the flat and two-level triangle paths."""
    ox, oy, oz, dx, dy, dz = rows
    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, w1, w2) = cols
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    det = e1x * hx + e1y * hy + e1z * hz
    inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u = (sx * hx + sy * hy + sz * hz) * inv
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    hit = (
        hitk & (jnp.abs(det) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > _T_MIN)
    )
    t_safe = jnp.where(hit, t, 0.0)
    px = ox + t_safe * dx
    py = oy + t_safe * dy
    pz = oz + t_safe * dz
    # Outward geometric normal = normalize(e1 x e2).
    gx = e1y * e2z - e1z * e2y
    gy = e1z * e2x - e1x * e2z
    gz = e1x * e2y - e1y * e2x
    inv_g = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-30))
    # Material words: same 16-bit packing as the sphere shade table
    # (arrive as f32 bit patterns from the radix path or int32 from the
    # MXU window fetch).
    w1i = _bits_i32(w1)
    w2i = _bits_i32(w2)
    inv16 = jnp.float32(1.0 / 65535.0)
    albr = ((w1i >> 16) & 0xFFFF).astype(jnp.float32) * inv16
    albg = (w1i & 0xFFFF).astype(jnp.float32) * inv16
    albb = ((w2i >> 16) & 0xFFFF).astype(jnp.float32) * inv16
    param = (w2i & 0xFFFF).astype(jnp.float32) * jnp.float32(1.0 / 4096.0) - 2.0
    return (
        hit, t_safe, (px, py, pz), (gx * inv_g, gy * inv_g, gz * inv_g),
        (albr, albg, albb), param,
    )


def _textured_albedo(tex, texcols, p, outward_n, base_rgb, *, t_sub):
    """Checker / image albedo override (ops/texture.py semantics).

    ``texcols`` are the winner's 4 texture words (w3, w4, tinv, w5) of the
    widened shade table (see pack_scene), already fetched by the caller's
    gather path. Then:
      * checker: parity of floor(inv_scale * p) summed over xyz picks the
        odd color (sampled at the 3D hit point);
      * image: sphere UV from the outward unit normal (shared polynomial
        atan2/acos -- ops/texture.py), nearest texel from the pack_textures
        table via a second radix-select gather over texel rows.
    Non-textured lanes keep ``base_rgb``.
    """
    from .. import texture as rtexture

    tex_ref, kh, kw, tex_rows, tex_mxu_ref = tex
    px, py, pz = p
    onx, ony, onz = outward_n
    albr, albg, albb = base_rgb
    inv16 = jnp.float32(1.0 / 65535.0)

    w3, w4, tinv, w5 = texcols
    w3i = _bits_i32(w3)
    w4i = _bits_i32(w4)
    w5i = _bits_i32(w5)
    if tinv.dtype == jnp.int32:
        # MXU-gather path returns raw bits; the checker inverse scale is a
        # genuine (normal-range) float value.
        tinv = pltpu.bitcast(tinv, jnp.float32)
    alb2r = ((w3i >> 16) & 0xFFFF).astype(jnp.float32) * inv16
    alb2g = (w3i & 0xFFFF).astype(jnp.float32) * inv16
    alb2b = ((w4i >> 16) & 0xFFFF).astype(jnp.float32) * inv16
    tmeta = w4i & 0xFFFF
    tkind = tmeta & 3
    tid = tmeta >> 2

    # Checker parity at the hit point (exact for |sum| < 2^23).
    s = (
        jnp.floor(tinv * px) + jnp.floor(tinv * py) + jnp.floor(tinv * pz)
    )
    half = s * 0.5
    odd = (tkind == 1) & (half != jnp.floor(half))
    albr = jnp.where(odd, alb2r, albr)
    albg = jnp.where(odd, alb2g, albg)
    albb = jnp.where(odd, alb2b, albb)

    # Image texel: UV -> row in the texel table -> radix gather.
    twf = ((w5i >> 16) & 0xFFFF).astype(jnp.float32)
    thf = (w5i & 0xFFFF).astype(jnp.float32)
    u = (rtexture.atan2(-onz, onx) + rtexture._PI) * jnp.float32(
        1.0 / rtexture.TWO_PI
    )
    v = rtexture.acos(-ony) * jnp.float32(1.0 / rtexture._PI)
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    col = jnp.maximum(jnp.minimum(jnp.floor(u * twf), twf - 1.0), 0.0)
    rowf = jnp.maximum(
        jnp.minimum(jnp.floor((1.0 - v) * thf), thf - 1.0), 0.0
    )
    trow = (
        tid * jnp.int32(kh * kw)
        + rowf.astype(jnp.int32) * jnp.int32(kw)
        + col.astype(jnp.int32)
    )
    if tex_mxu_ref is not None:
        # Texel fetch on the MXU (bit-exact one-hot byte planes) -- the
        # texel table is usually the LARGEST gather domain in a textured
        # scene (thousands of rows), so this is where the VPU radix fold
        # hurt most.
        ta, tb = _gather_mxu(
            tex_mxu_ref, trow, n_pad=tex_rows, t_sub=t_sub, n_cols=2
        )
    else:
        ta, tb = _gather_cols(
            tex_ref, (0, 1), trow, n_rows=tex_rows, t_sub=t_sub
        )
    tai = _bits_i32(ta)
    tbi = _bits_i32(tb)
    texr = ((tai >> 16) & 0xFFFF).astype(jnp.float32) * inv16
    texg = (tai & 0xFFFF).astype(jnp.float32) * inv16
    texb = ((tbi >> 16) & 0xFFFF).astype(jnp.float32) * inv16
    is_img = tkind == 2
    albr = jnp.where(is_img, texr, albr)
    albg = jnp.where(is_img, texg, albg)
    albb = jnp.where(is_img, texb, albb)
    return albr, albg, albb


def _bounce_core(
    refs, rows, uniforms, *, n_pad, t_sub, tex=None, tris=None, mxu=None,
    sph_cull=None,
):
    """One intersection + shading step for a (t_sub, 128) ray tile.

    Args:
      refs: (geh_ref, gec_ref, shade_ref).
      rows: ray state (ox, oy, oz, dx, dy, dz).
      uniforms: three U[0,1) draws (unit-sphere z/azimuth, Schlick).
      tex: None for untextured scenes (compiles to the round-1 program), or
        ``(tex_ref, kh, kw, tex_rows)``: the pack_textures texel table and
        its static plane dims -- enables the checker/image albedo path
        (ops/texture.py semantics, same formulas).
      tris: None for sphere-only scenes, or ``(tri_ref, m_pad)``: the
        pack_triangles table -- enables the Moller-Trumbore sweep merged
        into the closest hit.

    Returns dict with: hitm (bool), new ray origin/direction rows, attenuation
    rgb, scat_ok (bool: hit ray survives the scatter), sky rgb (unweighted
    background for this direction).
    """
    geh_ref, gec_ref, shade_ref = refs
    ox, oy, oz, dx, dy, dz = rows
    u1, u2, u3 = uniforms

    a = dx * dx + dy * dy + dz * dz
    d_dot_o = dx * ox + dy * oy + dz * oz

    if _two_level_enabled(n_pad):
        # Large scenes: two-level sweep (window prefilter + exact re-sweep
        # of collapsed winner windows) -- O(N) work once, not per column.
        # With mxu, the ref carries the window-major plane table.
        (hitm, cxb, cyb, czb, rb, albr, albg, albb, param, texcols) = (
            _closest_sphere_two_level(
                geh_ref, gec_ref, shade_ref, rows,
                n_pad=n_pad, t_sub=t_sub, textured=tex is not None,
                mxu_win=mxu[0] if mxu is not None else None,
                cull=sph_cull,
            )
        )
    else:
        pack_mask = (1 << _pack_bits(n_pad)) - 1
        kmin = _sweep(
            geh_ref, gec_ref, rows, n_pad=n_pad, t_sub=t_sub, cull=sph_cull
        )
        nohit_key = _f32_bits(_BIGF) & ~pack_mask
        hitm = kmin < nohit_key
        imin = kmin & pack_mask
        if mxu is not None:
            mxu_ref, n_cols = mxu
            cols = _gather_mxu(
                mxu_ref, imin, n_pad=n_pad, t_sub=t_sub, n_cols=n_cols
            )
            # Geometry columns hold genuine normal-range floats: bitcast
            # back. Packed words (materials, textures) stay int32.
            cxb = pltpu.bitcast(cols[0], jnp.float32)
            cyb = pltpu.bitcast(cols[1], jnp.float32)
            czb = pltpu.bitcast(cols[2], jnp.float32)
            rb = pltpu.bitcast(cols[3], jnp.float32)
            albr, albg, albb, param = _mat_decode(cols[4], cols[5])
            if tex is not None:
                texcols = tuple(cols[6:10])
        else:
            cxb, cyb, czb, rb, albr, albg, albb, param = _gather(
                shade_ref, imin, n_pad=n_pad, t_sub=t_sub
            )
            if tex is not None:
                texcols = tuple(
                    _gather_cols(
                        shade_ref, (6, 7, 8, 9), imin, n_rows=n_pad,
                        t_sub=t_sub,
                    )
                )

    # Exact winner root, recomputed per ray (the swept key lost
    # _pack_bits mantissa bits to the id packing).
    hq = cxb * dx + cyb * dy + czb * dz - d_dot_o
    ocx = ox - cxb
    ocy = oy - cyb
    ocz = oz - czb
    cqw = ocx * ocx + ocy * ocy + ocz * ocz - rb * rb
    deltaw = jnp.maximum(hq * hq - a * cqw, 0.0)
    sqw = jnp.sqrt(deltaw)
    inv_a = 1.0 / a
    t1 = (hq - sqw) * inv_a
    t2 = (hq + sqw) * inv_a
    t = jnp.where(t1 > _T_MIN, t1, t2)
    t_safe = jnp.where(hitm, t, 0.0)

    # Hit point + front-face-corrected unit normal (object.defs.cc:11-18).
    invrb = jnp.where(rb > 0.0, 1.0 / jnp.maximum(rb, 1e-30), 0.0)
    px = ox + t_safe * dx
    py = oy + t_safe * dy
    pz = oz + t_safe * dz
    onx = (px - cxb) * invrb  # outward normal (pre-flip; texture UV basis)
    ony = (py - cyb) * invrb
    onz = (pz - czb) * invrb

    if tex is not None:
        # Textures apply to sphere winners only (a triangle winner below
        # overwrites the albedo anyway; triangles are solid-color).
        albr, albg, albb = _textured_albedo(
            tex, texcols, (px, py, pz), (onx, ony, onz),
            (albr, albg, albb), t_sub=t_sub,
        )

    if tris is not None:
        # Closest hit over BOTH primitive families: sweep the triangle
        # table, recompute the winner's exact t, take the per-lane min
        # against the sphere winner's exact t.
        # tri_mxu carries the window-major plane table (two-level path) or
        # the flat byte-plane table (<= _SWEEP_ROWS meshes); the static
        # _two_level_enabled branch picks the matching fetch.
        # The sphere winner's exact t doubles as a cull-gate HINT
        # (cross-primitive seeding): the merge below keeps a triangle
        # only at t_t STRICTLY under this same value, so blocks whose
        # whole margined window sits past it can never change the image
        # -- lanes that hit a closer sphere stop voting mesh blocks open.
        tri_ref, m_pad, tri_mxu, tri_cull = tris
        t_sph = jnp.where(hitm, t_safe, _BIGF)
        hint = t_sph if (tri_cull is not None and _cull_hint()) else None
        if _two_level_enabled(m_pad, tri=True):
            hit_t, t_t, tp, tn, ta, tparam = _closest_tri_two_level(
                tri_ref, rows, m_pad=m_pad, t_sub=t_sub, mxu_win=tri_mxu,
                cull=tri_cull, hint=hint,
            )
        else:
            kmin_t = _tri_sweep(
                tri_ref, rows, m_pad=m_pad, t_sub=t_sub, cull=tri_cull,
                hint=hint,
            )
            hit_t, t_t, tp, tn, ta, tparam = _tri_winner(
                tri_ref, kmin_t, rows, m_pad=m_pad, t_sub=t_sub,
                mxu_ref=tri_mxu,
            )
        pick = hit_t & ((~hitm) | (t_t < t_sph))
        hitm = hitm | hit_t
        px = jnp.where(pick, tp[0], px)
        py = jnp.where(pick, tp[1], py)
        pz = jnp.where(pick, tp[2], pz)
        onx = jnp.where(pick, tn[0], onx)
        ony = jnp.where(pick, tn[1], ony)
        onz = jnp.where(pick, tn[2], onz)
        albr = jnp.where(pick, ta[0], albr)
        albg = jnp.where(pick, ta[1], albg)
        albb = jnp.where(pick, ta[2], albb)
        param = jnp.where(pick, tparam, param)

    d_dot_n = dx * onx + dy * ony + dz * onz
    front = d_dot_n < 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    nx = onx * sgn
    ny = ony * sgn
    nz = onz * sgn

    # Sky on miss (core.cc:254-256).
    inv_len_d = jax.lax.rsqrt(a)
    sky_t = 0.5 * (dy * inv_len_d + 1.0)
    sky_r = 1.0 - sky_t + sky_t * 0.5
    sky_g = 1.0 - sky_t + sky_t * 0.7
    sky_b = jnp.ones_like(sky_t)  # 1-t + t*1.0

    # Uniform unit-sphere direction: z = 2u-1, azimuth 2*pi*v.
    uz = 2.0 * u1 - 1.0
    us = jnp.sqrt(jnp.maximum(1.0 - uz * uz, 0.0))
    theta = _TWO_PI * u2
    ux = us * jnp.cos(theta)
    uy = us * jnp.sin(theta)

    # --- Lambertian (material.defs.cc:31-42) ------------------------------
    ldx = nx + ux
    ldy = ny + uy
    ldz = nz + uz
    tiny = (
        (jnp.abs(ldx) < 1e-8) & (jnp.abs(ldy) < 1e-8) & (jnp.abs(ldz) < 1e-8)
    )
    ldx = jnp.where(tiny, nx, ldx)
    ldy = jnp.where(tiny, ny, ldy)
    ldz = jnp.where(tiny, nz, ldz)

    # --- Metallic (material.defs.cc:44-55); param = fuzz ------------------
    two_ddn = 2.0 * d_dot_n * sgn  # d.n with the corrected normal
    rfx = dx - two_ddn * nx
    rfy = dy - two_ddn * ny
    rfz = dz - two_ddn * nz
    inv_rf = jax.lax.rsqrt(
        jnp.maximum(rfx * rfx + rfy * rfy + rfz * rfz, 1e-20)
    )
    mdx = rfx * inv_rf + param * ux
    mdy = rfy * inv_rf + param * uy
    mdz = rfz * inv_rf + param * uz
    met_ok = (mdx * nx + mdy * ny + mdz * nz) > 0.0

    # --- Dielectric (material.defs.cc:57-87); param = 4 + ior -------------
    iorb = param - 4.0
    eta = jnp.where(front, 1.0 / iorb, iorb)
    udx = dx * inv_len_d
    udy = dy * inv_len_d
    udz = dz * inv_len_d
    cos_t = jnp.minimum(-(udx * nx + udy * ny + udz * nz), 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    cannot = (eta * sin_t) > 1.0
    r0 = (1.0 - eta) / (1.0 + eta)
    r0 = r0 * r0
    omc = 1.0 - cos_t
    omc2 = omc * omc
    schlick = r0 + (1.0 - r0) * omc2 * omc2 * omc
    choose_reflect = cannot | (schlick > u3)
    two_udn = 2.0 * (udx * nx + udy * ny + udz * nz)
    rdx = udx - two_udn * nx
    rdy = udy - two_udn * ny
    rdz = udz - two_udn * nz
    ppx = eta * (udx + cos_t * nx)
    ppy = eta * (udy + cos_t * ny)
    ppz = eta * (udz + cos_t * nz)
    k = 1.0 - (ppx * ppx + ppy * ppy + ppz * ppz)
    par = -jnp.sqrt(jnp.abs(k))
    tdx = ppx + par * nx
    tdy = ppy + par * ny
    tdz = ppz + par * nz
    ddx = jnp.where(choose_reflect, rdx, tdx)
    ddy = jnp.where(choose_reflect, rdy, tdy)
    ddz = jnp.where(choose_reflect, rdz, tdz)

    # --- blend by material kind (material.defs.cc:92-108) -----------------
    is_lam = param < -0.5
    is_diel = param > 2.5
    is_met = ~is_lam & ~is_diel
    ndx = jnp.where(is_lam, ldx, jnp.where(is_diel, ddx, mdx))
    ndy = jnp.where(is_lam, ldy, jnp.where(is_diel, ddy, mdy))
    ndz = jnp.where(is_lam, ldz, jnp.where(is_diel, ddz, mdz))
    scat_ok = hitm & ~(is_met & ~met_ok)
    atr = jnp.where(is_diel, 1.0, albr)
    atg = jnp.where(is_diel, 1.0, albg)
    atb = jnp.where(is_diel, 1.0, albb)

    # Restart offset along the side of the new direction (anti-acne,
    # models/integrator.py SELF_HIT_OFFSET).
    side = jnp.where((ndx * nx + ndy * ny + ndz * nz) >= 0.0, 1.0, -1.0)
    eps = _SELF_HIT_OFFSET * side
    return dict(
        hitm=hitm,
        scat_ok=scat_ok,
        new_o=(px + eps * nx, py + eps * ny, pz + eps * nz),
        new_d=(ndx, ndy, ndz),
        atten=(atr, atg, atb),
        sky=(sky_r, sky_g, sky_b),
    )


def _slot_pixels(meta_ref, tile_shape, *, pixel_order):
    """Slot -> (slot_i, pxf, pyf) map for this program's tile
    (see runtime/tiling.py). ``slot_i`` is the ABSOLUTE slot id per lane
    (also the RNG stream coordinate).

    Tiled order uses integer bit arithmetic for every power-of-two factor
    (tile size 1024, tile width 32) and f32 only for the small
    tile-id / tiles-per-row division -- exact up to 2^23 TILES (8.5G slots).
    Linear order divides the raw slot id in f32: exact below 2^23 slots
    (guarded in the host wrapper).
    """
    map_param = meta_ref[3].astype(jnp.float32)  # width | tiles_per_row
    off_i = (
        jax.lax.broadcasted_iota(jnp.int32, tile_shape, 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, tile_shape, 1)
        + pl.program_id(0) * (tile_shape[0] * 128)
    )
    slot_i = meta_ref[4] + off_i
    if pixel_order == "tiled":
        # runtime/tiling.py mapping (TILE_W = TILE_H = 32).
        tile_id = slot_i >> 10
        within = slot_i & 1023
        wy = (within >> 5).astype(jnp.float32)
        wx = (within & 31).astype(jnp.float32)
        tid_f = tile_id.astype(jnp.float32)  # exact: tile_id < 2^23
        ty = jnp.floor((tid_f + 0.5) / map_param)
        tx = tid_f - ty * map_param
        pxf = tx * 32.0 + wx
        pyf = ty * 32.0 + wy
    else:
        slot = slot_i.astype(jnp.float32)
        pyf = jnp.floor((slot + 0.5) / map_param)
        pxf = slot - pyf * map_param
    return slot_i, pxf, pyf


def _camera_rays(cam_ref, pxf, pyf, j1, j2, u3, u4):
    """Batched thin-lens ``get_ray`` (ray.tracer.core.cc:218-234)."""
    dr = jnp.sqrt(u3)
    dth = _TWO_PI * u4
    lens_u = dr * jnp.cos(dth)
    lens_v = dr * jnp.sin(dth)
    use_disk = cam_ref[18] > 0.0  # defocus_angle (core.cc:228)
    lens_u = jnp.where(use_disk, lens_u, 0.0)
    lens_v = jnp.where(use_disk, lens_v, 0.0)
    fx = pxf + j1 - 0.5
    fy = pyf + j2 - 0.5
    ox = cam_ref[9] + lens_u * cam_ref[12] + lens_v * cam_ref[15]
    oy = cam_ref[10] + lens_u * cam_ref[13] + lens_v * cam_ref[16]
    oz = cam_ref[11] + lens_u * cam_ref[14] + lens_v * cam_ref[17]
    dx = cam_ref[0] + fx * cam_ref[3] + fy * cam_ref[6] - ox
    dy = cam_ref[1] + fx * cam_ref[4] + fy * cam_ref[7] - oy
    dz = cam_ref[2] + fx * cam_ref[5] + fy * cam_ref[8] - oz
    return ox, oy, oz, dx, dy, dz


# ---------------------------------------------------------------------------
# Regeneration megakernel: pixels in, per-pixel radiance sums out
# ---------------------------------------------------------------------------


def _regen_kernel(
    meta_ref,      # SMEM i32[8]
    cam_ref,       # SMEM f32[20]
    done_ref,      # VMEM i32[t_sub, 128]: per-slot samples ALREADY done
    geh_ref,       # VMEM f32[N_pad, 8]
    gec_ref,       # VMEM f32[N_pad, 8]
    shade_ref,     # VMEM f32[N_pad, 8|16]
    *rest,         # [mxu_ref][sph_ord sph_bnd][tex_ref][tri_ref]
                   # [tri_ord tri_bnd] rad_ref, stats_ref, dout_ref
    n_pad: int,
    tile_shape: tuple[int, int],
    pixel_order: str,
    tex_plane: tuple[int, int, int] | None = None,
    tri_pad: int | None = None,
    mxu_cols: int = 0,
    tex_mxu: bool = False,
    tri_mxu: bool = False,
    sph_cull: bool | str = False,   # False | 'sphere' | 'box' (bound kind)
    tri_cull: bool | str = False,
):
    rest = list(rest)
    mxu = (rest.pop(0), mxu_cols) if mxu_cols else None
    sph_bnd = (rest.pop(0), rest.pop(0)) if sph_cull else None
    tex = None
    if tex_plane is not None:
        tref = rest.pop(0)
        tmxu = rest.pop(0) if tex_mxu else None
        tex = (tref, *tex_plane, tmxu)
    tris = None
    if tri_pad is not None:
        tref2 = rest.pop(0)
        tw = rest.pop(0) if tri_mxu else None
        tbnd = (rest.pop(0), rest.pop(0)) if tri_cull else None
        tris = (tref2, tri_pad, tw, tbnd)
    rad_ref, stats_ref, dout_ref = rest
    spp = meta_ref[5]        # ABSOLUTE per-slot sample budget (cap)
    t_end = meta_ref[2]      # this wave's guaranteed min-done target
    max_depth = meta_ref[6]
    seed = meta_ref[1]
    sample_start = meta_ref[7]
    t_sub = tile_shape[0]

    refs = (geh_ref, gec_ref, shade_ref)

    slot_i, pxf, pyf = _slot_pixels(
        meta_ref, tile_shape, pixel_order=pixel_order
    )

    zero = jnp.zeros(tile_shape, jnp.float32)
    one = zero + 1.0
    zero_i = jnp.zeros(tile_shape, jnp.int32)

    # RNG stream coordinates: (absolute slot, absolute sample, bounce, draw).
    seed_h = _fmix32(seed + jnp.int32(_GOLD))
    slot_h = slot_i * jnp.int32(-1640531535) + seed_h  # 0x9E3779B1 (odd)

    def cam_draws(sample_v):
        # Camera-ray draws for per-lane absolute sample ids (draw slots 3-6;
        # the bounce coordinate does not apply to camera rays).
        return tuple(
            _uniform01_keyed(slot_h, sample_v, zero_i, j) for j in (3, 4, 5, 6)
        )

    # Work-ahead regen (round 3): ``done`` is the ABSOLUTE per-slot count
    # of completed samples (carried across waves by the renderer). The
    # wave exits when every lane has completed at least ``t_end`` samples;
    # lanes that get there early keep tracing their OWN slot's next
    # samples up to the ``spp`` cap instead of going stale -- the
    # straggler tail is then paid ONCE at the end-of-budget wave, not per
    # wave. Exactness: a lane can exit mid-path on its open sample, but
    # radiance lands only at path TERMINATION (sky on miss), so an open
    # sample has contributed nothing; the next wave re-traces it from its
    # camera ray, drawing bit-identical numbers (absolute (slot, sample,
    # bounce) RNG keys). done0 = 0 with t_end = spp reproduces the
    # pre-work-ahead program exactly.
    done0 = done_ref[:, :]
    s0 = zero_i + sample_start
    u = cam_draws(s0 + done0)
    o0 = _camera_rays(cam_ref, pxf, pyf, u[0], u[1], u[2], u[3])

    state = (
        *o0,                    # ox..dz
        one, one, one,          # throughput rgb
        zero, zero, zero,       # radiance rgb
        zero_i,                 # bounce depth of the current path
        done0,                  # samples completed (absolute)
        jnp.int32(0),           # segments traced
    )

    def cond(state):
        done = state[13]
        # max_depth <= 0 -> black without tracing (core.cc:238-240).
        return (max_depth > 0) & (jnp.min(done) < t_end)

    def body(state):
        (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, rr, rg, rb,
         depth, done, segments) = state
        active = done < spp

        # Scatter draws for this (sample, bounce) coordinate (slots 0-2).
        sample_v = s0 + done
        u1 = _uniform01_keyed(slot_h, sample_v, depth, 0)
        u2 = _uniform01_keyed(slot_h, sample_v, depth, 1)
        u3 = _uniform01_keyed(slot_h, sample_v, depth, 2)
        # Cull tuples carry this iteration's active-lane mask: lanes done
        # with every sample keep tracing a stale ray (the wave runs until
        # ALL lanes finish) and must not force blocks others culled.
        sc = (*sph_bnd, active, sph_cull) if sph_bnd is not None else None
        trs = tris
        if tris is not None:
            trs = (
                tris[0], tris[1], tris[2],
                (*tris[3], active, tri_cull) if tris[3] is not None else None,
            )
        out = _bounce_core(
            refs, (ox, oy, oz, dx, dy, dz), (u1, u2, u3),
            n_pad=n_pad, t_sub=t_sub, tex=tex, tris=trs, mxu=mxu,
            sph_cull=sc,
        )
        hitm = out["hitm"]

        # Escaped rays collect throughput * sky exactly once.
        miss = active & ~hitm
        sky_r, sky_g, sky_b = out["sky"]
        missf = jnp.where(miss, 1.0, 0.0)
        rr = rr + missf * tpr * sky_r
        rg = rg + missf * tpg * sky_g
        rb = rb + missf * tpb * sky_b

        depth1 = depth + 1
        survives = active & out["scat_ok"] & (depth1 < max_depth)
        died = active & ~survives
        done = done + died.astype(jnp.int32)
        regen = died & (done < spp)

        j1, j2, c3, c4 = cam_draws(s0 + done)  # the NEXT sample's camera ray
        cx, cy, cz, cdx, cdy, cdz = _camera_rays(
            cam_ref, pxf, pyf, j1, j2, c3, c4
        )
        nox, noy, noz = out["new_o"]
        ndx, ndy, ndz = out["new_d"]
        atr, atg, atb = out["atten"]

        ox = jnp.where(survives, nox, jnp.where(regen, cx, ox))
        oy = jnp.where(survives, noy, jnp.where(regen, cy, oy))
        oz = jnp.where(survives, noz, jnp.where(regen, cz, oz))
        dx = jnp.where(survives, ndx, jnp.where(regen, cdx, dx))
        dy = jnp.where(survives, ndy, jnp.where(regen, cdy, dy))
        dz = jnp.where(survives, ndz, jnp.where(regen, cdz, dz))
        tpr = jnp.where(survives, tpr * atr, jnp.where(regen, 1.0, tpr))
        tpg = jnp.where(survives, tpg * atg, jnp.where(regen, 1.0, tpg))
        tpb = jnp.where(survives, tpb * atb, jnp.where(regen, 1.0, tpb))
        depth = jnp.where(survives, depth1, 0)

        segments = segments + jnp.sum(active.astype(jnp.int32))
        return (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, rr, rg, rb,
                depth, done, segments)

    state = jax.lax.while_loop(cond, body, state)
    rad_ref[0] = state[9]
    rad_ref[1] = state[10]
    rad_ref[2] = state[11]
    # A work-ahead lane can exit mid-path on an OPEN sample; that sample is
    # re-traced from its camera ray next wave (see the done0 note above), so
    # its partial segments would be double counted. The open path's segment
    # count IS the lane's current depth (regen/stale lanes sit at depth 0),
    # so subtracting it keeps the total segment count exact across any wave
    # decomposition -- the invariant the classic chunked plan already has.
    segments = state[14] - jnp.sum(state[12])
    stats_ref[:, :] = jnp.full((8, 128), segments, jnp.int32)
    dout_ref[:, :] = state[13]


def _aux_scene_inputs(scene, geom_h, shade, n_actual, n_pad, origin_proxy):
    """Assemble the OPTIONAL kernel operands (MXU plane tables, per-block
    cull bound tables, texture tables, triangle tables) plus their
    BlockSpecs and the kernel's static flags -- shared by
    ``_render_pixels_fused`` and ``trace_rays_fused`` so the operand order
    can never diverge between the two builders.

    The append order here IS the kernels' pop order (``_regen_kernel`` /
    ``_trace_kernel`` unpack positionally): sphere planes, sphere cull
    (ord, bnd), texture table, texture planes, triangle table, triangle
    planes, triangle cull (ord, bnd). Any reordering must change both
    kernels' unpack code in the same commit.

    ``origin_proxy``: the front-to-back sort origin for cull blocks -- the
    camera center for the pixel path, a ray-origin proxy (mean origin) for
    the raw-ray path. Visit order cannot affect results (stage-1 min is
    order-independent); it only decides how early lanes' bounds tighten.

    Returns ``(inputs, specs, kflags)`` where ``kflags`` are the
    keyword flags both kernels share (tex_plane, tri_pad, mxu_cols,
    tex_mxu, tri_mxu, sph_cull, tri_cull). ``sph_cull``/``tri_cull`` are
    False (no cull operands) or the bound KIND string ('sphere' | 'box')
    the table was packed with -- the kernels thread it into the cull
    tuples so the in-kernel gate always matches the packed layout.
    """
    inputs = ()
    specs = []
    mxu_cols = _mxu_gather_cols(n_pad, scene.has_textures)
    if mxu_cols:
        # Planes from INT sources (subnormal/NaN-safe; see pack_scene).
        inputs = (pack_scene(scene, with_planes=mxu_cols)[4],)
        specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    elif _two_level_mxu(n_pad):
        # Two-level stage-2 window fetch: window-major plane table.
        mxu_cols = 11 if scene.has_textures else 7
        inputs = (pack_scene(scene, with_win_planes=mxu_cols)[4],)
        specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    sph_cull = False
    # The bound-table granularity must equal the sweep's block rows: the
    # two-level stage 1 always uses _SWEEP_ROWS-row blocks, the flat sweep
    # reads the RT_FLAT_BLK trace-time knob (same _flat_blk call the sweep
    # itself makes, so they cannot diverge).
    sph_blk = (
        min(n_pad, _SWEEP_ROWS)
        if _two_level_enabled(n_pad)
        else _flat_blk(n_pad)
    )
    if _cull_enabled() and n_pad > sph_blk:
        # Per-block bounds for the stage-1 conservative reject (SMEM:
        # visit order int32[nb] + 4 (sphere kind) or 8 (box kind) f32
        # scalars per sweep block, front-to-back from the origin proxy).
        # sph_cull carries the KIND (one env read here) so the in-kernel
        # gate branch always matches the packed table layout.
        sph_cull = _cull_kind()
        s_ord, s_bnd = _block_bounds(
            geom_h[:, :3], shade[:, 3], n_actual, sph_blk, origin_proxy,
            sph_cull,
        )
        inputs = (*inputs, s_ord, s_bnd)
        specs = [*specs] + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
    tex_plane = None
    tex_mxu = False
    if scene.has_textures:
        tex_table, kh, kw, _ = pack_textures(scene)
        tex_plane = (kh, kw, tex_table.shape[0])
        inputs = (*inputs, tex_table)
        specs = [*specs, pl.BlockSpec(memory_space=pltpu.VMEM)]
        tex_mxu = _mxu_enabled()
        if tex_mxu:
            inputs = (*inputs, pack_textures(scene, with_planes=True)[4])
            specs = [*specs, pl.BlockSpec(memory_space=pltpu.VMEM)]
    tri_pad = None
    tri_mxu = False
    tri_cull = False
    if scene.has_triangles:
        tri_table, tri_m = pack_triangles(scene)
        tri_pad = tri_table.shape[0]
        inputs = (*inputs, tri_table)
        specs = [*specs, pl.BlockSpec(memory_space=pltpu.VMEM)]
        if _two_level_mxu(tri_pad, tri=True):
            # Stage-2 window fetch table (two-level meshes).
            tri_mxu = True
            tri_planes = pack_triangles(scene, with_win_planes=True)[2]
        elif _mxu_enabled() and not _two_level_enabled(tri_pad, tri=True):
            # Flat winner fetch on the MXU (<= _SWEEP_ROWS meshes).
            tri_mxu = True
            tri_planes = pack_triangles(scene, with_planes=True)[2]
        if tri_mxu:
            inputs = (*inputs, tri_planes)
            specs = [*specs, pl.BlockSpec(memory_space=pltpu.VMEM)]
        tri_blk_rows = (
            _tri_blk(tri_pad)
            if _two_level_enabled(tri_pad, tri=True)
            else min(tri_pad, _SWEEP_ROWS)
        )
        if _cull_enabled() and tri_pad > tri_blk_rows:
            tri_cull = _cull_kind()
            t_ord, t_bnd = _tri_block_bounds(
                tri_table[:, 0:3], tri_table[:, 3:6], tri_table[:, 6:9],
                tri_m, tri_blk_rows, origin_proxy, tri_cull,
            )
            inputs = (*inputs, t_ord, t_bnd)
            specs = [*specs] + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
    kflags = dict(
        tex_plane=tex_plane,
        tri_pad=tri_pad,
        mxu_cols=mxu_cols,
        tex_mxu=tex_mxu,
        tri_mxu=tri_mxu,
        sph_cull=sph_cull,
        tri_cull=tri_cull,
    )
    return inputs, specs, kflags


def _tile_split(count: int, tile_rays: int, what: str) -> tuple[int, int]:
    """Validate a launch's ray/slot count against its tile size.

    Returns ``(num_tiles, t_sub)`` where ``t_sub = tile_rays // 128`` is the
    sublane extent of each (t_sub, 128) kernel tile.
    """
    if tile_rays % 1024 != 0 or tile_rays <= 0:
        # (3, t_sub, 128) output blocks need t_sub divisible by 8 sublanes.
        raise ValueError(
            f"tile_rays must be a positive multiple of 1024, got {tile_rays}"
        )
    if count % tile_rays != 0:
        raise ValueError(
            f"{what} {count} not divisible by tile_rays {tile_rays}"
        )
    return count // tile_rays, tile_rays // 128


def _launch_megakernel(
    kernel, *, num_tiles, t_sub, in_specs, inputs, interpret,
    with_done=False,
):
    """Shared launch plumbing for the two megakernel entry points.

    Both kernels write a ``(3, t_sub, 128)`` radiance block and an
    ``(8, 128)`` tile-replicated stats block per grid step; the pixel
    kernel (``with_done``) additionally writes its per-slot done counts
    (work-ahead regen). This reshapes radiance to ``(S, 3)`` and reduces
    the per-tile segment counts. Per-tile counts are int32; the total can
    exceed 2^31 on large waves, so sum in f32 (exact below 2^24 -- covers
    every parity test -- and metrics-grade beyond).
    """
    num_slots = num_tiles * t_sub * 128
    out_specs = [
        pl.BlockSpec(
            (3, t_sub, 128),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((3, num_slots // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((num_tiles * 8, 128), jnp.int32),
    ]
    if with_done:
        out_specs.append(
            pl.BlockSpec(
                (t_sub, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((num_slots // 128, 128), jnp.int32)
        )
    outs = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interp(interpret),
    )(*inputs)
    rad, stats = outs[0], outs[1]
    radiance = rad.reshape(3, num_slots).T
    segments = jnp.sum(
        stats.reshape(num_tiles, 8, 128)[:, 0, 0].astype(jnp.float32)
    )
    if with_done:
        return radiance, segments, outs[2]
    return radiance, segments


@functools.partial(
    jax.jit,
    static_argnames=("num_slots", "pixel_order", "tile_rays", "interpret"),
)
def _render_pixels_fused(
    scene: Scene,
    pixel00: jnp.ndarray,
    pixel_delta_u: jnp.ndarray,
    pixel_delta_v: jnp.ndarray,
    center: jnp.ndarray,
    defocus_disk_u: jnp.ndarray,
    defocus_disk_v: jnp.ndarray,
    defocus_angle: jnp.ndarray,
    map_param: jnp.ndarray,
    slot_base: jnp.ndarray,
    seed: jnp.ndarray,
    sample_start: jnp.ndarray,
    num_slots: int,
    spp: jnp.ndarray,
    max_depth: jnp.ndarray,
    *,
    done=None,
    t_end=None,
    pixel_order: str = "linear",
    tile_rays: int = DEFAULT_TILE_RAYS,
    interpret: bool = False,
):
    """Trace ``spp`` full paths for each of ``num_slots`` pixel slots.

    Slot ``i`` maps to pixel ``slot_base + i`` under ``pixel_order``
    ("linear": pid = slot, ``map_param`` = image width; "tiled": 32x32 pixel
    tiles, ``map_param`` = tiles-per-row, runtime/tiling.py). Each slot's
    samples run back-to-back via in-kernel path regeneration.

    ``sample_start``: absolute index of the first sample -- the RNG is keyed
    by (slot, sample_start + k), so splitting a sample budget across calls
    (chunking, resume, spp sharding) draws the identical sample set as one
    big call.

    Work-ahead regen (round 3): ``done`` is an optional
    ``(num_slots // 128, 128)`` int32 array of per-slot samples ALREADY
    completed (sums already accumulated by earlier waves) and ``t_end``
    the per-slot count this wave must REACH; lanes reaching ``t_end``
    early keep tracing their own slot's samples toward the ``spp`` cap
    instead of idling until the tile's slowest lane finishes (see
    ``_regen_kernel``). When both are given, returns a third value: the
    updated done array to thread into the next wave. Without them
    (``done=None``), the wave is self-contained -- done = 0, t_end = spp
    -- and returns the classic 2-tuple
    ``(radiance_sum[num_slots, 3], segments scalar)`` where
    ``radiance_sum`` is the SUM over this call's samples (caller divides).
    """
    num_tiles, t_sub = _tile_split(num_slots, tile_rays, "slot count")
    if pixel_order == "linear" and num_slots >= 1 << 23:
        # Linear order divides the raw f32 ABSOLUTE slot id (slot_base +
        # offset): exact only while slot_base + num_slots < 2^23. slot_base
        # is traced so only the num_slots part can be checked statically;
        # the caller contract (documented on render_pixels_fused) covers the
        # rest. Tiled order (the renderer default) is integer-exact to 2^23
        # TILES and has no such limit in practice.
        raise ValueError(
            f"{num_slots} slots exceeds linear order's 2^23 addressing "
            "limit; use pixel_order='tiled'"
        )

    geom_h, geom_c, shade, n_actual = pack_scene(scene)
    n_pad = geom_h.shape[0]

    work_ahead = done is not None
    meta = (
        jnp.array([n_actual, 0, 0, 0, 0, 0, 0, 0], jnp.int32)
        .at[1].set(seed.astype(jnp.int32))
        # Wave target: min per-slot done the kernel loop must reach. The
        # classic self-contained wave targets its whole budget.
        .at[2].set(
            jnp.asarray(t_end if work_ahead else spp, jnp.int32)
        )
        .at[3].set(jnp.asarray(map_param, jnp.int32))
        .at[4].set(slot_base.astype(jnp.int32))
        .at[5].set(jnp.asarray(spp, jnp.int32))
        .at[6].set(jnp.asarray(max_depth, jnp.int32))
        .at[7].set(sample_start.astype(jnp.int32))
    )
    if not work_ahead:
        done = jnp.zeros((num_slots // 128, 128), jnp.int32)
    cam_vec = jnp.concatenate(
        [
            jnp.asarray(pixel00, jnp.float32),
            jnp.asarray(pixel_delta_u, jnp.float32),
            jnp.asarray(pixel_delta_v, jnp.float32),
            jnp.asarray(center, jnp.float32),
            jnp.asarray(defocus_disk_u, jnp.float32),
            jnp.asarray(defocus_disk_v, jnp.float32),
            jnp.asarray(defocus_angle, jnp.float32).reshape(1),
            jnp.zeros((1,), jnp.float32),
        ]
    )

    tex_inputs, tex_specs, kflags = _aux_scene_inputs(
        scene, geom_h, shade, n_actual, n_pad, center
    )

    kernel = functools.partial(
        _regen_kernel,
        n_pad=n_pad,
        tile_shape=(t_sub, 128),
        pixel_order=pixel_order,
        **kflags,
    )


    out = _launch_megakernel(
        kernel,
        num_tiles=num_tiles,
        t_sub=t_sub,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam
            pl.BlockSpec(                            # per-slot done
                (t_sub, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # geom_h
            pl.BlockSpec(memory_space=pltpu.VMEM),  # geom_c
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shade
            *tex_specs,                             # texel table
        ],
        inputs=(meta, cam_vec, done, geom_h, geom_c, shade, *tex_inputs),
        interpret=interpret,
        with_done=True,
    )
    return out if work_ahead else out[:2]


def render_pixels_fused(
    scene: Scene,
    pixel00,
    pixel_delta_u,
    pixel_delta_v,
    center,
    defocus_disk_u,
    defocus_disk_v,
    defocus_angle,
    map_param,
    slot_base,
    seed,
    sample_start,
    num_slots: int,
    spp: int,
    max_depth: int,
    *,
    pixel_order: str = "linear",
    tile_rays: int = DEFAULT_TILE_RAYS,
    interpret: bool = False,
):
    """Host wrapper: one compiled kernel per (num_slots, scene size);
    ``spp``/``max_depth`` are runtime values (no recompile across chunk
    sizes). Degenerate budgets short-circuit to black. ``sample_start`` is
    the absolute first-sample index (RNG streams are (slot, sample)-keyed;
    see _render_pixels_fused).

    Addressing limit: with ``pixel_order='linear'`` the kernel converts the
    ABSOLUTE slot id (``slot_base + offset``) to f32, so results are exact
    only while ``slot_base + num_slots < 2**23`` (~8.4M pixels). Images (or
    chunked renders) beyond that must use ``pixel_order='tiled'`` (the
    Renderer default), which is integer-exact to 2^23 tiles.
    """
    if spp <= 0 or max_depth <= 0:
        return (
            jnp.zeros((num_slots, 3), jnp.float32),
            jnp.int32(0),
        )
    return _render_pixels_fused(
        scene, pixel00, pixel_delta_u, pixel_delta_v, center,
        defocus_disk_u, defocus_disk_v, defocus_angle, map_param, slot_base,
        seed, sample_start, num_slots, jnp.int32(spp), jnp.int32(max_depth),
        pixel_order=pixel_order, tile_rays=tile_rays, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Ray-input kernel: arbitrary ray batches (API parity with compute_color)
# ---------------------------------------------------------------------------


def _trace_kernel(
    meta_ref,      # SMEM i32[8]
    geh_ref,       # VMEM f32[N_pad, 8]
    gec_ref,       # VMEM f32[N_pad, 8]
    shade_ref,     # VMEM f32[N_pad, 8|16]
    *rest,         # [mxu_ref][sph_ord sph_bnd][tex_ref][tri_ref]
                   # [tri_ord tri_bnd] rays_ref, rad_ref, stats_ref
    n_pad: int,
    max_depth: int,
    tile_shape: tuple[int, int],
    tex_plane: tuple[int, int, int] | None = None,
    tri_pad: int | None = None,
    mxu_cols: int = 0,
    tex_mxu: bool = False,
    tri_mxu: bool = False,
    sph_cull: bool | str = False,   # False | 'sphere' | 'box' (bound kind)
    tri_cull: bool | str = False,
):
    rest = list(rest)
    mxu = (rest.pop(0), mxu_cols) if mxu_cols else None
    sph_bnd = (rest.pop(0), rest.pop(0)) if sph_cull else None
    tex = None
    if tex_plane is not None:
        tref = rest.pop(0)
        tmxu = rest.pop(0) if tex_mxu else None
        tex = (tref, *tex_plane, tmxu)
    tris = None
    if tri_pad is not None:
        tref2 = rest.pop(0)
        tw = rest.pop(0) if tri_mxu else None
        tbnd = (rest.pop(0), rest.pop(0)) if tri_cull else None
        tris = (tref2, tri_pad, tw, tbnd)
    rays_ref, rad_ref, stats_ref = rest
    seed = meta_ref[1]
    tile_idx = meta_ref[2] + pl.program_id(0)
    t_sub = tile_shape[0]

    refs = (geh_ref, gec_ref, shade_ref)

    zero = jnp.zeros(tile_shape, jnp.float32)
    one = zero + 1.0

    state = (
        rays_ref[0], rays_ref[1], rays_ref[2],
        rays_ref[3], rays_ref[4], rays_ref[5],
        one, one, one,          # throughput
        zero, zero, zero,       # radiance
        one,                    # alive mask as f32 (Mosaic can't carry i1
                                # vectors through while_loop)
        jnp.int32(0),           # bounce
        jnp.int32(0),           # segments
    )

    def cond(state):
        alive_f = state[12]
        bounce = state[13]
        return (bounce < max_depth) & (jnp.max(alive_f) > 0.5)

    lane_h = _lane_hash(tile_shape)
    seed_h = _fmix32(seed + jnp.int32(_GOLD))

    def body(state):
        (ox, oy, oz, dx, dy, dz,
         tpr, tpg, tpb, rr, rg, rb, alive_f, bounce, segments) = state

        s = _fmix32(tile_idx * jnp.int32(_GOLD) + bounce + seed_h)
        u1 = _uniform01_from(lane_h, s, 0)
        u2 = _uniform01_from(lane_h, s, 1)
        u3 = _uniform01_from(lane_h, s, 2)

        # Dead lanes (alive_f 0) idle until the whole tile finishes; mask
        # them out of the cull so they can't force blocks (stale rays).
        act = alive_f > 0.5
        sc = (*sph_bnd, act, sph_cull) if sph_bnd is not None else None
        trs = tris
        if tris is not None:
            trs = (
                tris[0], tris[1], tris[2],
                (*tris[3], act, tri_cull) if tris[3] is not None else None,
            )
        out = _bounce_core(
            refs, (ox, oy, oz, dx, dy, dz), (u1, u2, u3),
            n_pad=n_pad, t_sub=t_sub, tex=tex, tris=trs, mxu=mxu,
            sph_cull=sc,
        )
        hitm = out["hitm"]
        hit_f = jnp.where(hitm, 1.0, 0.0)
        sky_r, sky_g, sky_b = out["sky"]
        skyw = alive_f * (1.0 - hit_f)
        rr = rr + skyw * tpr * sky_r
        rg = rg + skyw * tpg * sky_g
        rb = rb + skyw * tpb * sky_b

        surv_f = alive_f * jnp.where(out["scat_ok"], 1.0, 0.0)
        survives = surv_f > 0.5
        nox, noy, noz = out["new_o"]
        ndx, ndy, ndz = out["new_d"]
        atr, atg, atb = out["atten"]
        tpr = jnp.where(survives, tpr * atr, tpr)
        tpg = jnp.where(survives, tpg * atg, tpg)
        tpb = jnp.where(survives, tpb * atb, tpb)
        ox = jnp.where(survives, nox, ox)
        oy = jnp.where(survives, noy, oy)
        oz = jnp.where(survives, noz, oz)
        dx = jnp.where(survives, ndx, dx)
        dy = jnp.where(survives, ndy, dy)
        dz = jnp.where(survives, ndz, dz)

        segments = segments + jnp.sum(alive_f).astype(jnp.int32)
        return (
            ox, oy, oz, dx, dy, dz,
            tpr, tpg, tpb, rr, rg, rb,
            surv_f, bounce + 1, segments,
        )

    state = jax.lax.while_loop(cond, body, state)
    rad_ref[0] = state[9]
    rad_ref[1] = state[10]
    rad_ref[2] = state[11]
    stats_ref[:, :] = jnp.full((8, 128), state[14], jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "tile_rays", "interpret"),
)
def trace_rays_fused(
    scene: Scene,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    seed: jnp.ndarray,
    tile_offset: jnp.ndarray,
    max_depth: int,
    *,
    tile_rays: int = DEFAULT_TILE_RAYS,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Trace ``B`` rays (B divisible by ``tile_rays``) with the megakernel.

    Args:
      seed: int32 scalar -- sampling stream id.
      tile_offset: int32 scalar -- absolute index of the first tile (so a
        chunked/sharded caller keeps globally-stable per-tile RNG streams).

    Returns:
      ``(radiance[B, 3], segments scalar int32)``.
    """
    b = origins.shape[0]
    num_tiles, t_sub = _tile_split(b, tile_rays, "ray count")

    geom_h, geom_c, shade, n_actual = pack_scene(scene)
    n_pad = geom_h.shape[0]

    rays = jnp.concatenate([origins.T, directions.T], axis=0)  # (6, B)
    rays = rays.reshape(6, b // 128, 128)

    meta = (
        jnp.array([n_actual, 0, 0, 0, 0, 0, 0, 0], jnp.int32)
        .at[1].set(seed.astype(jnp.int32))
        .at[2].set(tile_offset.astype(jnp.int32))
    )

    # The mean ray origin stands in for the camera center as the cull
    # blocks' front-to-back proxy (raw rays have no camera).
    tex_inputs, tex_specs, kflags = _aux_scene_inputs(
        scene, geom_h, shade, n_actual, n_pad, jnp.mean(origins, axis=0)
    )

    kernel = functools.partial(
        _trace_kernel,
        n_pad=n_pad,
        max_depth=max_depth,
        tile_shape=(t_sub, 128),
        **kflags,
    )


    return _launch_megakernel(
        kernel,
        num_tiles=num_tiles,
        t_sub=t_sub,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec(memory_space=pltpu.VMEM),  # geom_h
            pl.BlockSpec(memory_space=pltpu.VMEM),  # geom_c
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shade
            *tex_specs,                             # texel table
            pl.BlockSpec(
                (6, t_sub, 128),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        inputs=(meta, geom_h, geom_c, shade, *tex_inputs, rays),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Scene packing
# ---------------------------------------------------------------------------


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so there are 2 zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _morton_order(centers: jnp.ndarray) -> jnp.ndarray:
    """Permutation sorting spheres along a 3D Morton curve (10 bits/axis).

    Spatially-close spheres land in adjacent table rows, which keeps future
    block-level culling effective and makes packing deterministic.
    """
    lo = jnp.min(centers, axis=0)
    hi = jnp.max(centers, axis=0)
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((centers - lo) * scale, 0.0, 1023.0).astype(jnp.uint32)
    code = (
        (_part1by2(q[:, 0]) << 2)
        | (_part1by2(q[:, 1]) << 1)
        | _part1by2(q[:, 2])
    )
    return jnp.argsort(code)


# In-kernel image textures are resampled (nearest) to fit this cap per side;
# the texel fetch is a radix-select gather over T*kh*kw rows, so the cap
# bounds its cost. Textures already within the cap are sampled exactly.
TEX_KERNEL_CAP = 64


def pack_textures(
    scene: Scene, cap: int = TEX_KERNEL_CAP, with_planes: bool = False
):
    """Texture stack -> (tex_table f32[rows, 8], kh, kw, kernel_wh i32[N,2]).

    Each texture plane is nearest-downsampled to at most (cap, cap); texel
    (tid, j, i) lives at row ``tid*kh*kw + j*kw + i`` with rgb packed 16-bit
    into cols 0 (r|g) and 1 (b|0). Rows padded to a power of two (the radix
    gather folds in half). ``kernel_wh`` is each sphere's texture's valid
    (w, h) inside the (kh, kw) plane.
    """
    t, th, tw, _ = scene.textures.shape
    kh, kw = min(th, cap), min(tw, cap)
    if (kh, kw) != (th, tw):
        import numpy as _np

        jrows = jnp.asarray((_np.arange(kh) * th) // kh)
        icols = jnp.asarray((_np.arange(kw) * tw) // kw)
        tex = scene.textures[:, jrows][:, :, icols]
        # Valid region shrinks by the same nearest mapping.
        w = scene.tex_wh[:, 0]
        h = scene.tex_wh[:, 1]
        kwh = jnp.stack(
            [-(-w * kw // tw), -(-h * kh // th)], axis=1
        ).astype(jnp.int32)
    else:
        tex = scene.textures
        kwh = scene.tex_wh
    flat = tex.reshape(t * kh * kw, 3)
    q = jnp.round(jnp.clip(flat, 0.0, 1.0) * 65535.0).astype(jnp.int32)
    wa = (q[:, 0] << 16) | q[:, 1]
    wb = q[:, 2] << 16
    rows = max(128, 1 << max((t * kh * kw - 1).bit_length(), 1))
    table = jnp.zeros((rows, 8), jnp.float32)
    table = table.at[: t * kh * kw, 0].set(
        jax.lax.bitcast_convert_type(wa, jnp.float32)
    )
    table = table.at[: t * kh * kw, 1].set(
        jax.lax.bitcast_convert_type(wb, jnp.float32)
    )
    if with_planes:
        # Texel words are packed 16-bit pairs -- the same subnormal/NaN
        # f32 hazard as pack_scene's material words; build the MXU byte
        # planes from the ints (see pack_scene with_planes).
        zi = jnp.zeros((rows,), jnp.int32)
        wa_full = zi.at[: t * kh * kw].set(wa)
        wb_full = zi.at[: t * kh * kw].set(wb)
        planes = _plane_table_int([wa_full, wb_full], rows)
        return table, kh, kw, kwh, planes
    return table, kh, kw, kwh


def pack_triangles(
    scene: Scene,
    m_pad_multiple: int = _SPHERE_BLOCK,
    with_win_planes: bool = False,
    with_planes: bool = False,
):
    """Triangles -> (tri_table f32[M_pad, 16], m_actual) for the kernel.

    Columns: v0 xyz (0-2), e1 xyz (3-5), e2 xyz (6-8), w1 = alb_r16|alb_g16
    (9), w2 = alb_b16|param16 (10) -- the same material encoding as the
    sphere shade table -- n' = e2 x e1 xyz (11-13, the precomputed
    UNNORMALIZED plane normal the sweep's triple-product candidate form
    reads: det = d.n', t_s = -(s.n') -- see ``_tri_key_rows``), rest zero.
    Triangles stay in BVH leaf order (the Scene already stores them
    permuted; Morton-like locality for free). Padding rows have
    e1 = e2 = 0 => n' = 0 => det = 0 => never hit.
    """
    m = scene.num_triangles
    m_pad = max(m_pad_multiple, 1 << max(m - 1, 1).bit_length())
    pad = m_pad - m
    v0 = jnp.pad(scene.tri_v0, ((0, pad), (0, 0)), constant_values=1.0e9)
    e1 = jnp.pad(scene.tri_e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(scene.tri_e2, ((0, pad), (0, 0)))
    kind = jnp.pad(scene.tri_mat_kind, (0, pad))
    albedo = jnp.pad(scene.tri_albedo, ((0, pad), (0, 0)))
    fuzz = jnp.pad(scene.tri_fuzz, (0, pad))
    ior = jnp.pad(scene.tri_ior, (0, pad), constant_values=1.0)
    kindf = kind.astype(jnp.float32)
    param = jnp.where(
        kindf < 0.5,
        -1.0,
        jnp.where(
            kindf < 1.5,
            jnp.clip(fuzz, 0.0, 1.999),
            4.0 + jnp.clip(ior, 0.0, 9.99),
        ),
    )
    a16 = jnp.round(jnp.clip(albedo, 0.0, 1.0) * 65535.0).astype(jnp.int32)
    p16 = jnp.round((param + 2.0) * 4096.0).astype(jnp.int32)
    w1i = (a16[:, 0] << 16) | a16[:, 1]
    w2i = (a16[:, 2] << 16) | p16
    w1 = jax.lax.bitcast_convert_type(w1i, jnp.float32)
    w2 = jax.lax.bitcast_convert_type(w2i, jnp.float32)
    # n' = e2 x e1: ONE f32 rounding at pack time, read identically by
    # stage 1 and stage 2 (recomputing it in-kernel could round
    # differently between fused forms and desynchronize the two stages'
    # keys). Subnormal-magnitude normals (XLA FTZ flushes them to 0) need
    # |e1 x e2| < 1e-38, which the sweep's dabs > 1e-12 validity gate
    # already rejects -- behavior identical to the computed-cross form.
    nrm = jnp.cross(e2, e1).astype(jnp.float32)
    z = jnp.zeros((m_pad,), jnp.float32)
    table = jnp.stack(
        [v0[:, 0], v0[:, 1], v0[:, 2],
         e1[:, 0], e1[:, 1], e1[:, 2],
         e2[:, 0], e2[:, 1], e2[:, 2],
         w1, w2, nrm[:, 0], nrm[:, 1], nrm[:, 2], z, z],
        axis=1,
    )
    if with_win_planes or with_planes:
        # MXU fetch tables; column order must match the kernel's triangle
        # column order (v0, e1, e2, w1, w2[, n']). Int sources for the
        # packed words (subnormal/NaN rule, see pack_scene). The flat
        # winner fetch (with_planes) reads only the 11 _tri_exact columns;
        # the stage-2 window collapse table (with_win_planes) always
        # carries all 14 so RT_TRI_FORM=triple can re-key with n' -- the
        # classic form reads the 11-column prefix (column-major plane
        # layout makes prefix reads exact).
        fbits = lambda v: jax.lax.bitcast_convert_type(v, jnp.int32)  # noqa: E731
        wcols = [
            fbits(v0[:, 0]), fbits(v0[:, 1]), fbits(v0[:, 2]),
            fbits(e1[:, 0]), fbits(e1[:, 1]), fbits(e1[:, 2]),
            fbits(e2[:, 0]), fbits(e2[:, 1]), fbits(e2[:, 2]),
            w1i, w2i,
        ]
        if with_win_planes:
            wcols += [
                fbits(nrm[:, 0]), fbits(nrm[:, 1]), fbits(nrm[:, 2]),
            ]
        planes = (
            _win_plane_table_int(wcols, m_pad, _WIN)
            if with_win_planes
            else _plane_table_int(wcols, m_pad)
        )
        return table.astype(jnp.float32), m, planes
    return table.astype(jnp.float32), m


def pack_scene(
    scene: Scene,
    n_pad_multiple: int = _SPHERE_BLOCK,
    with_planes: int = 0,
    with_win_planes: int = 0,
):
    """Scene -> (geom_h f32[N_pad,8], geom_c f32[N_pad,8],
    shade f32[N_pad,8 or 16], n_actual).  All tables VMEM-resident in the
    kernels.

    When ``scene.has_textures`` (static), ``shade`` widens to 16 columns:
      col 6: w3 = alb2_r16 | alb2_g16      (checker odd color)
      col 7: w4 = alb2_b16 | tmeta16       (tmeta = tex_kind(2) | tex_id(14))
      col 8: checker 1/scale (f32 bits; pre-rounded to f16 grid by the
             SceneBuilder so the value is exact)
      col 9: w5 = kernel_tex_w16 | kernel_tex_h16 (dims in the pack_textures
             plane)
    Untextured scenes keep the 8-column layout (identical code to round 1).

    * ``geom_h`` cols 0-2 [cx, cy, cz]: sphere centers for the sweep's
      ``h = d . (c - o)``.
    * ``geom_c`` cols 0-3 [-2cx, -2cy, -2cz, |c|^2 - r^2]: constants for the
      sweep's ``cq = |o - c|^2 - r^2 = cm2 - 2 c.o + o.o``.
    * ``shade`` rows [cx, cy, cz, r, w1, w2, 0, 0]: full-precision geometry
      plus two 16-bit-packed material words (bit patterns stored as f32 --
      the kernel's gather is bit-preserving): w1 = alb_r16 | alb_g16,
      w2 = alb_b16 | param16 with albedo quantized x65535 and
      param16 = round((param + 2) * 4096), where param encodes the material
      kind: lambertian -1, metal fuzz (clamped to [0, 2)), dielectric
      4 + ior (ior clamped to < 10 by the encoding range).

    Spheres are Morton-sorted. ``N_pad`` is a power of two >= 128 (the
    radix-select gather folds the table in half repeatedly). Padding rows
    carry ``cm2 = +1e30`` so their discriminant is always negative: they can
    never produce a hit and the kernel needs no validity mask.
    """
    n = scene.num_objects
    n_pad = max(n_pad_multiple, 1 << max(n - 1, 1).bit_length())
    textured = scene.has_textures

    if n > 0:
        order = _morton_order(scene.centers)
        centers = scene.centers[order]
        radii = scene.radii[order]
        albedo = scene.albedo[order]
        fuzz = scene.fuzz[order]
        ior = scene.ior[order]
        kind = scene.mat_kind[order]
        pad = n_pad - n
        pad_center = centers[-1]
        centers = jnp.concatenate(
            [centers, jnp.tile(pad_center[None], (pad, 1))], axis=0
        )
        radii = jnp.pad(radii, (0, pad))
        albedo = jnp.pad(albedo, ((0, pad), (0, 0)))
        fuzz = jnp.pad(fuzz, (0, pad))
        ior = jnp.pad(ior, (0, pad), constant_values=1.0)
        kind = jnp.pad(kind, (0, pad))
        if textured:
            _, _, _, kernel_wh = pack_textures(scene)
            tkind = jnp.pad(scene.tex_kind[order], (0, pad))
            alb2 = jnp.pad(scene.albedo2[order], ((0, pad), (0, 0)))
            tinv = jnp.pad(scene.tex_inv_scale[order], (0, pad))
            tid = jnp.pad(scene.tex_id[order], (0, pad))
            twh = jnp.pad(kernel_wh[order], ((0, pad), (0, 0)))
    else:
        centers = jnp.full((n_pad, 3), 1.0e9, jnp.float32)
        radii = jnp.zeros((n_pad,), jnp.float32)
        albedo = jnp.zeros((n_pad, 3), jnp.float32)
        fuzz = jnp.zeros((n_pad,), jnp.float32)
        ior = jnp.ones((n_pad,), jnp.float32)
        kind = jnp.zeros((n_pad,), jnp.int32)
        if textured:  # pragma: no cover - empty textured scene is degenerate
            tkind = jnp.zeros((n_pad,), jnp.int32)
            alb2 = jnp.zeros((n_pad, 3), jnp.float32)
            tinv = jnp.zeros((n_pad,), jnp.float32)
            tid = jnp.zeros((n_pad,), jnp.int32)
            twh = jnp.zeros((n_pad, 2), jnp.int32)

    cm2 = jnp.sum(centers * centers, axis=-1) - radii * radii
    # Padding rows: force the sweep's discriminant negative (never-hit).
    row_ids = jnp.arange(n_pad)
    cm2 = jnp.where(row_ids < n, cm2, 1.0e30)
    zcol = jnp.zeros_like(radii)
    onecol = zcol + 1.0
    geom_h = jnp.stack(
        [centers[:, 0], centers[:, 1], centers[:, 2], onecol,
         zcol, zcol, zcol, zcol],
        axis=1,
    )
    geom_c = jnp.stack(
        [-2.0 * centers[:, 0], -2.0 * centers[:, 1], -2.0 * centers[:, 2],
         cm2, onecol, zcol, zcol, zcol],
        axis=1,
    )
    # Material kinds (scene/types.py): 0 lambertian, 1 metal, 2 dielectric.
    kindf = kind.astype(jnp.float32)
    param = jnp.where(
        kindf < 0.5,
        -1.0,
        jnp.where(
            kindf < 1.5,
            jnp.clip(fuzz, 0.0, 1.999),
            4.0 + jnp.clip(ior, 0.0, 9.99),
        ),
    )
    a16 = jnp.round(jnp.clip(albedo, 0.0, 1.0) * 65535.0).astype(jnp.int32)
    p16 = jnp.round((param + 2.0) * 4096.0).astype(jnp.int32)
    w1 = (a16[:, 0] << 16) | a16[:, 1]
    w2 = (a16[:, 2] << 16) | p16
    w1f = jax.lax.bitcast_convert_type(w1, jnp.float32)
    w2f = jax.lax.bitcast_convert_type(w2, jnp.float32)
    if textured:
        b16 = jnp.round(jnp.clip(alb2, 0.0, 1.0) * 65535.0).astype(jnp.int32)
        tmeta = (jnp.clip(tkind, 0, 3) & 3) | (jnp.clip(tid, 0, (1 << 14) - 1) << 2)
        w3 = (b16[:, 0] << 16) | b16[:, 1]
        w4 = (b16[:, 2] << 16) | (tmeta & 0xFFFF)
        w5 = (jnp.clip(twh[:, 0], 0, 0xFFFF) << 16) | jnp.clip(
            twh[:, 1], 0, 0xFFFF
        )
        w3f = jax.lax.bitcast_convert_type(w3, jnp.float32)
        w4f = jax.lax.bitcast_convert_type(w4, jnp.float32)
        w5f = jax.lax.bitcast_convert_type(w5, jnp.float32)
        shade = jnp.stack(
            [centers[:, 0], centers[:, 1], centers[:, 2], radii,
             w1f, w2f, w3f, w4f, tinv, w5f,
             zcol, zcol, zcol, zcol, zcol, zcol],
            axis=1,
        )
    else:
        shade = jnp.stack(
            [centers[:, 0], centers[:, 1], centers[:, 2], radii,
             w1f, w2f, zcol, zcol],
            axis=1,
        )
    out = (
        geom_h.astype(jnp.float32),
        geom_c.astype(jnp.float32),
        shade.astype(jnp.float32),
        n,
    )
    if with_planes:
        # MXU byte planes, built from the packed words AS INTEGERS. The
        # packed material/texture words are arbitrary bit patterns that can
        # encode subnormal or NaN f32 values (gray albedo 0.5 -> w1 =
        # 0x80008000 is a negative subnormal; dielectric (1,1,1) -> w1 =
        # 0xFFFFFFFF is NaN); routing them through f32 intermediates on
        # the TPU flushes/canonicalizes them (hardware-verified: exactly
        # those two patterns corrupted, low mantissa zeroed / NaN payload
        # replaced -- the round-1 and round-2 "MXU gather diverged on
        # hardware only" mystery). Geometry columns are genuine
        # normal-range floats, so their bitcasts are safe.
        fbits = lambda v: jax.lax.bitcast_convert_type(v, jnp.int32)  # noqa: E731
        int_cols = [
            fbits(centers[:, 0]), fbits(centers[:, 1]),
            fbits(centers[:, 2]), fbits(radii), w1, w2,
        ]
        if textured:
            int_cols += [w3, w4, fbits(tinv), w5]
        out = (*out, _plane_table_int(int_cols[:with_planes], n_pad))
    if with_win_planes:
        # Stage-2 window-fetch table (two-level path). Column order MUST
        # match _closest_sphere_two_level's col_list:
        # cx, cy, cz, r, cm2, w1, w2 [, w3, w4, tinv, w5].
        fbits2 = lambda v: jax.lax.bitcast_convert_type(v, jnp.int32)  # noqa: E731
        wcols = [
            fbits2(centers[:, 0]), fbits2(centers[:, 1]),
            fbits2(centers[:, 2]), fbits2(radii), fbits2(cm2), w1, w2,
        ]
        if textured:
            wcols += [w3, w4, fbits2(tinv), w5]
        out = (
            *out,
            _win_plane_table_int(wcols[:with_win_planes], n_pad, _WIN),
        )
    return out
