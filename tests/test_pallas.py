"""Pallas megakernel correctness, run on CPU via TPU-interpret mode.

The deterministic-scene test is the strong one: with only fuzz-0 metals (no
RNG influence on any path), the fused kernel must agree with the XLA
wavefront integrator to float roundoff, including identical traced-segment
counts. RNG-dependent scenes are compared distributionally (the kernel uses
a counter-based hash keyed by (slot, sample, bounce); the XLA path uses
threefry)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_tpu.core import rng as rrng
from raytracing_tpu.models import integrator
from raytracing_tpu.ops.pallas import trace as ptrace
from raytracing_tpu.scene.types import SceneBuilder


def _keys(n, seed=0):
    return rrng.ray_keys(jr.key(seed), jnp.arange(n, dtype=jnp.int32))


def _run_fused(scene, o, d, depth, seed=3, tile_offset=0):
    if jax.default_backend() in ("tpu", "axon"):
        # Real hardware: compiled Mosaic (interpret mode would execute the
        # kernel op-by-op through the remote runtime -- unusably slow).
        rad, seg = ptrace.trace_rays_fused(
            scene, o, d, jnp.int32(seed), jnp.int32(tile_offset), depth
        )
    else:
        with pltpu.force_tpu_interpret_mode():
            rad, seg = ptrace.trace_rays_fused(
                scene, o, d, jnp.int32(seed), jnp.int32(tile_offset), depth
            )
    return np.asarray(rad), int(seg)


def test_deterministic_scene_matches_xla_exactly():
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0)
    b.add_metallic_sphere((0.0, 0.0, -1.0), 0.5, (0.8, 0.6, 0.2), 0.0)
    b.add_metallic_sphere((1.2, 0.0, -1.5), 0.7, (0.9, 0.9, 0.9), 0.0)
    scene = b.build()

    n = 1024
    keys = _keys(n, seed=1)
    d = rrng.unit_vector(keys)
    o = jnp.zeros((n, 3), jnp.float32)

    rad_p, seg_p = _run_fused(scene, o, d, 8)
    rad_x, seg_x = integrator.trace_rays(scene, o, d, keys, 8)
    assert seg_p == int(seg_x)
    np.testing.assert_allclose(rad_p, np.asarray(rad_x), atol=2e-4, rtol=1e-3)


def test_sky_only():
    scene = SceneBuilder().build()  # N=0 -> all padding, every ray misses
    d = jnp.tile(jnp.array([[0.0, 1.0, 0.0]], jnp.float32), (1024, 1))
    d = d.at[1].set(jnp.array([0.0, -1.0, 0.0]))
    rad, seg = _run_fused(scene, jnp.zeros((1024, 3)), d, 4)
    np.testing.assert_allclose(rad[0], [0.5, 0.7, 1.0], atol=1e-6)
    np.testing.assert_allclose(rad[1], [1.0, 1.0, 1.0], atol=1e-6)
    assert seg == 1024


def test_depth_zero_black():
    scene = SceneBuilder().build()
    d = jnp.ones((1024, 3), jnp.float32)
    rad, seg = _run_fused(scene, jnp.zeros((1024, 3)), d, 0)
    np.testing.assert_array_equal(rad, 0.0)
    assert seg == 0


def test_scene_larger_than_one_sphere_block():
    """> 128 spheres exercises the multi-block sweep; closest-hit must match
    the XLA min-reduction exactly on a deterministic (all-metal) scene."""
    rng = np.random.default_rng(8)
    b = SceneBuilder()
    for _ in range(150):
        b.add_metallic_sphere(rng.normal(size=3) * 4, rng.uniform(0.2, 0.8),
                              (0.9, 0.9, 0.9), 0.0)
    scene = b.build()
    n = 1024
    keys = _keys(n, seed=4)
    d = rrng.unit_vector(keys)
    o = jnp.zeros((n, 3), jnp.float32)
    rad_p, seg_p = _run_fused(scene, o, d, 3)
    rad_x, seg_x = integrator.trace_rays(scene, o, d, keys, 3)
    assert seg_p == int(seg_x)
    np.testing.assert_allclose(rad_p, np.asarray(rad_x), atol=2e-4, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("two_level", [False, True])
def test_scene_larger_than_sweep_window(monkeypatch, two_level):
    """> 512 spheres (n_pad 1024) exercises the multi-block sweep + cull;
    must still match XLA exactly on a deterministic all-metal scene. The
    default path at 1024 rows is FLAT (threshold 16*_SWEEP_ROWS = 8192
    since the round-3 A/B table);
    two_level=True forces the two-level path via RT_TWO_LEVEL_MIN so its
    parity stays covered off the default."""
    rng = np.random.default_rng(12)
    b = SceneBuilder()
    for _ in range(600):
        b.add_metallic_sphere(rng.normal(size=3) * 8, rng.uniform(0.2, 0.6),
                              (0.9, 0.9, 0.9), 0.0)
    scene = b.build()
    n = 1024
    keys = _keys(n, seed=9)
    d = rrng.unit_vector(keys)
    o = jnp.zeros((n, 3), jnp.float32)
    if two_level:
        monkeypatch.setenv("RT_TWO_LEVEL_MIN", "513")
        jax.clear_caches()
    try:
        rad_p, seg_p = _run_fused(scene, o, d, 3)
        rad_x, seg_x = integrator.trace_rays(scene, o, d, keys, 3)
    finally:
        if two_level:
            jax.clear_caches()
    assert seg_p == int(seg_x)
    # With 600 OVERLAPPING spheres a handful of rays hit near-coincident
    # surfaces where the packed-key argmin (root quantized by the id bits)
    # may pick the other of two near-tied spheres -- a documented design
    # property (ops/pallas/trace.py), bounded tightly here.
    rx = np.asarray(rad_x)
    rel = np.abs(rad_p - rx) / (np.abs(rx) + 1e-3)
    tight = (rel <= 1e-3).all(axis=1)
    assert tight.mean() >= 0.995, f"only {tight.mean():.4f} rays match tightly"
    assert rel.max() < 0.05, f"tie-flip deviation too large: {rel.max()}"


# The kernel RNG is a counter-based software hash (plain int32 vector ops),
# so RNG-dependent behavior is identical under TPU-interpret mode and
# compiled Mosaic -- these tests run everywhere (round 1 skipped them off
# hardware because the TPU core PRNG has no interpret emulation).


@pytest.mark.slow
def test_distributional_parity_full_materials():
    """All three materials: per-direction mean radiance matches the XLA
    integrator within MC error (independent RNG streams)."""
    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5))
    b.add_lambertian_sphere((0.0, 0.0, -1.0), 0.5, (0.7, 0.3, 0.3))
    b.add_metallic_sphere((1.0, 0.0, -1.0), 0.5, (0.8, 0.8, 0.8), 0.2)
    b.add_dielectric_sphere((-1.0, 0.0, -1.0), 0.5, 1.5)
    scene = b.build()

    n = 2048
    for dir3, seed in [((0.0, 0.0, -1.0), 5), ((-1.0, 0.0, -1.0), 6)]:
        d = jnp.tile(jnp.array([dir3], jnp.float32), (n, 1))
        o = jnp.zeros_like(d)
        rad_p, _ = _run_fused(scene, o, d, 8, seed=seed)
        rad_x, _ = integrator.trace_rays(scene, o, d, _keys(n, seed), 8)
        np.testing.assert_allclose(
            rad_p.mean(0), np.asarray(rad_x).mean(0), atol=0.06
        ), dir3


def test_tile_offset_changes_stream():
    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, 0.0, -1.0), 0.5, (0.7, 0.3, 0.3))
    scene = b.build()
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (1024, 1))
    o = jnp.zeros_like(d)
    r0, _ = _run_fused(scene, o, d, 4, seed=1, tile_offset=0)
    r1, _ = _run_fused(scene, o, d, 4, seed=1, tile_offset=1)
    r0b, _ = _run_fused(scene, o, d, 4, seed=1, tile_offset=0)
    assert not np.array_equal(r0, r1)      # distinct streams per tile index
    np.testing.assert_array_equal(r0, r0b)  # deterministic


def test_bad_ray_count_raises():
    scene = SceneBuilder().build()
    o = jnp.zeros((1000, 3))
    with pytest.raises(ValueError):
        ptrace.trace_rays_fused(
            scene, o, o, jnp.int32(0), jnp.int32(0), 2
        )


def test_pack_scene_padding():
    b = SceneBuilder()
    b.add_lambertian_sphere((0.25, 0.5, -1.0), 0.5, (0.7, 0.3, 0.3))
    scene = b.build()
    geom_h, geom_c, shade, n = ptrace.pack_scene(scene)
    assert n == 1
    n_pad = geom_h.shape[0]
    assert geom_h.shape == (n_pad, 8) and n_pad % ptrace._SPHERE_BLOCK == 0
    assert geom_c.shape == (n_pad, 8)
    assert shade.shape == (n_pad, 8)
    # Real sphere row 0: geom_h = [c, 1, 0...], geom_c = [-2c, |c|^2-r^2, 1].
    np.testing.assert_allclose(
        np.asarray(geom_h[0]), [0.25, 0.5, -1.0, 1, 0, 0, 0, 0], atol=1e-6
    )
    cm2 = 0.25**2 + 0.5**2 + 1.0 - 0.25
    np.testing.assert_allclose(
        np.asarray(geom_c[0]), [-0.5, -1.0, 2.0, cm2, 1, 0, 0, 0], atol=1e-6
    )
    # shade = [c, r, w1, w2]; material words 16-bit packed.
    np.testing.assert_allclose(
        np.asarray(shade[0, :4]), [0.25, 0.5, -1.0, 0.5], atol=1e-6
    )
    albr, albg, albb, param = _decode_material(shade[0])
    np.testing.assert_allclose(
        [albr, albg, albb, param], [0.7, 0.3, 0.3, -1.0], atol=3e-4
    )
    # Padding spheres: radius 0 at the last real center -> can never hit.
    assert float(shade[5, 3]) == 0.0
    assert float(shade[5, 0]) == 0.25


def _decode_material(shade_row):
    w1 = np.asarray(shade_row[4:5]).view(np.int32)[0]
    w2 = np.asarray(shade_row[5:6]).view(np.int32)[0]
    albr = ((w1 >> 16) & 0xFFFF) / 65535.0
    albg = (w1 & 0xFFFF) / 65535.0
    albb = ((w2 >> 16) & 0xFFFF) / 65535.0
    param = (w2 & 0xFFFF) / 4096.0 - 2.0
    return albr, albg, albb, param


def test_pack_scene_param_encoding():
    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, 0.0, 0.0), 1.0, (0.1, 0.2, 0.3))
    b.add_metallic_sphere((3.0, 0.0, 0.0), 1.0, (0.4, 0.5, 0.6), 0.25)
    b.add_dielectric_sphere((6.0, 0.0, 0.0), 1.0, 1.5)
    scene = b.build()
    _, _, shade, n = ptrace.pack_scene(scene)
    assert n == 3
    shade = np.asarray(shade)
    # Identify rows by x-center (Morton sort may permute).
    for cx, want in [(0.0, -1.0), (3.0, 0.25), (6.0, 5.5)]:
        row = np.flatnonzero(np.abs(shade[:n, 0] - cx) < 1e-6)
        assert len(row) == 1
        _, _, _, param = _decode_material(shade[row[0]])
        np.testing.assert_allclose(param, want, atol=3e-4)


def test_pack_scene_morton_preserves_materials():
    """Sorting must keep (geometry, material) rows paired."""
    rng = np.random.default_rng(3)
    b = SceneBuilder()
    centers = rng.normal(size=(50, 3)).astype(np.float32) * 5
    for i, c in enumerate(centers):
        b.add_lambertian_sphere(c, 0.1 + 0.01 * i, (i / 50.0, 0.5, 0.5))
    scene = b.build()
    _, _, shade, n = ptrace.pack_scene(scene)
    # For every packed row, the (radius -> albedo_r) pairing must match the
    # original builder order: radius 0.1+0.01*i pairs with albedo i/50.
    for row in range(n):
        radius = float(shade[row, 3])
        i = round((radius - 0.1) / 0.01)
        albr, _, _, _ = _decode_material(np.asarray(shade[row]))
        np.testing.assert_allclose(albr, i / 50.0, atol=3e-4)


def test_tiled_pixel_order_host_table():
    from raytracing_tpu.runtime import tiling

    ids = tiling.tiled_pixel_ids(70, 40)  # not multiples of 32
    assert len(ids) % 1024 == 0
    spill = 70 * 40
    valid = ids[ids < spill]
    # Every pixel appears exactly once.
    assert len(valid) == spill
    assert len(np.unique(valid)) == spill
    # First tile is the top-left 32x32 block in row-major within-tile order.
    assert ids[0] == 0
    assert ids[1] == 1
    assert ids[32] == 70  # second row of the tile
    # Mapping matches the kernel's float formula.
    tpr = tiling.tiles_per_row(70)
    slot = np.arange(len(ids), dtype=np.float64)
    tile_id = np.floor((slot + 0.5) / 1024.0)
    within = slot - tile_id * 1024.0
    wy = np.floor((within + 0.5) / 32.0)
    wx = within - wy * 32.0
    ty = np.floor((tile_id + 0.5) / tpr)
    tx = tile_id - ty * tpr
    px = (tx * 32 + wx).astype(np.int64)
    py = (ty * 32 + wy).astype(np.int64)
    expect = np.where((px < 70) & (py < 40), py * 70 + px, spill)
    np.testing.assert_array_equal(ids, expect.astype(np.int32))


def test_tiled_mapping_exact_beyond_2e23_slots():
    """The kernel's tiled slot->pixel map must stay exact past 2^23 slots
    (integer bit math for the power-of-two factors; f32 only divides the
    small tile id). Renders the CENTER tile of a 4096x4096 image (slot base
    > 2^23) aimed straight at a sphere: every slot must hit; a corner tile
    must be all sky."""
    from raytracing_tpu.core import camera as rcamera
    from raytracing_tpu.runtime import tiling as rtiling
    import raytracing_tpu as rt

    width = height = 4096
    tpr = rtiling.tiles_per_row(width)
    params = rt.CameraParameters(
        aspect_ratio=1.0, image_width=width, samples_per_pixel=1,
        max_depth=2, vertical_fov=60.0, defocus_angle=0.0,
        focus_distance=1.0, lookfrom=(0, 0, 0), lookat=(0, 0, -1),
    )
    cam = rcamera.derive(params)
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, 0.0, -5.0), 1.0, (1.0, 0.0, 0.0), 0.0)
    scene = b.build()

    def run_tile(slot_base):
        with pltpu.force_tpu_interpret_mode():
            rad, _ = ptrace._render_pixels_fused(
                scene, cam.pixel00, cam.pixel_delta_u, cam.pixel_delta_v,
                cam.center, cam.defocus_disk_u, cam.defocus_disk_v,
                cam.defocus_angle, jnp.int32(tpr), jnp.int32(slot_base),
                jnp.int32(0), jnp.int32(0), 1024, jnp.int32(1), jnp.int32(2),
                pixel_order="tiled",
            )
        return np.asarray(rad)

    ty, tx = (height // 2) // 32, (width // 2) // 32
    center_base = (ty * tpr + tx) * 1024
    assert center_base > (1 << 23)
    rad = run_tile(center_base)
    assert (rad.sum(1) < 2.9).mean() > 0.99   # center tile: all hits
    rad0 = run_tile(0)
    assert (rad0.sum(1) > 2.0).mean() == 1.0  # corner tile: all sky


def test_regen_sample_chunks_compose_exactly():
    """(slot, sample)-keyed RNG: tracing spp=4 in one kernel call draws the
    SAME sample set as two spp=2 calls at sample_start 0 and 2 -- segment
    counts must be equal and the radiance sums must compose to f32
    summation-order roundoff. (This is the invariance that makes chunked /
    resumed / spp-sharded pallas renders agree.)"""
    from raytracing_tpu.core import camera as rcamera
    import raytracing_tpu as rt

    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5))
    b.add_lambertian_sphere((0.0, 0.0, -1.0), 0.5, (0.7, 0.3, 0.3))
    b.add_dielectric_sphere((-1.0, 0.0, -1.0), 0.5, 1.5)
    scene = b.build()
    params = rt.CameraParameters(
        aspect_ratio=2.0, image_width=64, samples_per_pixel=4, max_depth=6,
        vertical_fov=50.0, defocus_angle=0.4, focus_distance=2.0,
        lookfrom=(0.0, 0.3, 1.0), lookat=(0.0, 0.0, -1.0),
    )
    cam = rcamera.derive(params)

    def run(sample_start, spp):
        with pltpu.force_tpu_interpret_mode():
            rad, seg = ptrace.render_pixels_fused(
                scene, cam.pixel00, cam.pixel_delta_u, cam.pixel_delta_v,
                cam.center, cam.defocus_disk_u, cam.defocus_disk_v,
                cam.defocus_angle, jnp.int32(cam.image_width),
                jnp.int32(0), jnp.int32(7), jnp.int32(sample_start),
                2048, spp, 6, pixel_order="linear",
            )
        return np.asarray(rad), int(seg)

    rad_all, seg_all = run(0, 4)
    rad_a, seg_a = run(0, 2)
    rad_b, seg_b = run(2, 2)
    assert seg_all == seg_a + seg_b
    np.testing.assert_allclose(rad_a + rad_b, rad_all, atol=2e-5, rtol=1e-6)
    # And the two halves draw DIFFERENT samples (streams advance).
    assert not np.allclose(rad_a, rad_b)


def test_mxu_gather_matches_radix_bitexact():
    """The one-hot MXU byte-plane gather must reproduce the radix-select
    tournament bit-for-bit -- including packed material words whose bit
    patterns encode subnormal/NaN f32 values (gray 0.5 albedo ->
    0x80008000, white dielectric -> 0xFFFFFFFF), the patterns that
    XLA-on-TPU f32 intermediates corrupt (the round-1/2 hardware
    divergence; planes must come from int32 sources)."""
    import numpy as np
    from raytracing_tpu.scene.types import SceneBuilder

    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, -100.0, 0.0), 99.0, (0.5, 0.5, 0.5))
    b.add_dielectric_sphere((1.0, 1.0, 0.0), 1.0, 1.5)  # albedo (1,1,1)
    for i in range(40):
        b.add_metallic_sphere(
            (float(i % 7), 0.2, float(i // 7)), 0.2,
            ((i % 5) / 4.0, (i % 3) / 2.0, (i % 7) / 6.0), 0.1,
        )
    scene = b.build()
    geh, gec, shade, n = ptrace.pack_scene(scene)
    n_pad = geh.shape[0]
    planes = ptrace.pack_scene(scene, with_planes=6)[4]
    t_sub = 8

    def kernel(shade_ref, mxu_ref, sel_ref, oa, ob):
        s = sel_ref[...]
        a = ptrace._gather_cols(
            shade_ref, range(6), s, n_rows=n_pad, t_sub=t_sub
        )
        bcols = ptrace._gather_mxu(
            mxu_ref, s, n_pad=n_pad, t_sub=t_sub, n_cols=6
        )
        for c in range(6):
            oa[c] = a[c]
            ob[c] = pltpu.bitcast(bcols[c], jnp.float32)

    rng = np.random.default_rng(0)
    sel = jnp.asarray(
        rng.integers(0, n_pad, size=(t_sub, 128)), jnp.int32
    )
    # Ensure the hazardous rows are selected: rows 0..n-1 cyclically.
    sel = (sel % jnp.int32(n)).astype(jnp.int32)
    oa, ob = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((6, t_sub, 128), jnp.float32)
        ] * 2,
        interpret=ptrace._interp(True),
    )(shade, planes, sel)
    np.testing.assert_array_equal(
        np.asarray(oa).view(np.int32), np.asarray(ob).view(np.int32)
    )


def test_sphere_cull_bit_transparent_smoke(monkeypatch):
    """FAST-TIER representative of the cull bit-transparency family: the
    shipped default gate (flat block-major sweep + box bound) on a 2-block
    scene at depth 2. The full matrix (sphere/box/box-sub x flat/two-level
    x hostile dynamic range x axis-parallel) is slow-marked below; this one
    keeps the smoke tier from shipping a cull regression blind (ADVICE
    round 4)."""
    rng = np.random.default_rng(12)
    b = SceneBuilder()
    for _ in range(600):
        b.add_metallic_sphere(rng.normal(size=3) * 8, rng.uniform(0.2, 0.6),
                              (0.9, 0.9, 0.9), 0.0)
    scene = b.build()
    n = 1024
    keys = _keys(n, seed=9)
    d = rrng.unit_vector(keys)
    o = jnp.zeros((n, 3), jnp.float32)
    monkeypatch.setenv("RT_CULL", "box")
    jax.clear_caches()
    try:
        rad_cull, seg_cull = _run_fused(scene, o, d, 2)
        monkeypatch.setenv("RT_CULL", "0")
        jax.clear_caches()
        rad_ref, seg_ref = _run_fused(scene, o, d, 2)
    finally:
        jax.clear_caches()
    assert seg_cull == seg_ref
    assert np.array_equal(rad_cull, rad_ref)


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["sphere", "box", "box-sub"])
@pytest.mark.parametrize("two_level", [False, True])
def test_sphere_cull_bit_transparent(monkeypatch, two_level, kind):
    """The per-block conservative reject in the multi-block stage-1
    sweeps (round 3, RT_CULL; both bound kinds) must be BIT-transparent:
    a block is skipped only when no lane can beat its current upper bound
    inside the block's widened bound, so radiance with culling on vs off
    must be identical to the last bit. 600 spheres -> n_pad 1024 = 2 sweep
    blocks; the default path at 1024 rows is the FLAT block-major sweep
    (two-level starts at 16*_SWEEP_ROWS = 8192 per the round-3 A/B), so the
    two_level=True case forces the two-level path via RT_TWO_LEVEL_MIN to
    keep its cull covered too. 'box-sub' runs the box gate with
    RT_CULL_SUB=4 sub-AABBs per block (union-of-sub-boxes gate)."""
    rng = np.random.default_rng(12)
    b = SceneBuilder()
    for _ in range(600):
        b.add_metallic_sphere(rng.normal(size=3) * 8, rng.uniform(0.2, 0.6),
                              (0.9, 0.9, 0.9), 0.0)
    scene = b.build()
    n = 1024
    keys = _keys(n, seed=9)
    d = rrng.unit_vector(keys)
    o = jnp.zeros((n, 3), jnp.float32)
    if kind == "box-sub":
        kind = "box"
        monkeypatch.setenv("RT_CULL_SUB", "4")
    monkeypatch.setenv("RT_CULL", kind)
    jax.clear_caches()
    if two_level:
        monkeypatch.setenv("RT_TWO_LEVEL_MIN", "513")
        jax.clear_caches()
    try:
        rad_cull, seg_cull = _run_fused(scene, o, d, 3)
        monkeypatch.setenv("RT_CULL", "0")
        jax.clear_caches()
        rad_ref, seg_ref = _run_fused(scene, o, d, 3)
    finally:
        jax.clear_caches()
    assert seg_cull == seg_ref
    assert np.array_equal(rad_cull, rad_ref)


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["sphere", "box", "box-sub"])
@pytest.mark.parametrize("two_level", [False, True])
def test_sphere_cull_bit_transparent_dynamic_range(
    monkeypatch, two_level, kind
):
    """Cull bit-transparency at the HOSTILE dynamic range: |o - c| up to
    ~1000x the sphere radius, with rays aimed at sphere SILHOUETTES so the
    bound quadratic's discriminant delta_b = h^2 - a*cq sits near zero
    where its f32 rounding error (~eps * |oc|^2 ~ 0.1 at |oc|=1000) dwarfs
    any radius-relative widening. Guards the delta-space margin in
    _cull_gate (_CULL_DELTA_EPS): without it, a grazing TRUE hit's block
    can round delta_b negative (sqrt -> NaN -> culled) while the
    contained sphere's own delta stays positive, and cull on/off images
    diverge. Also seeds a near sphere first so lanes carry a TIGHT
    current-best bound (small cur_hi) while the far blocks are voted on --
    the exact regime of the review finding."""
    rng = np.random.default_rng(21)
    b = SceneBuilder()
    # A COMPACT cluster far away: 600 tiny spheres (r = 0.05) on a
    # 0.4-radius shell at distance 1000. Morton blocks over the cluster
    # are themselves compact, so each stage-1 block bound has R_b ~ 0.45
    # at |oc| ~ 1000 = 20000x R_b -- the regime where the pack-time
    # radius widening's delta-space coverage (~2 a^2 R_b^2 * 1e-3 ~ 4e-4)
    # is ~4 ORDERS below the f32 rounding of the gate's discriminant
    # (~20 eps |oc|^2 ~ 2.4) and only _CULL_DELTA_EPS keeps skips safe.
    C = np.array([120.0, -340.0, 930.0])
    C = C / np.linalg.norm(C) * 1000.0
    centers = []
    for _ in range(600):
        u = rng.normal(size=3)
        c = C + u / np.linalg.norm(u) * 0.4
        centers.append(c)
        b.add_metallic_sphere(tuple(c), 0.05, (0.9, 0.9, 0.9), 0.0)
    scene = b.build()
    n = 1024
    # Aim every ray at a random cluster sphere's OUTER silhouette rim: the
    # grazing band where the block gate's true discriminant is far smaller
    # than its rounding error, while the sphere is still truly hit for
    # about half the rays (impact parameter 0.9-1.1 r).
    idx = rng.integers(0, len(centers), size=n)
    c = np.asarray(centers)[idx]
    tang = rng.normal(size=(n, 3))
    tang -= (tang * c).sum(1, keepdims=True) * c / (c * c).sum(1, keepdims=True)
    tang /= np.linalg.norm(tang, axis=1, keepdims=True)
    aim = c + tang * (0.05 * rng.uniform(0.9, 1.1, size=n))[:, None]
    d1 = aim / np.linalg.norm(aim, axis=1, keepdims=True)
    # Tile 2: 1024 COPIES of a found kill-shot direction. The cull vote is
    # per 1024-ray tile, so mixed-direction tiles are always rescued by
    # some lane whose gate discriminant rounds positive; only a UNIFORM
    # tile can be wrongly culled as a whole. This direction was searched
    # offline (f32 gate emulation over 100k silhouette rays, then
    # confirmed through the interpret-mode kernel): with
    # _CULL_DELTA_EPS = 0 the winning block's gate computes delta_b < 0
    # for it and cull on/off images DIVERGE; the shipped margin must keep
    # them byte-equal.
    kill = np.array(
        [0.11988540463865942, -0.34081958551765895, 0.9324534840313463]
    )
    d = jnp.asarray(
        np.concatenate([d1, np.tile(kill, (1024, 1))]), jnp.float32
    )
    o = jnp.zeros((2 * n, 3), jnp.float32)
    if kind == "box-sub":
        kind = "box"
        monkeypatch.setenv("RT_CULL_SUB", "4")
    monkeypatch.setenv("RT_CULL", kind)
    jax.clear_caches()
    if two_level:
        monkeypatch.setenv("RT_TWO_LEVEL_MIN", "513")
        jax.clear_caches()
    try:
        rad_cull, seg_cull = _run_fused(scene, o, d, 3)
        monkeypatch.setenv("RT_CULL", "0")
        jax.clear_caches()
        rad_ref, seg_ref = _run_fused(scene, o, d, 3)
    finally:
        jax.clear_caches()
    assert seg_cull == seg_ref
    assert np.array_equal(rad_cull, rad_ref)


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["sphere", "box", "box-sub"])
def test_cull_bit_transparent_axis_parallel(monkeypatch, kind):
    """Cull bit-transparency for EXACTLY-axis-parallel rays whose origin
    sits just OUTSIDE a block bound's widened x-extent -- the AABB gate's
    hardest case. With d_x == 0.0 the geometric slab test says 'never
    inside the x-slab', but at |oc| ~ 1000 the sweep's f32 discriminant
    rounding band (~eps * |oc|^2 ~ 0.06) dwarfs the true miss margin
    (delta_true ~ -2 a r gap ~ -2e-4), so grazing TRUE misses round into
    hits the gate must not cull. Only the PER-AXIS grazing margin
    (_CULL_GRAZE_EPS * (|o| + bmag) * |inv_axis|, astronomically large on
    the clamped parallel axis, unconstraining exactly that axis) keeps the
    skip conservative; a global margin or an unmargined slab test culls the
    whole cluster and diverges (verified: zeroing the margins flips this
    scenario from byte-equal to seg 1024 vs 3072 --
    scripts/probe_box_cull.py, which found the pinned direction; every
    silhouette-aimed d_x=0 candidate at this range exhibits the rounding).
    Uniform 1024-ray tile so no other lane can rescue the vote."""
    rng = np.random.default_rng(5)
    b = SceneBuilder()
    C = np.array([0.0, 0.0, 1000.0])
    for _ in range(600):
        u = rng.normal(size=3)
        c = C + u / np.linalg.norm(u) * 0.4
        b.add_metallic_sphere(tuple(c), 0.05, (0.9, 0.9, 0.9), 0.0)
    scene = b.build()
    if kind == "box-sub":
        kind = "box"
        monkeypatch.setenv("RT_CULL_SUB", "4")
    monkeypatch.setenv("RT_CULL", kind)
    jax.clear_caches()
    # Origin just past the widened x-extent of every cull block, computed
    # from the real pack-side bounds so the test tracks widening changes.
    # (With RT_CULL_SUB the table carries 8-float SUB-box records -- the
    # reshape(-1, 8) parsing below is layout-compatible.)
    geh, gec, shade, n = ptrace.pack_scene(scene)[:4]
    n_pad = geh.shape[0]
    blk = min(n_pad, ptrace._SWEEP_ROWS)
    _, bnd = ptrace._block_bounds(
        np.asarray(geh[:, :3]), np.asarray(shade[:, 3]), n, blk,
        jnp.zeros((3,), jnp.float32), kind,
    )
    bnd = np.asarray(bnd)
    if kind == "box":
        bnd = bnd.reshape(-1, 8)
        hix = bnd[bnd[:, 7] > 0.5, 3].max()
    else:
        bnd = bnd.reshape(-1, 4)  # [C, |C|^2 - R^2]
        cm2 = bnd[:, 3]
        live = cm2 < 1.0e37
        rad = np.sqrt((bnd[live, :3] ** 2).sum(1) - cm2[live])
        hix = (bnd[live, 0] + rad).max()
    X0 = np.float32(hix + 2.0e-4)
    kill = np.array([0.0, 4.999515113013331e-06, 1.0], np.float32)
    d = jnp.asarray(np.tile(kill, (1024, 1)), jnp.float32)
    o = jnp.asarray(
        np.tile(np.array([X0, 0.0, 0.0], np.float32), (1024, 1)), jnp.float32
    )
    try:
        rad_cull, seg_cull = _run_fused(scene, o, d, 3)
        monkeypatch.setenv("RT_CULL", "0")
        jax.clear_caches()
        rad_ref, seg_ref = _run_fused(scene, o, d, 3)
    finally:
        jax.clear_caches()
    assert seg_cull == seg_ref
    assert np.array_equal(rad_cull, rad_ref)


@pytest.mark.slow
def test_cull_box_overflow_fail_closed(monkeypatch):
    """Box-gate bit-transparency when slab products OVERFLOW f32: at
    |coord| ~ 1e9, an exactly-axis-parallel lane's coord * clamped-1e30
    reciprocal is inf and inf - inf = NaN inside the gate. The vote is
    written as negated reject comparisons so NaN lanes PASS (conservatively
    swept block) instead of wrongly culling.

    Teeth (the first draft of this test had none -- review catch): a
    UNIFORM 1024-ray tile, every lane d_x = 0.0 aimed exactly THROUGH a
    cluster sphere's center (guaranteed TRUE hit) with o_x = c_x ~ +1e9
    and the block's lo_x/hi_x ~ +1e9, so lo*inv = +inf and o*inv = +inf
    give NaN on the x axis for EVERY lane -- no generic lane can rescue
    the vote. A positive-form vote (NaN -> no pass) culls the winning
    block and loses the hit; the shipped negated form must stay
    byte-identical vs culling off."""
    rng = np.random.default_rng(17)
    b = SceneBuilder()
    C = np.array([1.2e9, 3.0e8, 9.0e8])
    centers = []
    for _ in range(600):
        u = rng.normal(size=3)
        c = C + u / np.linalg.norm(u) * 4.0e8 * rng.uniform(0.3, 1.0)
        c = np.abs(c)  # keep every coordinate positive: inf - inf, not inf+inf
        centers.append(c)
        b.add_metallic_sphere(tuple(c), 2.0e6, (0.9, 0.9, 0.9), 0.0)
    scene = b.build()
    c0 = centers[0]
    dyz = np.array([0.0, c0[1], c0[2]])
    dyz = dyz / np.linalg.norm(dyz)
    # Origin on the ray through c0's center, x pinned to c0's x exactly.
    o0 = np.array([c0[0], c0[1] - 5.0e8 * dyz[1], c0[2] - 5.0e8 * dyz[2]])
    d = jnp.asarray(np.tile(dyz, (1024, 1)), jnp.float32)
    o = jnp.asarray(np.tile(o0, (1024, 1)), jnp.float32)
    monkeypatch.setenv("RT_CULL", "box")
    jax.clear_caches()
    try:
        rad_cull, seg_cull = _run_fused(scene, o, d, 2)
        monkeypatch.setenv("RT_CULL", "0")
        jax.clear_caches()
        rad_ref, seg_ref = _run_fused(scene, o, d, 2)
    finally:
        jax.clear_caches()
    # The tile must actually trace a hit (else the A/B is vacuous).
    assert seg_ref > 1024, seg_ref
    assert seg_cull == seg_ref
    assert np.array_equal(rad_cull, rad_ref)


@pytest.mark.slow
def test_flat_blk_knob_invariance(monkeypatch):
    """RT_FLAT_BLK (trace-time flat-sweep block size, the shippable lever
    of the cover block-size A/B) must not change the image: a 300-sphere
    scene (n_pad 512) rendered at the default single 512-row block, then
    at 128-row blocks under every cull kind and at 256-row blocks, all
    byte-equal. 128/256 make the flat path MULTI-block, so this also
    pins that _aux_scene_inputs packs the cull bound tables at the knob's
    granularity (a mismatch culls wrong blocks and diverges loudly)."""
    rng = np.random.default_rng(23)
    b = SceneBuilder()
    for _ in range(300):
        b.add_metallic_sphere(rng.normal(size=3) * 6, rng.uniform(0.2, 0.5),
                              (0.9, 0.9, 0.9), 0.0)
    scene = b.build()
    n = 1024
    keys = _keys(n, seed=14)
    d = rrng.unit_vector(keys)
    o = jnp.zeros((n, 3), jnp.float32)
    try:
        rad_ref, seg_ref = _run_fused(scene, o, d, 3)
        for blk, kind in (
            ("128", "sphere"), ("128", "box"), ("128", "0"), ("256", "1")
        ):
            monkeypatch.setenv("RT_FLAT_BLK", blk)
            monkeypatch.setenv("RT_CULL", kind)
            jax.clear_caches()
            rad, seg = _run_fused(scene, o, d, 3)
            assert seg == seg_ref, (blk, kind)
            assert np.array_equal(rad, rad_ref), (blk, kind)
    finally:
        jax.clear_caches()


@pytest.mark.slow
def test_sweep_fma_matches_oracle(monkeypatch):
    """RT_SWEEP_FMA=1 (fma-chain flat sweep, hardware A/B candidate) is
    NOT bit-identical to the default -- the association changes last-ulp
    rounding -- but it must satisfy the same correctness bar as the
    default form: identical traced-segment count and radiance vs the XLA
    wavefront oracle, bounded exactly like the default-form test above
    (test_scene_larger_than_sweep_window): with 600 overlapping metal
    spheres a handful of near-tied winners may flip -- here additionally
    because the fma chain moves the last ulp of the roots -- so >= 99.5%
    of rays must match tightly and no deviation may exceed the tie-flip
    bound. Multi-block (n_pad 1024), cull on."""
    rng = np.random.default_rng(31)
    b = SceneBuilder()
    for _ in range(600):
        b.add_metallic_sphere(rng.normal(size=3) * 8, rng.uniform(0.2, 0.6),
                              (0.9, 0.9, 0.9), 0.0)
    scene = b.build()
    n = 1024
    keys = _keys(n, seed=16)
    d = rrng.unit_vector(keys)
    o = jnp.zeros((n, 3), jnp.float32)
    monkeypatch.setenv("RT_SWEEP_FMA", "1")
    jax.clear_caches()
    try:
        rad_p, seg_p = _run_fused(scene, o, d, 3)
    finally:
        jax.clear_caches()
    rad_x, seg_x = integrator.trace_rays(scene, o, d, keys, 3)
    assert seg_p == int(seg_x)
    rx = np.asarray(rad_x)
    rel = np.abs(rad_p - rx) / (np.abs(rx) + 1e-3)
    tight = (rel <= 1e-3).all(axis=1)
    assert tight.mean() >= 0.995, f"only {tight.mean():.4f} rays match tightly"
    assert rel.max() < 0.05, f"tie-flip deviation too large: {rel.max()}"


def test_flat_blk_knob_validated(monkeypatch):
    """A bad RT_FLAT_BLK raises at trace time instead of silently skipping
    scene rows (same posture as the import-time RT_SWEEP_ROWS checks)."""
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, 0.0, -2.0), 0.5, (0.9, 0.9, 0.9), 0.0)
    scene = b.build()
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (1024, 1))
    o = jnp.zeros((1024, 3), jnp.float32)
    for bad in ("96", "64", "1024"):
        monkeypatch.setenv("RT_FLAT_BLK", bad)
        jax.clear_caches()
        try:
            with pytest.raises(ValueError, match="RT_FLAT_BLK"):
                _run_fused(scene, o, d, 2)
        finally:
            jax.clear_caches()


def test_launch_validation_errors():
    """Bad tile sizing raises loudly from both kernel entry points
    (shared _tile_split; a silent truncation would drop rays)."""
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, 0.0, -1.0), 0.5, (0.8, 0.6, 0.2), 0.0)
    scene = b.build()
    o = jnp.zeros((1024, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0], jnp.float32), (1024, 1))
    with pytest.raises(ValueError, match="multiple of 1024"):
        ptrace.trace_rays_fused(
            scene, o, d, jnp.int32(0), jnp.int32(0), 2, tile_rays=512
        )
    with pytest.raises(ValueError, match="not divisible"):
        ptrace.trace_rays_fused(
            scene, o[:512], d[:512], jnp.int32(0), jnp.int32(0), 2,
            tile_rays=1024,
        )
    with pytest.raises(ValueError, match="not divisible"):
        ptrace.render_pixels_fused(
            scene, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
            jnp.zeros(3), jnp.zeros(3), jnp.float32(0.0), jnp.int32(8),
            jnp.int32(0), jnp.int32(0), jnp.int32(0), 512, 1, 2,
        )
