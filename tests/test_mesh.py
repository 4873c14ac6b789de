"""Triangle meshes: Moller-Trumbore, BVH build/traversal, glTF loading.

BASELINE configs[3] target ("triangle-mesh scene loaded via tinygltf with
BVH build + traversal"); the reference only vendors tinygltf
(/root/reference/third_party/tinygltf/, GLTFError at src/error.hpp:17-20).
"""

import base64
import json
import struct

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu.core import rng as rrng
from raytracing_tpu.models import integrator
from raytracing_tpu.ops import intersect as rintersect
from raytracing_tpu.scene import gltf as rgltf
from raytracing_tpu.scene import mesh as rmesh
from raytracing_tpu.scene.types import MaterialKind, SceneBuilder
from raytracing_tpu.utils import png


def _keys(n, seed=0):
    return rrng.ray_keys(jr.key(seed), jnp.arange(n, dtype=jnp.int32))


# --- BVH build ---------------------------------------------------------------


def test_bvh_structure_and_bounds():
    verts, faces = rmesh.make_icosphere(2)  # 320 tris
    v0, e1, e2 = rmesh.faces_to_soa(verts, faces)
    bvh = rmesh.build_bvh(v0, e1, e2)
    m = len(faces)
    assert sorted(bvh.order.tolist()) == list(range(m))
    # Root bounds contain the unit sphere.
    np.testing.assert_array_compare(np.less_equal, bvh.node_min[0], -0.99)
    np.testing.assert_array_compare(np.greater_equal, bvh.node_max[0], 0.99)
    # Leaves cover all triangles exactly once, in order.
    leaves = bvh.count > 0
    total = bvh.count[leaves].sum()
    assert total == m
    # Skip links: every skip points past the node, root's skip == K.
    k = len(bvh.skip)
    assert bvh.skip[0] == k
    assert (bvh.skip > np.arange(k)).all()
    # Each node's box contains its leaf triangles.
    for ni in np.flatnonzero(leaves)[:10]:
        f, c = bvh.first[ni], bvh.count[ni]
        ids = bvh.order[f : f + c]
        pts = np.concatenate([v0[ids], v0[ids] + e1[ids], v0[ids] + e2[ids]])
        assert (pts >= bvh.node_min[ni] - 1e-5).all()
        assert (pts <= bvh.node_max[ni] + 1e-5).all()


def test_bvh_matches_brute_force():
    """BVH traversal must return the identical closest hit as the O(M)
    masked min-reduction for every ray."""
    verts, faces = rmesh.make_icosphere(2)
    b = SceneBuilder()
    b.add_mesh(verts, faces, albedo=(0.5, 0.5, 0.5))
    scene = b.build()
    n = 2048
    d = rrng.unit_vector(_keys(n, 1))
    o = jnp.tile(jnp.array([[0.0, 0.0, 3.0]], jnp.float32), (n, 1))

    t_b, i_b, h_b = rintersect.intersect_triangles(o, d, scene)
    t_v, i_v, h_v = rintersect.intersect_triangles_bvh(o, d, scene)
    np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_v))
    hb = np.asarray(h_b)
    np.testing.assert_allclose(
        np.asarray(t_b)[hb], np.asarray(t_v)[hb], rtol=1e-6
    )
    # Index ties can differ only where two triangles share the exact t
    # (edges); demand equality for 99.9%+.
    same = (np.asarray(i_b) == np.asarray(i_v)) | ~hb
    assert same.mean() > 0.999


def test_ray_inside_and_grazing():
    # Single triangle in the z=-1 plane.
    b = SceneBuilder()
    b.add_mesh(
        np.array([[-1, -1, -1], [1, -1, -1], [0, 1, -1]], np.float32),
        np.array([[0, 1, 2]]),
    )
    scene = b.build()
    o = jnp.zeros((3, 3), jnp.float32)
    d = jnp.array(
        [[0, 0, -1.0], [0, 0, 1.0], [5.0, 0, -1.0]], jnp.float32
    )
    t, idx, hit = rintersect.intersect_triangles(o, d, scene)
    assert bool(hit[0]) and abs(float(t[0]) - 1.0) < 1e-6
    assert not bool(hit[1])   # behind
    assert not bool(hit[2])   # outside barycentric range


def test_triangle_hit_records_front_face():
    b = SceneBuilder()
    b.add_mesh(
        np.array([[-1, -1, -1], [1, -1, -1], [0, 1, -1]], np.float32),
        np.array([[0, 1, 2]]),
    )
    scene = b.build()
    o = jnp.array([[0, 0, 0.0], [0, 0, -2.0]], jnp.float32)
    d = jnp.array([[0, 0, -1.0], [0, 0, 1.0]], jnp.float32)
    t, idx, hit = rintersect.intersect_triangles(o, d, scene)
    p, nrm, front = rintersect.triangle_hit_records(o, d, t, idx, scene)
    assert bool(hit[0]) and bool(hit[1])
    nrm = np.asarray(nrm)
    # Normal must oppose the ray on both sides (two-sided triangle).
    assert nrm[0] @ [0, 0, -1] < 0
    assert nrm[1] @ [0, 0, 1] < 0


# --- integrator with meshes ---------------------------------------------------


def test_mesh_occludes_sky():
    """A big triangle 'wall' in front of the camera must darken radiance vs
    the empty sky, and a lambertian mesh + sphere scene must stay bounded."""
    b = SceneBuilder()
    b.add_mesh(
        np.array(
            [[-50, -50, -2], [50, -50, -2], [0, 80, -2]], np.float32
        ),
        np.array([[0, 1, 2]]),
        albedo=(0.1, 0.1, 0.1),
    )
    b.add_lambertian_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5))
    scene = b.build()
    n = 256
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    o = jnp.zeros_like(d)
    rad, seg = integrator.trace_rays(scene, o, d, _keys(n, 2), max_depth=4)
    rad = np.asarray(rad)
    assert rad.mean() < 0.2  # dark wall, not sky (sky would be ~0.75)
    assert np.isfinite(rad).all()
    assert int(seg) >= n


def test_mesh_closest_hit_vs_sphere():
    """A triangle in front of a sphere must win the closest-hit merge."""
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, 0.0, -3.0), 1.0, (1.0, 0.0, 0.0), 0.0)
    b.add_mesh(  # wall at z=-1, fully covering the sphere from the origin
        np.array([[-5, -5, -1], [5, -5, -1], [0, 8, -1]], np.float32),
        np.array([[0, 1, 2]]),
        albedo=(0.0, 1.0, 0.0),
    )
    scene = b.build()
    n = 64
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    o = jnp.zeros_like(d)
    rad, _ = integrator.trace_rays(scene, o, d, _keys(n, 3), max_depth=3)
    m = np.asarray(rad).mean(0)
    assert m[1] > m[0] + 0.05, m  # green wall, not red sphere


def test_mesh_render_end_to_end():
    verts, faces = rmesh.make_icosphere(1)
    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, -1000.0, 0.0), 1000.0, (0.5, 0.5, 0.5))
    b.add_mesh(verts * 1.0 + np.float32([0, 1, 0]), faces,
               albedo=(0.8, 0.3, 0.2))
    scene = b.build()
    params = rt.CameraParameters(
        aspect_ratio=2.0, image_width=64, samples_per_pixel=4, max_depth=4,
        vertical_fov=30.0, defocus_angle=0.0, focus_distance=5.0,
        lookfrom=(0.0, 1.5, 5.0), lookat=(0.0, 1.0, 0.0),
    )
    img = rt.Renderer(scene, params, seed=1, backend="xla").render()
    assert img.shape == (32, 64, 3)
    # The mesh ball must be visible: center rows redder than sky-blue top.
    center = img[12:20, 24:40].astype(float).mean(axis=(0, 1))
    top = img[0:4].astype(float).mean(axis=(0, 1))
    assert center[0] / max(center[2], 1) > top[0] / max(top[2], 1)


# --- glTF loader ---------------------------------------------------------------


def _tiny_gltf_doc(positions, indices, *, metallic=0.0, base=(1, 0, 0, 1)):
    pos = np.asarray(positions, np.float32)
    idx = np.asarray(indices, np.uint16)
    blob = pos.tobytes() + idx.tobytes()
    return {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [0.0, 0.0, -2.0]}],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0},
                "indices": 1,
                "material": 0,
            }]
        }],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": list(base),
                "metallicFactor": metallic,
                "roughnessFactor": 0.25,
            }
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(pos),
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": idx.size,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": pos.nbytes, "byteLength": idx.nbytes},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }, blob


def _write_glb(path, doc, blob):
    js = json.dumps(doc).encode()
    js += b" " * ((-len(js)) % 4)
    blob = blob + b"\x00" * ((-len(blob)) % 4)
    body = (
        struct.pack("<II", len(js), 0x4E4F534A) + js
        + struct.pack("<II", len(blob), 0x004E4942) + blob
    )
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, 12 + len(body)) + body)


def test_gltf_glb_roundtrip(tmp_path):
    positions = [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]]
    indices = [0, 1, 2, 2, 1, 3]
    doc, blob = _tiny_gltf_doc(positions, indices)
    p = tmp_path / "quad.glb"
    _write_glb(p, doc, blob)
    prims = rgltf.load_gltf(p)
    assert len(prims) == 1
    assert prims[0].faces.shape == (2, 3)
    # Node translation applied.
    np.testing.assert_allclose(prims[0].vertices[0], [0, 0, -2], atol=1e-6)
    assert prims[0].albedo == (1.0, 0.0, 0.0)
    assert not prims[0].metallic


def test_gltf_json_with_data_uri(tmp_path):
    positions = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    doc, blob = _tiny_gltf_doc(positions, [0, 1, 2], metallic=1.0,
                               base=(0.9, 0.8, 0.7, 1.0))
    doc["buffers"][0]["uri"] = (
        "data:application/octet-stream;base64,"
        + base64.b64encode(blob).decode()
    )
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(doc))
    prims = rgltf.load_gltf(p)
    assert prims[0].metallic and prims[0].fuzz == 0.25
    np.testing.assert_allclose(prims[0].albedo, (0.9, 0.8, 0.7))


def test_gltf_into_scene_builder(tmp_path):
    doc, blob = _tiny_gltf_doc(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]], [0, 1, 2]
    )
    p = tmp_path / "tri.glb"
    _write_glb(p, doc, blob)
    b = SceneBuilder()
    b.add_gltf(p, scale=2.0, translate=(0.0, 5.0, 0.0))
    scene = b.build()
    assert scene.has_triangles and scene.num_triangles == 1
    # scale*pos + translate, after the node's own -2 z translation.
    np.testing.assert_allclose(
        np.asarray(scene.tri_v0[0]), [0.0, 5.0, -4.0], atol=1e-5
    )
    assert int(scene.tri_mat_kind[0]) == MaterialKind.LAMBERTIAN


def test_gltf_rejects_garbage(tmp_path):
    p = tmp_path / "bad.glb"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(rgltf.GLTFError):
        rgltf.load_gltf(p)


# --- pallas kernel triangle parity --------------------------------------------


def _run_fused_rays(scene, o, d, depth, seed=3):
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from raytracing_tpu.ops.pallas import trace as ptrace

    if jax.default_backend() in ("tpu", "axon"):
        rad, seg = ptrace.trace_rays_fused(
            scene, o, d, jnp.int32(seed), jnp.int32(0), depth
        )
    else:
        with pltpu.force_tpu_interpret_mode():
            rad, seg = ptrace.trace_rays_fused(
                scene, o, d, jnp.int32(seed), jnp.int32(0), depth
            )
    return np.asarray(rad), int(seg)


def _metal_mesh_scene():
    """Deterministic: all-metal fuzz-0 icosphere + metal ground + a metal
    sphere, so kernel/XLA paths are RNG-free and must agree."""
    verts, faces = rmesh.make_icosphere(1)  # 80 tris
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0)
    b.add_metallic_sphere((1.5, 0.0, -2.0), 0.5, (0.9, 0.6, 0.2), 0.0)
    b.add_mesh(
        verts * 0.6 + np.float32([-0.9, 0.1, -2.0]), faces,
        albedo=(0.8, 0.8, 0.9), kind=MaterialKind.METALLIC, fuzz=0.0,
    )
    return b.build()


@pytest.mark.slow
def test_pallas_mesh_deterministic_parity():
    scene = _metal_mesh_scene()
    n = 1024
    keys = _keys(n, seed=6)
    d = rrng.unit_vector(keys)
    o = jnp.zeros((n, 3), jnp.float32)
    rad_p, seg_p = _run_fused_rays(scene, o, d, 5)
    rad_x, seg_x = integrator.trace_rays(scene, o, d, keys, 5)
    assert seg_p == int(seg_x), (seg_p, int(seg_x))
    rx = np.asarray(rad_x)
    err = np.abs(rad_p - rx)
    tight = (err <= 1e-3).all(axis=1)
    assert tight.mean() >= 0.995, f"only {tight.mean():.4f} rays match"
    assert np.abs(rad_p.mean(0) - rx.mean(0)).max() < 3e-3


@pytest.mark.slow
def test_pallas_mesh_two_level_parity():
    """>512 triangles (m_pad 2048) exercises the kernel's two-level
    triangle path (stage-1 window prefilter + collapsed-window exact
    re-test, ops/pallas/trace._closest_tri_two_level) against the XLA
    integrator on a deterministic all-metal scene."""
    verts, faces = rmesh.make_icosphere(3)  # 1280 tris
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0)
    b.add_mesh(
        verts * 0.8 + np.float32([0.0, 0.3, -2.0]), faces,
        albedo=(0.8, 0.8, 0.9), kind=MaterialKind.METALLIC, fuzz=0.0,
    )
    scene = b.build()
    assert scene.num_triangles == 1280
    n = 1024
    keys = _keys(n, seed=11)
    d = rrng.unit_vector(keys)
    o = jnp.zeros((n, 3), jnp.float32)
    rad_p, seg_p = _run_fused_rays(scene, o, d, 4)
    rad_x, seg_x = integrator.trace_rays(scene, o, d, keys, 4)
    assert seg_p == int(seg_x), (seg_p, int(seg_x))
    rx = np.asarray(rad_x)
    tight = (np.abs(rad_p - rx) <= 1e-3).all(axis=1)
    assert tight.mean() >= 0.995, f"only {tight.mean():.4f} rays match"
    assert np.abs(rad_p.mean(0) - rx.mean(0)).max() < 3e-3


@pytest.mark.slow
def test_pallas_mesh_two_level_radix_parity(monkeypatch):
    """RT_TWO_LEVEL_MXU=0 forces the two-level triangle path's radix/fori
    collapse fallback. m_pad = 2048 with the 256-row triangle stage-1
    blocks exercises the stage-1 vs collapse block-size split: the winner's
    collapse-block index must be derived from the COLLAPSE block size (512)
    inside _collapse_window_blocked, not the caller's stage-1 size --
    deriving it from the 256-row stage-1 size collapsed the wrong block for
    winners past row 255 (round-2 advisor finding)."""
    import jax

    monkeypatch.setenv("RT_TWO_LEVEL_MXU", "0")
    # The knob is read at trace time; drop cached executables so both this
    # trace and later default-config traces see their own env.
    jax.clear_caches()
    try:
        verts, faces = rmesh.make_icosphere(3)  # 1280 tris -> m_pad 2048
        b = SceneBuilder()
        b.add_metallic_sphere(
            (0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0
        )
        b.add_mesh(
            verts * 0.8 + np.float32([0.0, 0.3, -2.0]), faces,
            albedo=(0.8, 0.8, 0.9), kind=MaterialKind.METALLIC, fuzz=0.0,
        )
        scene = b.build()
        n = 1024
        keys = _keys(n, seed=11)
        d = rrng.unit_vector(keys)
        o = jnp.zeros((n, 3), jnp.float32)
        rad_p, seg_p = _run_fused_rays(scene, o, d, 4)
        rad_x, seg_x = integrator.trace_rays(scene, o, d, keys, 4)
        assert seg_p == int(seg_x), (seg_p, int(seg_x))
        rx = np.asarray(rad_x)
        tight = (np.abs(rad_p - rx) <= 1e-3).all(axis=1)
        assert tight.mean() >= 0.995, f"only {tight.mean():.4f} rays match"
        assert np.abs(rad_p.mean(0) - rx.mean(0)).max() < 3e-3
    finally:
        jax.clear_caches()


@pytest.mark.slow
def test_pallas_mesh_triple_form_parity(monkeypatch):
    """RT_TRI_FORM=triple (the packed-n' triple-product candidate key --
    measured-rejected probe variant, ops/pallas/trace._tri_form) must
    still agree with the XLA oracle on BOTH triangle paths: the 1280-tri
    two-level path (14-column collapse incl. the n' re-key columns) and
    the 80-tri flat path. Keys may flip near-tie winners vs classic (the
    accepted class), so the assertion is the standard oracle-parity bound,
    not bit-equality with the classic form."""
    import jax

    monkeypatch.setenv("RT_TRI_FORM", "triple")
    jax.clear_caches()
    try:
        for scene, ntri in (
            (_metal_mesh_scene(), 80),  # flat (m_pad 128)
        ):
            assert scene.num_triangles == ntri
            n = 1024
            keys = _keys(n, seed=13)
            d = rrng.unit_vector(keys)
            o = jnp.zeros((n, 3), jnp.float32)
            rad_p, seg_p = _run_fused_rays(scene, o, d, 4)
            rad_x, seg_x = integrator.trace_rays(scene, o, d, keys, 4)
            assert seg_p == int(seg_x), (seg_p, int(seg_x))
            rx = np.asarray(rad_x)
            tight = (np.abs(rad_p - rx) <= 1e-3).all(axis=1)
            assert tight.mean() >= 0.995, f"only {tight.mean():.4f} match"
        # Two-level path (1280 tris -> m_pad 2048, 256-row stage 1).
        verts, faces = rmesh.make_icosphere(3)
        b = SceneBuilder()
        b.add_metallic_sphere(
            (0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0
        )
        b.add_mesh(
            verts * 0.8 + np.float32([0.0, 0.3, -2.0]), faces,
            albedo=(0.8, 0.8, 0.9), kind=MaterialKind.METALLIC, fuzz=0.0,
        )
        scene = b.build()
        n = 1024
        keys = _keys(n, seed=13)
        d = rrng.unit_vector(keys)
        o = jnp.zeros((n, 3), jnp.float32)
        rad_p, seg_p = _run_fused_rays(scene, o, d, 4)
        rad_x, seg_x = integrator.trace_rays(scene, o, d, keys, 4)
        assert seg_p == int(seg_x), (seg_p, int(seg_x))
        rx = np.asarray(rad_x)
        tight = (np.abs(rad_p - rx) <= 1e-3).all(axis=1)
        assert tight.mean() >= 0.995, f"only {tight.mean():.4f} match"
    finally:
        jax.clear_caches()


@pytest.mark.slow
def test_pallas_mesh_flat_mxu_matches_radix_bitexact(monkeypatch):
    """The flat (<= _SWEEP_ROWS) triangle winner fetch on the MXU
    (_tri_winner mxu_ref, round 3) must reproduce the VPU radix gather's
    radiance BIT-FOR-BIT -- byte planes are exact in any matmul precision
    and the packed material words stay int32 end to end."""
    import jax

    scene = _metal_mesh_scene()  # 80 tris -> m_pad 128 (flat path)
    n = 1024
    keys = _keys(n, seed=9)
    d = rrng.unit_vector(keys)
    o = jnp.zeros((n, 3), jnp.float32)
    rad_mxu, seg_mxu = _run_fused_rays(scene, o, d, 5)
    monkeypatch.setenv("RT_GATHER", "radix")
    jax.clear_caches()
    try:
        rad_radix, seg_radix = _run_fused_rays(scene, o, d, 5)
    finally:
        jax.clear_caches()
    assert seg_mxu == seg_radix
    assert np.array_equal(rad_mxu, rad_radix)


@pytest.mark.slow
def test_pallas_mesh_only_scene():
    """Triangles with ZERO spheres through the kernel."""
    verts, faces = rmesh.make_icosphere(1)
    b = SceneBuilder()
    b.add_mesh(verts, faces, albedo=(0.9, 0.2, 0.2),
               kind=MaterialKind.METALLIC, fuzz=0.0)
    scene = b.build()
    assert scene.num_objects == 0 and scene.has_triangles
    n = 1024
    keys = _keys(n, 8)
    # Spread directions (identical rays would concentrate the whole batch on
    # one possibly-edge-grazing triangle where backend tie-breaks differ).
    d = rrng.unit_vector(keys)
    o = jnp.tile(jnp.array([[0.0, 0.0, 3.0]], jnp.float32), (n, 1))
    rad_p, seg_p = _run_fused_rays(scene, o, d, 4)
    rad_x, seg_x = integrator.trace_rays(scene, o, d, keys, 4)
    assert seg_p == int(seg_x)
    rx = np.asarray(rad_x)
    tight = (np.abs(rad_p - rx) <= 1e-3).all(axis=1)
    # Edge-adjacent triangle ties may flip between backends (quantized
    # packed keys + approx-reciprocal candidates vs exact argmin).
    assert tight.mean() >= 0.99, f"only {tight.mean():.4f} rays match"
    assert np.abs(rad_p.mean(0) - rx.mean(0)).max() < 2e-2


def test_cli_gltf_end_to_end(tmp_path):
    """--gltf through the real CLI: a .glb asset merges into the configured
    world (spec syntax PATH:SCALE:TX,TY,TZ) and renders to PNG. Hermetic
    child env (tunnel-down-proof, same pattern as test_examples.py)."""
    import os
    import subprocess
    import sys

    positions = [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]]
    indices = [0, 1, 2, 2, 1, 3]
    doc, blob = _tiny_gltf_doc(positions, indices)
    p = tmp_path / "quad.glb"
    _write_glb(p, doc, blob)
    out = tmp_path / "gltf.png"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=repo,
    )
    proc = subprocess.run(
        [
            sys.executable, "-m", "raytracing_tpu",
            "--config", "data/config/world.config.json",
            "--width", "64", "--spp", "1", "--depth", "2",
            "--gltf", f"{p}:2.0:0,1,-3",
            "--out", str(out),
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    img = png.read_png(str(out))
    assert img.shape[0] > 0 and np.isfinite(img.astype(np.float32)).all()


def test_large_mesh_20k_tris_packs_and_renders():
    """Large-mesh threshold (VERDICT r4 item 6): a >= 20k-triangle asset
    (the asymptote class tinygltf was vendored for) must pack cleanly,
    select the two-level triangle path at its padded size, and render
    finite non-trivial radiance through the BVH-traversal backend. (The
    Pallas path at this size is hardware-benched -- bench.py --scene
    mesh:5 -- interpret mode at 32k rows is impractical for CI.)"""
    from raytracing_tpu.ops.pallas import trace as ptrace

    cam0, scene = rt.make_world_mesh(image_width=64, subdivisions=5)
    assert scene.num_triangles == 20480
    tri_tab, m_actual = ptrace.pack_triangles(scene)[:2]
    assert m_actual == 20480 and tri_tab.shape[0] == 32768
    assert ptrace._two_level_enabled(tri_tab.shape[0], tri=True)
    # Stage-1 triangle blocks stay within the scoped-vmem budget class
    # (256 rows by default; RT_TRI_BLK=512 is toolchain-blocked).
    assert ptrace._tri_blk(tri_tab.shape[0]) == 256
    import dataclasses

    params = dataclasses.replace(
        cam0, image_width=64, samples_per_pixel=2, max_depth=3,
        aspect_ratio=2.0,
    )
    img = rt.Renderer(scene, params, seed=3, backend="xla").render()
    assert img.shape == (32, 64, 3)
    assert np.isfinite(img.astype(np.float32)).all()
    assert img.std() > 10  # sky + ground + mesh actually shaded


@pytest.mark.slow
def test_renderer_mesh_pallas_vs_xla_image():
    scene = _metal_mesh_scene()
    params = rt.CameraParameters(
        aspect_ratio=2.0, image_width=64, samples_per_pixel=8, max_depth=5,
        vertical_fov=45.0, defocus_angle=0.0, focus_distance=3.0,
        lookfrom=(0.0, 0.6, 1.5), lookat=(0.0, 0.0, -2.0),
    )
    img_x = rt.Renderer(scene, params, seed=2, backend="xla").render()
    img_p = rt.Renderer(scene, params, seed=2, backend="pallas").render()
    bx = img_x.astype(np.float32).reshape(8, 4, 16, 4, 3).mean(axis=(1, 3))
    bp = img_p.astype(np.float32).reshape(8, 4, 16, 4, 3).mean(axis=(1, 3))
    assert np.abs(bx - bp).max() < 28.0, np.abs(bx - bp).max()


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["sphere", "box"])
def test_pallas_mesh_cull_bit_transparent_dynamic_range(monkeypatch, kind):
    """Triangle cull bit-transparency in the HOSTILE regime: 600 small
    disconnected triangles (edge ~0.05) on a 0.4 shell at distance 1000
    (m_pad 1024, two-level path, 256-row cull blocks), rays aimed at edge
    midpoints of the most positive-x triangles with EXACTLY axis-parallel
    d_x = 0 from just outside the widened x-extent, plus a random-grazing
    band. Unlike the sphere quadratic, no single-rounding-flip kill-shot is
    CONSTRUCTIBLE for Moller-Trumbore here: its barycentric rounding band
    is spatially ~3 eps |oc| ~ 2e-7 |oc| (edge-size-independent), always
    ~5x under the pack-time box pad's coordinate-relative term -- measured
    zero flips in 2048 directed candidates (scripts/probe_box_cull.py
    --tri, analysis in its docstring). This A/B pins the scenario anyway:
    it exercises the triangle box gate's clamped-reciprocal axis-parallel
    path and would catch any pad/margin/layout regression that reopens the
    class."""
    import importlib.util
    import pathlib

    import jax

    # The scene is shared with the probe that recorded the no-kill-shot
    # analysis (single source so they cannot desynchronize).
    spec = importlib.util.spec_from_file_location(
        "probe_box_cull",
        pathlib.Path(__file__).parent.parent / "scripts" / "probe_box_cull.py",
    )
    probe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(probe)
    rng = np.random.default_rng(5)
    scene, tris = probe.build_tri_scene(rng)
    C = np.array([0.0, 0.0, 1000.0])
    monkeypatch.setenv("RT_CULL", kind)
    jax.clear_caches()
    import raytracing_tpu.ops.pallas.trace as ptrace

    tri_table, tri_m = ptrace.pack_triangles(scene)
    m_pad = tri_table.shape[0]
    blk = ptrace._tri_blk(m_pad)
    _, bnd = ptrace._tri_block_bounds(
        tri_table[:, 0:3], tri_table[:, 3:6], tri_table[:, 6:9],
        tri_m, blk, jnp.zeros((3,), jnp.float32), kind,
    )
    bnd = np.asarray(bnd)
    tarr = np.asarray(tris)
    if kind == "box":
        bnd = bnd.reshape(-1, 8)
        hix = bnd[bnd[:, 7] > 0.5, 3].max()
    else:
        bnd = bnd.reshape(-1, 4)
        cm2 = bnd[:, 3]
        live = cm2 < 1.0e37
        rad = np.sqrt((bnd[live, :3] ** 2).sum(1) - cm2[live])
        hix = (bnd[live, 0] + rad).max()
    X0 = np.float32(hix + 2.0e-4)
    # Tile 1: 1024 edge-aimed axis-parallel rays. Tile 2: 1024 random rays
    # grazing the cluster from the origin (genuine hits tighten cur_hi so
    # far blocks face a real t-test).
    vmax = tarr.max(axis=1)[:, 0]
    order = np.argsort(-vmax)
    dirs = []
    i = 0
    while len(dirs) < 1024:
        a3, b3, c3 = tarr[order[i % 16]]
        mid = 0.5 * (a3 if i % 3 else b3) + 0.5 * c3
        aim = mid + rng.normal(size=3) * 5.0e-3
        dyz = aim[1:] / np.linalg.norm(aim[1:])
        dirs.append([0.0, dyz[0], dyz[1]])
        i += 1
    d1 = np.asarray(dirs, np.float32)
    d1[:, 0] = 0.0
    o1 = np.tile(np.array([X0, 0.0, 0.0], np.float32), (1024, 1))
    aim2 = C + rng.normal(size=(1024, 3)) * 0.45
    d2 = (aim2 / np.linalg.norm(aim2, axis=1, keepdims=True)).astype(
        np.float32
    )
    o2 = np.zeros((1024, 3), np.float32)
    o = jnp.asarray(np.concatenate([o1, o2]), jnp.float32)
    d = jnp.asarray(np.concatenate([d1, d2]), jnp.float32)
    try:
        # depth 2 keeps the always-run suite lean; the gate's hostile
        # paths are all exercised on the first two segments.
        rad_cull, seg_cull = _run_fused_rays(scene, o, d, 2)
        monkeypatch.setenv("RT_CULL", "0")
        jax.clear_caches()
        rad_ref, seg_ref = _run_fused_rays(scene, o, d, 2)
    finally:
        jax.clear_caches()
    assert seg_cull == seg_ref
    assert np.array_equal(rad_cull, rad_ref)


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["sphere", "box", "box-sub"])
def test_pallas_mesh_cull_bit_transparent(monkeypatch, kind):
    """Triangle analog of test_sphere_cull_bit_transparent: the per-block
    reject (both bound kinds: bounding sphere and AABB) over the 256-row
    triangle stage-1 blocks must leave radiance bit-identical (1280 tris
    -> m_pad 2048 = 8 cull blocks). 'box-sub' = the box gate with
    RT_CULL_SUB=4 sub-AABBs per block (union-of-sub-boxes gate)."""
    import jax

    verts, faces = rmesh.make_icosphere(3)  # 1280 tris -> m_pad 2048
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0)
    b.add_mesh(
        verts * 0.8 + np.float32([0.0, 0.3, -2.0]), faces,
        albedo=(0.8, 0.8, 0.9), kind=MaterialKind.METALLIC, fuzz=0.0,
    )
    scene = b.build()
    n = 1024
    keys = _keys(n, seed=13)
    d = rrng.unit_vector(keys)
    o = jnp.zeros((n, 3), jnp.float32)
    if kind == "box-sub":
        kind = "box"
        monkeypatch.setenv("RT_CULL_SUB", "4")
    monkeypatch.setenv("RT_CULL", kind)
    jax.clear_caches()
    try:
        rad_cull, seg_cull = _run_fused_rays(scene, o, d, 4)
        monkeypatch.setenv("RT_CULL", "0")
        jax.clear_caches()
        rad_ref, seg_ref = _run_fused_rays(scene, o, d, 4)
    finally:
        jax.clear_caches()
    assert seg_cull == seg_ref
    assert np.array_equal(rad_cull, rad_ref)


@pytest.mark.slow
@pytest.mark.parametrize("hint", ["1", "0"])
def test_pallas_mesh_cull_hint_occluder_bit_transparent(monkeypatch, hint):
    """Cross-primitive cull seeding (RT_CULL_HINT) in its MAXIMAL regime:
    a large metal sphere sits strictly in front of the whole icosphere
    mesh, so every forward lane's sphere winner t is closer than every
    triangle -- with the hint, all 8 triangle cull blocks are skipped for
    the whole first segment. Radiance must stay byte-identical to the
    unculled render (hint '1') and the hint knob itself must be a pure
    gate tightening (hint '0' == same unculled image). Grazing rays at
    the occluder's silhouette exercise the near-tie band the 1% + 1e-3
    compare slack must cover (the sphere t and first triangle t differ
    by ~the sphere-mesh gap there, far above the ~5e-4 key quantization,
    so the directed scenario is safe by construction -- the random tile
    below also mixes occluded/unoccluded lanes so partial votes occur)."""
    import jax

    verts, faces = rmesh.make_icosphere(3)  # 1280 tris -> m_pad 2048
    b = SceneBuilder()
    b.add_mesh(
        verts * 0.9 + np.float32([0.0, 0.0, -4.0]), faces,
        albedo=(0.8, 0.8, 0.9), kind=MaterialKind.METALLIC, fuzz=0.0,
    )
    # Occluder: covers the mesh from the origin's view (radius chosen so
    # silhouette rays graze it and still reach mesh triangles behind).
    b.add_metallic_sphere((0.0, 0.0, -2.0), 0.55, (0.9, 0.9, 0.9), 0.0)
    scene = b.build()
    rng = np.random.default_rng(31)
    # Tile 1: 1024 rays straight at the occluder center (all seeded).
    d1 = np.tile(np.float32([0.0, 0.0, -1.0]), (1024, 1))
    d1[:, :2] += rng.normal(size=(1024, 2)).astype(np.float32) * 0.02
    # Tile 2: silhouette-grazing + wide rays (mixed seeded/unseeded votes).
    ang = 0.55 / 2.0  # occluder angular radius from origin ~ r/z
    theta = ang * rng.uniform(0.85, 1.6, size=1024)
    phi = rng.uniform(0.0, 2 * np.pi, size=1024)
    d2 = np.stack(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi),
         -np.cos(theta)], axis=1,
    ).astype(np.float32)
    d = jnp.asarray(np.concatenate([d1, d2]), jnp.float32)
    o = jnp.zeros((2048, 3), jnp.float32)
    monkeypatch.setenv("RT_CULL_HINT", hint)
    jax.clear_caches()
    try:
        rad_cull, seg_cull = _run_fused_rays(scene, o, d, 3)
        monkeypatch.setenv("RT_CULL", "0")
        jax.clear_caches()
        rad_ref, seg_ref = _run_fused_rays(scene, o, d, 3)
    finally:
        jax.clear_caches()
    assert seg_cull == seg_ref
    assert np.array_equal(rad_cull, rad_ref)


def test_make_world_meshes_scene_shape():
    """Multi-object mesh scene (bench `meshes:K`): K icosphere instances +
    occluders; exact triangle/sphere counts and every mesh AABB disjoint
    (separated instances => separable cull blocks)."""
    cam, scene = rt.make_world_meshes(4, image_width=64, subdivisions=1)
    assert scene.has_triangles
    assert scene.num_triangles == 4 * 80  # 20 * 4^1 per instance
    # ground + 2 occluders (i = 0, 2) + 1 dielectric = 4 spheres
    assert scene.num_objects == 4
    v = np.asarray(scene.tri_v0)
    xs = sorted(
        float(v[i * 80 : (i + 1) * 80, 0].mean()) for i in range(4)
    )
    gaps = np.diff(xs)
    assert (gaps > 2.0).all()  # instances are separated along x


@pytest.mark.slow
@pytest.mark.parametrize("knob", ["cull", "hint"])
def test_world_meshes_cull_bit_transparent(monkeypatch, knob):
    """The meshes:K workload the round-3 cull machinery was built for
    (occluders in front of whole instances): per-block triangle cull and
    cross-primitive hint seeding must stay byte-transparent on it."""
    import jax

    _, scene = rt.make_world_meshes(4, image_width=64, subdivisions=2)
    rng = np.random.default_rng(17)
    # Camera-shaped primaries: from the scene's lookfrom toward the
    # instance row (mixing occluded and open lanes in every tile), plus a
    # jittered spread so bounce-like divergent rays occur by depth 2.
    o = np.tile(np.float32([0.0, 2.6, 9.0]), (2048, 1))
    targets = np.float32(rng.uniform([-5.5, 0.0, -1.0], [5.5, 2.2, 3.5],
                                     size=(2048, 3)))
    d = targets - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    if knob == "hint":
        monkeypatch.setenv("RT_CULL_HINT", "1")
    jax.clear_caches()
    try:
        rad_on, seg_on = _run_fused_rays(scene, o, d, 3)
        monkeypatch.setenv("RT_CULL", "0")
        monkeypatch.setenv("RT_CULL_HINT", "0")
        jax.clear_caches()
        rad_off, seg_off = _run_fused_rays(scene, o, d, 3)
    finally:
        jax.clear_caches()
    assert seg_on == seg_off
    assert np.array_equal(rad_on, rad_off)
