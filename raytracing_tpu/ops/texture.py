"""Albedo textures: checker + image, RTiOW book-2 semantics.

Realizes the reference's vendored-but-unwired texturing intent
(``/root/reference/third_party/stb/stb_image.h`` is vendored and
``Texture::from_file`` is commented out at
``/root/reference/src/renderer.common.cc:285-304``; ``BASELINE.json``
configs[2] names "checker + image-textured spheres" as a target config).
With no texture of its own to match, semantics follow the canonical RTiOW
book-2 definitions:

- ``checker_texture.value``: ``floor(inv_scale * p)`` per axis at the 3D hit
  point; the parity of the sum picks the even/odd color.
- ``get_sphere_uv`` on the outward unit normal ``n``:
  ``theta = acos(-n.y)``, ``phi = atan2(-n.z, n.x) + pi``;
  ``u = phi / 2pi``, ``v = theta / pi``.
- ``image_texture.value``: clamp u/v to [0,1], nearest texel
  ``i = u * W``, ``j = (1 - v) * H`` (clamped to the last texel), linear
  color = byte/255 (no sRGB de-gamma -- the book reads raw bytes).

The pallas megakernel implements the same formulas in-kernel
(ops/pallas/trace.py); this module is the XLA wavefront's path and the
reference implementation the kernel is tested against.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.types import Scene, TextureKind

TWO_PI = 6.283185307179586
_PI = 3.141592653589793
_HALF_PI = 1.5707963267948966

# atan(t)/t as a degree-7 polynomial in s = t^2 on [0, 1]; max abs error
# 2.9e-7 rad (f32-grade). Mosaic has no atan2/acos lowering, so BOTH
# backends use this shared implementation -- UV agreement between the XLA
# path and the pallas kernel is then by construction, not by libm luck.
_ATAN_COEF = (
    0.9999999228, -0.3333223262, 0.1997402858, -0.1404782123,
    0.1000220526, -0.06087448222, 0.02533170106, -0.005021063911,
)


def atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise atan2 via octant reduction + polynomial (kernel-safe)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    s = t * t
    p = jnp.float32(_ATAN_COEF[-1])
    for c in _ATAN_COEF[-2::-1]:
        p = p * s + jnp.float32(c)
    r = p * t
    r = jnp.where(ay > ax, _HALF_PI - r, r)
    r = jnp.where(x < 0.0, _PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def acos(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise acos in [0, pi] via atan2 (kernel-safe)."""
    xc = jnp.clip(x, -1.0, 1.0)
    return atan2(jnp.sqrt(jnp.maximum(1.0 - xc * xc, 0.0)), xc)


def sphere_uv(outward_normal: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Outward UNIT normals ``(B, 3)`` -> (u, v) each ``(B,)`` in [0, 1]."""
    n = outward_normal
    theta = acos(-n[..., 1])
    phi = atan2(-n[..., 2], n[..., 0]) + _PI
    return phi / TWO_PI, theta / _PI


def checker_select(
    p: jnp.ndarray, inv_scale: jnp.ndarray
) -> jnp.ndarray:
    """``(B,)`` bool: True where the 3D checker at hit points ``p`` is ODD."""
    xi = jnp.floor(inv_scale[..., None] * p)
    s = xi[..., 0] + xi[..., 1] + xi[..., 2]
    # Parity of an integer-valued f32: s/2 has a fractional part iff odd
    # (exact for |s| < 2^23).
    half = s * 0.5
    return half != jnp.floor(half)


def image_texel(
    textures: jnp.ndarray,
    tex_id: jnp.ndarray,
    tex_wh: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Nearest-texel fetch ``(B, 3)`` from the padded texture stack.

    ``tex_wh[:, 0/1]`` are the texture's true (width, height) inside the
    padded (TH, TW) stack plane (image_texture.value's clamped reads).
    """
    w = tex_wh[..., 0].astype(jnp.float32)
    h = tex_wh[..., 1].astype(jnp.float32)
    uu = jnp.clip(u, 0.0, 1.0)
    vv = jnp.clip(v, 0.0, 1.0)
    i = jnp.minimum(jnp.floor(uu * w), w - 1.0).astype(jnp.int32)
    j = jnp.minimum(jnp.floor((1.0 - vv) * h), h - 1.0).astype(jnp.int32)
    i = jnp.maximum(i, 0)
    j = jnp.maximum(j, 0)
    return textures[tex_id, j, i]


def surface_albedo(
    scene: Scene,
    idx: jnp.ndarray,
    p: jnp.ndarray,
    outward_normal: jnp.ndarray,
) -> jnp.ndarray:
    """Per-hit albedo ``(B, 3)``: solid color, checker, or image texel.

    ``idx``: hit sphere index per ray; ``p``: hit points; ``outward_normal``:
    unit normals pointing out of the sphere (pre front-face flip).
    """
    base = scene.albedo[idx]
    tk = scene.tex_kind[idx]

    odd = checker_select(p, scene.tex_inv_scale[idx])
    checker = jnp.where(odd[..., None], scene.albedo2[idx], base)

    u, v = sphere_uv(outward_normal)
    texel = image_texel(scene.textures, scene.tex_id[idx], scene.tex_wh[idx], u, v)

    albedo = jnp.where((tk == TextureKind.CHECKER)[..., None], checker, base)
    return jnp.where((tk == TextureKind.IMAGE)[..., None], texel, albedo)
