"""Color pipeline: linear radiance -> gamma -> packed 8-bit RGBA.

TPU-native, batched equivalent of the reference's ``src/color.hpp``:

- ``linear_to_gamma``: sqrt for positive values, 0 otherwise
  (``color.hpp:9-14``).
- quantization: ``clamp(v, 0, 0.999) * 256`` truncated to uint8, so the max
  channel value is 255 (``color.hpp:32-35``, matching RTiOW). Alpha follows
  the same clamp *without* gamma (``color.hpp:35``); with the tracer's
  constant alpha of 1.0 that is always 255 (``color.hpp:30`` builds vec4 with
  a = 1).

The reference packs little-endian u32 ``0xAABBGGRR`` via a union
(``color.hpp:16-26``); here images are plain ``uint8[H, W, 4]`` (or ``[..., 3]``
for RGB) which serializes identically byte-for-byte.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_to_gamma(value: jnp.ndarray) -> jnp.ndarray:
    """sqrt gamma for positive values, 0 otherwise (``color.hpp:9-14``)."""
    return jnp.where(value > 0.0, jnp.sqrt(jnp.maximum(value, 0.0)), 0.0)


def quantize_channel(value: jnp.ndarray) -> jnp.ndarray:
    """``uint8(clamp(v, 0, 0.999) * 256)`` -- ``color.hpp:32-35``."""
    return (jnp.clip(value, 0.0, 0.999) * 256.0).astype(jnp.uint8)


def rgb_to_u8(linear_rgb: jnp.ndarray) -> jnp.ndarray:
    """Linear RGB float array ``[..., 3]`` -> gamma'd ``uint8[..., 3]``."""
    return quantize_channel(linear_to_gamma(linear_rgb))


def rgba_to_u8(linear_rgb: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    """Linear RGB ``[..., 3]`` -> ``uint8[..., 4]`` RGBA.

    Alpha is clamped+quantized but NOT gamma corrected, matching
    ``color.hpp:35``; the tracer always passes alpha = 1 (``color.hpp:30``).
    """
    rgb = rgb_to_u8(linear_rgb)
    a = quantize_channel(jnp.full(linear_rgb.shape[:-1] + (1,), alpha, linear_rgb.dtype))
    return jnp.concatenate([rgb, a], axis=-1)
