"""Color pipeline parity with the reference's RGBAColor quantization
(color.hpp:9-35): uint8(clamp(linear_to_gamma(v), 0, 0.999) * 256)."""

import jax.numpy as jnp
import numpy as np

from raytracing_tpu.core import color as rcolor


def _expected_u8(v: np.ndarray) -> np.ndarray:
    gamma = np.where(v > 0, np.sqrt(np.maximum(v, 0)), 0.0)
    return (np.clip(gamma, 0.0, 0.999) * 256.0).astype(np.uint8)


def test_quantization_matches_reference_formula():
    v = np.concatenate(
        [
            np.linspace(-0.5, 2.0, 1002, dtype=np.float32),
            np.array([0.0, 1.0, 0.999, 0.9980013, 1e-8, np.float32(0.999**2)],
                     dtype=np.float32),
        ]
    ).reshape(-1, 3)
    got = np.asarray(rcolor.rgb_to_u8(jnp.asarray(v)))
    np.testing.assert_array_equal(got, _expected_u8(v))


def test_max_channel_is_255():
    # clamp to 0.999 then *256 truncates to 255 (color.hpp:32-35 / RTiOW).
    v = jnp.array([[10.0, 1.0, 0.9999]])
    assert np.asarray(rcolor.rgb_to_u8(v)).max() == 255


def test_negative_radiance_is_black():
    v = jnp.array([[-1.0, -0.0, 0.0]])
    np.testing.assert_array_equal(np.asarray(rcolor.rgb_to_u8(v))[0], [0, 0, 0])


def test_rgba_alpha_not_gamma_corrected():
    # alpha 1.0 -> clamp 0.999 * 256 = 255; alpha 0.25 -> 64 (no sqrt).
    img = jnp.full((2, 2, 3), 0.25, jnp.float32)
    rgba = np.asarray(rcolor.rgba_to_u8(img, alpha=0.25))
    assert rgba.shape == (2, 2, 4)
    assert (rgba[..., 3] == 64).all()
    # rgb channel went through gamma: sqrt(0.25)=0.5 -> 128.
    assert (rgba[..., 0] == 128).all()
