"""Golden tests for the L0 ops against independent numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.ops import (
    upfirdn2d, make_kernel, upsample2d, downsample2d, blur,
    fused_leaky_relu, fused_leaky_relu_pallas, equal_linear, pixel_norm,
    modulated_conv2d,
)
from oracles import upfirdn2d_np, modulated_conv2d_np, leaky_relu_np


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 1)),
    (2, 1, (2, 1)),     # Upsample(k4, factor 2) pads
    (1, 2, (1, 1)),     # Downsample(k4) pads
    (1, 1, (2, 2)),
    (2, 1, (1, 1)),
    (1, 1, (0, 0)),
    (1, 1, (-1, -1)),   # negative pad = crop
])
def test_upfirdn2d_matches_oracle(rng, up, down, pad):
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    k = rng.rand(4, 4).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad))
    want = upfirdn2d_np(x, k, up=up, down=down, pad=pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_asymmetric(rng):
    x = rng.randn(1, 5, 7, 2).astype(np.float32)
    k = rng.rand(3, 3).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k),
                               up=(2, 1), down=(1, 2), pad=(1, 0, 2, 1)))
    want = upfirdn2d_np(x, k, up=(2, 1), down=(1, 2), pad=(1, 0, 2, 1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_make_kernel_1d_outer_product():
    k = np.asarray(make_kernel([1, 3, 3, 1]))
    assert k.shape == (4, 4)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    t = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32)
    np.testing.assert_allclose(k, t / t.sum(), rtol=1e-6)


def test_upsample_downsample_shapes(rng):
    x = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    k_up = make_kernel([1, 3, 3, 1], gain=4)
    k_dn = make_kernel([1, 3, 3, 1])
    assert upsample2d(x, k_up).shape == (1, 32, 32, 4)
    assert downsample2d(x, k_dn).shape == (1, 8, 8, 4)


def test_upsample_constant_preserved():
    # A constant image upsampled with a normalized kernel (gain=4) stays
    # constant in the interior (partition-of-unity across phases).
    x = jnp.ones((1, 8, 8, 1), jnp.float32) * 3.0
    k = make_kernel([1, 3, 3, 1], gain=4)
    y = np.asarray(upsample2d(x, k))
    np.testing.assert_allclose(y[0, 2:-2, 2:-2, 0], 3.0, rtol=1e-5)


def test_fused_leaky_relu_matches_formula(rng):
    x = rng.randn(4, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    want = leaky_relu_np(x + b) * np.sqrt(2.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fused_leaky_relu_pallas_fwd_bwd(rng):
    x = rng.randn(8, 128).astype(np.float32)
    b = rng.randn(128).astype(np.float32)
    xj, bj = jnp.asarray(x), jnp.asarray(b)

    y = fused_leaky_relu_pallas(xj, bj)
    np.testing.assert_allclose(np.asarray(y), np.asarray(fused_leaky_relu(xj, bj)),
                               rtol=1e-6)

    def f_pallas(x, b):
        return jnp.sum(fused_leaky_relu_pallas(x, b) ** 2)

    def f_ref(x, b):
        return jnp.sum(fused_leaky_relu(x, b) ** 2)

    gx_p, gb_p = jax.grad(f_pallas, argnums=(0, 1))(xj, bj)
    gx_r, gb_r = jax.grad(f_ref, argnums=(0, 1))(xj, bj)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r), rtol=1e-5, atol=1e-5)


def test_fused_leaky_relu_pallas_4d(rng):
    x = rng.randn(2, 4, 4, 128).astype(np.float32)
    b = rng.randn(128).astype(np.float32)
    got = np.asarray(fused_leaky_relu_pallas(jnp.asarray(x), jnp.asarray(b)))
    want = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_equal_linear_scale(rng):
    x = rng.randn(3, 16).astype(np.float32)
    w = rng.randn(8, 16).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    got = np.asarray(equal_linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                  lr_mul=0.01))
    scale = 0.01 / np.sqrt(16)
    want = x @ (w * scale).T + b * 0.01
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_pixel_norm(rng):
    x = rng.randn(4, 512).astype(np.float32)
    y = np.asarray(pixel_norm(jnp.asarray(x)))
    want = x / np.sqrt((x ** 2).mean(axis=-1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(y, want, rtol=1e-5)


@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv_matches_per_sample_oracle(rng, demodulate):
    x = rng.randn(2, 8, 8, 6).astype(np.float32)
    w = rng.randn(3, 3, 6, 10).astype(np.float32)
    s = (rng.randn(2, 6) * 0.5 + 1.0).astype(np.float32)
    got = np.asarray(modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
                                      demodulate=demodulate))
    want = modulated_conv2d_np(x, w, s, demodulate=demodulate)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_modulated_conv_1x1(rng):
    # ToRGB uses k=1, no demod.
    x = rng.randn(2, 8, 8, 6).astype(np.float32)
    w = rng.randn(1, 1, 6, 3).astype(np.float32)
    s = rng.randn(2, 6).astype(np.float32)
    got = np.asarray(modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
                                      demodulate=False))
    want = modulated_conv2d_np(x, w, s, demodulate=False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_modulated_conv_upsample_shape_and_linearity(rng):
    x = rng.randn(2, 8, 8, 6).astype(np.float32)
    w = rng.randn(3, 3, 6, 10).astype(np.float32)
    s = (rng.randn(2, 6) * 0.5 + 1.0).astype(np.float32)
    y = np.asarray(modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
                                    upsample=True))
    assert y.shape == (2, 16, 16, 10)
    # Linearity in x (demod fixed by the same style): f(2x) = 2 f(x)
    y2 = np.asarray(modulated_conv2d(jnp.asarray(2 * x), jnp.asarray(w), jnp.asarray(s),
                                     upsample=True))
    np.testing.assert_allclose(y2, 2 * y, rtol=1e-4, atol=1e-4)


def test_modulated_conv_downsample_shape(rng):
    x = rng.randn(2, 16, 16, 6).astype(np.float32)
    w = rng.randn(3, 3, 6, 10).astype(np.float32)
    s = (rng.randn(2, 6) * 0.5 + 1.0).astype(np.float32)
    y = modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
                         downsample=True)
    assert y.shape == (2, 8, 8, 10)


def test_modulated_conv_grad_flows(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 6, 10).astype(np.float32))
    s = jnp.asarray((rng.randn(2, 6) * 0.5 + 1.0).astype(np.float32))

    def loss(w, s):
        return jnp.sum(modulated_conv2d(x, w, s) ** 2)

    gw, gs = jax.grad(loss, argnums=(0, 1))(w, s)
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(np.asarray(gs)).all()
    assert float(jnp.abs(gs).sum()) > 0
