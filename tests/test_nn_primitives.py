"""NN primitive parity vs torch.nn.functional (CPU).

These primitives back every frozen net (DECA ResNet, e4e, ArcFace, FAN,
S3FD, LPIPS); exact agreement with torch semantics is what makes converted
checkpoints reproduce reference outputs.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from stylegan_directions_face_reenactment_tpu.models.nn import (
    conv2d, linear, batch_norm, max_pool2d, avg_pool2d, adaptive_avg_pool2d,
    resize_bilinear, grid_sample, prelu, upsample_nearest, affine_warp,
)


def nchw(x):  # NHWC numpy -> torch NCHW
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def nhwc(t):  # torch NCHW -> NHWC numpy
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("stride,padding,groups", [
    (1, 1, 1), (2, 3, 1), (1, 0, 1), (2, 1, 4),
])
def test_conv2d_parity(rng, stride, padding, groups):
    x = rng.randn(2, 12, 12, 8).astype(np.float32)
    w = rng.randn(3, 3, 8 // groups, 16).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                            stride=stride, padding=padding, groups=groups))
    # torch weight OIHW = transpose of HWIO
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
    want = nhwc(F.conv2d(nchw(x), wt, torch.from_numpy(b), stride=stride,
                         padding=padding, groups=groups))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batch_norm_parity(rng):
    x = rng.randn(2, 6, 6, 8).astype(np.float32)
    p = {"scale": rng.rand(8).astype(np.float32) + 0.5,
         "offset": rng.randn(8).astype(np.float32),
         "mean": rng.randn(8).astype(np.float32),
         "var": rng.rand(8).astype(np.float32) + 0.5}
    got = np.asarray(batch_norm(jnp.asarray(x),
                                {k: jnp.asarray(v) for k, v in p.items()}))
    want = nhwc(F.batch_norm(nchw(x), torch.from_numpy(p["mean"]),
                             torch.from_numpy(p["var"]),
                             torch.from_numpy(p["scale"]),
                             torch.from_numpy(p["offset"]), training=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_max_pool_parity(rng):
    x = rng.randn(2, 14, 14, 4).astype(np.float32)
    got = np.asarray(max_pool2d(jnp.asarray(x), 3, stride=2, padding=1))
    want = nhwc(F.max_pool2d(nchw(x), 3, stride=2, padding=1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_avg_pool_parity(rng):
    x = rng.randn(2, 14, 14, 4).astype(np.float32)
    got = np.asarray(avg_pool2d(jnp.asarray(x), 7, stride=1))
    want = nhwc(F.avg_pool2d(nchw(x), 7, stride=1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("out", [(1, 1), (7, 7), (256, 256)])
def test_adaptive_avg_pool_parity(rng, out):
    size = 14 if out != (256, 256) else 1024
    x = rng.randn(1, size, size, 2).astype(np.float32)
    got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), out))
    want = nhwc(F.adaptive_avg_pool2d(nchw(x), out))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_adaptive_avg_pool_nondivisible(rng):
    x = rng.randn(1, 10, 10, 3).astype(np.float32)
    got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (3, 3)))
    want = nhwc(F.adaptive_avg_pool2d(nchw(x), (3, 3)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("align", [False, True])
def test_resize_bilinear_parity(rng, align):
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (16, 16),
                                     align_corners=align))
    want = nhwc(F.interpolate(nchw(x), (16, 16), mode="bilinear",
                              align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_down_parity(rng):
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (17, 17)))
    want = nhwc(F.interpolate(nchw(x), (17, 17), mode="bilinear",
                              align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("align", [False, True])
def test_grid_sample_parity(rng, align):
    x = rng.randn(2, 9, 9, 3).astype(np.float32)
    grid = (rng.rand(2, 5, 6, 2).astype(np.float32) * 2.4 - 1.2)  # incl. OOB
    got = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid),
                                 align_corners=align))
    want = nhwc(F.grid_sample(nchw(x), torch.from_numpy(grid),
                              mode="bilinear", padding_mode="zeros",
                              align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_prelu_parity(rng):
    x = rng.randn(2, 4, 4, 6).astype(np.float32)
    a = rng.rand(6).astype(np.float32)
    got = np.asarray(prelu(jnp.asarray(x), jnp.asarray(a)))
    want = nhwc(F.prelu(nchw(x), torch.from_numpy(a)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_upsample_nearest_parity(rng):
    x = rng.randn(1, 5, 5, 2).astype(np.float32)
    got = np.asarray(upsample_nearest(jnp.asarray(x), 2))
    want = nhwc(F.interpolate(nchw(x), scale_factor=2, mode="nearest"))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_linear_parity(rng):
    x = rng.randn(3, 10).astype(np.float32)
    w = rng.randn(5, 10).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    got = np.asarray(linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    want = F.linear(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_affine_warp_identity(rng):
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    theta = np.eye(3, dtype=np.float32)[None]
    got = np.asarray(affine_warp(jnp.asarray(x), jnp.asarray(theta), (8, 8)))
    np.testing.assert_allclose(got, x, rtol=1e-5, atol=1e-5)


def test_affine_warp_translation(rng):
    x = rng.randn(1, 8, 8, 1).astype(np.float32)
    # shift dst by +2 in x: dst(x,y) = src(x-2, y)
    theta = np.asarray([[[1, 0, 2], [0, 1, 0], [0, 0, 1]]], np.float32)
    got = np.asarray(affine_warp(jnp.asarray(x), jnp.asarray(theta), (8, 8)))
    np.testing.assert_allclose(got[0, :, 2:, 0], x[0, :, :-2, 0], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(got[0, :, :2, 0], 0.0, atol=1e-6)  # zero pad


def test_affine_warp_scale_matches_kornia_convention(rng):
    # downscale-by-2 crop: similarity transform mapping src [0,16) -> dst [0,8)
    x = rng.randn(1, 16, 16, 1).astype(np.float32)
    theta = np.asarray([[[0.5, 0, 0], [0, 0.5, 0], [0, 0, 1]]], np.float32)
    got = np.asarray(affine_warp(jnp.asarray(x), jnp.asarray(theta), (8, 8)))
    # dst pixel p samples src at 2p — nearest-grid case, exact gather
    np.testing.assert_allclose(got[0, :, :, 0], x[0, ::2, ::2, 0], rtol=1e-5,
                               atol=1e-5)


def test_scale_translate_warp_matches_affine_warp(rng):
    """The MXU matmul warp (tent-matrix form) must agree with the
    gather-based affine_warp for axis-aligned transforms — the only kind
    the DECA alignment and FAN crop produce."""
    from stylegan_directions_face_reenactment_tpu.models.nn import (
        scale_translate_warp)
    x = rng.rand(3, 12, 12, 2).astype(np.float32)
    s_ = np.asarray([0.7, 1.3, 2.1], np.float32)
    tx = np.asarray([-2.0, 1.5, 0.3], np.float32)
    ty = np.asarray([3.0, -1.2, 0.0], np.float32)
    theta = np.zeros((3, 3, 3), np.float32)
    theta[:, 0, 0] = s_
    theta[:, 1, 1] = s_
    theta[:, 0, 2] = tx
    theta[:, 1, 2] = ty
    theta[:, 2, 2] = 1.0
    want = np.asarray(affine_warp(jnp.asarray(x), jnp.asarray(theta), (9, 9)))
    got = np.asarray(scale_translate_warp(jnp.asarray(x), jnp.asarray(s_),
                                          jnp.asarray(tx), jnp.asarray(ty),
                                          (9, 9)))
    np.testing.assert_allclose(got, want, atol=1e-5)
