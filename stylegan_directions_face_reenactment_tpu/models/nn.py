"""Shared NN primitives for the frozen model zoo (NHWC, inference-mode).

These back every torch-style network we re-implement (DECA ResNet-50, e4e
IR-SE-50, ArcFace, FAN hourglass, S3FD, LPIPS AlexNet). All are pure
functions; batch norm is inference-mode (affine + running stats folded at
call time — every net in the pipeline is frozen/eval, matching the
reference which calls `.eval()` on all of them).

Conv weights are HWIO; linear weights are (out, in) torch-style.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

PadLike = Union[int, Tuple[int, int], str]


def _pad2(padding: PadLike):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    (ph, pw) = padding
    return ((ph, ph), (pw, pw))


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
           stride: Union[int, Tuple[int, int]] = 1, padding: PadLike = 0,
           dilation: Union[int, Tuple[int, int]] = 1,
           groups: int = 1) -> jnp.ndarray:
    """Plain convolution: x (N,H,W,C), w (kh,kw,in/groups,out)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=_pad2(padding),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=(jnp.float32 if x.dtype == jnp.float32
                                else x.dtype),
    ).astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x (..., in) @ w(out, in)^T + b."""
    out = jnp.dot(x, w.T.astype(x.dtype),
                  preferred_element_type=(jnp.float32 if x.dtype == jnp.float32
                                          else x.dtype))
    out = out.astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def batch_norm(x: jnp.ndarray, p, eps: float = 1e-5) -> jnp.ndarray:
    """Inference batch norm on the channel (last) axis.

    p: dict with 'scale', 'offset', 'mean', 'var' (each (C,)).
    """
    inv = lax.rsqrt(p["var"].astype(jnp.float32) + eps) * p["scale"].astype(jnp.float32)
    return (x * inv.astype(x.dtype)
            + (p["offset"] - p["mean"] * inv).astype(x.dtype))


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, x * slope)


def prelu(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Per-channel PReLU; a (C,) broadcasts on the last axis."""
    return jnp.where(x >= 0, x, x * a.astype(x.dtype))


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def max_pool2d(x: jnp.ndarray, window: int, stride: Optional[int] = None,
               padding: PadLike = 0) -> jnp.ndarray:
    stride = stride or window
    pad = _pad2(padding)
    if isinstance(pad, str):
        raise ValueError("use explicit padding for max_pool2d")
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0),) + pad + ((0, 0),))


def avg_pool2d(x: jnp.ndarray, window: int, stride: Optional[int] = None,
               padding: PadLike = 0) -> jnp.ndarray:
    stride = stride or window
    pad = _pad2(padding)
    ones = lax.reduce_window(
        jnp.ones_like(x), 0.0, lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0),) + pad + ((0, 0),))
    s = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0),) + pad + ((0, 0),))
    return s / ones


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d semantics (exact when in % out == 0, which
    covers every use in the pipeline: 1024→256, 7→1, 112 pools)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        x = x.reshape(n, oh, h // oh, ow, w // ow, c)
        return x.mean(axis=(2, 4))
    # general case: torch's variable bins floor(i*h/oh)..ceil((i+1)*h/oh),
    # computed via integral images + static gathers (compiles to a handful
    # of ops instead of per-bin slicing).
    lo_h = np.floor(np.arange(oh) * h / oh).astype(np.int32)
    hi_h = np.ceil((np.arange(oh) + 1) * h / oh).astype(np.int32)
    lo_w = np.floor(np.arange(ow) * w / ow).astype(np.int32)
    hi_w = np.ceil((np.arange(ow) + 1) * w / ow).astype(np.int32)

    # integral over rows: (N, h+1, w, c)
    ch = jnp.concatenate([jnp.zeros_like(x[:, :1]),
                          jnp.cumsum(x, axis=1)], axis=1)
    rows = ch[:, hi_h] - ch[:, lo_h]                       # (N, oh, w, c)
    cw_ = jnp.concatenate([jnp.zeros_like(rows[:, :, :1]),
                           jnp.cumsum(rows, axis=2)], axis=2)
    sums = cw_[:, :, hi_w] - cw_[:, :, lo_w]               # (N, oh, ow, c)
    areas = ((hi_h - lo_h)[:, None] * (hi_w - lo_w)[None, :]).astype(np.float32)
    return sums / jnp.asarray(areas)[None, :, :, None]


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize, NHWC. align_corners=False matches torch
    F.interpolate(..., mode='bilinear') / jax.image.resize."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if align_corners:
        ys = jnp.linspace(0.0, h - 1.0, oh)
        xs = jnp.linspace(0.0, w - 1.0, ow)
        grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
        return _bilinear_gather_batch(x, grid_x, grid_y, pad_zero=False)
    # antialias=False matches torch F.interpolate's plain bilinear sampling
    # (torch never antialiases unless antialias=True is passed).
    return jax.image.resize(x, (n, oh, ow, c), method="bilinear",
                            antialias=False).astype(x.dtype)


def _bilinear_gather(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                     pad_zero: bool = True) -> jnp.ndarray:
    """Sample img (H,W,C) at float pixel coords xs, ys (...,); bilinear.

    pad_zero: out-of-bounds samples read as 0 (torch grid_sample
    padding_mode='zeros'); otherwise coordinates are clamped to the border.
    """
    h, w, _ = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = xs - x0
    wy1 = ys - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1

    def gather(yi, xi):
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        v = img[yc, xc]
        if pad_zero:
            inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
            v = v * inb[..., None].astype(img.dtype)
        return v

    out = (gather(y0, x0) * (wy0 * wx0)[..., None]
           + gather(y0, x1) * (wy0 * wx1)[..., None]
           + gather(y1, x0) * (wy1 * wx0)[..., None]
           + gather(y1, x1) * (wy1 * wx1)[..., None])
    return out.astype(img.dtype)


def _bilinear_gather_batch(x, grid_x, grid_y, pad_zero=True):
    return jax.vmap(lambda img: _bilinear_gather(img, grid_x, grid_y, pad_zero))(x)


def _tent_matrix(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear interpolation matrix: W[b, i, j] = max(0, 1 - |coords[b,i]
    - j|). Row i resamples source position coords[b, i] with zero padding
    (out-of-range positions produce all-zero rows) — exactly the
    two-tap-bilinear-with-zero-pad semantics of `models/nn.py::
    _bilinear_gather`, but as a DENSE matrix so the warp runs on the MXU."""
    j = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - j))


def warp_from_coords(images: jnp.ndarray, src_y: jnp.ndarray,
                     src_x: jnp.ndarray) -> jnp.ndarray:
    """Separable bilinear resample at per-sample axis coordinates
    (zero padding outside the image) as two MXU einsums.

    images: (B, H, W, C); src_y (B, oh), src_x (B, ow) in source pixels.
    """
    h, w = images.shape[1], images.shape[2]
    wy = _tent_matrix(src_y, h)                            # (B, oh, H)
    wx = _tent_matrix(src_x, w)                            # (B, ow, W)
    tmp = jnp.einsum("bih,bhwc->biwc", wy, images,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("bow,biwc->bioc", wx, tmp,
                      preferred_element_type=jnp.float32)


def scale_translate_warp(images: jnp.ndarray, s: jnp.ndarray,
                         tx: jnp.ndarray, ty: jnp.ndarray,
                         out_hw) -> jnp.ndarray:
    """Axis-aligned warp dst = s·src + t as two batched matmuls.

    TPU-first replacement for the gather-based `affine_warp` in the
    no-rotation case (the DECA crop square is axis-aligned, so the
    reference's skimage 'similarity' fit degenerates to scale+translate):
    per-pixel gathers neither tile nor vectorize on TPU (~43 ms + minutes
    of compile for a (16, 224, 224, 3) warp), while the separable form
    out = Wy @ img @ Wxᵀ is two MXU einsums.

    images: (B, H, W, C); s/tx/ty: (B,) with dst = s·src + t per axis.
    """
    oh, ow = out_hw
    dst_y = jnp.arange(oh, dtype=jnp.float32)
    dst_x = jnp.arange(ow, dtype=jnp.float32)
    src_y = (dst_y[None, :] - ty[:, None]) / s[:, None]   # (B, oh)
    src_x = (dst_x[None, :] - tx[:, None]) / s[:, None]   # (B, ow)
    return warp_from_coords(images, src_y, src_x)



def affine_warp(x: jnp.ndarray, theta: jnp.ndarray,
                out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Warp NHWC batch with per-sample affine maps (src→dst), like
    kornia.warp_affine (`decalib/datasets/datasets.py:79`).

    theta: (N, 2, 3) or (N, 3, 3) pixel-coordinate transform from source to
    destination; output pixel p samples source at theta^{-1} @ p. Bilinear,
    zero padding; differentiable in x (the warp matrix comes from the face
    detector and is treated as constant, matching the reference).
    """
    n = x.shape[0]
    oh, ow = out_hw
    if theta.shape[-2:] == (2, 3):
        bottom = jnp.tile(jnp.asarray([[[0.0, 0.0, 1.0]]], theta.dtype), (n, 1, 1))
        theta = jnp.concatenate([theta, bottom], axis=1)
    inv = jnp.linalg.inv(theta)

    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(xs)
    dst = jnp.stack([xs, ys, ones], axis=-1)  # (oh, ow, 3)

    def warp_one(img, m):
        src = dst @ m.T  # (oh, ow, 3)
        sx = src[..., 0] / src[..., 2]
        sy = src[..., 1] / src[..., 2]
        return _bilinear_gather(img, sx, sy, pad_zero=True)

    return jax.vmap(warp_one)(x, inv.astype(jnp.float32))


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = False) -> jnp.ndarray:
    """torch.nn.functional.grid_sample (bilinear, zeros padding), NHWC.

    grid: (N, Hg, Wg, 2) normalized coords in [-1, 1], (x, y) order.
    """
    n, h, w, c = x.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        xs = (gx + 1.0) * 0.5 * (w - 1)
        ys = (gy + 1.0) * 0.5 * (h - 1)
    else:
        xs = ((gx + 1.0) * w - 1.0) * 0.5
        ys = ((gy + 1.0) * h - 1.0) * 0.5
    return jax.vmap(lambda img, sx, sy: _bilinear_gather(img, sx, sy))(x, xs, ys)


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)
