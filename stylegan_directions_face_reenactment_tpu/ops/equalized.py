"""Equalized-learning-rate linear / conv primitives (StyleGAN2).

Functional equivalents of `libs/gan/StyleGAN2/model.py:91-162`
(`EqualConv2d`, `EqualLinear`): weights are stored at unit scale and
multiplied by ``1/sqrt(fan_in)`` (times ``lr_mul``) at call time.

Layouts: linear weights are (out, in) like torch so checkpoint conversion is
a no-op; conv weights are HWIO (kh, kw, in, out), transposed from torch's
OIHW at the conversion boundary.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from jax import lax

from .fused_act import fused_leaky_relu


def equal_linear(x: jnp.ndarray, weight: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None,
                 lr_mul: float = 1.0, activation: bool = False) -> jnp.ndarray:
    """y = x @ (w * scale)^T (+ bias*lr_mul), optional fused leaky-relu.

    weight: (out, in); scale = lr_mul / sqrt(in)  (`model.py:145`).
    When ``activation`` is set the bias is applied inside the fused
    activation, matching `model.py:148-156`.
    """
    in_dim = weight.shape[1]
    scale = lr_mul / math.sqrt(in_dim)
    w = (weight * scale).astype(x.dtype)
    pet = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    out = jnp.dot(x, w.T, preferred_element_type=pet).astype(x.dtype)
    if activation:
        return fused_leaky_relu(out, bias * lr_mul if bias is not None else None)
    if bias is not None:
        out = out + (bias * lr_mul).astype(x.dtype)
    return out


def equal_conv2d(x: jnp.ndarray, weight: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None,
                 stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """Equalized conv, NHWC / HWIO.

    weight: (kh, kw, in, out); scale = 1/sqrt(in*kh*kw) (`model.py:100`).
    """
    kh, kw, cin, _ = weight.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    out = lax.conv_general_dilated(
        x, (weight * scale).astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=(jnp.float32 if x.dtype == jnp.float32
                                else x.dtype),
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def pixel_norm(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """x * rsqrt(mean(x^2, channel) + eps) (`model.py:11-16`).

    Channel axis is the last axis in our layouts.
    """
    return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)
