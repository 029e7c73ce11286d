"""IR-SE residual blocks + ArcFace backbone (identity embedding).

Functional equivalents of `libs/gan/encoder4editing/helpers.py` and
`libs/criteria/model_irse.py` (reference; ArcFace from InsightFace).
Shared by the e4e inversion encoder (`models/e4e.py`) and the identity
loss (`losses/id_loss.py`).

All nets here are frozen at inference: BN uses running stats, dropout is
identity. NHWC; the 112-input backbone's final Linear consumes the
flattened (C, H, W)-ordered features so torch checkpoints convert 1:1.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from .nn import (adaptive_avg_pool2d, batch_norm, conv2d, linear, prelu,
                 relu, sigmoid)

Params = Dict[str, Any]

# [3, 4, 14, 3] IR bottleneck stage layout (`helpers.py:30-37`)
IRSE50_BLOCKS: List[Tuple[int, int, int]] = []
for in_c, depth, n_units in ((64, 64, 3), (64, 128, 4), (128, 256, 14),
                             (256, 512, 3)):
    IRSE50_BLOCKS.append((in_c, depth, 2))
    IRSE50_BLOCKS.extend((depth, depth, 1) for _ in range(n_units - 1))


def _kaiming_conv(key, kh, kw, cin, cout):
    fan = kh * kw * cin
    bound = math.sqrt(6.0 / fan)
    return jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32,
                              -bound, bound)


def _bn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "offset": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


def init_se_module(key, channels: int, reduction: int = 16) -> Params:
    k1, k2 = jax.random.split(key)
    return {"fc1": _kaiming_conv(k1, 1, 1, channels, channels // reduction),
            "fc2": _kaiming_conv(k2, 1, 1, channels // reduction, channels)}


def se_module(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Squeeze-and-excitation (`helpers.py:57-73`)."""
    s = adaptive_avg_pool2d(x, (1, 1))
    s = relu(conv2d(s, p["fc1"]))
    s = sigmoid(conv2d(s, p["fc2"]))
    return x * s


def init_bottleneck_ir(key, in_c: int, depth: int, stride: int,
                       se: bool = True) -> Params:
    keys = jax.random.split(key, 4)
    p: Params = {
        "bn0": _bn_init(in_c),
        "conv1": _kaiming_conv(keys[0], 3, 3, in_c, depth),
        "prelu": jnp.full((depth,), 0.25, jnp.float32),
        "conv2": _kaiming_conv(keys[1], 3, 3, depth, depth),
        "bn2": _bn_init(depth),
        "_meta": {"stride": stride, "identity_shortcut": in_c == depth},
    }
    if in_c != depth:
        p["shortcut"] = {"conv": _kaiming_conv(keys[2], 1, 1, in_c, depth),
                         "bn": _bn_init(depth)}
    if se:
        p["se"] = init_se_module(keys[3], depth)
    return p


def bottleneck_ir(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """bottleneck_IR[_SE] (`helpers.py:76-120`)."""
    stride = p["_meta"]["stride"]
    if p["_meta"]["identity_shortcut"]:
        # MaxPool2d(1, stride): identity at stride 1, strided pick at 2
        shortcut = x if stride == 1 else x[:, ::stride, ::stride, :]
    else:
        shortcut = batch_norm(conv2d(x, p["shortcut"]["conv"], stride=stride),
                              p["shortcut"]["bn"])
    res = batch_norm(x, p["bn0"])
    res = conv2d(res, p["conv1"], stride=1, padding=1)
    res = prelu(res, p["prelu"])
    res = conv2d(res, p["conv2"], stride=stride, padding=1)
    res = batch_norm(res, p["bn2"])
    if "se" in p:
        res = se_module(p["se"], res)
    return res + shortcut


def init_input_layer(key) -> Params:
    return {"conv": _kaiming_conv(key, 3, 3, 3, 64), "bn": _bn_init(64),
            "prelu": jnp.full((64,), 0.25, jnp.float32)}


def input_layer(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return prelu(batch_norm(conv2d(x, p["conv"], padding=1), p["bn"]),
                 p["prelu"])


def init_ir_body(key, se: bool = True) -> List[Params]:
    keys = jax.random.split(key, len(IRSE50_BLOCKS))
    return [init_bottleneck_ir(k, in_c, depth, stride, se=se)
            for k, (in_c, depth, stride) in zip(keys, IRSE50_BLOCKS)]


def ir_body(blocks: List[Params], x: jnp.ndarray,
            taps: Tuple[int, ...] = ()) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Run the 24-block body, optionally returning intermediate taps
    (e4e taps at block indices 6/20/23, `psp_encoders.py:175-182`)."""
    tapped = []
    for i, blk in enumerate(blocks):
        x = bottleneck_ir(blk, x)
        if i in taps:
            tapped.append(x)
    return x, tapped


def l2_norm(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """x / ||x|| (`helpers.py:16-19`)."""
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True)


def init_backbone(key, input_size: int = 112, se: bool = True,
                  affine: bool = False) -> Params:
    """ArcFace Backbone (`model_irse.py:9-48`): IR-SE-50 + BN/flatten/linear
    head → l2-normalized 512-d embedding."""
    k1, k2, k3 = jax.random.split(key, 3)
    spatial = input_size // 16  # 7 at 112, 14 at 224
    lim = 1.0 / math.sqrt(512 * spatial * spatial)
    return {
        "input": init_input_layer(k1),
        "body": init_ir_body(k2, se=se),
        "out_bn2d": _bn_init(512),
        "out_linear": {
            "weight": jax.random.uniform(k3, (512, 512 * spatial * spatial),
                                         jnp.float32, -lim, lim),
            "bias": jnp.zeros((512,), jnp.float32)},
        "out_bn1d": _bn_init(512),
        "meta": {"input_size": input_size, "affine": affine},
    }


def backbone_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, 112, 112, 3) in [-1, 1] → (B, 512) unit embedding.

    Dropout is identity (eval). The flatten matches torch's (C, H, W) order
    so converted Linear weights apply unchanged.
    """
    out = input_layer(p["input"], x)
    out, _ = ir_body(p["body"], out)
    out = batch_norm(out, p["out_bn2d"])
    b, h, w, c = out.shape
    out = out.transpose(0, 3, 1, 2).reshape(b, -1)  # (B, C*H*W) torch order
    out = linear(out, p["out_linear"]["weight"], p["out_linear"]["bias"])
    out = batch_norm(out, p["out_bn1d"])  # affine=False ⇒ scale=1, offset=0
    return l2_norm(out, axis=-1)
