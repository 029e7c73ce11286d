"""ResNet-50 feature extractor for the DECA encoders (NHWC, inference BN).

Functional equivalent of `libs/DECA/decalib/models/resnet.py` (reference):
bottleneck blocks [3, 4, 6, 3], 7x7 stem, global average pool → 2048
features (the fc layer is removed, `resnet.py:37`).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..nn import batch_norm, conv2d, max_pool2d, relu

Params = Dict[str, Any]

RESNET50_LAYERS = (3, 4, 6, 3)


def _init_conv(key, kh, kw, cin, cout):
    n = kh * kw * cout
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * jnp.sqrt(2.0 / n)


def _init_bn(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "offset": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


def _init_bottleneck(key, cin, planes, stride):
    k = jax.random.split(key, 4)
    p = {
        "conv1": _init_conv(k[0], 1, 1, cin, planes), "bn1": _init_bn(planes),
        "conv2": _init_conv(k[1], 3, 3, planes, planes), "bn2": _init_bn(planes),
        "conv3": _init_conv(k[2], 1, 1, planes, planes * 4),
        "bn3": _init_bn(planes * 4),
        "_meta": {"stride": stride},
    }
    if stride != 1 or cin != planes * 4:
        p["downsample"] = {"conv": _init_conv(k[3], 1, 1, cin, planes * 4),
                           "bn": _init_bn(planes * 4)}
    return p


def init_resnet50(key) -> Params:
    keys = jax.random.split(key, 64)
    ki = iter(range(64))
    params: Params = {
        "conv1": _init_conv(keys[next(ki)], 7, 7, 3, 64),
        "bn1": _init_bn(64),
        "layers": [],
    }
    cin = 64
    for stage, (blocks, planes, stride) in enumerate(
            zip(RESNET50_LAYERS, (64, 128, 256, 512), (1, 2, 2, 2))):
        layer: List[Params] = []
        for b in range(blocks):
            layer.append(_init_bottleneck(keys[next(ki)], cin,
                                          planes, stride if b == 0 else 1))
            cin = planes * 4
        params["layers"].append(layer)
    return params


def _bottleneck(p: Params, x):
    s = p["_meta"]["stride"]
    out = relu(batch_norm(conv2d(x, p["conv1"]), p["bn1"]))
    out = relu(batch_norm(conv2d(out, p["conv2"], stride=s, padding=1), p["bn2"]))
    out = batch_norm(conv2d(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        res = batch_norm(conv2d(x, p["downsample"]["conv"], stride=s),
                         p["downsample"]["bn"])
    else:
        res = x
    return relu(out + res)


def resnet50_features(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (N, 224, 224, 3) → (N, 2048) pooled features."""
    out = conv2d(x, p["conv1"], stride=2, padding=3)
    out = relu(batch_norm(out, p["bn1"]))
    out = max_pool2d(out, 3, stride=2, padding=1)
    for layer in p["layers"]:
        for block in layer:
            out = _bottleneck(block, out)
    # the reference's avgpool(7) acts on a 7x7 map at 224 input, i.e. a
    # global mean — written as such so smaller (dry-run) inputs also work
    return out.mean(axis=(1, 2))
