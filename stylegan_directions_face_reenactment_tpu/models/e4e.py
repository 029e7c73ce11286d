"""e4e (encoder4editing) inversion encoder: image → W+ latent.

Functional equivalent of `libs/gan/encoder4editing/psp_encoders.py`
(reference): IR-SE-50 backbone with FPN taps at body blocks 6/20/23, a
14-head "gradual style" pyramid, and the e4e progressive-delta scheme
(`Encoder4Editing.forward`, `psp_encoders.py:171-199`; inference stage =
all deltas active).

Also includes the two alternative pSp heads (`GradualStyleEncoder`,
`BackboneEncoderUsingLastLayerIntoW`) for component parity — the pipeline
only uses Encoder4Editing.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .irse import (init_input_layer, init_ir_body, input_layer, ir_body,
                   _kaiming_conv)
from .nn import adaptive_avg_pool2d, conv2d, leaky_relu, resize_bilinear
from ..ops import equal_linear

Params = Dict[str, Any]

COARSE_IND = 3
MIDDLE_IND = 7
TAPS = (6, 20, 23)  # c1 (128ch @64), c2 (256ch @32), c3 (512ch @16)


def _init_equal_linear(key, in_dim, out_dim):
    return {"weight": jax.random.normal(key, (out_dim, in_dim), jnp.float32),
            "bias": jnp.zeros((out_dim,), jnp.float32)}


def init_gradual_style_block(key, in_c: int, out_c: int, spatial: int) -> Params:
    """Stride-2 conv stack down to 1x1 + equalized linear
    (`psp_encoders.py:33-54`)."""
    num_pools = int(math.log2(spatial))
    keys = jax.random.split(key, num_pools + 1)
    convs = [_kaiming_conv(keys[0], 3, 3, in_c, out_c)]
    biases = [jnp.zeros((out_c,), jnp.float32)]
    for i in range(num_pools - 1):
        convs.append(_kaiming_conv(keys[i + 1], 3, 3, out_c, out_c))
        biases.append(jnp.zeros((out_c,), jnp.float32))
    return {"convs": convs, "biases": biases,
            "linear": _init_equal_linear(keys[-1], out_c, out_c)}


def gradual_style_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    for w, b in zip(p["convs"], p["biases"]):
        x = conv2d(x, w, b, stride=2, padding=1)
        x = leaky_relu(x, 0.01)  # nn.LeakyReLU() default slope
    x = x.reshape(x.shape[0], -1)
    return equal_linear(x, p["linear"]["weight"], p["linear"]["bias"])


def upsample_add(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear (align_corners=True) upsample of x to y's size, then add
    (`helpers.py:123-140`)."""
    return resize_bilinear(x, (y.shape[1], y.shape[2]),
                           align_corners=True) + y


def _style_spatial(i: int) -> int:
    if i < COARSE_IND:
        return 16
    if i < MIDDLE_IND:
        return 32
    return 64


def init_e4e_encoder(key, image_resolution: int = 256) -> Params:
    """Encoder4Editing(50, 'ir_se', resolution) (`psp_encoders.py:122-161`)."""
    style_count = 2 * int(math.log2(image_resolution)) - 2
    keys = jax.random.split(key, style_count + 4)
    return {
        "input": init_input_layer(keys[0]),
        "body": init_ir_body(keys[1], se=True),
        "styles": [init_gradual_style_block(keys[i + 2], 512, 512,
                                            _style_spatial(i))
                   for i in range(style_count)],
        "latlayer1": {"weight": _kaiming_conv(keys[-2], 1, 1, 256, 512),
                      "bias": jnp.zeros((512,), jnp.float32)},
        "latlayer2": {"weight": _kaiming_conv(keys[-1], 1, 1, 128, 512),
                      "bias": jnp.zeros((512,), jnp.float32)},
        "meta": {"style_count": style_count},
    }


def _backbone_pyramid(params: Params, x: jnp.ndarray):
    x = input_layer(params["input"], x)
    _, (c1, c2, c3) = ir_body(params["body"], x, taps=TAPS)
    return c1, c2, c3


def e4e_forward(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, 256, 256, 3) in [-1, 1] → W+ (B, style_count, 512)
    (`psp_encoders.py:171-199`, Inference stage: all deltas)."""
    c1, c2, c3 = _backbone_pyramid(params, x)
    style_count = params["meta"]["style_count"]

    w0 = gradual_style_block(params["styles"][0], c3)
    deltas = [jnp.zeros_like(w0)]

    features = c3
    p2 = None
    for i in range(1, style_count):
        if i == COARSE_IND:
            p2 = upsample_add(c3, conv2d(c2, params["latlayer1"]["weight"],
                                         params["latlayer1"]["bias"]))
            features = p2
        elif i == MIDDLE_IND:
            p1 = upsample_add(p2, conv2d(c1, params["latlayer2"]["weight"],
                                         params["latlayer2"]["bias"]))
            features = p1
        deltas.append(gradual_style_block(params["styles"][i], features))

    return w0[:, None, :] + jnp.stack(deltas, axis=1)


def init_gradual_style_encoder(key, image_resolution: int = 256) -> Params:
    """pSp GradualStyleEncoder (`psp_encoders.py:57-120`; unused by the
    pipeline, kept for parity). Same parameter structure as e4e."""
    return init_e4e_encoder(key, image_resolution)


def gradual_style_encoder_forward(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """All styles independent (no w0+delta scheme), `psp_encoders.py:94-120`."""
    c1, c2, c3 = _backbone_pyramid(params, x)
    style_count = params["meta"]["style_count"]

    latents = [gradual_style_block(params["styles"][j], c3)
               for j in range(COARSE_IND)]
    p2 = upsample_add(c3, conv2d(c2, params["latlayer1"]["weight"],
                                 params["latlayer1"]["bias"]))
    latents += [gradual_style_block(params["styles"][j], p2)
                for j in range(COARSE_IND, MIDDLE_IND)]
    p1 = upsample_add(p2, conv2d(c1, params["latlayer2"]["weight"],
                                 params["latlayer2"]["bias"]))
    latents += [gradual_style_block(params["styles"][j], p1)
                for j in range(MIDDLE_IND, style_count)]
    return jnp.stack(latents, axis=1)


def init_backbone_encoder_into_w(key) -> Params:
    """BackboneEncoderUsingLastLayerIntoW (`psp_encoders.py:201-232`)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "input": init_input_layer(k1),
        "body": init_ir_body(k2, se=True),
        "linear": _init_equal_linear(k3, 512, 512),
    }


def backbone_encoder_into_w_forward(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = input_layer(params["input"], x)
    x, _ = ir_body(params["body"], x)
    x = adaptive_avg_pool2d(x, (1, 1)).reshape(x.shape[0], 512)
    return equal_linear(x, params["linear"]["weight"], params["linear"]["bias"])
