"""Style-modulated convolution — the StyleGAN2 core op, TPU-first.

Functional spec: `libs/gan/StyleGAN2/model.py:177-273` (ModulatedConv2d).
The reference builds per-sample weights ``w' = scale * W * s_in`` (optionally
demodulated by ``rsqrt(sum w'^2)`` over (in, kh, kw)) and runs a grouped conv
with ``groups=batch``. Per-sample weights defeat the TPU convolution units,
so we use the algebraically identical *input/output scaling* formulation:

    conv(x, scale * W * s_in)[b, o]  ==  conv(x * s_in, scale * W)[b, o]
    demod is a per-(batch, out-channel) scalar -> applied to the output.

This keeps a single shared-weight conv (large, batched, MXU-tiled) plus two
cheap elementwise scalings that XLA fuses into it. The demod factor is
computed from ``W^2`` with one small matmul instead of materialising w'.

Both scalings commute with the blur FIR (per-channel spatial filter), so the
up/downsample variants stay exact:
  * upsample:  conv_transpose(stride 2) then blur  (`model.py:246-257`)
  * downsample: blur then stride-2 conv            (`model.py:259-265`)
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
from jax import lax

from .upfirdn2d import blur, make_kernel

DEFAULT_BLUR = (1, 3, 3, 1)


def modulation_demod(weight: jnp.ndarray, style: jnp.ndarray,
                     eps: float = 1e-8) -> jnp.ndarray:
    """Per-(batch, out) demodulation factor.

    weight: (kh, kw, in, out); style: (B, in) — the modulation scalars.
    Returns (B, out): rsqrt(sum_{kh,kw,in} (scale*W*s)^2 + eps)
    matching `model.py:238-240`.
    """
    kh, kw, cin, cout = weight.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    w2 = jnp.square(weight * scale).sum(axis=(0, 1))  # (in, out)
    sigma = jnp.dot(jnp.square(style), w2,
                    preferred_element_type=jnp.float32)  # (B, out)
    return lax.rsqrt(sigma + eps)


def modulated_conv2d(x: jnp.ndarray, weight: jnp.ndarray, style: jnp.ndarray,
                     *, demodulate: bool = True,
                     upsample: bool = False, downsample: bool = False,
                     blur_kernel: Sequence[int] = DEFAULT_BLUR,
                     eps: float = 1e-8) -> jnp.ndarray:
    """Modulated conv over an NHWC batch.

    Args:
      x: (B, H, W, in).
      weight: (kh, kw, in, out) shared weights (unit scale; equalized-LR
        scaling applied internally).
      style: (B, in) modulation scalars (already through the style linear,
        whose bias initializes to 1 — see `model.py:222`).
    """
    kh, kw, cin, cout = weight.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    # f32 accumulation only for f32 operands: preferred_element_type=f32
    # with bf16 operands breaks the conv transpose rule under jax.grad
    # (the cotangent arrives f32 against bf16 weights); bf16 convs still
    # accumulate f32 inside the MXU.
    pet = jnp.float32 if x.dtype == jnp.float32 else x.dtype

    demod = modulation_demod(weight, style, eps) if demodulate else None

    xm = x * style[:, None, None, :].astype(x.dtype)
    w = (weight * scale).astype(x.dtype)

    if upsample:
        factor = 2
        # conv_transpose(stride=2, padding=0): dilate input, full-pad, true
        # convolution == correlation with the spatially flipped kernel.
        wt = jnp.flip(w, (0, 1))
        out = lax.conv_general_dilated(
            xm, wt,
            window_strides=(1, 1),
            padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
            lhs_dilation=(factor, factor),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet,
        ).astype(x.dtype)
        # Output size (H-1)*2 + kh == torch conv_transpose2d(stride=2, pad=0).
        p = (len(blur_kernel) - factor) - (kh - 1)
        pad0 = (p + 1) // 2 + factor - 1
        pad1 = p // 2 + 1
        k = make_kernel(blur_kernel, gain=factor ** 2)
        out = blur(out, k, pad=(pad0, pad1))
    elif downsample:
        factor = 2
        p = (len(blur_kernel) - factor) + (kh - 1)
        pad0 = (p + 1) // 2
        pad1 = p // 2
        k = make_kernel(blur_kernel)
        xm = blur(xm, k, pad=(pad0, pad1))
        out = lax.conv_general_dilated(
            xm, w,
            window_strides=(factor, factor),
            padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet,
        ).astype(x.dtype)
    else:
        pad = kh // 2
        out = lax.conv_general_dilated(
            xm, w,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet,
        ).astype(x.dtype)

    if demod is not None:
        out = out * demod[:, None, None, :].astype(x.dtype)
    return out
