"""StyleGAN2 as pure functions over parameter pytrees (NHWC, TPU-first).

Functional re-design of `libs/gan/StyleGAN2/model.py` (reference):
  * `Generator`       → :func:`init_generator` / :func:`generator_forward`
                        (+ :func:`mapping`, :func:`synthesis`, :func:`mean_latent`)
  * `StyledConv`      → :func:`styled_conv`        (`model.py:303-337`)
  * `ToRGB`           → :func:`to_rgb`             (`model.py:340-359`)
  * `ConvLayer/ResBlock` → :func:`conv_layer` / :func:`res_block` (`model.py:542-609`)
  * `Discriminator`   → :func:`init_discriminator` / :func:`discriminator_forward`
                        (`model.py:612-671`; unused by the pipeline but part
                        of the component inventory)
  * `Encoder` (W+ ResNet encoder, `model.py:673-710`; superseded by e4e)
                        → :func:`init_wplus_encoder` / :func:`wplus_encoder_forward`

Everything here is jittable; the per-resolution layer structure is static
Python that unrolls at trace time. Noise buffers are fixed parameters (the
reference registers them as buffers and defaults to ``randomize_noise=False``,
`model.py:481,488-492`), which makes synthesis deterministic — the basis of
our golden tests.

Weight layouts: conv HWIO (kh, kw, in, out); linear (out, in) torch-style.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import (equal_linear, equal_conv2d, fused_leaky_relu, make_kernel,
                   modulated_conv2d, pixel_norm, scaled_leaky_relu, upsample2d,
                   blur)

Params = Dict[str, Any]

BLUR_KERNEL = (1, 3, 3, 1)


def channel_map(channel_multiplier: int = 2) -> Dict[int, int]:
    """Per-resolution channel table (`model.py:389-399`)."""
    return {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


def n_latent_for(size: int) -> int:
    """Number of W+ rows: 2*log2(size) - 2 (`model.py:447`); 14 at 256."""
    return int(math.log2(size)) * 2 - 2


def num_noise_layers(size: int) -> int:
    return (int(math.log2(size)) - 2) * 2 + 1


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_equal_linear(key, in_dim, out_dim, lr_mul=1.0, bias_init=0.0):
    kw, _ = jax.random.split(key)
    return {
        "weight": jax.random.normal(kw, (out_dim, in_dim), jnp.float32) / lr_mul,
        "bias": jnp.full((out_dim,), float(bias_init), jnp.float32),
    }


def _init_modconv(key, in_ch, out_ch, kernel_size, style_dim):
    k1, k2 = jax.random.split(key)
    return {
        "weight": jax.random.normal(k1, (kernel_size, kernel_size, in_ch, out_ch),
                                    jnp.float32),
        "mod": _init_equal_linear(k2, style_dim, in_ch, bias_init=1.0),
    }


def _init_styled_conv(key, in_ch, out_ch, kernel_size, style_dim):
    k1, _ = jax.random.split(key)
    return {
        "conv": _init_modconv(k1, in_ch, out_ch, kernel_size, style_dim),
        "noise_weight": jnp.zeros((), jnp.float32),
        "act_bias": jnp.zeros((out_ch,), jnp.float32),
    }


def _init_to_rgb(key, in_ch, style_dim):
    k1, _ = jax.random.split(key)
    return {
        "conv": _init_modconv(k1, in_ch, 3, 1, style_dim),
        "bias": jnp.zeros((3,), jnp.float32),
    }


def init_generator(key, size: int = 256, style_dim: int = 512, n_mlp: int = 8,
                   channel_multiplier: int = 2) -> Params:
    """Random-init generator params mirroring the reference distributions."""
    channels = channel_map(channel_multiplier)
    log_size = int(math.log2(size))
    keys = jax.random.split(key, 16 + n_mlp + 6 * log_size)
    ki = iter(range(len(keys)))

    style = [_init_equal_linear(keys[next(ki)], style_dim, style_dim, lr_mul=0.01)
             for _ in range(n_mlp)]

    params: Params = {
        "style": style,
        "input": jax.random.normal(keys[next(ki)], (1, 4, 4, channels[4]), jnp.float32),
        "conv1": _init_styled_conv(keys[next(ki)], channels[4], channels[4], 3, style_dim),
        "to_rgb1": _init_to_rgb(keys[next(ki)], channels[4], style_dim),
        "convs": [],
        "to_rgbs": [],
        "noises": [],
    }

    n_layers = num_noise_layers(size)
    for layer_idx in range(n_layers):
        res = (layer_idx + 5) // 2
        params["noises"].append(
            jax.random.normal(keys[next(ki)], (1, 2 ** res, 2 ** res, 1), jnp.float32))

    in_ch = channels[4]
    for i in range(3, log_size + 1):
        out_ch = channels[2 ** i]
        params["convs"].append(
            _init_styled_conv(keys[next(ki)], in_ch, out_ch, 3, style_dim))
        params["convs"].append(
            _init_styled_conv(keys[next(ki)], out_ch, out_ch, 3, style_dim))
        params["to_rgbs"].append(_init_to_rgb(keys[next(ki)], out_ch, style_dim))
        in_ch = out_ch

    params["meta"] = {"size": size, "style_dim": style_dim,
                      "channel_multiplier": channel_multiplier}
    return params


# ---------------------------------------------------------------------------
# Forward blocks
# ---------------------------------------------------------------------------

def modconv_apply(p: Params, x, w_style, *, demodulate=True, upsample=False,
                  downsample=False):
    s = equal_linear(w_style, p["mod"]["weight"], p["mod"]["bias"])
    return modulated_conv2d(x, p["weight"], s, demodulate=demodulate,
                            upsample=upsample, downsample=downsample,
                            blur_kernel=BLUR_KERNEL)


def styled_conv(p: Params, x, w_style, noise, *, upsample=False):
    """ModulatedConv → noise add → fused leaky relu (`model.py:303-337`)."""
    out = modconv_apply(p["conv"], x, w_style, upsample=upsample)
    if noise is not None:
        out = out + p["noise_weight"] * noise.astype(out.dtype)
    return fused_leaky_relu(out, p["act_bias"])


def to_rgb(p: Params, x, w_style, skip=None):
    """1x1 modulated conv (no demod) + bias + upsampled skip (`model.py:340-359`)."""
    out = modconv_apply(p["conv"], x, w_style, demodulate=False)
    out = out + p["bias"].astype(out.dtype)
    if skip is not None:
        k = make_kernel(BLUR_KERNEL, gain=4)
        out = out + upsample2d(skip, k).astype(out.dtype)
    return out


def mapping(params: Params, z: jnp.ndarray) -> jnp.ndarray:
    """Style MLP: PixelNorm + n_mlp equalized fused-lrelu layers (`model.py:378-387`)."""
    x = pixel_norm(z)
    for layer in params["style"]:
        x = equal_linear(x, layer["weight"], layer["bias"], lr_mul=0.01,
                         activation=True)
    return x


def mean_latent(params: Params, key, n_latent: int = 4096) -> jnp.ndarray:
    """Mean W over random z's, for truncation (`model.py:460-466`)."""
    z = jax.random.normal(key, (n_latent, params["meta"]["style_dim"]), jnp.float32)
    return mapping(params, z).mean(axis=0, keepdims=True)


def synthesis(params: Params, latent: jnp.ndarray,
              noise: Optional[List[Optional[jnp.ndarray]]] = None,
              compute_dtype=jnp.float32) -> jnp.ndarray:
    """Synthesis stack from a W+ latent (B, n_latent, 512) → NHWC image in [-1,1].

    Mirrors `model.py:519-534`: constant input → conv1 → to_rgb1, then per
    resolution (conv↑, conv, to_rgb skip).
    """
    if noise is None:
        noise = params["noises"]

    b = latent.shape[0]
    out = jnp.broadcast_to(params["input"],
                           (b,) + params["input"].shape[1:]).astype(compute_dtype)
    latent = latent.astype(compute_dtype)

    out = styled_conv(params["conv1"], out, latent[:, 0], noise[0])
    skip = to_rgb(params["to_rgb1"], out, latent[:, 1])

    i = 1
    for idx in range(0, len(params["convs"]), 2):
        conv_up = params["convs"][idx]
        conv_pl = params["convs"][idx + 1]
        rgb = params["to_rgbs"][idx // 2]
        out = styled_conv(conv_up, out, latent[:, i], noise[idx + 1], upsample=True)
        out = styled_conv(conv_pl, out, latent[:, i + 1], noise[idx + 2])
        skip = to_rgb(rgb, out, latent[:, i + 2], skip)
        i += 2

    return skip.astype(jnp.float32)


def style_to_wplus(params: Params, styles: Sequence[jnp.ndarray],
                   inject_index: Optional[int] = None) -> jnp.ndarray:
    """W (or pair of W for mixing) → W+ (B, n_latent, 512) (`model.py:502-517`)."""
    size = params["meta"]["size"]
    n_lat = n_latent_for(size)
    if len(styles) < 2:
        s = styles[0]
        if s.ndim < 3:
            return jnp.repeat(s[:, None, :], n_lat, axis=1)
        return s
    if inject_index is None:
        raise ValueError("style mixing requires an explicit inject_index "
                         "(host-side randomness; no implicit RNG under jit)")
    l1 = jnp.repeat(styles[0][:, None, :], inject_index, axis=1)
    l2 = jnp.repeat(styles[1][:, None, :], n_lat - inject_index, axis=1)
    return jnp.concatenate([l1, l2], axis=1)


def generator_forward(params: Params, styles: Sequence[jnp.ndarray], *,
                      input_is_latent: bool = False,
                      truncation: float = 1.0,
                      truncation_latent: Optional[jnp.ndarray] = None,
                      inject_index: Optional[int] = None,
                      return_latents: bool = False,
                      noise: Optional[List[Optional[jnp.ndarray]]] = None,
                      randomize_noise: bool = False,
                      rng: Optional[jax.Array] = None,
                      compute_dtype=jnp.float32):
    """Full generator call matching `Generator.forward` (`model.py:471-539`).

    styles: list of (B, 512) z/w vectors, or a single (B, n_latent, 512) W+.
    Noise defaults to the fixed buffers (deterministic); pass
    ``randomize_noise=True`` with an ``rng`` key to sample per call.
    """
    if not input_is_latent:
        styles = [mapping(params, s) for s in styles]

    if noise is None:
        if randomize_noise:
            if rng is None:
                raise ValueError("randomize_noise=True requires an rng key")
            keys = jax.random.split(rng, len(params["noises"]))
            noise = [jax.random.normal(k, n.shape, n.dtype)
                     for k, n in zip(keys, params["noises"])]
        else:
            noise = params["noises"]

    if truncation < 1:
        if truncation_latent is None:
            raise ValueError("truncation < 1 requires truncation_latent")
        styles = [truncation_latent + truncation * (s - truncation_latent)
                  for s in styles]

    latent = style_to_wplus(params, styles, inject_index)
    image = synthesis(params, latent, noise, compute_dtype=compute_dtype)
    if return_latents:
        return image, latent
    return image, None


# ---------------------------------------------------------------------------
# Discriminator / W+ encoder building blocks (`model.py:542-710`)
# ---------------------------------------------------------------------------

def _init_equal_conv(key, in_ch, out_ch, kernel_size, bias=True):
    p = {"weight": jax.random.normal(
        key, (kernel_size, kernel_size, in_ch, out_ch), jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def init_conv_layer(key, in_ch, out_ch, kernel_size, *, downsample=False,
                    bias=True, activate=True):
    k1, _ = jax.random.split(key)
    p = {"conv": _init_equal_conv(k1, in_ch, out_ch, kernel_size,
                                  bias=bias and not activate)}
    if activate and bias:
        p["act_bias"] = jnp.zeros((out_ch,), jnp.float32)
    p["_meta"] = {"downsample": downsample, "activate": activate, "bias": bias,
                  "kernel_size": kernel_size}
    return p


def conv_layer(p: Params, x):
    """Blur(+stride-2) equalized conv + activation (`model.py:542-588`)."""
    meta = p["_meta"]
    ks = meta["kernel_size"]
    if meta["downsample"]:
        factor = 2
        pd = (len(BLUR_KERNEL) - factor) + (ks - 1)
        pad0, pad1 = (pd + 1) // 2, pd // 2
        x = blur(x, make_kernel(BLUR_KERNEL), pad=(pad0, pad1))
        stride, padding = 2, 0
    else:
        stride, padding = 1, ks // 2
    out = equal_conv2d(x, p["conv"]["weight"], p["conv"].get("bias"),
                       stride=stride, padding=padding)
    if meta["activate"]:
        if meta["bias"]:
            out = fused_leaky_relu(out, p["act_bias"])
        else:
            out = scaled_leaky_relu(out)
    return out


def init_res_block(key, in_ch, out_ch):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": init_conv_layer(k1, in_ch, in_ch, 3),
        "conv2": init_conv_layer(k2, in_ch, out_ch, 3, downsample=True),
        "skip": init_conv_layer(k3, in_ch, out_ch, 1, downsample=True,
                                activate=False, bias=False),
    }


def res_block(p: Params, x):
    out = conv_layer(p["conv1"], x)
    out = conv_layer(p["conv2"], out)
    skip = conv_layer(p["skip"], x)
    return (out + skip) / math.sqrt(2.0)


def init_discriminator(key, size: int, channel_multiplier: int = 2) -> Params:
    channels = channel_map(channel_multiplier)
    log_size = int(math.log2(size))
    keys = jax.random.split(key, log_size + 5)
    blocks = [init_conv_layer(keys[0], 3, channels[size], 1)]
    in_ch = channels[size]
    for n, i in enumerate(range(log_size, 2, -1)):
        out_ch = channels[2 ** (i - 1)]
        blocks.append(init_res_block(keys[n + 1], in_ch, out_ch))
        in_ch = out_ch
    return {
        "blocks": blocks,
        "final_conv": init_conv_layer(keys[-3], in_ch + 1, channels[4], 3),
        "final_linear": [
            _init_equal_linear(keys[-2], channels[4] * 16, channels[4]),
            _init_equal_linear(keys[-1], channels[4], 1),
        ],
        "meta": {"size": size},
    }


def minibatch_stddev(x: jnp.ndarray, group_size: int = 4, num_feat: int = 1):
    """Minibatch-stddev feature (`model.py:657-664`), NHWC."""
    b, h, w, c = x.shape
    group = min(b, group_size)
    y = x.reshape(group, -1, h, w, num_feat, c // num_feat)
    std = jnp.sqrt(y.var(axis=0) + 1e-8)           # (b/g, h, w, nf, c/nf)
    std = std.mean(axis=(1, 2, 4), keepdims=True)  # (b/g, 1, 1, nf, 1)
    std = std.squeeze(4)                           # (b/g, 1, 1, nf)
    std = jnp.tile(std, (group, h, w, 1))
    return jnp.concatenate([x, std], axis=-1)


def discriminator_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    out = conv_layer(p["blocks"][0], x)
    for blk in p["blocks"][1:]:
        out = res_block(blk, out)
    out = minibatch_stddev(out)
    out = conv_layer(p["final_conv"], out)
    out = out.reshape(out.shape[0], -1)
    out = equal_linear(out, p["final_linear"][0]["weight"],
                       p["final_linear"][0]["bias"], activation=True)
    out = equal_linear(out, p["final_linear"][1]["weight"],
                       p["final_linear"][1]["bias"])
    return out


def init_wplus_encoder(key, size: int, w_dim: int = 512) -> Params:
    """W+ ResNet encoder (`model.py:673-710`; unused in the pipeline)."""
    channels = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128,
                256: 64, 512: 32, 1024: 16}
    log_size = int(math.log2(size))
    n_latents = log_size * 2 - 2
    keys = jax.random.split(key, log_size + 2)
    blocks = [init_conv_layer(keys[0], 3, channels[size], 1)]
    in_ch = channels[size]
    for n, i in enumerate(range(log_size, 2, -1)):
        out_ch = channels[2 ** (i - 1)]
        blocks.append(init_res_block(keys[n + 1], in_ch, out_ch))
        in_ch = out_ch
    final = _init_equal_conv(keys[-1], in_ch, n_latents * w_dim, 4, bias=False)
    return {"blocks": blocks, "final": final,
            "meta": {"n_latents": n_latents, "w_dim": w_dim}}


def wplus_encoder_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    out = conv_layer(p["blocks"][0], x)
    for blk in p["blocks"][1:]:
        out = res_block(blk, out)
    out = equal_conv2d(out, p["final"]["weight"], None, stride=1, padding=0)
    b = x.shape[0]
    return out.reshape(b, p["meta"]["n_latents"], p["meta"]["w_dim"])
