"""Fused dense-residual ConvBlock — the FAN hourglass hot op (Pallas).

The FAN 4-stack hourglass (`libs/face_models/fan_model/models.py:13-55`
ConvBlock) is the top sink of the reenactment headline path and is
HBM-bandwidth-bound (PERF.md: 488 GB/s at 24% MXU). Its dense residual
block

    o1 = conv3x3(relu(bn1(x)))        # 256 -> 128
    o2 = conv3x3(relu(bn2(o1)))       # 128 -> 64
    o3 = conv3x3(relu(bn3(o2)))       # 64  -> 64
    out = concat(o1, o2, o3) + x      # channels-equal residual

round-trips every intermediate through HBM on the XLA path. At hourglass
resolutions (<=64x64, 256 ch) the whole image fits in VMEM (2 MB bf16), so
this kernel computes the entire block per (batch-item) grid step with ONE
HBM read of x and ONE write of out. Each 3x3 conv is 9 shifted
(H*W, Cin) @ (Cin, Cout) MXU matmuls over a zero-padded VMEM scratch —
no im2col materialization.

MEASURED RESULT (v5e, FAN bf16 batch 16): 12.7 ms vs 9.5 ms for the XLA
path — the kernel is numerically correct but SLOWER, so it ships DISABLED
(`_FUSED_MODE = "off"`). The 27 shifted (H·W, C) reads per block are
materialized through VPU shuffles (~54 MB of vreg traffic per block),
which costs more than the ~2x HBM-traffic saving; XLA's native conv
library already streams the same data through the MXU at 488 GB/s (60% of
HBM peak, PERF.md). Kept (with tests, interpreted off-TPU) as the measured
negative result documenting why the FAN stage sits at its bandwidth bound
rather than as an unexamined "should be fused" TODO.

Numerics match the XLA path's mixed-precision recipe: bf16 (or f32)
elementwise bn/relu with bf16-rounded folded scales, f32 conv accumulation,
cast back to the activation dtype between stages.

Gradients: the block sits behind `stop_gradient` on every pipeline use
(detection is crop metadata), but a custom VJP recomputes through the plain
XLA composition so `jax.grad` stays correct if anyone differentiates it.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

# "off" (DEFAULT — measured slower than XLA, see module docstring);
# "auto" = on TPU only (interpret elsewhere is correct but slow);
# "on" forces it (tests use "on" + interpret).
_FUSED_MODE = "off"


def set_fused_convblock(mode: str) -> None:
    global _FUSED_MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError("mode must be 'auto', 'on' or 'off'")
    _FUSED_MODE = mode


def _on_tpu() -> bool:
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform == "tpu"
    return jax.default_backend() in ("tpu", "axon")


def fused_convblock_enabled(p: Params, x: jnp.ndarray) -> bool:
    """The kernel covers the channels-equal (no-downsample) 256-ch blocks —
    every block inside the hourglasses — at VMEM-resident sizes."""
    if _FUSED_MODE == "off":
        return False
    if "downsample" in p or x.ndim != 4 or x.shape[-1] != 256:
        return False
    h, w = x.shape[1], x.shape[2]
    if h * w < 8 * 8:                      # tiny levels: XLA is fine
        return False
    # VMEM budget: double-buffered in+out blocks + padded scratch + weights
    # must fit 16 MB — 64² fits at bf16 (~11 MB) but NOT at f32 (20.6 MB,
    # measured compile OOM); f32 caps at 32².
    itemsize = jnp.dtype(x.dtype).itemsize
    if h * w * 256 * itemsize > 2 * 1024 * 1024:
        return False
    return _FUSED_MODE == "on" or _on_tpu()


def _fold_bn(bn: Params, dtype) -> tuple:
    inv = (bn["scale"].astype(jnp.float32)
           * jax.lax.rsqrt(bn["var"].astype(jnp.float32) + 1e-5))
    off = bn["offset"].astype(jnp.float32) - bn["mean"].astype(jnp.float32) * inv
    # the XLA path multiplies with dtype-rounded scales (models/nn.py
    # batch_norm); match it
    return inv.astype(dtype)[None, :], off.astype(dtype)[None, :]


def _kernel(x_ref, i1_ref, f1_ref, w1_ref, i2_ref, f2_ref, w2_ref,
            i3_ref, f3_ref, w3_ref, out_ref, pad_ref):
    h, w = x_ref.shape[1], x_ref.shape[2]
    dtype = x_ref.dtype

    def conv3x3(w_ref, cin, cout):
        acc = jnp.zeros((h * w, cout), jnp.float32)
        for k in range(9):
            dy, dx = divmod(k, 3)
            sl = pad_ref[dy:dy + h, dx:dx + w, :cin].reshape(h * w, cin)
            acc += jnp.dot(sl, w_ref[k, :cin, :],
                           preferred_element_type=jnp.float32)
        return acc.astype(dtype).reshape(h, w, cout)

    x = x_ref[0]

    pad_ref[:] = jnp.zeros_like(pad_ref)
    pad_ref[1:h + 1, 1:w + 1, :] = jnp.maximum(x * i1_ref[0] + f1_ref[0], 0)
    o1 = conv3x3(w1_ref, 256, 128)

    pad_ref[:] = jnp.zeros_like(pad_ref)
    pad_ref[1:h + 1, 1:w + 1, :128] = jnp.maximum(
        o1 * i2_ref[0] + f2_ref[0], 0)
    o2 = conv3x3(w2_ref, 128, 64)

    pad_ref[:] = jnp.zeros_like(pad_ref)
    pad_ref[1:h + 1, 1:w + 1, :64] = jnp.maximum(
        o2 * i3_ref[0] + f3_ref[0], 0)
    o3 = conv3x3(w3_ref, 64, 64)

    out_ref[0] = jnp.concatenate([o1, o2, o3], axis=-1) + x


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_conv_block_256(x, i1, f1, w1, i2, f2, w2, i3, f3, w3):
    return _forward(x, i1, f1, w1, i2, f2, w2, i3, f3, w3)


def _forward(x, i1, f1, w1, i2, f2, w2, i3, f3, w3, interpret=None):
    if interpret is None:
        interpret = not _on_tpu()   # compiled on TPU; interpreter elsewhere
    b, h, w, c = x.shape
    assert c == 256
    dtype = x.dtype
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    flops = 2 * h * w * 9 * (256 * 128 + 128 * 64 + 64 * 64) * b
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, 256), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((1, 256)), full((1, 256)), full((9, 256, 128)),
            full((1, 128)), full((1, 128)), full((9, 128, 64)),
            full((1, 64)), full((1, 64)), full((9, 64, 64)),
        ],
        out_specs=pl.BlockSpec((1, h, w, 256), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 256), dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, 256), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * b * h * w * 256 * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, i1, f1, w1, i2, f2, w2, i3, f3, w3)


def _reference(x, i1, f1, w1, i2, f2, w2, i3, f3, w3):
    """The plain XLA composition (for the VJP and for testing)."""
    from ..models.nn import conv2d

    def stage(h_in, inv, off, wk, cin, cout):
        act = jnp.maximum(h_in * inv[0] + off[0], 0)
        return conv2d(act, wk.reshape(3, 3, cin, cout), padding=1)

    o1 = stage(x, i1, f1, w1, 256, 128)
    o2 = stage(o1, i2, f2, w2, 128, 64)
    o3 = stage(o2, i3, f3, w3, 64, 64)
    return jnp.concatenate([o1, o2, o3], axis=-1) + x


def _fwd(x, i1, f1, w1, i2, f2, w2, i3, f3, w3):
    out = _forward(x, i1, f1, w1, i2, f2, w2, i3, f3, w3)
    return out, (x, i1, f1, w1, i2, f2, w2, i3, f3, w3)


def _bwd(res, g):
    _, vjp = jax.vjp(_reference, *res)
    return vjp(g)


fused_conv_block_256.defvjp(_fwd, _bwd)


def conv_block_fused(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for `models/face/fan.py::conv_block` on 256-ch blocks."""
    dtype = x.dtype
    i1, f1 = _fold_bn(p["bn1"], dtype)
    i2, f2 = _fold_bn(p["bn2"], dtype)
    i3, f3 = _fold_bn(p["bn3"], dtype)
    rs = lambda w: w.astype(dtype).reshape(9, w.shape[2], w.shape[3])
    return fused_conv_block_256(x, i1, f1, rs(p["conv1"]), i2, f2,
                                rs(p["conv2"]), i3, f3, rs(p["conv3"]))
