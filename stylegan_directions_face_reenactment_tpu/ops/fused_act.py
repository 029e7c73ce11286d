"""Fused bias + LeakyReLU + gain — the StyleGAN2 activation.

TPU-native equivalent of the reference CUDA kernel
(`libs/gan/StyleGAN2/op/fused_bias_act_kernel.cu`, python wrapper
`libs/gan/StyleGAN2/op/fused_act.py`):

    y = leaky_relu(x + b[c], negative_slope) * scale

with ``negative_slope = 0.2`` and ``scale = sqrt(2)`` everywhere in the
pipeline. The bias broadcasts along the channel axis, which in our NHWC /
(B, C) layouts is always the *last* axis.

Two implementations:
  * :func:`fused_leaky_relu` — plain jnp. XLA fuses it into the producing
    matmul/conv, which is already speed-of-light for this op; this is the
    default on the model path.
  * :func:`fused_leaky_relu_pallas` — an explicit Pallas VPU kernel with a
    custom VJP, exercised by tests and available for fusion experiments.
    The backward follows the CUDA kernel's trick of re-deriving the mask
    from the *output* sign (valid because scale > 0).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_SLOPE = 0.2
DEFAULT_SCALE = math.sqrt(2.0)


def fused_leaky_relu(x: jnp.ndarray, bias: jnp.ndarray | None = None,
                     negative_slope: float = DEFAULT_SLOPE,
                     scale: float = DEFAULT_SCALE) -> jnp.ndarray:
    """``leaky_relu(x + bias) * scale`` with bias broadcast on the last axis."""
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(scale, x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel version
# ---------------------------------------------------------------------------

_LANE = 128
_SUBLANE = 8


def _interpret() -> bool:
    """Pallas TPU kernels only compile on TPU; interpret elsewhere (tests).

    Honors ``jax_default_device`` (tests route to a virtual-CPU mesh that
    way because the environment pins JAX_PLATFORMS to the TPU plugin).
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform != "tpu"
    return jax.default_backend() not in ("tpu", "axon")


def _fwd_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    x = x_ref[:] + b_ref[:]
    o_ref[:] = jnp.where(x >= 0, x, x * negative_slope) * scale


def _bwd_kernel(g_ref, y_ref, dx_ref, *, negative_slope, scale):
    # Mask from the saved output: y >= 0 iff (x + b) >= 0 since scale > 0.
    mask = y_ref[:] >= 0
    dx_ref[:] = jnp.where(mask, g_ref[:] * scale, g_ref[:] * (scale * negative_slope))


def _as_2d(x: jnp.ndarray):
    """Collapse leading axes so the channel axis is the (lane) minor axis."""
    c = x.shape[-1]
    return x.reshape(-1, c)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_leaky_relu_pallas(x, bias, negative_slope=DEFAULT_SLOPE,
                            scale=DEFAULT_SCALE):
    y, _ = _fused_fwd(x, bias, negative_slope, scale)
    return y


def _pallas_fwd_call(x2, b_row, negative_slope, scale):
    rows, c = x2.shape
    return pl.pallas_call(
        partial(_fwd_kernel, negative_slope=negative_slope, scale=scale),
        out_shape=jax.ShapeDtypeStruct((rows, c), x2.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x2, b_row)


def _pallas_bwd_call(g2, y2, negative_slope, scale):
    rows, c = g2.shape
    return pl.pallas_call(
        partial(_bwd_kernel, negative_slope=negative_slope, scale=scale),
        out_shape=jax.ShapeDtypeStruct((rows, c), g2.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(g2, y2)


def _fused_fwd(x, bias, negative_slope, scale):
    orig_shape = x.shape
    c = orig_shape[-1]
    x2 = _as_2d(x)
    b_row = jnp.broadcast_to(bias.astype(x.dtype)[None, :], x2.shape)
    y2 = _pallas_fwd_call(x2, b_row, negative_slope, scale)
    y = y2.reshape(orig_shape)
    return y, (y,)


def _fused_bwd(negative_slope, scale, res, g):
    (y,) = res
    orig_shape = g.shape
    g2 = _as_2d(g)
    y2 = _as_2d(y)
    dx2 = _pallas_bwd_call(g2, y2, negative_slope, scale)
    dx = dx2.reshape(orig_shape)
    # Bias grad: reduce over all non-channel axes.
    db = dx2.sum(axis=0)
    return dx, db


fused_leaky_relu_pallas.defvjp(
    lambda x, b, ns, sc: _fused_fwd(x, b, ns, sc),
    _fused_bwd,
)


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = DEFAULT_SLOPE) -> jnp.ndarray:
    """Bias-free variant (`model.py:165-174` ScaledLeakyReLU)."""
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(math.sqrt(2.0), x.dtype)
