"""upfirdn2d — upsample, FIR filter, downsample — as a single XLA op.

TPU-native equivalent of the reference CUDA kernel
(`libs/gan/StyleGAN2/op/upfirdn2d_kernel.cu`, functional spec in
`libs/gan/StyleGAN2/op/upfirdn2d.py:168-209` `upfirdn2d_native`).

Semantics (per spatial axis):
  1. zero-stuff the input by the integer factor ``up`` (each sample followed
     by ``up - 1`` zeros, so length becomes ``in * up``);
  2. pad by ``(pad0, pad1)`` (negative values crop);
  3. correlate with the *flipped* FIR kernel (i.e. true convolution);
  4. keep every ``down``-th sample.

Output size: ``(in * up + pad0 + pad1 - k + down) // down``.

Instead of materialising the zero-stuffed intermediate (what the CUDA kernel
tiles into shared memory), we express the whole thing as one
`lax.conv_general_dilated` with ``lhs_dilation=up`` and grouped (depthwise)
channels; XLA lowers this straight onto the TPU convolution units and fuses
the surrounding elementwise work.  A subtlety: ``lhs_dilation`` produces
``(in-1)*up + 1`` samples (no trailing zeros) whereas the reference
zero-stuffing produces ``in*up``; we compensate by adding ``up - 1`` to the
trailing pad, which is numerically identical.

Layout: NHWC (TPU-friendly). The reference is NCHW.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Pad = Union[Tuple[int, int], Tuple[int, int, int, int]]


def make_kernel(k: Sequence[float], gain: float = 1.0) -> jnp.ndarray:
    """Build a normalized 2D FIR kernel from a 1D or 2D tap list.

    Mirrors `libs/gan/StyleGAN2/model.py:19-27` (outer product of a 1D taps
    vector, normalized to sum 1, then optionally multiplied by a gain such as
    ``factor**2`` for upsampling filters).
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return jnp.asarray(k * gain, dtype=jnp.float32)


def _normalize_updown(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        ux, uy = int(v[0]), int(v[1])
    else:
        ux = uy = int(v)
    return ux, uy


def _normalize_pad(pad: Pad) -> Tuple[int, int, int, int]:
    if len(pad) == 2:
        p0, p1 = int(pad[0]), int(pad[1])
        return p0, p1, p0, p1
    px0, px1, py0, py1 = (int(p) for p in pad)
    return px0, px1, py0, py1


def upfirdn2d_output_shape(in_h: int, in_w: int, kernel_shape: Tuple[int, int],
                           up=1, down=1, pad: Pad = (0, 0)) -> Tuple[int, int]:
    """Output spatial dims, matching `upfirdn2d.py:104-105` of the reference."""
    up_x, up_y = _normalize_updown(up)
    down_x, down_y = _normalize_updown(down)
    px0, px1, py0, py1 = _normalize_pad(pad)
    kh, kw = kernel_shape
    out_h = (in_h * up_y + py0 + py1 - kh + down_y) // down_y
    out_w = (in_w * up_x + px0 + px1 - kw + down_x) // down_x
    return out_h, out_w


@partial(jax.jit, static_argnames=("up", "down", "pad"))
def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up=1, down=1,
              pad: Pad = (0, 0)) -> jnp.ndarray:
    """Apply upsample→FIR→downsample to an NHWC batch.

    Args:
      x: (N, H, W, C) input.
      kernel: (kh, kw) float FIR taps (not flipped; we flip internally so the
        op performs true convolution like the reference).
      up / down: int or (x, y) integer resampling factors.
      pad: (pad0, pad1) applied to both axes, or (px0, px1, py0, py1).
        Negative values crop.

    Returns:
      (N, out_h, out_w, C) array with the formula above.
    """
    up_x, up_y = _normalize_updown(up)
    down_x, down_y = _normalize_updown(down)
    px0, px1, py0, py1 = _normalize_pad(pad)

    n, h, w, c = x.shape
    kh, kw = kernel.shape

    # True convolution == correlation with the flipped kernel.
    k = jnp.flip(kernel, (0, 1)).astype(jnp.float32)
    k = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))

    # lhs_dilation yields (h-1)*up+1 samples; the reference zero-stuffing
    # yields h*up. Add up-1 to the trailing pad to match.
    pad_spec = ((py0, py1 + up_y - 1), (px0, px1 + up_x - 1))

    out = lax.conv_general_dilated(
        x.astype(jnp.float32),
        k,
        window_strides=(down_y, down_x),
        padding=pad_spec,
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# StyleGAN2 resampling wrappers (pad arithmetic from model.py:30-88)
# ---------------------------------------------------------------------------

# Backend for the up/blur resampling ops:
#   "xla"    — the dilated-conv formulation above; fuses with neighbors.
#   "pallas" — the double-buffered polyphase Pallas kernel
#              (`ops/pallas_upfirdn.py`) everywhere: exact f32 like the
#              reference CUDA kernel.
#   "mixed"  — Pallas for 2x upsampling (at per-op parity with XLA on v5e
#              after double-buffering the row-band DMA: up64 0.98x /
#              up128 ~1.0x, e2e reenact 566.2 vs 566.5 fps), XLA for the
#              small in-graph blurs where conv fusion still wins.
#   "auto"   — DEFAULT: "mixed" on TPU; "xla" elsewhere (off-TPU the
#              Pallas kernel runs interpreted — correct but slow).
# Numerics: all three are equivalent at f32 on v5e — the depthwise
# resample convs lower exactly (composed 256² synthesis drift of mixed/xla
# vs pallas measured 0.0, `tools/measure_backend_drift.py`); backend
# choice is purely a performance knob.
_RESAMPLE_BACKEND = "auto"


def set_resample_backend(name: str) -> None:
    global _RESAMPLE_BACKEND
    if name not in ("xla", "pallas", "mixed", "auto"):
        raise ValueError("backend must be 'xla', 'pallas', 'mixed' or 'auto'")
    _RESAMPLE_BACKEND = name


def _on_tpu() -> bool:
    import jax as _jax
    dev = _jax.config.jax_default_device
    if dev is not None:
        return dev.platform == "tpu"
    return _jax.default_backend() in ("tpu", "axon")


def get_resample_backend() -> str:
    if _RESAMPLE_BACKEND == "auto":
        return "mixed" if _on_tpu() else "xla"
    return _RESAMPLE_BACKEND


def _pallas_ok(kernel, for_upsample: bool = False) -> bool:
    import jax as _jax
    if isinstance(kernel, _jax.core.Tracer):
        return False
    backend = get_resample_backend()
    if backend == "pallas":
        return True
    return backend == "mixed" and for_upsample


def upsample2d(x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """2x (or ``factor``x) upsampling with a FIR filter.

    ``kernel`` must already include the ``factor**2`` gain (see
    :func:`make_kernel`). Pad arithmetic mirrors `model.py:38-43`.
    """
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    if factor in (1, 2) and _pallas_ok(kernel, for_upsample=True):
        from .pallas_upfirdn import upfirdn2d_pallas
        return upfirdn2d_pallas(x, np.asarray(kernel), factor, (pad0, pad1))
    return upfirdn2d(x, kernel, up=factor, down=1, pad=(pad0, pad1))


def downsample2d(x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """FIR filter then ``factor``x downsampling (`model.py:58-64`)."""
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def blur(x: jnp.ndarray, kernel: jnp.ndarray, pad: Tuple[int, int]) -> jnp.ndarray:
    """Plain FIR blur with explicit pad (`model.py:72-88`)."""
    if _pallas_ok(kernel):
        from .pallas_upfirdn import upfirdn2d_pallas
        return upfirdn2d_pallas(x, np.asarray(kernel), 1,
                                (int(pad[0]), int(pad[1])))
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)
