"""Pallas TPU kernel for upfirdn2d (up ∈ {1, 2}, down = 1).

The polyphase formulation of the reference CUDA kernel
(`libs/gan/StyleGAN2/op/upfirdn2d_kernel.cu`): instead of materializing the
zero-stuffed intermediate, each of the up×up output phases is a plain FIR
over the *input* grid with its own tap subset —

    y[o] = Σ_j h̄[j] · x[(o − p0 + j) / u]      (terms with exact division)

For outputs of a fixed parity, the input index advances 1-for-2 with o, so
every (phase, tap) pair contributes one statically-offset slice of the
input tile: the kernel is a handful of VPU multiply-adds over VMEM slices,
then a reshape-interleave of the phases. No gathers, no strided writes.

Memory: the input stays in HBM (`pl.ANY`); each (batch, row-tile) grid step
DMAs its halo'd row band into VMEM scratch (the BlockSpec index map cannot
express overlapping tiles, so the halo is a manual `make_async_copy`).

Covers every generator use of the primitive (blur after conv_transpose,
2× upsampling in to_rgb skips). The XLA formulation (`ops/upfirdn2d.py`)
remains the general/backward path; this kernel carries a custom VJP whose
backward is the reference's gradient identity (upfirdn2d with flipped taps
and gradient pads, `op/upfirdn2d.py:112-117`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .upfirdn2d import upfirdn2d as upfirdn2d_xla


def _interpret() -> bool:
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform != "tpu"
    return jax.default_backend() not in ("tpu", "axon")


def _phase_taps(kernel_flipped: np.ndarray, up: int, p0y: int, p0x: int):
    """Per-(φy, φx) lists of (tap, row_offset, col_offset) in input units,
    plus the pre-pad amounts that make all offsets non-negative."""
    kh, kw = kernel_flipped.shape

    def axis_taps(k_len, p0):
        # for output phase φ (parity of o): o = o0 + u·m, o0 = φ
        phases = []
        for phi in range(up):
            taps = []
            for j in range(k_len):
                t = phi - p0 + j
                if t % up == 0:
                    taps.append((j, t // up))
            phases.append(taps)
        return phases

    ty = axis_taps(kh, p0y)
    tx = axis_taps(kw, p0x)
    min_sy = min(s for taps in ty for _, s in taps)
    min_sx = min(s for taps in tx for _, s in taps)
    pre_y, pre_x = max(0, -min_sy), max(0, -min_sx)
    ty = [[(j, s + pre_y) for j, s in taps] for taps in ty]
    tx = [[(j, s + pre_x) for j, s in taps] for taps in tx]
    max_sy = max(s for taps in ty for _, s in taps)
    max_sx = max(s for taps in tx for _, s in taps)
    return ty, tx, pre_y, pre_x, max_sy, max_sx


def _separable_factors(kflip: np.ndarray):
    """If the (flipped) kernel is rank-1 (every StyleGAN2 blur kernel is an
    outer product, `model.py:19-27`), return 1D row/col factors, else None."""
    u, s, vt = np.linalg.svd(kflip)
    if s.shape[0] > 1 and s[1] > 1e-6 * max(s[0], 1e-30):
        return None
    ky = u[:, 0] * np.sqrt(s[0])
    kx = vt[0] * np.sqrt(s[0])
    return ky.astype(np.float64), kx.astype(np.float64)


def _make_kernel_fn(taps_y, taps_x, kflip: np.ndarray, up: int,
                    th_out: int, ow: int, rows_in: int):
    """Build the pallas kernel body (everything static).

    The halo'd input row band is DOUBLE-BUFFERED across grid steps: the
    TPU grid runs sequentially and scratch persists, so each step starts
    the next step's HBM→VMEM copy before computing its own — the DMA for
    band t+1 overlaps the VPU work on band t (the output block write is
    pipelined by pallas itself via the BlockSpec)."""
    oh_half = th_out // up
    ow_half = ow // up
    sep = _separable_factors(kflip)

    def body(x_hbm, o_ref, scratch, sem):
        b = pl.program_id(0)
        ht = pl.program_id(1)
        nt = pl.num_programs(1)
        nb = pl.num_programs(0)
        step = b * nt + ht
        total = nb * nt

        def dma(slot, s):
            bb = s // nt
            hh = s - bb * nt
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(hh * oh_half, rows_in)],
                scratch.at[slot], sem.at[slot])

        @pl.when(step == 0)
        def _():
            dma(0, 0).start()

        @pl.when(step + 1 < total)
        def _():
            dma((step + 1) % 2, step + 1).start()

        slot = step % 2
        dma(slot, step).wait()

        row_filtered = {}  # per-phy row-filtered intermediate (separable path)

        def phase_block(phy, phx):
            """One output phase: Σ taps · offset slice (dense), or the
            separable row-then-column formulation (≈half the VPU passes)."""
            if sep is None:
                acc = None
                for jy, sy in taps_y[phy]:
                    for jx, sx in taps_x[phx]:
                        tap = float(kflip[jy, jx])
                        sl = scratch[slot, sy:sy + oh_half,
                                     sx:sx + ow_half, :]
                        term = sl * tap
                        acc = term if acc is None else acc + term
            else:
                ky, kx = sep
                if phy not in row_filtered:
                    row_acc = None
                    for jy, sy in taps_y[phy]:
                        t = scratch[slot, sy:sy + oh_half, :, :] * float(ky[jy])
                        row_acc = t if row_acc is None else row_acc + t
                    row_filtered[phy] = row_acc
                row_acc = row_filtered[phy]
                acc = None
                if row_acc is not None:
                    for jx, sx in taps_x[phx]:
                        t = row_acc[:, sx:sx + ow_half, :] * float(kx[jx])
                        acc = t if acc is None else acc + t
            if acc is None:
                acc = jnp.zeros((oh_half, ow_half) + scratch.shape[3:],
                                scratch.dtype)
            return acc

        phase_rows = []
        for phy in range(up):
            phase_cols = [phase_block(phy, phx) for phx in range(up)]
            if up == 1:
                phase_rows.append(phase_cols[0])
            else:
                # interleave along W: (oh_half, ow_half, 2, C) → (oh_half, OW, C)
                st = jnp.stack(phase_cols, axis=2)
                phase_rows.append(st.reshape(oh_half, ow, -1))
        if up == 1:
            out = phase_rows[0]
        else:
            st = jnp.stack(phase_rows, axis=1)   # (oh_half, 2, OW, C)
            out = st.reshape(th_out, ow, -1)
        o_ref[0] = out.reshape(o_ref.shape[1:])

    return body


@functools.lru_cache(maxsize=None)
def _make_op(kernel_taps: tuple, up: int, pad: Tuple[int, int]):
    """Build (and cache) a custom-vjp op for one static kernel config.

    The FIR taps must be concrete (they are — blur kernels are compile-time
    constants in StyleGAN2); caching on the tap tuple keeps the function
    identity stable so jit does not recompile per call site.
    """
    kernel = np.asarray(kernel_taps, np.float32)

    @jax.custom_vjp
    def op(x):
        return _forward(x, kernel, up, pad)

    def fwd(x):
        return _forward(x, kernel, up, pad), (x.shape,)

    def bwd(res, g):
        (in_shape,) = res
        return (_backward(g, kernel, up, pad, in_shape),)

    op.defvjp(fwd, bwd)
    return op


def upfirdn2d_pallas(x: jnp.ndarray, kernel, up: int = 1,
                     pad: Tuple[int, int] = (0, 0)) -> jnp.ndarray:
    """Pallas upfirdn2d. ``kernel`` must be concrete (np.ndarray / nested
    tuple / concrete jnp array — NOT a traced value)."""
    if isinstance(kernel, jax.core.Tracer):
        # traced taps → fall back to the general XLA path
        return upfirdn2d_xla(x, kernel, up=up, down=1, pad=pad)
    taps = tuple(tuple(float(v) for v in row) for row in np.asarray(kernel))
    return _make_op(taps, int(up), (int(pad[0]), int(pad[1])))(x)


def _forward(x, kernel, up, pad):
    if up not in (1, 2):
        raise ValueError("pallas upfirdn2d supports up in {1, 2}")
    p0, p1 = int(pad[0]), int(pad[1])
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    oh = h * up + p0 + p1 - kh + 1
    ow = w * up + p0 + p1 - kw + 1
    if oh % up or ow % up:
        # phase interleave needs up | OH; fall back (never hits generator shapes)
        return upfirdn2d_xla(x, kernel, up=up, down=1, pad=(p0, p1))

    kflip = np.asarray(kernel, np.float32)[::-1, ::-1]
    taps_y, taps_x, pre_y, pre_x, max_sy, max_sx = _phase_taps(kflip, up, p0, p0)

    # output row tile: bounded so (double-buffered out block + halo scratch)
    # fits comfortably in the 16MB VMEM budget
    bytes_per_row = ow * c * x.dtype.itemsize
    th_out = oh if oh <= 64 else 64
    while oh % th_out:
        th_out //= 2
    # out block + its pipeline double-buffer + 2-slot input scratch must fit
    # VMEM; 4MB out blocks keep the grid coarse enough that per-step
    # overhead does not dominate at 256² shapes
    while th_out > up and th_out * bytes_per_row > 4 * 1024 * 1024:
        th_out //= 2
    oh_half = th_out // up
    rows_in = oh_half + max_sy
    cols_in = ow // up + max_sx

    # pre-pad the input so all slice offsets are valid; the padded width is
    # rounded up to a multiple of 8 (f32 sublane tile — odd-width VMEM
    # scratch buffers fault the DMA engine)
    post_y = max(0, rows_in + (oh // up - oh_half) - pre_y - h)
    post_x = max(0, cols_in - pre_x - w)
    width = pre_x + w + post_x
    post_x += (-width) % 16  # sublane tile: 8 (f32) / 16 (bf16) — use 16
    xp = jnp.pad(x, ((0, 0), (pre_y, post_y), (pre_x, post_x), (0, 0)))

    body = _make_kernel_fn(taps_y, taps_x, kflip, up, th_out, ow,
                           rows_in)
    grid = (n, oh // th_out)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, th_out, ow, c),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows_in, xp.shape[2], c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(xp)
    return out


def _backward(g, kernel, up, pad, in_shape):
    """Reference gradient identity (`op/upfirdn2d.py:104-117`): dL/dx is an
    upfirdn2d of the cotangent with the flipped kernel, up/down swapped and
    'gradient pads'."""
    kh, kw = kernel.shape
    p0, p1 = int(pad[0]), int(pad[1])
    h, w = in_shape[1], in_shape[2]
    oh = h * up + p0 + p1 - kh + 1
    g_p0y = kh - p0 - 1
    g_p1y = h * up - oh + p0 - up + 1
    gk = jnp.flip(jnp.asarray(kernel), (0, 1))
    return upfirdn2d_xla(g, gk, up=1, down=up, pad=(g_p0y, g_p1y))


# ---------------------------------------------------------------------------
# drop-in generator resampling wrappers (pallas-backed)
# ---------------------------------------------------------------------------

def blur_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                pad: Tuple[int, int]) -> jnp.ndarray:
    return upfirdn2d_pallas(x, kernel, 1, (int(pad[0]), int(pad[1])))


def upsample2d_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                      factor: int = 2) -> jnp.ndarray:
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d_pallas(x, kernel, factor, (pad0, pad1))
