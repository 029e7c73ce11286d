"""Independent numpy oracles for kernel golden tests.

Implemented directly from the mathematical definitions (zero-stuff → pad →
true 2D convolution → decimate), deliberately *not* shaped like either the
reference CUDA kernel or our XLA formulation, so agreement is meaningful.
"""

import numpy as np


def upfirdn2d_np(x, kernel, up=1, down=1, pad=(0, 0)):
    """x: (N, H, W, C) float; kernel: (kh, kw). Returns NHWC.

    Semantics per axis: insert up-1 zeros after each sample (length in*up),
    pad by (pad0, pad1) (negative crops), true-convolve with kernel, then
    keep every down-th sample.
    """
    if np.isscalar(up):
        up = (up, up)
    if np.isscalar(down):
        down = (down, down)
    if len(pad) == 2:
        pad = (pad[0], pad[1], pad[0], pad[1])
    up_x, up_y = up
    down_x, down_y = down
    px0, px1, py0, py1 = pad

    n, h, w, c = x.shape
    kh, kw = kernel.shape

    # 1. zero-stuff to (h*up_y, w*up_x)
    z = np.zeros((n, h * up_y, w * up_x, c), dtype=np.float64)
    z[:, ::up_y, ::up_x, :] = x

    # 2. pad (negative = crop)
    def axpad(a, axis, p0, p1):
        padw = [(0, 0)] * a.ndim
        padw[axis] = (max(p0, 0), max(p1, 0))
        a = np.pad(a, padw)
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(max(-p0, 0), a.shape[axis] - max(-p1, 0))
        return a[tuple(sl)]

    z = axpad(z, 1, py0, py1)
    z = axpad(z, 2, px0, px1)

    # 3. true convolution (flip kernel, correlate), valid mode
    hh = z.shape[1] - kh + 1
    ww = z.shape[2] - kw + 1
    out = np.zeros((n, hh, ww, c), dtype=np.float64)
    kf = kernel[::-1, ::-1]
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * z[:, i:i + hh, j:j + ww, :]

    # 4. decimate
    out = out[:, ::down_y, ::down_x, :]
    return out


def modulated_conv2d_np(x, weight, style, demodulate=True, eps=1e-8):
    """Explicit per-sample-weight oracle (no up/down sampling).

    x: (B,H,W,Cin) NHWC; weight: (kh,kw,Cin,Cout); style: (B,Cin).
    Builds the modulated per-sample weights like the reference
    (`model.py:232-244`) and runs a direct convolution per sample.
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    scale = 1.0 / np.sqrt(cin * kh * kw)

    # per-sample weights (B,kh,kw,Cin,Cout)
    ws = scale * weight[None] * style[:, None, None, :, None]
    if demodulate:
        demod = 1.0 / np.sqrt((ws ** 2).sum(axis=(1, 2, 3)) + eps)  # (B,Cout)
        ws = ws * demod[:, None, None, None, :]

    pad = kh // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = np.zeros((b, h, w, cout), dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            # (B,H,W,Cin) x (B,Cin,Cout) -> (B,H,W,Cout)
            out += np.einsum('bhwi,bio->bhwo',
                             xp[:, i:i + h, j:j + w, :], ws[:, i, j])
    return out


def leaky_relu_np(x, slope=0.2):
    return np.where(x >= 0, x, x * slope)
