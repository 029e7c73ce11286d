"""Probe: does int8 convolution beat bf16 at FAN-hourglass shapes on this TPU?

The FAN 4-stack hourglass is the headline path's top sink and is
HBM-bandwidth-bound at ~60% of the v5e's peak (PERF.md). After the
whole-block VMEM fusion measured negative (`ops/fused_conv_block.py`),
int8 quantization was the remaining identified lever: int8 activations
halve HBM traffic vs bf16 and the v5e MXU has 2x int8 throughput.

Methodology: repeated identical dispatches through the tunneled chip get
deduplicated (apparent >2 PFLOP/s), so each candidate op runs as a
50-iteration `lax.scan` chain inside ONE jitted program — every iteration
depends on the previous output, so the device must execute all of them.

Result on TPU v5e (2026-08-17):

    bf16 3x3 conv 64x64x256->256 : 1.061 ms/iter   72.8 TFLOP/s
    int8 3x3 conv + requant      : 0.865 ms/iter   89.4 TOP/s    (1.23x)
    int8 3x3 conv + f32 requant  : 0.867 ms/iter   89.1 TOP/s
    bf16 1x1 conv 256->256       : 0.676 ms/iter   12.7 TFLOP/s
    int8 1x1 conv + requant      : 0.664 ms/iter   12.9 TOP/s    (1.02x)

Conclusion (recorded in PERF.md): XLA's int8 conv lowering on this chip
yields only 1.23x on the MXU-heavy 3x3 and ~nothing on the
bandwidth-bound 1x1 — nowhere near the ~2x the traffic halving promises.
Quantizing FAN end-to-end (which would also need per-layer calibration
scales and would perturb landmark peaks) would buy well under 10% of the
headline frame budget. Not pursued; the FAN stage ships bf16.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
    enable_persistent_cache,
)

B, H, W, C = 16, 64, 64, 256
N = 50  # chained iterations inside the device program


def bench(name, fn, x, *consts, ops_per_iter):
    f = jax.jit(
        lambda x: lax.scan(lambda c, _: (fn(c, *consts), None), x, None,
                           length=N)[0])
    r = f(x)
    jax.block_until_ready(r)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = f(x)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / N
    print(f"{name:34s} {dt*1e3:.4f} ms/iter  {ops_per_iter/dt/1e12:.1f} T/s")
    return dt


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_i8(x, w):
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)


def conv_i8_f32scale(x, w):
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return jnp.clip(jnp.round(y.astype(jnp.float32) * 0.002),
                    -127, 127).astype(jnp.int8)


def main():
    enable_persistent_cache()
    print(jax.devices())
    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (B, H, W, C), jnp.bfloat16) * 0.1
    x8 = (jax.random.normal(key, (B, H, W, C)) * 10).astype(jnp.int8)

    flops3 = 2 * B * H * W * 9 * C * C
    wb3 = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.01
    w83 = (jax.random.normal(key, (3, 3, C, C)) * 10).astype(jnp.int8)
    t_bf = bench("bf16 3x3 conv 64x64x256->256", conv, xb, wb3,
                 ops_per_iter=flops3)
    t_i8 = bench("int8 3x3 conv + shift requant", conv_i8, x8, w83,
                 ops_per_iter=flops3)
    bench("int8 3x3 conv + f32 requant", conv_i8_f32scale, x8, w83,
          ops_per_iter=flops3)

    flops1 = 2 * B * H * W * C * C
    wb1 = jax.random.normal(key, (1, 1, C, C), jnp.bfloat16) * 0.01
    w81 = (jax.random.normal(key, (1, 1, C, C)) * 10).astype(jnp.int8)
    bench("bf16 1x1 conv 256->256", conv, xb, wb1, ops_per_iter=flops1)
    bench("int8 1x1 conv + shift requant", conv_i8, x8, w81,
          ops_per_iter=flops1)
    print(f"\n3x3 int8-vs-bf16 speedup: {t_bf/t_i8:.2f}x")


if __name__ == "__main__":
    main()
