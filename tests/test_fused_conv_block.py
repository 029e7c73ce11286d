"""Fused FAN ConvBlock Pallas kernel vs the XLA composition.

The kernel runs compiled on TPU and interpreted elsewhere; these tests run
it interpreted against `models/face/fan.py::conv_block` (the XLA path, the
one with live-torch parity) on small shapes, f32 and bf16, plus the custom
VJP (which must recompute through the XLA composition)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.models.face.fan import (
    conv_block, init_conv_block)
from stylegan_directions_face_reenactment_tpu.ops.fused_conv_block import (
    conv_block_fused, fused_convblock_enabled, set_fused_convblock)


@pytest.fixture
def block_params(rng):
    p = init_conv_block(jax.random.PRNGKey(0), 256, 256)
    # randomize BN stats so normalization is exercised
    for bn in ("bn1", "bn2", "bn3"):
        c = p[bn]["mean"].shape[0]
        p[bn]["mean"] = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
        p[bn]["var"] = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
        p[bn]["scale"] = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
        p[bn]["offset"] = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    return p


@pytest.mark.parametrize("hw", [8, 16])
def test_fused_conv_block_matches_xla_f32(block_params, rng, hw):
    x = jnp.asarray(rng.randn(2, hw, hw, 256).astype(np.float32))
    want = conv_block(block_params, x)          # XLA path (mode auto, CPU)
    got = conv_block_fused(block_params, x)     # kernel, interpreted
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_conv_block_matches_xla_bf16(block_params, rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 256).astype(np.float32)).astype(
        jnp.bfloat16)
    want = conv_block(block_params, x).astype(jnp.float32)
    got = conv_block_fused(block_params, x).astype(jnp.float32)
    # both paths are bf16 approximations with f32 conv accumulation; they
    # differ only in elementwise rounding order
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.15)


def test_fused_gating(block_params):
    x32 = jnp.zeros((1, 32, 32, 256))
    assert not fused_convblock_enabled(block_params, x32)  # default: off
    set_fused_convblock("on")
    try:
        assert fused_convblock_enabled(block_params, x32)
        assert not fused_convblock_enabled(block_params,
                                           jnp.zeros((1, 4, 4, 256)))
        assert not fused_convblock_enabled(block_params,
                                           jnp.zeros((1, 128, 128, 256)))
        # VMEM budget: 64² f32 blocks OOM the 16 MB VMEM (measured) — only
        # bf16 fits at 64²
        assert not fused_convblock_enabled(block_params,
                                           jnp.zeros((1, 64, 64, 256)))
        assert fused_convblock_enabled(
            block_params, jnp.zeros((1, 64, 64, 256), jnp.bfloat16))
        p_ds = dict(block_params, downsample={"x": 0})
        assert not fused_convblock_enabled(p_ds, x32)
    finally:
        set_fused_convblock("off")


def test_fused_conv_block_grad_matches_xla(block_params, rng):
    """The custom VJP recomputes through the XLA composition — grads of the
    fused op must equal grads of conv_block."""
    x = jnp.asarray(rng.randn(1, 8, 8, 256).astype(np.float32))

    def loss_fused(x):
        return jnp.sum(conv_block_fused(block_params, x) ** 2)

    def loss_xla(x):
        return jnp.sum(conv_block(block_params, x) ** 2)

    g_fused = jax.grad(loss_fused)(x)
    g_xla = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_fan_forward_fused_matches_xla(rng):
    """Whole FAN forward with the kernel forced on (interpreted) matches
    the XLA path."""
    from stylegan_directions_face_reenactment_tpu.models.face.fan import (
        fan_forward, init_fan)
    fan = init_fan(jax.random.PRNGKey(1), num_modules=1)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    want = fan_forward(fan, x)[-1]
    set_fused_convblock("on")
    try:
        got = fan_forward(fan, x)[-1]
    finally:
        set_fused_convblock("off")
    # per-block agreement is ~1e-6 (tests above); reduction-order deltas
    # compound through the 13-block hourglass to a few 1e-4
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=2e-3)
