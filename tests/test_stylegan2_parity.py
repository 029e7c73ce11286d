"""Full-forward live-torch parity for the StyleGAN2 generator and the DECA
ResNet-50 encoder — the two L1 nets that previously only had math-oracle /
schema tests.

The REAL reference `libs/gan/StyleGAN2/model.py` runs on CPU via
`ref_loader.install_op_stub()`: `upfirdn2d` routes to the reference's own CPU
oracle `upfirdn2d_native` (`op/upfirdn2d.py:168-209`) and the fused bias-act
uses the documented kernel semantics (`op/fused_act.py:73-86`). Random-init
torch weights go through `convert_stylegan2_generator` into our jitted
forward; the synthesized pixels must match. This validates converter,
mapping, truncation, W+/mixing handling, modulated conv (incl. the
input/output-scaling identity), noise injection, fused act and the full
resampling stack in one shot — exactly what happens with real checkpoints.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from stylegan_directions_face_reenactment_tpu.models.stylegan2 import (
    generator_forward, mapping, n_latent_for)
from stylegan_directions_face_reenactment_tpu.models.deca.deca import (
    resnet_encoder_forward)
from stylegan_directions_face_reenactment_tpu.weights.torch_convert import (
    convert_stylegan2_generator, convert_resnet_encoder)

from ref_loader import load_generator_module, install_reference_path


def nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def to_nhwc(t):
    return t.numpy().transpose(0, 2, 3, 1)


@pytest.fixture(scope="module")
def ref_gen64():
    """Reference Generator(size=64, cm=1) + converted params."""
    mod = load_generator_module()
    torch.manual_seed(7)
    g = mod.Generator(64, 512, 8, channel_multiplier=1).eval()
    params = convert_stylegan2_generator(g.state_dict(), size=64,
                                         channel_multiplier=1)
    return g, params


@pytest.fixture(scope="module")
def trunc_latent(ref_gen64):
    """Deterministic truncation latent: mean W over a fixed z batch (the
    reference's `mean_latent(4096)` is the same computation over random z,
    `model.py:460-466`)."""
    g, params = ref_gen64
    torch.manual_seed(11)
    z = torch.randn(256, 512)
    with torch.no_grad():
        t = g.style(z).mean(0, keepdim=True)
    t_jax = mapping(params, jnp.asarray(z.numpy())).mean(axis=0, keepdims=True)
    np.testing.assert_allclose(np.asarray(t_jax), t.numpy(),
                               rtol=1e-4, atol=1e-5)
    return t, t_jax


@pytest.mark.slow
def test_generator_full_parity_z(ref_gen64):
    """z → mapping → W+ broadcast → synthesis, fixed noise buffers."""
    g, params = ref_gen64
    torch.manual_seed(21)
    z = torch.randn(2, 512)
    with torch.no_grad():
        want_img, want_lat = g([z], randomize_noise=False, return_latents=True)
    got_img, got_lat = generator_forward(params, [jnp.asarray(z.numpy())],
                                         return_latents=True)
    np.testing.assert_allclose(np.asarray(got_lat), want_lat.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_img), to_nhwc(want_img),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_generator_full_parity_truncation(ref_gen64, trunc_latent):
    """ψ=0.7 truncation toward an explicit mean latent (`model.py:494-500`;
    ψ=0.7 is the pipeline's constant, `run_inference.py:64`)."""
    g, params = ref_gen64
    t_torch, t_jax = trunc_latent
    torch.manual_seed(22)
    z = torch.randn(2, 512)
    with torch.no_grad():
        want_img, _ = g([z], truncation=0.7, truncation_latent=t_torch,
                        randomize_noise=False)
    got_img, _ = generator_forward(params, [jnp.asarray(z.numpy())],
                                   truncation=0.7, truncation_latent=t_jax)
    np.testing.assert_allclose(np.asarray(got_img), to_nhwc(want_img),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_generator_full_parity_wplus(ref_gen64):
    """W+ passthrough (`input_is_latent=True` with an (B, n_latent, 512)
    tensor, `model.py:502-517`) — the reenactment path's entry point."""
    g, params = ref_gen64
    torch.manual_seed(23)
    z = torch.randn(2, 512)
    with torch.no_grad():
        w = g.style(z)
    wplus = w[:, None, :].repeat(1, n_latent_for(64), 1).contiguous()
    # perturb rows so each W+ layer is distinct (as after a direction shift)
    wplus = wplus + 0.05 * torch.randn_like(wplus)
    with torch.no_grad():
        want_img, _ = g([wplus], input_is_latent=True, randomize_noise=False)
    got_img, _ = generator_forward(params, [jnp.asarray(wplus.numpy())],
                                   input_is_latent=True)
    np.testing.assert_allclose(np.asarray(got_img), to_nhwc(want_img),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_generator_full_parity_style_mixing(ref_gen64):
    """Two z's with an explicit inject_index (`model.py:502-517`)."""
    g, params = ref_gen64
    torch.manual_seed(24)
    z1, z2 = torch.randn(2, 512), torch.randn(2, 512)
    with torch.no_grad():
        want_img, want_lat = g([z1, z2], inject_index=3,
                               randomize_noise=False, return_latents=True)
    got_img, got_lat = generator_forward(
        params, [jnp.asarray(z1.numpy()), jnp.asarray(z2.numpy())],
        inject_index=3, return_latents=True)
    np.testing.assert_allclose(np.asarray(got_lat), want_lat.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_img), to_nhwc(want_img),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_generator_full_parity_256(ref_gen64):
    """Full VoxCeleb-256 config (cm=2, 14 W+ rows) — the shipped layout."""
    del ref_gen64  # only to keep module import order deterministic
    mod = load_generator_module()
    torch.manual_seed(31)
    g = mod.Generator(256, 512, 8, channel_multiplier=2).eval()
    params = convert_stylegan2_generator(g.state_dict(), size=256,
                                         channel_multiplier=2)
    z = torch.randn(1, 512)
    with torch.no_grad():
        want_img, _ = g([z], randomize_noise=False)
    got_img, _ = generator_forward(params, [jnp.asarray(z.numpy())])
    np.testing.assert_allclose(np.asarray(got_img), to_nhwc(want_img),
                               rtol=1e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# DECA ResNet-50 encoder (`libs/DECA/decalib/models/encoders.py:22-40`,
# `models/resnet.py`) — previously schema-contract only.
# ---------------------------------------------------------------------------

def _ref_resnet_encoder(outsize=236):
    install_reference_path()
    import sys
    import types
    # torchvision is only touched by load_ResNet50Model's pretrained-weight
    # download (`resnet.py:175`), which we patch out below; a bare stub
    # satisfies the module-level `import torchvision`.
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    from unittest import mock
    from libs.DECA.decalib.models import resnet as ref_resnet

    def _local_resnet50():
        # same constructor `load_ResNet50Model` uses (`resnet.py:173-175`)
        # minus the torchvision pretrained-weight download (no network here)
        return ref_resnet.ResNet(ref_resnet.Bottleneck, [3, 4, 6, 3])

    with mock.patch.object(ref_resnet, "load_ResNet50Model", _local_resnet50):
        from libs.DECA.decalib.models.encoders import ResnetEncoder
        return ResnetEncoder(outsize).eval()


@pytest.mark.slow
def test_deca_resnet_encoder_parity(rng):
    torch.manual_seed(41)
    mod = _ref_resnet_encoder(236)
    # randomize BN running stats so normalization is actually exercised
    sd = mod.state_dict()
    for k in sd:
        if "running_mean" in k:
            sd[k] = torch.randn_like(sd[k]) * 0.1
        if "running_var" in k:
            sd[k] = torch.rand_like(sd[k]) + 0.5
    mod.load_state_dict(sd)

    x = rng.randn(1, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        want = mod(nchw(x)).numpy()

    params = convert_resnet_encoder(mod.state_dict())
    got = np.asarray(resnet_encoder_forward(params, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 236)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3 * scale)
