"""Live parity: converted torch weights must reproduce reference outputs.

Builds the reference e4e / ArcFace modules (torch CPU, random init), runs
them, converts the state_dict with `weights/torch_convert.py`, and checks
our functional forward matches. This validates the converter AND the
forward passes in one shot — exactly what happens with real checkpoints.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from stylegan_directions_face_reenactment_tpu.models.e4e import (
    e4e_forward, init_e4e_encoder)
from stylegan_directions_face_reenactment_tpu.models.irse import (
    backbone_forward, bottleneck_ir, se_module)
from stylegan_directions_face_reenactment_tpu.weights.torch_convert import (
    convert_e4e_encoder, convert_irse_backbone, _irse_block, conv_w)

from ref_loader import load_e4e_class, load_helpers, load_backbone_class


def nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


@pytest.fixture(scope="module")
def helpers():
    return load_helpers()


def test_se_module_parity(rng, helpers):
    torch.manual_seed(0)
    mod = helpers.SEModule(32, 16).eval()
    x = rng.randn(2, 8, 8, 32).astype(np.float32)
    with torch.no_grad():
        want = mod(nchw(x)).numpy().transpose(0, 2, 3, 1)
    sd = mod.state_dict()
    p = {"fc1": conv_w(sd["fc1.weight"]), "fc2": conv_w(sd["fc2.weight"])}
    got = np.asarray(se_module(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_c,depth,stride", [(64, 64, 1), (64, 128, 2),
                                               (128, 128, 2)])
def test_bottleneck_ir_se_parity(rng, helpers, in_c, depth, stride):
    torch.manual_seed(1)
    mod = helpers.bottleneck_IR_SE(in_c, depth, stride).eval()
    # randomize BN stats so the test is not trivially scale-1/mean-0
    sdt = mod.state_dict()
    for k in sdt:
        if "running_mean" in k:
            sdt[k] = torch.randn_like(sdt[k]) * 0.1
        if "running_var" in k:
            sdt[k] = torch.rand_like(sdt[k]) + 0.5
    mod.load_state_dict(sdt)

    x = rng.randn(2, 16, 16, in_c).astype(np.float32)
    with torch.no_grad():
        want = mod(nchw(x)).numpy().transpose(0, 2, 3, 1)

    sd = {f"body.0.{k}": v for k, v in mod.state_dict().items()}
    p = _irse_block(sd, "body.0")
    p["_meta"] = {"stride": stride, "identity_shortcut": in_c == depth}
    got = np.asarray(bottleneck_ir(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_e4e_full_parity(rng):
    E4E = load_e4e_class()
    torch.manual_seed(2)
    mod = E4E(50, "ir_se", 256).eval()
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    # 64x64 input keeps CPU time sane; taps/pyramid spatial dims scale with
    # input so the graph structure is identical to 256 (styles built for 256).
    with torch.no_grad():
        want = mod(nchw(x)).numpy()

    params = convert_e4e_encoder(mod.state_dict(), image_resolution=256)
    got = np.asarray(e4e_forward(params, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 14, 512)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_arcface_backbone_parity(rng):
    Backbone = load_backbone_class()
    torch.manual_seed(3)
    mod = Backbone(input_size=112, num_layers=50, mode="ir_se",
                   drop_ratio=0.6, affine=False).eval()
    x = rng.randn(1, 112, 112, 3).astype(np.float32)
    with torch.no_grad():
        # .contiguous() works around the reference Flatten's .view on a
        # channels-strided tensor (torch CPU quirk, not a semantic change)
        want = mod(nchw(x).contiguous()).numpy()

    params = convert_irse_backbone(mod.state_dict(), input_size=112,
                                   affine=False)
    got = np.asarray(backbone_forward(params, jnp.asarray(x)))
    assert got.shape == (1, 512)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_e4e_random_init_shapes():
    import jax
    p = init_e4e_encoder(jax.random.PRNGKey(0), image_resolution=256)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = e4e_forward(p, x)
    assert out.shape == (1, 14, 512)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_e4e_full_parity_256_input(rng):
    """Full parity at the e4e's REAL input resolution (256² — the pyramid
    taps hit their production spatial dims; the 64² variant above only
    matches graph structure)."""
    E4E = load_e4e_class()
    torch.manual_seed(4)
    mod = E4E(50, "ir_se", 256).eval()
    x = rng.randn(1, 256, 256, 3).astype(np.float32)
    with torch.no_grad():
        want = mod(nchw(x)).numpy()
    params = convert_e4e_encoder(mod.state_dict(), image_resolution=256)
    got = np.asarray(e4e_forward(params, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 14, 512)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
