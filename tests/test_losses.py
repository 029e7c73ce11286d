"""Loss-stack tests: LPIPS parity vs torchvision AlexNet pipeline, identity
loss behavior, shape/pixel losses vs direct math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn


def make_torch_alexnet_features():
    """torchvision alexnet.features layout (torchvision not installed)."""
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
    )

from stylegan_directions_face_reenactment_tpu.losses import (
    lpips, alex_features, init_lpips_alex, convert_lpips_alex, id_loss, csim,
    extract_id_feats, pixel_wise_loss, shape_loss, eye_loss, mouth_loss,
    l2_loss, pti_loss)
from stylegan_directions_face_reenactment_tpu.losses.pti import get_morphed_w_code
from stylegan_directions_face_reenactment_tpu.models.irse import backbone_forward
from stylegan_directions_face_reenactment_tpu.weights.torch_convert import (
    convert_irse_backbone)


def nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _torch_lpips(alex, lins, x, y):
    """Reference LPIPS computation built from torch primitives
    (`lpips/lpips.py:28-34` semantics)."""
    mean = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    std = torch.tensor([.458, .448, .450])[None, :, None, None]

    def feats(t):
        t = (t - mean) / std
        out = []
        for i, layer in enumerate(alex, 1):
            t = layer(t)
            if i in (2, 5, 8, 10, 12):
                nf = torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True) + 1e-9)
                out.append(t / (nf + 1e-10))
        return out

    fx, fy = feats(x), feats(y)
    res = [F.conv2d((a - b) ** 2, w).mean((2, 3), True)
           for a, b, w in zip(fx, fy, lins)]
    return (torch.sum(torch.cat(res, 0)) / x.shape[0]).item()


@pytest.fixture(scope="module")
def alex_pair(rng=np.random.RandomState(3)):
    torch.manual_seed(5)
    alex = make_torch_alexnet_features().eval()
    lins = [torch.rand(1, c, 1, 1) for c in (64, 192, 384, 256, 256)]
    alex_sd = {k: v for k, v in alex.state_dict().items()}
    lin_sd = {f"{i}.1.weight": w for i, w in enumerate(lins)}
    params = convert_lpips_alex(alex_sd, lin_sd)
    return alex, lins, params


def test_lpips_parity(alex_pair, rng):
    alex, lins, params = alex_pair
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = _torch_lpips(alex, lins, nchw(x), nchw(y))
    got = float(lpips(params, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_lpips_zero_for_identical(alex_pair, rng):
    _, _, params = alex_pair
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    assert abs(float(lpips(params, x, x))) < 1e-6


def test_lpips_grad(alex_pair, rng):
    _, _, params = alex_pair
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    g = jax.grad(lambda a: lpips(params, a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


@pytest.fixture(scope="module")
def id_backbone():
    from ref_loader import load_backbone_class
    Backbone = load_backbone_class()
    torch.manual_seed(7)
    mod = Backbone(input_size=112, num_layers=50, mode="ir_se",
                   drop_ratio=0.6, affine=False).eval()
    return convert_irse_backbone(mod.state_dict())


def test_id_loss_zero_same_image(id_backbone, rng):
    x = jnp.asarray(rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32))
    loss = float(id_loss(id_backbone, x, x))
    np.testing.assert_allclose(loss, 0.0, atol=1e-5)
    np.testing.assert_allclose(float(csim(id_backbone, x, x)), 1.0, atol=1e-5)


def test_id_loss_positive_different(id_backbone, rng):
    x = jnp.asarray(rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32))
    assert float(id_loss(id_backbone, x, y)) > 0


def test_id_feats_crop_region(id_backbone, rng):
    # changing pixels OUTSIDE the crop must not change the embedding
    x = rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32)
    x2 = x.copy()
    x2[:, :30, :, :] = 0.0   # rows < 35 are cropped away
    x2[:, 230:, :, :] = 0.0  # rows >= 223 cropped away
    f1 = np.asarray(extract_id_feats(id_backbone, jnp.asarray(x)))
    f2 = np.asarray(extract_id_feats(id_backbone, jnp.asarray(x2)))
    np.testing.assert_allclose(f1, f2, atol=1e-6)


def test_pixel_and_l2(rng):
    a = rng.randn(2, 8, 8, 3).astype(np.float32)
    b = rng.randn(2, 8, 8, 3).astype(np.float32)
    np.testing.assert_allclose(float(pixel_wise_loss(jnp.asarray(a), jnp.asarray(b))),
                               np.abs(a - b).mean(), rtol=1e-6)
    np.testing.assert_allclose(float(l2_loss(jnp.asarray(a), jnp.asarray(b))),
                               ((a - b) ** 2).mean(), rtol=1e-6)


def test_shape_loss(rng):
    a = rng.randn(2, 100, 3).astype(np.float32)
    b = rng.randn(2, 100, 3).astype(np.float32)
    np.testing.assert_allclose(float(shape_loss(jnp.asarray(a), jnp.asarray(b))),
                               np.abs(a - b).mean(), rtol=1e-6)
    np.testing.assert_allclose(
        float(shape_loss(jnp.asarray(a), jnp.asarray(b), normalize=True)),
        np.abs(a / 200 - b / 200).mean(), rtol=1e-5)


def test_eye_mouth_losses_match_reference_math(rng):
    gt = rng.randn(3, 68, 2).astype(np.float32)
    pr = rng.randn(3, 68, 2).astype(np.float32)
    eye_pairs = [(36, 39), (37, 41), (38, 40), (42, 45), (43, 47), (44, 46)]
    want = np.mean([np.abs(np.abs(gt[:, a] - gt[:, b])
                           - np.abs(pr[:, a] - pr[:, b])).mean()
                    for a, b in eye_pairs])
    np.testing.assert_allclose(float(eye_loss(jnp.asarray(gt), jnp.asarray(pr))),
                               want, rtol=1e-5)
    mouth_pairs = [(48, 54), (49, 59), (50, 58), (51, 57), (52, 56), (53, 55),
                   (60, 64), (61, 67), (62, 66), (63, 65)]
    want_m = np.mean([np.abs(np.abs(gt[:, a] - gt[:, b])
                             - np.abs(pr[:, a] - pr[:, b])).mean()
                      for a, b in mouth_pairs])
    np.testing.assert_allclose(float(mouth_loss(jnp.asarray(gt), jnp.asarray(pr))),
                               want_m, rtol=1e-5)


def test_shape_losses_live_reference_parity(rng):
    """All four `libs/criteria/losses.py::Losses` methods imported live
    (pure torch): pixel L1, vertex L1 (both normalize modes), eye and mouth
    pairwise-distance losses."""
    from ref_loader import install_reference_path
    install_reference_path()
    from libs.criteria.losses import Losses
    L = Losses()
    a = rng.randn(3, 16, 16, 3).astype(np.float32)
    b = rng.randn(3, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        want_px = float(L.calculate_pixel_wise_loss(torch.from_numpy(b),
                                                    torch.from_numpy(a)))
    np.testing.assert_allclose(
        float(pixel_wise_loss(jnp.asarray(a), jnp.asarray(b))), want_px,
        rtol=1e-6)

    v1 = rng.randn(2, 120, 3).astype(np.float32)
    v2 = rng.randn(2, 120, 3).astype(np.float32)
    lm1 = rng.randn(2, 68, 2).astype(np.float32)
    lm2 = rng.randn(2, 68, 2).astype(np.float32)
    with torch.no_grad():
        want_s = float(L.calculate_shape_loss(torch.from_numpy(v1),
                                              torch.from_numpy(v2)))
        want_sn = float(L.calculate_shape_loss(torch.from_numpy(v1),
                                               torch.from_numpy(v2),
                                               normalize=True))
        want_eye = float(L.calculate_eye_loss(torch.from_numpy(lm1),
                                              torch.from_numpy(lm2)))
        want_mouth = float(L.calculate_mouth_loss(torch.from_numpy(lm1),
                                                  torch.from_numpy(lm2)))
    np.testing.assert_allclose(
        float(shape_loss(jnp.asarray(v1), jnp.asarray(v2))), want_s,
        rtol=1e-5)
    np.testing.assert_allclose(
        float(shape_loss(jnp.asarray(v1), jnp.asarray(v2), normalize=True)),
        want_sn, rtol=1e-5)
    np.testing.assert_allclose(
        float(eye_loss(jnp.asarray(lm1), jnp.asarray(lm2))), want_eye,
        rtol=1e-5)
    np.testing.assert_allclose(
        float(mouth_loss(jnp.asarray(lm1), jnp.asarray(lm2))), want_mouth,
        rtol=1e-5)


def test_pti_loss(alex_pair, rng):
    _, _, params = alex_pair
    gen = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    real = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    total, l2v, lp = pti_loss(params, gen, real, pt_l2_lambda=100.0)
    np.testing.assert_allclose(float(total), 100 * float(l2v) + float(lp),
                               rtol=1e-5)


def test_morphed_w_code():
    fixed = jnp.zeros((1, 4))
    new = jnp.asarray([[3.0, 0.0, 4.0, 0.0]])  # norm 5
    out = np.asarray(get_morphed_w_code(new, fixed, alpha=10.0))
    np.testing.assert_allclose(out, [[6.0, 0.0, 8.0, 0.0]], rtol=1e-6)
