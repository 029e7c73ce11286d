"""3D landmark path + trainer evaluation + visualization tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.models.face.fan import (
    draw_gaussians, init_resnet_depth, resnet_depth_forward)
from stylegan_directions_face_reenactment_tpu.utils.image_utils import (
    torch_range_1_to_255, tensor_to_image, generate_grid_image, add_border,
    save_image)
from stylegan_directions_face_reenactment_tpu.utils.visualization import (
    make_interpolation_chart, save_gif)
from stylegan_directions_face_reenactment_tpu.utils.common import one_hot


def test_draw_gaussians_peak():
    pts = jnp.asarray([[[30.0, 40.0], [-1.0, 5.0]]])  # second invalid (x<=0)
    hm = np.asarray(draw_gaussians(pts, size=64, sigma=2.0))
    assert hm.shape == (1, 64, 64, 2)
    # peak at (row=40-1, col=30-1) in 0-based pixel grid (1-based convention)
    peak = np.unravel_index(hm[0, :, :, 0].argmax(), (64, 64))
    assert peak == (39, 29)
    np.testing.assert_allclose(hm[0, 39, 29, 0], 1.0, rtol=1e-5)
    assert hm[0, :, :, 1].max() == 0.0  # invalid landmark blanked


def test_resnet_depth_shapes():
    p = init_resnet_depth(jax.random.PRNGKey(0), layers=(1, 1, 1, 1))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 224, 224, 71))
    out = resnet_depth_forward(p, x)
    assert out.shape == (1, 68)


def test_image_range_utils(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
    y = np.asarray(torch_range_1_to_255(x))
    assert y.min() >= 0 and y.max() <= 255
    img = tensor_to_image(x[0])
    assert img.dtype == np.uint8 and img.shape == (8, 8, 3)
    b = add_border(img.copy())
    assert (b[0] == (255, 0, 0)).all()


def test_grid_and_gif(tmp_path, rng):
    s = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    grid = generate_grid_image(s, s, s)
    assert grid.shape == (32, 48, 3)
    save_gif([grid, grid], str(tmp_path / "x.gif"), fps=5)
    assert (tmp_path / "x.gif").exists()
    save_image(s[0], str(tmp_path / "im.png"))
    assert (tmp_path / "im.png").exists()


def test_one_hot():
    v = np.asarray(one_hot(15, 2.5, 7))
    assert v.shape == (1, 15) and v[0, 7] == 2.5 and np.abs(v).sum() == 2.5


def test_interpolation_chart(rng):
    from stylegan_directions_face_reenactment_tpu.models import (
        init_generator, init_direction_matrix, n_latent_for)
    g = init_generator(jax.random.PRNGKey(0), size=32)
    a = init_direction_matrix(jax.random.PRNGKey(1), 512, 15, w_plus=True,
                              num_layers=8)
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, n_latent_for(32), 512))
    frames = make_interpolation_chart(g, a, lat, directions=[0, 3], steps=1)
    assert len(frames) == 3
    assert frames[0].shape == (32, 64, 3)  # 2 directions side by side
