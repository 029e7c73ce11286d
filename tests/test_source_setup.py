"""Shared CLI source-setup helper (`pipeline/source_setup.py`).

Covers the decoupled crop-vs-synthesis sizing the ffhq-1024 config relies
on: the FFHQ crop is ALWAYS 256 (`ffhq_cropping.py:50`) while the
generator synthesizes at its own size — exercised here cheaply with a
64-px generator against 256 crops (the same shape-decoupling as 1024 vs
256, in the direction that also hits optimize_g's resize branch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.geometry import (
    initialize_directions)
from stylegan_directions_face_reenactment_tpu.losses import init_lpips_alex
from stylegan_directions_face_reenactment_tpu.models import (
    init_direction_matrix, init_generator, mean_latent, n_latent_for)
from stylegan_directions_face_reenactment_tpu.models.deca import (
    init_deca, synthetic_flame_params)
from stylegan_directions_face_reenactment_tpu.models.e4e import (
    init_e4e_encoder)
from stylegan_directions_face_reenactment_tpu.pipeline import (
    make_prep_fn, make_reenact_fn, setup_source, CROP_SIZE)
from stylegan_directions_face_reenactment_tpu.utils.image_utils import (
    generate_grid_image)

SIZE = 64


def test_prep_fn_skip_preprocess_always_256():
    prep = make_prep_fn(None, None, skip_preprocess=True)
    frames = [np.random.RandomState(i).randint(0, 255, (100, 80, 3))
              .astype(np.uint8) for i in range(2)]
    batch, ok = prep(frames)
    assert batch.shape == (2, CROP_SIZE, CROP_SIZE, 3)
    assert ok.all()
    assert batch.min() >= -1.0 and batch.max() <= 1.0


def test_grid_image_mixed_sizes():
    """The reference grid hard-codes 256 cells and crashes on mixed sizes;
    ours resizes every cell to the target's size."""
    rng = np.random.RandomState(0)
    src = rng.rand(2, 256, 256, 3) * 2 - 1
    tgt = rng.rand(2, 256, 256, 3) * 2 - 1
    ren = rng.rand(2, 64, 64, 3) * 2 - 1
    grid = generate_grid_image(src, tgt, ren)
    assert grid.shape == (2 * 256, 3 * 256, 3)
    assert grid.dtype == np.uint8


@pytest.mark.slow
def test_setup_source_and_reenact_decoupled_sizes():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    g = init_generator(ks[0], size=SIZE)
    e4e = init_e4e_encoder(ks[1], image_resolution=SIZE)
    deca = init_deca(ks[2], synthetic_flame_params(ks[3], n_verts=128,
                                                   n_faces=200),
                     with_detail=False)
    lp = init_lpips_alex(ks[4])
    a = init_direction_matrix(ks[5], 512, 15, w_plus=True, num_layers=8)
    trunc = mean_latent(g, ks[6], n_latent=32)
    spec = initialize_directions("voxceleb", 15, 6.0)

    prep = make_prep_fn(None, None, skip_preprocess=True)
    frame = (np.random.RandomState(1).rand(300, 300, 3) * 255).astype(
        np.uint8)
    # optimize_generator exercises optimize_g with generated (64) vs pivot
    # (256) shapes — the resize branch production >=256 generators skip
    source_img, source_code, g_src, p_src, ang_src = setup_source(
        g, e4e, deca, [frame], prep, truncation_latent=trunc,
        optimize_generator=True, lpips_params=lp, opt_steps=2)
    assert source_img.shape == (1, CROP_SIZE, CROP_SIZE, 3)
    assert source_code.shape == (1, n_latent_for(SIZE), 512)
    assert np.isfinite(np.asarray(p_src["pose"])).all()

    fn = make_reenact_fn(g_src, a, deca, spec, truncation_latent=trunc,
                         return_target_params=True)
    tgts = jax.random.uniform(ks[7], (2, CROP_SIZE, CROP_SIZE, 3),
                              minval=-1.0, maxval=1.0)
    reenacted, latents, p_t, a_t = fn(source_code, p_src, ang_src, tgts)
    assert reenacted.shape == (2, SIZE, SIZE, 3)
    assert latents.shape == (2, n_latent_for(SIZE), 512)
    assert set(p_t) == {"pose", "alpha_shp", "alpha_exp", "cam"}
    assert a_t.shape == (2, 3)
    assert np.isfinite(np.asarray(reenacted)).all()

    grid = generate_grid_image(np.asarray(source_img),
                               np.asarray(tgts[:1]),
                               np.asarray(reenacted[:1]))
    assert grid.shape == (CROP_SIZE, 3 * CROP_SIZE, 3)
