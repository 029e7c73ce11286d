"""FFHQ / high-resolution path: the second shipped dataset config.

Covers (a) the ffhq DirectionsSpec layout (roll_direction=-1 branch,
`geometry/directions.py` vs `libs/configs/config_directions.py:17-28` +
`libs/utilities/utils_train.py:127-174` slot conventions) and (b) a
structural run of the full generator+e4e+reenact stack at size 512
(18-row-wplus-family channel table; 64/256 cover everything else)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.geometry.directions import (
    initialize_directions, make_shift_vector, make_shift_vector_50,
    start_positions)


@pytest.fixture(scope="module")
def ffhq_spec():
    return initialize_directions("ffhq", learned_directions=15,
                                 shift_scale=6.0)


def _fake_params(rng, b):
    return {
        "pose": jnp.asarray(rng.uniform(-0.2, 0.2, (b, 6)).astype(np.float32)),
        "alpha_exp": jnp.asarray(rng.uniform(-1, 1, (b, 50)).astype(np.float32)),
        "alpha_shp": jnp.asarray(rng.uniform(-1, 1, (b, 100)).astype(np.float32)),
        "cam": jnp.asarray(np.tile([8.0, 0.0, 0.0], (b, 1)).astype(np.float32)),
    }


def test_ffhq_shift_vector_layout(rng, ffhq_spec):
    """FFHQ Δp slots: 0 yaw, 1 pitch, 2 jaw (= count_pose−1,
    `utils_train.py:157`), 3..14 the 12 expressions; roll never enters."""
    s = ffhq_spec
    b = 4
    ps, pt = _fake_params(rng, b), _fake_params(rng, b)
    ang_s = jnp.asarray(rng.uniform(-30, 30, (b, 3)).astype(np.float32))
    ang_t = jnp.asarray(rng.uniform(-30, 30, (b, 3)).astype(np.float32))

    shift = make_shift_vector(s, ps, pt, ang_s, ang_t)
    assert shift.shape == (b, 15)

    np.testing.assert_allclose(
        np.asarray(shift[:, 0]),
        np.asarray((ang_t[:, 0] - ang_s[:, 0]) * 6.0 / 40.0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(shift[:, 1]),
        np.asarray((ang_t[:, 1] - ang_s[:, 1]) * 6.0 / 20.0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(shift[:, 2]),
        np.asarray(s.a_jaw * (pt["pose"][:, 3] - ps["pose"][:, 3])),
        rtol=1e-4, atol=1e-5)
    for i in range(s.num_expressions):
        np.testing.assert_allclose(
            np.asarray(shift[:, 3 + i]),
            np.asarray(s.exp_a[i] * (pt["alpha_exp"][:, i]
                                     - ps["alpha_exp"][:, i])),
            rtol=1e-4, atol=1e-5)

    # roll is unlearned: changing roll angles must not move any slot
    ang_t2 = ang_t.at[:, 2].add(15.0)
    shift2 = make_shift_vector(s, ps, pt, ang_s, ang_t2)
    np.testing.assert_array_equal(np.asarray(shift), np.asarray(shift2))


def test_ffhq_start_positions_no_roll_slot(rng, ffhq_spec):
    """start_positions writes yaw/pitch/jaw/exps only — slot 2 holds jaw,
    not roll."""
    s = ffhq_spec
    ps = _fake_params(rng, 2)
    ang = jnp.asarray(rng.uniform(-30, 30, (2, 3)).astype(np.float32))
    start = start_positions(s, ps, ang)
    np.testing.assert_allclose(
        np.asarray(start[:, 2]),
        np.asarray(s.a_jaw * ps["pose"][:, 3] + s.b_jaw), rtol=1e-4)


def test_ffhq_shift_vector_50(rng, ffhq_spec):
    """Disentanglement-50 batching works with the 3-pose ffhq layout."""
    s = ffhq_spec
    b = 4
    ps, pt = _fake_params(rng, b), _fake_params(rng, b)
    ang_s = jnp.asarray(rng.uniform(-30, 30, (b, 3)).astype(np.float32))
    ang_t = jnp.asarray(rng.uniform(-30, 30, (b, 3)).astype(np.float32))
    shift, idx = make_shift_vector_50(s, ps, pt, ang_s, ang_t,
                                      jax.random.PRNGKey(0))
    assert shift.shape == (b, 15) and idx.shape == (b // 2,)
    # second half: exactly one nonzero slot per sample, within ±6 of start
    second = np.asarray(shift[b // 2:])
    assert ((np.abs(second) > 0).sum(axis=1) <= 1).all()


@pytest.mark.slow
def test_generator_e4e_reenact_512_structural():
    """Full stack at 512: 16-row W+, channel table rows past 256, e4e with
    16 style blocks, reenactment with the ffhq spec. Structure/finiteness
    gate (random init)."""
    from stylegan_directions_face_reenactment_tpu.models import (
        init_direction_matrix, init_e4e_encoder, init_generator,
        generator_forward, n_latent_for)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.e4e import e4e_forward
    from stylegan_directions_face_reenactment_tpu.pipeline.reenactment import (
        reenact_batch, source_shape)

    size = 512
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    g = init_generator(ks[0], size=size)
    assert n_latent_for(size) == 16
    e4e = init_e4e_encoder(ks[1], image_resolution=size)
    deca = init_deca(ks[2], synthetic_flame_params(ks[3], n_verts=128,
                                                   n_faces=200),
                     with_detail=False)
    a = init_direction_matrix(ks[4], 512, 15, w_plus=True, num_layers=8)
    spec = initialize_directions("ffhq", learned_directions=15)

    z = jax.random.normal(ks[5], (1, 512))
    img, lat = generator_forward(g, [z], return_latents=True)
    assert img.shape == (1, size, size, 3)
    assert lat.shape == (1, 16, 512)
    assert np.isfinite(np.asarray(img)).all()

    # e4e consumes the 256-sized view (reference transforms resize to 256
    # even for the 1024 generator); 16 style blocks at resolution 512
    from stylegan_directions_face_reenactment_tpu.models.nn import (
        resize_bilinear)
    img256 = resize_bilinear(img, (256, 256))
    codes = e4e_forward(e4e, img256)
    assert codes.shape == (1, 16, 512)

    params_src, angles_src = source_shape(deca, img256)
    reenacted, shifted = reenact_batch(
        g, a, deca, spec, codes, params_src, angles_src,
        jnp.asarray(np.asarray(img256)),
        truncation=1.0, num_layers_shift=8)
    # generate_image pools every synthesis to 256 like the reference
    # (`libs/utilities/generic.py:148-151` AdaptiveAvgPool2d(256))
    assert reenacted.shape == (1, 256, 256, 3)
    assert shifted.shape == (1, 16, 512)
    assert np.isfinite(np.asarray(reenacted)).all()


@pytest.mark.slow
def test_generator_1024_structural():
    """FFHQ's shipped resolution: 1024² synthesis with the full channel
    table (rows 512/1024) and 18 W+ rows; direction shift on the first 8."""
    from stylegan_directions_face_reenactment_tpu.models import (
        init_direction_matrix, init_generator, n_latent_for)
    from stylegan_directions_face_reenactment_tpu.models.direction_matrix import (
        direction_matrix_forward)
    from stylegan_directions_face_reenactment_tpu.pipeline.synthesis import (
        generate_image)

    size = 1024
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    g = init_generator(ks[0], size=size)
    assert n_latent_for(size) == 18
    a = init_direction_matrix(ks[1], 512, 15, w_plus=True, num_layers=8)

    codes = jax.random.normal(ks[2], (1, 18, 512)) * 0.1
    shift = direction_matrix_forward(a, jnp.ones((1, 15)))
    assert shift.shape == (1, 8, 512)
    # generate_image pools to 256 like the reference (`generic.py:148-151`)
    img = generate_image(g, codes, input_is_latent=True, shift_code=shift,
                         num_layers_shift=8, w_plus=True)
    assert img.shape == (1, 256, 256, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_effective_frame_batch_guards_1024_pathology():
    """No user can hit the measured 26.9 fps batch-4 tiling hole at 1024
    (PERF.md FFHQ-1024 table): batches 3-7 round up to 8; 256 and the
    healthy 1024 batches pass through unchanged."""
    from stylegan_directions_face_reenactment_tpu.cli.run_inference import (
        effective_frame_batch)

    for fb in (3, 4, 5, 6, 7):
        assert effective_frame_batch(fb, 1024) == 8
    for fb in (1, 2, 8, 16):
        assert effective_frame_batch(fb, 1024) == fb
    for fb in (1, 4, 16):
        assert effective_frame_batch(fb, 256) == fb
    # with a mesh the override keeps divisibility: next multiple of
    # n_devices >= 8 (a user's valid --frame_batch 6 --n_devices 3 must
    # not be rewritten to something 3 no longer divides)
    assert effective_frame_batch(6, 1024, n_devices=3) == 9
    assert effective_frame_batch(4, 1024, n_devices=4) == 8
    assert effective_frame_batch(6, 1024, n_devices=2) == 8
    assert effective_frame_batch(16, 1024, n_devices=4) == 16
