"""Fused raw-frames → reenactment program (`reenact_raw_batch`).

The fused program (SFD detect → FAN landmarks → device FFHQ crop → DECA →
Δp → A → synthesis, ONE jitted dispatch) must equal the two-stage path
(`preprocess_batch_device` then `make_reenact_fn`) bit-for-bit — it is the
same compute, fused to remove the host sync between the programs
(reference loop: `run_inference.py:170-195` + `utils_inference.py:61-82`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.geometry import (
    initialize_directions)
from stylegan_directions_face_reenactment_tpu.models import (
    init_direction_matrix, init_generator, mean_latent, n_latent_for)
from stylegan_directions_face_reenactment_tpu.models.deca import (
    init_deca, synthetic_flame_params)
from stylegan_directions_face_reenactment_tpu.models.face import (
    init_fan, init_s3fd)
from stylegan_directions_face_reenactment_tpu.pipeline import (
    make_fused_reenact_fn, make_reenact_fn)
from stylegan_directions_face_reenactment_tpu.pipeline.preprocess import (
    preprocess_batch_device)

SIZE = 64
T = 3


@pytest.fixture(scope="module")
def zoo():
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    g = init_generator(ks[0], size=SIZE)
    deca = init_deca(ks[1], synthetic_flame_params(ks[2], n_verts=128,
                                                   n_faces=200),
                     with_detail=False)
    a = init_direction_matrix(ks[3], 512, 15, w_plus=True, num_layers=8)
    trunc = mean_latent(g, ks[4], n_latent=32)
    sfd = init_s3fd(ks[5])
    fan = init_fan(ks[6])
    spec = initialize_directions("voxceleb", 15, 6.0)
    return g, a, deca, trunc, sfd, fan, spec


@pytest.fixture(scope="module")
def source():
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    code = jax.random.normal(ks[0], (1, n_latent_for(SIZE), 512))
    params = {"pose": jnp.zeros((1, 6)), "alpha_shp": jnp.zeros((1, 100)),
              "alpha_exp": jnp.zeros((1, 50)), "cam": jnp.zeros((1, 3))}
    return code, params, jnp.zeros((1, 3))


@pytest.fixture(scope="module")
def frames():
    return np.random.RandomState(7).randint(
        0, 256, (T, 256, 256, 3)).astype(np.uint8)


def test_fused_matches_two_stage(zoo, source, frames):
    g, a, deca, trunc, sfd, fan, spec = zoo
    code, params, angles = source

    fused = make_fused_reenact_fn(g, a, deca, spec, sfd, fan,
                                  truncation_latent=trunc)
    reen_f, lat_f, crops_u8, ok_f, inf_f, pts_f = fused(
        code, params, angles, jnp.asarray(frames))

    crops_gan, ok_w, inf_w, pts_w = jax.jit(
        lambda f: preprocess_batch_device(sfd, fan, f))(
            jnp.asarray(frames, jnp.float32))
    live = make_reenact_fn(g, a, deca, spec, truncation_latent=trunc)
    reen_w, lat_w = live(code, params, angles, crops_gan)

    np.testing.assert_array_equal(np.asarray(ok_f), np.asarray(ok_w))
    np.testing.assert_array_equal(np.asarray(inf_f), np.asarray(inf_w))
    np.testing.assert_allclose(np.asarray(pts_f), np.asarray(pts_w),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(reen_f), np.asarray(reen_w),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(lat_f), np.asarray(lat_w),
                               atol=2e-5)
    # the u8 crops are the exact integer-valued device crops
    want_u8 = np.round(
        (np.asarray(crops_gan) + 1.0) * 127.5).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(crops_u8), want_u8)


def test_fused_reuse_landmarks_matches_two_stage(zoo, source, frames):
    """reuse_landmarks mode: the detection landmarks, mapped into crop
    coordinates, feed the DECA kpt68 bbox — same as the unfused
    single-detection path."""
    from stylegan_directions_face_reenactment_tpu.models.face.cropping import (
        landmarks_in_crop)
    g, a, deca, trunc, sfd, fan, spec = zoo
    code, params, angles = source

    fused = make_fused_reenact_fn(g, a, deca, spec, sfd, fan,
                                  truncation_latent=trunc,
                                  reuse_landmarks=True)
    reen_f, lat_f, _, ok_f, _, pts_f = fused(code, params, angles,
                                             jnp.asarray(frames))

    crops_gan, ok_w, _, pts_w = jax.jit(
        lambda f: preprocess_batch_device(sfd, fan, f))(
            jnp.asarray(frames, jnp.float32))
    lms_crop, _ = landmarks_in_crop(pts_w)
    live = make_reenact_fn(g, a, deca, spec, truncation_latent=trunc,
                           reuse_landmarks=True)
    reen_w, _ = live(code, params, angles, crops_gan, lms_crop, ok_w)
    np.testing.assert_allclose(np.asarray(reen_f), np.asarray(reen_w),
                               atol=2e-5)


def test_run_targets_fused_loop_mechanics(tmp_path):
    """The CLI fused target loop (`cli/run_inference.py::_run_targets_fused`)
    with a stub program: chunk padding, 3-deep prefetch ordering, the
    out-of-frame host-fallback routing, and artifact emission — without
    compiling any model. Device-grid mode: the program returns the
    [crop|reenacted] row; the loop prepends the constant source cell."""
    import argparse

    from stylegan_directions_face_reenactment_tpu.cli.run_inference import (
        _run_targets_fused)

    n_frames, bi, s = 7, 3, 32
    rng = np.random.RandomState(0)
    resized = [rng.randint(0, 256, (s, s, 3)).astype(np.uint8)
               for _ in range(n_frames)]
    args = argparse.Namespace(
        frame_batch=bi, save_images=True, save_grid=True, save_video=True,
        output_path=str(tmp_path))
    source_img = rng.rand(1, s, s, 3).astype(np.float32) * 2 - 1

    calls = []

    def stub_fused(code, ps, ang, dev):
        dev = np.asarray(dev)
        calls.append(dev.shape)
        assert dev.shape == (bi, s, s, 3)   # always padded to frame_batch
        b = dev.shape[0]
        reen = np.full((b, s, s, 3), 100, np.uint8)
        crops = dev
        grid = np.concatenate([crops, reen], axis=2)   # (b, s, 2s, 3)
        ok = np.ones(b, bool)
        in_frame = np.ones(b, bool)
        in_frame[0] = False                 # frame 0 of each chunk → fallback
        pts = np.zeros((b, 68, 2), np.float32)
        return grid, ok, in_frame, pts

    fb_calls = []

    def make_fallback():
        def fb(frames_list, lms):
            fb_calls.append(len(frames_list))
            crops = np.stack([f[:s, :s] for f in frames_list])
            reen = np.full((len(frames_list), s, s, 3), 200, np.uint8)
            return crops, reen, np.ones(len(frames_list), bool)
        return fb

    frames_out = _run_targets_fused(args, resized, stub_fused, source_img,
                                    None, None, None, make_fallback,
                                    outputs_mode="grid")
    assert len(calls) == 3                  # ceil(7/3) chunks
    assert fb_calls == [1, 1, 1]            # one fallback frame per chunk
    assert len(frames_out) == n_frames
    assert frames_out[0].shape == (s, 3 * s, 3)   # [source|crop|reenacted]
    import glob as _glob
    pngs = sorted(_glob.glob(str(tmp_path / ("[0-9]" * 6 + ".png"))))
    assert len(pngs) == n_frames
    # fallback output (200) replaced the fused output (100) on frame 0
    from PIL import Image
    assert np.asarray(Image.open(pngs[0]))[0, 0, 0] == 200
    assert np.asarray(Image.open(pngs[1]))[0, 0, 0] == 100
    gpngs = sorted(_glob.glob(str(tmp_path / "grids" / "*.png")))
    assert len(gpngs) == n_frames
    # the video-grid frame embeds the reenacted cell in its third column
    # (patched to 200 on the fallback frame) and the crop in its second
    assert frames_out[0][0, 2 * s, 0] == 200
    assert frames_out[1][0, 2 * s, 0] == 100
    np.testing.assert_array_equal(frames_out[1][:, s:2 * s], resized[1])


def test_run_targets_fused_reenact_mode(tmp_path):
    """outputs_mode='reenact': the loop consumes the reduced output set
    (no crops cross the link) and the video frames are the reenacted
    images themselves."""
    import argparse

    from stylegan_directions_face_reenactment_tpu.cli.run_inference import (
        _run_targets_fused)

    n_frames, bi, s = 5, 2, 32
    rng = np.random.RandomState(1)
    resized = [rng.randint(0, 256, (s, s, 3)).astype(np.uint8)
               for _ in range(n_frames)]
    args = argparse.Namespace(
        frame_batch=bi, save_images=False, save_grid=False, save_video=True,
        output_path=str(tmp_path))
    source_img = rng.rand(1, s, s, 3).astype(np.float32) * 2 - 1

    def stub_fused(code, ps, ang, dev):
        b = np.asarray(dev).shape[0]
        reen = np.full((b, s, s, 3), 77, np.uint8)
        return (reen, np.ones(b, bool), np.ones(b, bool),
                np.zeros((b, 68, 2), np.float32))

    frames_out = _run_targets_fused(args, resized, stub_fused, source_img,
                                    None, None, None,
                                    lambda: (lambda fr, lm: None),
                                    outputs_mode="reenact")
    assert len(frames_out) == n_frames
    assert frames_out[0].shape == (s, s, 3)
    assert (frames_out[0] == 77).all()


def test_fused_output_u8(zoo, source, frames):
    """output_u8 returns the same images quantized exactly as saving
    to disk would (round-half-up after [0,255] mapping)."""
    g, a, deca, trunc, sfd, fan, spec = zoo
    code, params, angles = source
    fused = make_fused_reenact_fn(g, a, deca, spec, sfd, fan,
                                  truncation_latent=trunc)
    fused_u8 = make_fused_reenact_fn(g, a, deca, spec, sfd, fan,
                                     truncation_latent=trunc,
                                     output_u8=True)
    reen_f, *_ = fused(code, params, angles, jnp.asarray(frames))
    reen_u8, *_ = fused_u8(code, params, angles, jnp.asarray(frames))
    assert reen_u8.dtype == jnp.uint8
    want = np.floor(np.clip((np.asarray(reen_f) + 1.0) * 127.5,
                            0, 255) + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(reen_u8), want)


def test_fused_reduced_outputs(zoo, source, frames):
    """outputs='grid'/'reenact' (the CLI's reduced-payload modes) carry
    exactly the full mode's u8 images: grid = [crop|reenacted] on axis 2,
    reenact = the reenacted frames alone. crop_size is set to the test
    generator's size so the equal-size concat path (the production case:
    both cells 256) is what's exercised."""
    g, a, deca, trunc, sfd, fan, spec = zoo
    code, params, angles = source
    kw = dict(truncation_latent=trunc, crop_size=SIZE)
    full = make_fused_reenact_fn(g, a, deca, spec, sfd, fan, output_u8=True,
                                 **kw)
    reen_u8, _lat, crops_u8, ok, inf, pts = full(code, params, angles,
                                                 jnp.asarray(frames))

    grid_fn = make_fused_reenact_fn(g, a, deca, spec, sfd, fan,
                                    outputs="grid", **kw)
    grid, ok_g, inf_g, pts_g = grid_fn(code, params, angles,
                                       jnp.asarray(frames))
    assert grid.dtype == jnp.uint8
    want = np.concatenate([np.asarray(crops_u8), np.asarray(reen_u8)],
                          axis=2)
    np.testing.assert_array_equal(np.asarray(grid), want)
    np.testing.assert_array_equal(np.asarray(ok_g), np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(inf_g), np.asarray(inf))

    reen_fn = make_fused_reenact_fn(g, a, deca, spec, sfd, fan,
                                    outputs="reenact", **kw)
    r, ok_r, inf_r, pts_r = reen_fn(code, params, angles,
                                    jnp.asarray(frames))
    np.testing.assert_array_equal(np.asarray(r), np.asarray(reen_u8))
    np.testing.assert_allclose(np.asarray(pts_r), np.asarray(pts),
                               atol=1e-5)
