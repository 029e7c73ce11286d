"""DECA face-alignment path: FAN-bbox → similarity warp to 224
(reference `libs/DECA/decalib/datasets/datasets.py:44-86`) and its wiring
into the training / eval / inference hot paths (VERDICT round-1 item 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.configs.arguments import (
    TrainingArguments)
from stylegan_directions_face_reenactment_tpu.pipeline.alignment import (
    DECA_CROP, DECA_SCALE, kpt68_center_size, make_fan_align, warp_to_224)


def test_kpt68_center_size_matches_reference_rule():
    """bbox2point(type='kpt68') (`datasets.py:47-49`): old_size =
    (w + h) / 2 * 1.1, center = bbox center."""
    rng = np.random.RandomState(0)
    lms = rng.rand(3, 68, 2).astype(np.float32) * 200 + 10
    center, old_size = kpt68_center_size(jnp.asarray(lms))
    mins, maxs = lms.min(axis=1), lms.max(axis=1)
    w = maxs[:, 0] - mins[:, 0]
    h = maxs[:, 1] - mins[:, 1]
    np.testing.assert_allclose(np.asarray(old_size), (w + h) / 2 * 1.1,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(center),
                               np.stack([maxs[:, 0] - w / 2,
                                         maxs[:, 1] - h / 2], -1), rtol=1e-5)


def test_warp_to_224_full_frame_equals_resize():
    """When the (center, 1.25·old_size) square is exactly the full frame,
    the similarity warp degenerates to a plain corner-aligned resize."""
    from stylegan_directions_face_reenactment_tpu.models.nn import (
        _bilinear_gather)
    h = w = 64
    rng = np.random.RandomState(1)
    img = rng.rand(1, h, w, 3).astype(np.float32)
    center = jnp.asarray([[w / 2.0, h / 2.0]])
    old_size = jnp.asarray([w / DECA_SCALE])
    out = warp_to_224(jnp.asarray(img), center, old_size)
    assert out.shape == (1, DECA_CROP, DECA_CROP, 3)
    # golden: sample the source at the same grid the warp induces
    s = (DECA_CROP - 1.0) / w
    ys, xs = np.meshgrid(np.arange(DECA_CROP), np.arange(DECA_CROP),
                         indexing="ij")
    want = _bilinear_gather(jnp.asarray(img[0]), jnp.asarray(xs / s),
                            jnp.asarray(ys / s), pad_zero=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want),
                               atol=1e-5)


def test_make_align_fn_selection():
    """`train.steps.make_align_fn`: 'fan' + a FAN model → aligner; 'resize'
    or no FAN model → None (bilinear fallback)."""
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        FrozenModels, make_align_fn)
    models_nofan = FrozenModels({}, {}, {}, {}, jnp.zeros((1, 512)))
    assert models_nofan.fan is None
    assert make_align_fn(models_nofan, TrainingArguments()) is None

    models_fan = FrozenModels({}, {}, {}, {}, jnp.zeros((1, 512)),
                              fan={"dummy": jnp.zeros(())})
    args_fan = TrainingArguments(deca_alignment="fan")
    args_resize = TrainingArguments(deca_alignment="resize")
    assert callable(make_align_fn(models_fan, args_fan))
    assert make_align_fn(models_fan, args_resize) is None


def test_make_align_fn_modes_sfd():
    """'fan' uses models.s3fd (faithful SFD-crop→FAN); 'fan_frame' ignores
    it (FAN directly on the frame)."""
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        FrozenModels, make_align_fn)
    models = FrozenModels({}, {}, {}, {}, jnp.zeros((1, 512)),
                          fan={"dummy": jnp.zeros(())},
                          s3fd={"dummy": jnp.zeros(())})
    assert callable(make_align_fn(models, TrainingArguments(
        deca_alignment="fan")))
    assert callable(make_align_fn(models, TrainingArguments(
        deca_alignment="fan_frame")))


def test_shapemodel_detection_failure_sentinel():
    """calculate_shapemodel replicates the reference's failed-detection
    behavior (`estimate_DECA.py:33-51`): coefficients zero, angles −180°,
    for exactly the images the aligner flags."""
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        calculate_shapemodel, init_deca, synthetic_flame_params)
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    deca = init_deca(ks[0], synthetic_flame_params(ks[1], n_verts=128,
                                                   n_faces=200),
                     with_detail=False)
    imgs = jax.random.uniform(jax.random.PRNGKey(6), (2, 64, 64, 3),
                              minval=-1.0, maxval=1.0)
    ok = jnp.asarray([True, False])

    def align_stub(im01):
        from stylegan_directions_face_reenactment_tpu.models.nn import (
            resize_bilinear)
        return resize_bilinear(im01, (DECA_CROP, DECA_CROP)), ok

    p, ang = calculate_shapemodel(deca, imgs, align_fn=align_stub)
    assert float(jnp.abs(ang[1] + 180.0).max()) == 0.0
    assert float(jnp.abs(ang[0] + 180.0).max()) > 0.0
    for k in ("pose", "alpha_shp", "alpha_exp", "cam"):
        assert float(jnp.abs(p[k][1]).max()) == 0.0
        assert float(jnp.abs(p[k][0]).max()) > 0.0


@pytest.mark.slow
def test_fan_align_sfd_matches_manual_composition():
    """make_fan_align(fan, s3fd) is exactly estimate_landmarks →
    kpt68 bbox → warp_to_224, with the whole-frame fallback on failed
    detections (random-init S3FD never clears the 0.99 gate, so this also
    exercises the fallback: the warp degenerates to the full-frame map)."""
    from stylegan_directions_face_reenactment_tpu.models.face import (
        init_fan, init_s3fd)
    from stylegan_directions_face_reenactment_tpu.models.face.landmarks import (
        estimate_landmarks)

    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    sfd, fan = init_s3fd(ks[0]), init_fan(ks[1])
    im01 = jax.random.uniform(jax.random.PRNGKey(7), (2, 256, 256, 3))

    align = make_fan_align(fan, s3fd_params=sfd, return_ok=True)
    aligned, ok = jax.jit(align)(im01)
    assert aligned.shape == (2, DECA_CROP, DECA_CROP, 3)

    lms, ok_want, _ = estimate_landmarks(sfd, fan, im01 * 255.0,
                                         detector_input="fa")
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_want))
    center, old_size = kpt68_center_size(lms)
    center = jnp.where(ok_want[:, None], center, 128.0)
    old_size = jnp.where(ok_want, old_size, 256.0 / DECA_SCALE)
    want = warp_to_224(im01, center, old_size)
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(want),
                               atol=1e-5)


@pytest.mark.slow
def test_fan_align_shapemodel_differs_from_resize():
    """calculate_shapemodel with the FAN aligner consumes different crops
    than the bilinear-resize fallback (the round-1 numerics deviation);
    both paths are finite and the aligner output is a 224 crop."""
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        calculate_shapemodel, init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.face import init_fan

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    deca = init_deca(ks[0], synthetic_flame_params(ks[1], n_verts=128,
                                                   n_faces=200),
                     with_detail=False)
    fan = init_fan(ks[2])
    imgs = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3),
                              minval=-1.0, maxval=1.0)

    align = make_fan_align(fan)
    aligned = align((jnp.clip(imgs, -1, 1) + 1) / 2)
    assert aligned.shape == (2, DECA_CROP, DECA_CROP, 3)
    assert np.isfinite(np.asarray(aligned)).all()

    p_warp, ang_warp = jax.jit(
        lambda im: calculate_shapemodel(deca, im, align_fn=align))(imgs)
    p_res, ang_res = jax.jit(
        lambda im: calculate_shapemodel(deca, im))(imgs)
    for k in p_warp:
        assert p_warp[k].shape == p_res[k].shape
        assert np.isfinite(np.asarray(p_warp[k])).all()
    # different crops → different coefficients (random nets, random crops)
    assert float(jnp.abs(p_warp["pose"] - p_res["pose"]).max()) > 1e-6
    assert np.isfinite(np.asarray(ang_warp)).all()
    assert np.isfinite(np.asarray(ang_res)).all()


def test_landmarks_in_crop_affine():
    """landmarks_in_crop maps raw-frame kpts through the exact FFHQ crop
    box (origin = center − size, scale = image_size / (2·size))."""
    from stylegan_directions_face_reenactment_tpu.models.face.cropping import (
        ffhq_crop_box, landmarks_in_crop)
    rng = np.random.RandomState(0)
    lms = jnp.asarray(rng.rand(3, 68, 2).astype(np.float32) * 200 + 100)
    center, size, valid = ffhq_crop_box(lms)
    lms_c, ok = landmarks_in_crop(lms, image_size=256)
    assert ok.all() == valid.all()
    c = np.asarray(center, np.float32)
    s = np.asarray(size, np.float32)
    expect = (np.asarray(lms) - (c - s[:, None])[:, None, :]) \
        * (256.0 / (2.0 * s))[:, None, None]
    np.testing.assert_allclose(np.asarray(lms_c), expect, rtol=1e-5,
                               atol=1e-4)
    # a landmark at the box origin lands at crop pixel 0; at the far
    # corner it lands at 256
    origin = jnp.asarray((c - s[:, None])[:, None, :])
    probe = jnp.concatenate([origin, origin + 2 * s[:, None, None]], axis=1)
    # reuse the same box by mapping probe points through lms' box
    got = (np.asarray(probe) - (c - s[:, None])[:, None, :]) \
        * (256.0 / (2.0 * s))[:, None, None]
    np.testing.assert_allclose(got[:, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(got[:, 1], 256.0, rtol=1e-6)


def test_landmark_align_matches_manual_and_fallback():
    """landmark_align == kpt68 bbox → warp_to_224 for ok frames; failed
    frames warp the whole frame exactly like make_fan_align's fallback."""
    from stylegan_directions_face_reenactment_tpu.pipeline.alignment import (
        landmark_align)
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(2, 256, 256, 3).astype(np.float32))
    lms = jnp.asarray(rng.rand(2, 68, 2).astype(np.float32) * 120 + 60)
    ok = jnp.asarray([True, False])
    aligned, ok_out = landmark_align(imgs, lms, ok)
    assert aligned.shape == (2, DECA_CROP, DECA_CROP, 3)
    np.testing.assert_array_equal(np.asarray(ok_out), np.asarray(ok))
    center, old_size = kpt68_center_size(lms)
    manual_ok = warp_to_224(imgs[:1], center[:1], old_size[:1])
    np.testing.assert_allclose(np.asarray(aligned[:1]),
                               np.asarray(manual_ok), rtol=1e-5, atol=1e-5)
    manual_bad = warp_to_224(imgs[1:], jnp.full((1, 2), 128.0),
                             jnp.full((1,), 256.0 / DECA_SCALE))
    np.testing.assert_allclose(np.asarray(aligned[1:]),
                               np.asarray(manual_bad), rtol=1e-5, atol=1e-5)
