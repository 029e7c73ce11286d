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
