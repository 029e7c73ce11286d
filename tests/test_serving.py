"""AOT serving bundles (`serving.py`): export → save → load → call.

The exported `jax.export` artifact must reproduce the live
`make_reenact_fn` pipeline exactly, serve arbitrary request lengths by
chunk/pad, refuse wrong-platform loads, and support the PTI
weight-swap pattern without re-exporting.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylegan_directions_face_reenactment_tpu.geometry import (
    initialize_directions)
from stylegan_directions_face_reenactment_tpu.models import (
    init_direction_matrix, init_generator, mean_latent, n_latent_for)
from stylegan_directions_face_reenactment_tpu.models.deca import (
    init_deca, synthetic_flame_params)
from stylegan_directions_face_reenactment_tpu.pipeline import make_reenact_fn
from stylegan_directions_face_reenactment_tpu.serving import (
    FORMAT_VERSION, META_FILE, ReenactServingProgram, export_reenact,
    load_reenact_bundle, save_reenact_bundle)

SIZE = 64
FRAME_BATCH = 4


@pytest.fixture(scope="module")
def zoo():
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    g = init_generator(ks[0], size=SIZE)
    deca = init_deca(ks[1], synthetic_flame_params(ks[2], n_verts=128,
                                                   n_faces=200),
                     with_detail=False)
    a = init_direction_matrix(ks[3], 512, 15, w_plus=True, num_layers=8)
    trunc = mean_latent(g, ks[4], n_latent=32)
    spec = initialize_directions("voxceleb", 15, 6.0)
    return g, a, deca, trunc, spec


@pytest.fixture(scope="module")
def source(zoo):
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    code = jax.random.normal(ks[0], (1, n_latent_for(SIZE), 512))
    params = {"pose": jnp.zeros((1, 6)), "alpha_shp": jnp.zeros((1, 100)),
              "alpha_exp": jnp.zeros((1, 50)), "cam": jnp.zeros((1, 3))}
    angles = jnp.zeros((1, 3))
    return code, params, angles


@pytest.fixture(scope="module")
def bundle_dir(zoo, source, tmp_path_factory):
    g, a, deca, trunc, spec = zoo
    exported, weights, meta = export_reenact(
        g, a, deca, spec, frame_batch=FRAME_BATCH, truncation=0.7,
        truncation_latent=trunc, target_size=SIZE)
    path = str(tmp_path_factory.mktemp("bundle"))
    save_reenact_bundle(path, exported, weights, meta)
    return path


def _targets(t, seed=2):
    return jax.random.uniform(jax.random.PRNGKey(seed), (t, SIZE, SIZE, 3),
                              minval=-1.0, maxval=1.0)


def test_bundle_roundtrip_matches_live_pipeline(zoo, source, bundle_dir):
    g, a, deca, trunc, spec = zoo
    code, params, angles = source
    prog = load_reenact_bundle(bundle_dir)
    assert prog.frame_batch == FRAME_BATCH
    assert prog.meta["format_version"] == FORMAT_VERSION

    tgts = _targets(FRAME_BATCH)
    got_img, got_lat = prog(code, params, angles, tgts)

    live = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                           truncation_latent=trunc)
    want_img, want_lat = live(code, params, angles, tgts)
    np.testing.assert_allclose(np.asarray(got_img), np.asarray(want_img),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_lat), np.asarray(want_lat),
                               rtol=1e-6, atol=1e-6)


def test_chunking_and_padding(zoo, source, bundle_dir):
    """Request lengths off the exported batch: pad (T<fb), chunk+pad
    (T>fb, not a multiple) — outputs equal the one-shot live program."""
    g, a, deca, trunc, spec = zoo
    code, params, angles = source
    prog = load_reenact_bundle(bundle_dir)
    live = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                           truncation_latent=trunc)
    for t in (1, 3, 7):
        tgts = _targets(t, seed=10 + t)
        got_img, got_lat = prog(code, params, angles, tgts)
        assert got_img.shape[0] == t and got_lat.shape[0] == t
        want_img, want_lat = live(code, params, angles, tgts)
        # the live fn compiles at batch T while the bundle always runs at
        # frame_batch; XLA's batch-dependent conv tiling reorders f32
        # accumulation (measured 2e-5 max at T=1, exact at T=3/7)
        np.testing.assert_allclose(np.asarray(got_img),
                                   np.asarray(want_img), atol=1e-4)


def test_empty_request_raises(source, bundle_dir):
    code, params, angles = source
    prog = load_reenact_bundle(bundle_dir)
    with pytest.raises(ValueError, match="empty"):
        prog(code, params, angles, _targets(0))


def test_wrong_platform_refused(bundle_dir, tmp_path):
    import shutil
    bad = tmp_path / "bad_bundle"
    shutil.copytree(bundle_dir, bad)
    meta_path = bad / META_FILE
    meta = json.loads(meta_path.read_text())
    meta["platforms"] = ["tpu"]
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="platforms"):
        load_reenact_bundle(str(bad))

    meta["format_version"] = 999
    meta["platforms"] = [jax.default_backend()]
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="format_version"):
        load_reenact_bundle(str(bad))


def test_with_generator_swap(zoo, source, bundle_dir):
    """The PTI pattern: swap in different generator weights without
    re-exporting; outputs track the new weights."""
    g, a, deca, trunc, spec = zoo
    code, params, angles = source
    prog = load_reenact_bundle(bundle_dir)
    g2 = init_generator(jax.random.PRNGKey(42), size=SIZE)
    prog2 = prog.with_generator(g2)

    tgts = _targets(FRAME_BATCH)
    base_img, _ = prog(code, params, angles, tgts)
    got_img, _ = prog2(code, params, angles, tgts)
    assert not np.allclose(np.asarray(got_img), np.asarray(base_img))

    live2 = make_reenact_fn(g2, a, deca, spec, truncation=0.7,
                            truncation_latent=trunc)
    want_img, _ = live2(code, params, angles, tgts)
    np.testing.assert_allclose(np.asarray(got_img), np.asarray(want_img),
                               rtol=1e-6, atol=1e-6)


def test_return_target_params_bundle(zoo, source, tmp_path):
    """Bundles exported with return_target_params=True emit a dict output
    (params_target) — chunk slicing/concat must be pytree-aware (a plain
    `r[:n]` on the dict raised KeyError before the fix)."""
    g, a, deca, trunc, spec = zoo
    code, params, angles = source
    exported, weights, meta = export_reenact(
        g, a, deca, spec, frame_batch=FRAME_BATCH, truncation=0.7,
        truncation_latent=trunc, target_size=SIZE,
        return_target_params=True)
    path = str(tmp_path / "bundle_tp")
    save_reenact_bundle(path, exported, weights, meta)
    prog = load_reenact_bundle(path)
    assert prog.meta["return_target_params"] is True

    # T=6 with frame_batch 4 exercises both chunking AND padding
    tgts = _targets(6, seed=5)
    img, lat, params_t, angles_t = prog(code, params, angles, tgts)
    assert img.shape[0] == 6 and lat.shape[0] == 6
    assert set(params_t) == {"pose", "alpha_shp", "alpha_exp", "cam"}
    assert params_t["alpha_exp"].shape == (6, 50)
    assert angles_t.shape == (6, 3)

    live = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                           truncation_latent=trunc,
                           return_target_params=True)
    w_img, w_lat, w_pt, w_ang = live(code, params, angles, tgts)
    np.testing.assert_allclose(np.asarray(img), np.asarray(w_img),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(params_t["alpha_exp"]),
                               np.asarray(w_pt["alpha_exp"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(angles_t), np.asarray(w_ang),
                               atol=1e-4)


def test_reuse_landmarks_bundle(zoo, source, tmp_path):
    """reuse_landmarks bundles take (targets, lms, ok) and must chunk/pad
    all three together."""
    g, a, deca, trunc, spec = zoo
    code, params, angles = source
    exported, weights, meta = export_reenact(
        g, a, deca, spec, frame_batch=FRAME_BATCH, truncation=0.7,
        truncation_latent=trunc, target_size=SIZE, reuse_landmarks=True)
    path = str(tmp_path / "bundle_rl")
    save_reenact_bundle(path, exported, weights, meta)
    prog = load_reenact_bundle(path)
    assert prog.meta["reuse_landmarks"] is True

    t = 5
    tgts = _targets(t, seed=6)
    lms = jax.random.uniform(jax.random.PRNGKey(7), (t, 68, 2),
                             minval=10.0, maxval=54.0)
    ok = jnp.ones((t,), bool)
    img, lat = prog(code, params, angles, tgts, lms, ok)
    assert img.shape[0] == t and lat.shape[0] == t

    live = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                           truncation_latent=trunc, reuse_landmarks=True)
    w_img, _ = live(code, params, angles, tgts, lms, ok)
    np.testing.assert_allclose(np.asarray(img), np.asarray(w_img),
                               atol=1e-4)


def test_weights_stored_without_pickle(bundle_dir):
    """The bundle must contain no pickle payloads (npz with allow_pickle
    default False + JSON manifest only)."""
    from stylegan_directions_face_reenactment_tpu.serving import (
        WEIGHTS_FILE, WEIGHTS_TREE_FILE)
    assert not os.path.exists(os.path.join(bundle_dir, "weights.pkl"))
    with np.load(os.path.join(bundle_dir, WEIGHTS_FILE)) as z:
        assert len(z.files) > 0   # loads with allow_pickle=False
    json.loads(open(os.path.join(bundle_dir, WEIGHTS_TREE_FILE)).read())


@pytest.mark.slow
def test_export_serving_cli_random_init(tmp_path):
    """CLI end-to-end at the production 256 crop with the faithful SFD→FAN
    alignment baked in, then served through the loader."""
    from stylegan_directions_face_reenactment_tpu.cli.export_serving import (
        main)
    out = str(tmp_path / "bundle")
    main(["--output_path", out, "--random_init", "--frame_batch", "2",
          "--deca_alignment", "fan", "--image_resolution", "64"])
    assert os.path.exists(os.path.join(out, META_FILE))
    prog = load_reenact_bundle(out)
    assert prog.meta["deca_alignment"] == "fan"
    assert prog.meta["dataset_type"] == "voxceleb"

    code = jax.random.normal(jax.random.PRNGKey(0),
                             (1, n_latent_for(64), 512))
    params = {"pose": jnp.zeros((1, 6)), "alpha_shp": jnp.zeros((1, 100)),
              "alpha_exp": jnp.zeros((1, 50)), "cam": jnp.zeros((1, 3))}
    tgts = jax.random.uniform(jax.random.PRNGKey(3), (3, 256, 256, 3),
                              minval=-1.0, maxval=1.0)
    img, lat = prog(code, params, jnp.zeros((1, 3)), tgts)
    assert img.shape == (3, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
