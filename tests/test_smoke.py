"""Sub-2-minute cold-cache smoke tier: one test per subsystem.

`pytest -m smoke` is the iteration-speed guard: op parity, one generator
forward, one alignment crop, one full training step (tiny shapes, the
`__graft_entry__.dryrun_multichip` recipe single-device), and CLI
arg-parsing for all five entry points. Everything runs on the virtual-CPU
test platform with shapes small enough that a COLD jit cache stays under
two minutes total (documented in README.md; the fast tier is >9 min cold).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oracles import leaky_relu_np, upfirdn2d_np

pytestmark = pytest.mark.smoke


def test_smoke_upfirdn2d_op_parity(rng):
    """L0 resampling primitive vs the independent numpy oracle
    (reference spec: `op/upfirdn2d.py:168-209` upfirdn2d_native)."""
    from stylegan_directions_face_reenactment_tpu.ops import upfirdn2d

    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    k = rng.rand(4, 4).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k),
                               up=2, down=1, pad=(2, 1)))
    want = upfirdn2d_np(x, k, up=2, down=1, pad=(2, 1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_smoke_fused_bias_act_op_parity(rng):
    """L0 fused bias+leaky-relu+scale vs oracle
    (reference spec: `op/fused_act.py:73-86`)."""
    from stylegan_directions_face_reenactment_tpu.ops import fused_leaky_relu

    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    b = rng.randn(3).astype(np.float32)
    got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    want = leaky_relu_np(x + b) * np.sqrt(2.0, dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_smoke_generator_forward():
    """StyleGAN2 z→image synthesis at 16² — mapping MLP, truncation,
    W→W+ broadcast, the conv/to_rgb stack (`model.py:471-539`)."""
    from stylegan_directions_face_reenactment_tpu.models import (
        init_generator, generator_forward, n_latent_for)

    key = jax.random.PRNGKey(0)
    g = init_generator(key, size=16)
    z = jax.random.normal(jax.random.fold_in(key, 1), (2, 512))
    trunc = jax.random.normal(jax.random.fold_in(key, 2), (1, 512)) * 0.01
    img, lat = generator_forward(g, [z], truncation=0.7,
                                 truncation_latent=trunc,
                                 return_latents=True)
    assert img.shape == (2, 16, 16, 3)
    assert lat.shape == (2, n_latent_for(16), 512)
    assert bool(jnp.isfinite(img).all())


def test_smoke_alignment_crop(rng):
    """FFHQ landmark-driven crop, host path
    (`ffhq_cropping.py:49-69`): in-frame landmarks → valid 256² crop."""
    from stylegan_directions_face_reenactment_tpu.models.face.cropping import (
        crop_using_landmarks_batch)

    img = rng.randint(0, 256, (1, 128, 128, 3)).astype(np.uint8)
    lms = (rng.rand(1, 68, 2) * 30 + 48).astype(np.float32)
    crops, ok = crop_using_landmarks_batch(img, lms, image_size=256)
    assert crops.shape == (1, 256, 256, 3)
    assert bool(ok[0])


def test_smoke_train_step():
    """One FULL paired training step at 64² on the production
    cached-GT-shape path (Δp from cached DECA coefficients → A →
    shifted synthesis → DECA-with-grad → loss stack → Adam on A) — the
    deepest differentiable chain in the system (`trainer.py:349-397`).
    Tiny shapes per the dryrun_multichip recipe: deca_image_size=64,
    resize alignment, 128-vert FLAME."""
    from stylegan_directions_face_reenactment_tpu.configs.arguments import (
        TrainingArguments)
    from stylegan_directions_face_reenactment_tpu.geometry import (
        initialize_directions)
    from stylegan_directions_face_reenactment_tpu.losses import (
        init_lpips_alex)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_direction_matrix, init_generator, mean_latent, n_latent_for)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.irse import (
        init_backbone)
    from stylegan_directions_face_reenactment_tpu.train import (
        FrozenModels, make_optimizer, make_paired_step)
    from stylegan_directions_face_reenactment_tpu.train.steps import split_a
    from stylegan_directions_face_reenactment_tpu.utils.common import (
        jit_build)

    size, batch = 64, 2
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    g = jit_build(lambda k: init_generator(k, size=size), ks[0])
    deca = jit_build(lambda k: init_deca(
        k, synthetic_flame_params(jax.random.fold_in(k, 1), n_verts=128,
                                  n_faces=200), with_detail=False), ks[1])
    idb = jit_build(init_backbone, ks[2])
    lp = jit_build(init_lpips_alex, ks[3])
    trunc = jax.jit(lambda k: mean_latent(g, k, n_latent=16))(ks[4])
    a = jit_build(lambda k: init_direction_matrix(
        k, 512, 15, w_plus=True, num_layers=8), ks[5])

    args = TrainingArguments(batch_size=batch, image_resolution=size,
                             deca_image_size=size, deca_alignment="resize",
                             training_method="paired")
    spec = initialize_directions("voxceleb", 15, 6.0)
    models = FrozenModels(g, deca, idb, lp, trunc)
    tx = make_optimizer(args)
    step = make_paired_step(models, spec, args, tx, cached_shape=True)
    opt_state = tx.init(split_a(a)[0])

    n_lat = n_latent_for(size)
    sw = jax.random.normal(ks[6], (batch, n_lat, 512))
    tw = jax.random.normal(ks[7], (batch, n_lat, 512))
    t_img = jax.random.uniform(ks[8], (batch, size, size, 3),
                               minval=-1.0, maxval=1.0)

    def coeffs(k):
        kk = jax.random.split(k, 3)
        return {
            "pose": 0.1 * jax.random.normal(kk[0], (batch, 6)),
            "alpha_shp": 0.1 * jax.random.normal(kk[1], (batch, 100)),
            "alpha_exp": 0.1 * jax.random.normal(kk[2], (batch, 50)),
            "cam": jnp.tile(jnp.asarray([[8.0, 0.0, 0.0]]), (batch, 1)),
        }

    p_s, p_t = coeffs(ks[9]), coeffs(jax.random.fold_in(ks[9], 1))
    ang = jnp.zeros((batch, 3))
    # the step graph (G fwd + DECA fwd + deep backward) is by far the
    # largest XLA:CPU compile in the smoke tier; skip the expensive HLO
    # optimization passes — this is a does-the-chain-run gate, the
    # optimized-program numerics are covered by the fast tier
    jax.config.update("jax_disable_most_optimizations", True)
    try:
        a2, _opt2, loss_dict = step(a, opt_state, ks[6], sw, tw, t_img,
                                    p_s, ang, p_t, ang)
    finally:
        jax.config.update("jax_disable_most_optimizations", False)
    loss = float(loss_dict["loss"])
    assert np.isfinite(loss), f"loss is not finite: {loss}"
    delta = float(jnp.abs(a2["weight"] - a["weight"]).max())
    assert delta > 0, "A matrix did not update"


@pytest.mark.parametrize("cli,flags", [
    ("run_inference", ["--source_path", "s.png", "--target_path", "t.mp4",
                       "--output_path", "out"]),
    ("run_facial_editing", ["--output_path", "out", "--directions", "0"]),
    ("run_trainer", ["--experiment_path", "exp",
                     "--training_method", "paired"]),
    ("invert_images", ["--dataset_path", "in"]),
    ("extract_statistics", ["--output_path", "out"]),
])
def test_smoke_cli_parsers(cli, flags):
    """All five entry points expose reference-compatible flags
    (`run_inference.py:294-315` etc.) and parse without side effects."""
    import importlib

    mod = importlib.import_module(
        f"stylegan_directions_face_reenactment_tpu.cli.{cli}")
    ns = mod.build_parser().parse_args(flags)
    assert ns is not None
