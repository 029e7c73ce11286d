"""StyleGAN2 model tests: shapes, determinism, truncation, mixing, grads."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.models import (
    init_generator, generator_forward, mapping, synthesis, mean_latent,
    style_to_wplus, n_latent_for, init_discriminator, discriminator_forward,
    init_wplus_encoder, wplus_encoder_forward,
    init_direction_matrix, direction_matrix_forward,
)

SIZE = 64  # small CPU-friendly config; structure identical to 256


@pytest.fixture(scope="module")
def gparams():
    return init_generator(jax.random.PRNGKey(0), size=SIZE)


def test_n_latent():
    assert n_latent_for(256) == 14
    assert n_latent_for(64) == 10
    assert n_latent_for(1024) == 18


def test_mapping_shape(gparams):
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 512))
    w = mapping(gparams, z)
    assert w.shape == (3, 512)
    assert np.isfinite(np.asarray(w)).all()


def test_generator_forward_from_z(gparams):
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    img, lat = generator_forward(gparams, [z], return_latents=True)
    assert img.shape == (2, SIZE, SIZE, 3)
    assert lat.shape == (2, n_latent_for(SIZE), 512)
    assert np.isfinite(np.asarray(img)).all()


def test_generator_deterministic_fixed_noise(gparams):
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 512))
    a, _ = generator_forward(gparams, [z])
    b, _ = generator_forward(gparams, [z])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generator_randomize_noise_differs(gparams):
    # noise_weight inits to 0 (like the reference NoiseInjection), so bump it
    # to make noise observable.
    p = jax.tree_util.tree_map(lambda x: x, gparams)  # shallow-ish copy
    p["conv1"] = dict(gparams["conv1"], noise_weight=jnp.ones(()))
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 512))
    a, _ = generator_forward(p, [z], randomize_noise=True,
                             rng=jax.random.PRNGKey(10))
    b, _ = generator_forward(p, [z], randomize_noise=True,
                             rng=jax.random.PRNGKey(11))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0


def test_truncation_pulls_toward_mean(gparams):
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 512))
    trunc = mean_latent(gparams, jax.random.PRNGKey(4), n_latent=256)
    w = mapping(gparams, z)
    # truncation in w-space: style' = trunc + 0.7 (w - trunc)
    img_t, lat_t = generator_forward(gparams, [z], truncation=0.7,
                                     truncation_latent=trunc, return_latents=True)
    want = trunc + 0.7 * (w - trunc)
    np.testing.assert_allclose(np.asarray(lat_t[:, 0]), np.asarray(want[0:1]),
                               rtol=1e-5, atol=1e-6)


def test_input_is_latent_wplus_passthrough(gparams):
    wp = jax.random.normal(jax.random.PRNGKey(5), (2, n_latent_for(SIZE), 512))
    img, lat = generator_forward(gparams, [wp], input_is_latent=True,
                                 return_latents=True)
    np.testing.assert_array_equal(np.asarray(lat), np.asarray(wp))
    assert img.shape == (2, SIZE, SIZE, 3)


def test_style_mixing_inject_index(gparams):
    w1 = jax.random.normal(jax.random.PRNGKey(6), (1, 512))
    w2 = jax.random.normal(jax.random.PRNGKey(7), (1, 512))
    lat = style_to_wplus(gparams, [w1, w2], inject_index=3)
    n = n_latent_for(SIZE)
    assert lat.shape == (1, n, 512)
    np.testing.assert_array_equal(np.asarray(lat[:, :3]),
                                  np.tile(np.asarray(w1)[:, None], (1, 3, 1)))
    np.testing.assert_array_equal(np.asarray(lat[:, 3:]),
                                  np.tile(np.asarray(w2)[:, None], (1, n - 3, 1)))


def test_synthesis_grad_wrt_latent(gparams):
    wp = jax.random.normal(jax.random.PRNGKey(8), (1, n_latent_for(SIZE), 512))

    def loss(lat):
        return jnp.mean(synthesis(gparams, lat) ** 2)

    g = jax.grad(loss)(wp)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_synthesis_jit_compiles(gparams):
    f = jax.jit(lambda lat: synthesis(gparams, lat))
    wp = jax.random.normal(jax.random.PRNGKey(9), (1, n_latent_for(SIZE), 512))
    img = f(wp)
    assert img.shape == (1, SIZE, SIZE, 3)


def test_discriminator_shapes():
    p = init_discriminator(jax.random.PRNGKey(0), size=SIZE)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, SIZE, SIZE, 3))
    out = discriminator_forward(p, x)
    assert out.shape == (4, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_wplus_encoder_shapes():
    p = init_wplus_encoder(jax.random.PRNGKey(0), size=SIZE)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3))
    out = wplus_encoder_forward(p, x)
    assert out.shape == (2, n_latent_for(SIZE), 512)


def test_direction_matrix_wplus():
    p = init_direction_matrix(jax.random.PRNGKey(0), 512, 15, w_plus=True,
                              num_layers=8)
    dp = jax.random.normal(jax.random.PRNGKey(1), (4, 15))
    out = direction_matrix_forward(p, dp)
    assert out.shape == (4, 8, 512)
    # linearity
    out2 = direction_matrix_forward(p, 2 * dp)
    bias = np.asarray(p["bias"]).reshape(8, 512)
    np.testing.assert_allclose(np.asarray(out2) - bias,
                               2 * (np.asarray(out) - bias), rtol=1e-4, atol=1e-5)


def test_direction_matrix_eye_init():
    p = init_direction_matrix(jax.random.PRNGKey(0), 512, 15, w_plus=True,
                              num_layers=2, initialization="eye")
    dp = jnp.eye(15)[None, 0]  # e_0
    out = direction_matrix_forward(p, dp)
    # each layer block has identity in its top-left 15x15
    assert float(out[0, 0, 0]) == 1.0
    assert float(out[0, 1, 0]) == 1.0
    assert float(out[0, 0, 20]) == 0.0


def test_direction_matrix_flat():
    p = init_direction_matrix(jax.random.PRNGKey(0), 512, 15, w_plus=False)
    dp = jax.random.normal(jax.random.PRNGKey(1), (4, 15))
    assert direction_matrix_forward(p, dp).shape == (4, 512)
