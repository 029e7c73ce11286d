"""Pallas upfirdn2d kernel vs the XLA formulation (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.ops.upfirdn2d import (
    upfirdn2d, make_kernel, set_resample_backend, get_resample_backend,
    upsample2d, blur)
from stylegan_directions_face_reenactment_tpu.ops.pallas_upfirdn import (
    upfirdn2d_pallas)


@pytest.mark.parametrize("up,pad,klen,h,w,c", [
    (1, (1, 1), 4, 16, 16, 8),     # blur after conv_transpose
    (1, (2, 2), 4, 33, 33, 8),     # downsample pre-blur (odd size)
    (2, (2, 1), 4, 16, 16, 8),     # Upsample (to_rgb skip)
    (2, (2, 1), 4, 8, 8, 512),     # deep/low-res
    (1, (1, 1), 3, 16, 16, 4),     # k=3
])
def test_pallas_matches_xla(rng, up, pad, klen, h, w, c):
    x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    taps = [1, 3, 3, 1][:klen] if klen == 4 else [1, 2, 1]
    k = make_kernel(taps, gain=up ** 2)
    want = np.asarray(upfirdn2d(x, k, up=up, down=1, pad=pad))
    got = np.asarray(upfirdn2d_pallas(x, np.asarray(k), up, pad))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_gradient_matches(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    k = make_kernel([1, 3, 3, 1], gain=4)
    kn = np.asarray(k)

    g_p = jax.grad(lambda a: jnp.sum(upfirdn2d_pallas(a, kn, 2, (2, 1)) ** 2))(x)
    g_x = jax.grad(lambda a: jnp.sum(
        upfirdn2d(a, k, up=2, down=1, pad=(2, 1)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4,
                               atol=1e-5)


def test_backend_switch(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    k = make_kernel([1, 3, 3, 1], gain=4)
    assert get_resample_backend() == "xla"
    y_xla = np.asarray(upsample2d(x, k))
    try:
        set_resample_backend("pallas")
        y_pl = np.asarray(upsample2d(x, k))
        b_pl = np.asarray(blur(x, make_kernel([1, 3, 3, 1]), (1, 1)))
    finally:
        set_resample_backend("xla")
    np.testing.assert_allclose(y_pl, y_xla, rtol=1e-5, atol=1e-5)
    b_xla = np.asarray(blur(x, make_kernel([1, 3, 3, 1]), (1, 1)))
    np.testing.assert_allclose(b_pl, b_xla, rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError):
        set_resample_backend("bogus")


def test_generator_synthesis_with_pallas_backend():
    from stylegan_directions_face_reenactment_tpu.models import (
        init_generator, synthesis, n_latent_for)
    g = init_generator(jax.random.PRNGKey(0), size=32)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, n_latent_for(32), 512))
    base = np.asarray(synthesis(g, lat))
    try:
        set_resample_backend("pallas")
        with_pallas = np.asarray(synthesis(g, lat))
    finally:
        set_resample_backend("xla")
    np.testing.assert_allclose(with_pallas, base, rtol=1e-4, atol=1e-4)
