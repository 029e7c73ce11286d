"""FLAME/LBS parity vs reference goldens + DECA facade tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.models.deca import (
    lbs, vertices2landmarks, flame_forward, synthetic_flame_params,
    find_dynamic_lmk_idx, init_deca, deca_encode, deca_decode,
    calculate_shape, extract_deca_params, calculate_shapemodel,
    decompose_code, init_resnet_encoder, resnet_encoder_forward,
    init_detail_generator, detail_generator_forward, N_PARAM,
)
from stylegan_directions_face_reenactment_tpu.geometry import batch_rodrigues

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "flame.npz")


@pytest.fixture(scope="module")
def g():
    if not os.path.exists(GOLDEN):
        pytest.skip("flame goldens not generated")
    return np.load(GOLDEN)


def test_batch_rodrigues_parity(g):
    got = np.asarray(batch_rodrigues(jnp.asarray(g["aa"])))
    np.testing.assert_allclose(got, g["rod"], rtol=1e-5, atol=1e-6)


def test_lbs_parity(g):
    verts, joints = lbs(jnp.asarray(g["betas"]), jnp.asarray(g["full_pose"]),
                        jnp.asarray(g["v_template"]), jnp.asarray(g["shapedirs"]),
                        jnp.asarray(g["posedirs"]), jnp.asarray(g["j_regressor"]),
                        jnp.asarray(g["lbs_weights"]))
    np.testing.assert_allclose(np.asarray(verts), g["verts"], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(joints), g["joints"], rtol=1e-4,
                               atol=1e-5)


def test_vertices2landmarks_parity(g):
    lmks = vertices2landmarks(jnp.asarray(g["verts"]), jnp.asarray(g["faces"]),
                              jnp.asarray(g["lmk_faces_idx"]),
                              jnp.asarray(g["lmk_bary"]))
    np.testing.assert_allclose(np.asarray(lmks), g["lmks"], rtol=1e-4,
                               atol=1e-5)


def test_dynamic_lmk_parity(g):
    idx, bary = find_dynamic_lmk_idx(jnp.asarray(g["full_pose"]),
                                     jnp.asarray(g["dyn_faces"]),
                                     jnp.asarray(g["dyn_bary"]))
    np.testing.assert_array_equal(np.asarray(idx), g["dyn_idx_sel"])
    np.testing.assert_allclose(np.asarray(bary), g["dyn_bary_sel"], rtol=1e-5)


# ---------------------------------------------------------------------------
# FLAME forward / DECA facade (synthetic params; structure + differentiability)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def flame_params():
    return synthetic_flame_params(jax.random.PRNGKey(0))


def test_flame_forward_shapes(flame_params):
    b = 3
    verts, lm2d, lm3d = flame_forward(
        flame_params,
        jax.random.normal(jax.random.PRNGKey(1), (b, 100)) * 0.3,
        jax.random.normal(jax.random.PRNGKey(2), (b, 50)) * 0.3,
        jax.random.normal(jax.random.PRNGKey(3), (b, 6)) * 0.2)
    assert verts.shape == (b, 256, 3)
    assert lm2d.shape == (b, 68, 3)
    assert lm3d.shape == (b, 68, 3)
    assert np.isfinite(np.asarray(verts)).all()


def test_flame_grad_flows_to_pose(flame_params):
    def loss(pose):
        v, _, _ = flame_forward(
            flame_params, jnp.zeros((1, 100)), jnp.zeros((1, 50)), pose)
        return jnp.sum(v ** 2)

    gp = jax.grad(loss)(jnp.full((1, 6), 0.1))
    assert np.isfinite(np.asarray(gp)).all()
    assert float(jnp.abs(gp).sum()) > 0


def test_decompose_code():
    code = jnp.arange(2 * N_PARAM, dtype=jnp.float32).reshape(2, N_PARAM)
    d = decompose_code(code)
    assert d["shape"].shape == (2, 100)
    assert d["tex"].shape == (2, 50)
    assert d["exp"].shape == (2, 50)
    assert d["pose"].shape == (2, 6)
    assert d["cam"].shape == (2, 3)
    assert d["light"].shape == (2, 9, 3)
    np.testing.assert_allclose(np.asarray(d["pose"][0]),
                               np.arange(200, 206, dtype=np.float32))


@pytest.fixture(scope="module")
def deca_params(flame_params):
    return init_deca(jax.random.PRNGKey(4), flame_params, with_detail=True)


def test_deca_encode_decode(deca_params):
    imgs = jax.random.uniform(jax.random.PRNGKey(5), (2, 224, 224, 3))
    code = deca_encode(deca_params, imgs)
    assert code["pose"].shape == (2, 6)
    lm2d, lm3d, tverts = deca_decode(deca_params, code)
    assert lm2d.shape == (2, 68, 2)
    assert lm3d.shape == (2, 68, 3)
    assert tverts.shape == (2, 256, 3)
    assert np.isfinite(np.asarray(lm2d)).all()
    assert np.isfinite(np.asarray(tverts)).all()


def test_calculate_shape_coefficient_dict(deca_params):
    coeffs = {"shape": jnp.zeros((2, 100)), "exp": jnp.zeros((2, 50)),
              "pose": jnp.zeros((2, 6)),
              "cam": jnp.tile(jnp.asarray([[8.0, 0, 0]]), (2, 1))}
    lm2d, lm3d, tverts = calculate_shape(deca_params, coeffs)
    assert np.isfinite(np.asarray(lm2d)).all()


def test_extract_deca_params_batched(deca_params):
    imgs = jax.random.uniform(jax.random.PRNGKey(6), (3, 224, 224, 3))
    p, shp, exp, angles, cam = extract_deca_params(deca_params, imgs)
    assert p.shape == (3, 6) and shp.shape == (3, 100)
    assert exp.shape == (3, 50) and angles.shape == (3, 3) and cam.shape == (3, 3)


def test_calculate_shapemodel_gan_range(deca_params):
    imgs = jax.random.uniform(jax.random.PRNGKey(7), (2, 224, 224, 3),
                              minval=-1, maxval=1)
    out, angles = calculate_shapemodel(deca_params, imgs, image_space="gan")
    assert set(out) == {"pose", "alpha_shp", "alpha_exp", "cam"}
    assert angles.shape == (2, 3)


def test_deca_end_to_end_grad_to_image(deca_params):
    # the critical training-path property: d(landmarks)/d(image) exists
    imgs = jax.random.uniform(jax.random.PRNGKey(8), (1, 224, 224, 3))

    def loss(im):
        code = deca_encode(deca_params, im)
        lm2d, _, tv = deca_decode(deca_params, code)
        return jnp.sum(lm2d ** 2) + jnp.sum(tv ** 2)

    gi = jax.grad(loss)(imgs)
    assert np.isfinite(np.asarray(gi)).all()
    assert float(jnp.abs(gi).sum()) > 0


def test_detail_generator_shape():
    p = init_detail_generator(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 128 + 53))
    out = detail_generator_forward(p, z)
    assert out.shape == (2, 256, 256, 1)
    assert float(jnp.abs(out).max()) <= 0.01 + 1e-6


def test_shapemodel_bf16_encode_close_to_f32():
    """The bf16 serving dtype for the DECA ResNet-50 trunk
    (`calculate_shapemodel(compute_dtype=...)`) returns f32 coefficients
    close to the f32 path — pose angles within tenths of a degree class
    bounds on random nets."""
    import jax
    import jax.numpy as jnp
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        calculate_shapemodel, init_deca, synthetic_flame_params)
    ks = jax.random.split(jax.random.PRNGKey(5), 2)
    deca = init_deca(ks[0], synthetic_flame_params(ks[1], n_verts=128,
                                                   n_faces=200),
                     with_detail=False)
    imgs = jax.random.uniform(jax.random.PRNGKey(6), (2, 64, 64, 3),
                              minval=-1.0, maxval=1.0)
    p32, a32 = calculate_shapemodel(deca, imgs, image_size=64)
    p16, a16 = calculate_shapemodel(deca, imgs, image_size=64,
                                    compute_dtype=jnp.bfloat16)
    for k in p16:
        assert p16[k].dtype == jnp.float32
        scale = float(jnp.abs(p32[k]).max()) + 1e-6
        assert float(jnp.abs(p16[k] - p32[k]).max()) / scale < 0.05
    assert a16.dtype == jnp.float32


# ---------------------------------------------------------------- FLAMETex

def _tex_space_arrays(rng, n_pc):
    n = 512 * 512 * 3
    mu = rng.random(n).astype(np.float32) * 255.0
    pc = rng.standard_normal((n, n_pc)).astype(np.float32)
    return mu, pc


def test_flametex_live_parity():
    """`flametex_forward` + `load_flame_tex` (BFM branch) vs the reference
    FLAMETex __init__ math + AST-extracted forward (`FLAME.py:216-262`),
    incl. the nearest 512->256 interpolate and the BGR flip."""
    import types
    import torch
    import tempfile
    from ref_loader import extract_ref_function
    from stylegan_directions_face_reenactment_tpu.weights import (
        load_flame_tex)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        flametex_forward)

    rng = np.random.default_rng(0)
    n_tex = 2
    mu, pc = _tex_space_arrays(rng, n_pc=3)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "tex.npz")
        np.savez(path, MU=mu, PC=pc)
        params = load_flame_tex(path, tex_type="BFM", n_tex=n_tex)

    # reference __init__ (BFM branch, FLAME.py:225-233) + buffers
    texture_mean = torch.from_numpy(mu.reshape(1, -1)).float()[None]
    texture_basis = torch.from_numpy(
        pc.reshape(-1, 199 if pc.shape[1] >= 199 else pc.shape[1])
        [:, :n_tex]).float()[None]
    ref_forward = extract_ref_function(
        "libs/DECA/decalib/models/FLAME.py", "forward",
        class_name="FLAMETex")
    self_ns = types.SimpleNamespace(texture_mean=texture_mean,
                                    texture_basis=texture_basis)
    texcode = rng.standard_normal((2, n_tex)).astype(np.float32)
    ref = ref_forward(self_ns, torch.from_numpy(texcode))  # (B,3,256,256)
    ref_nhwc = ref.permute(0, 2, 3, 1).numpy()

    got = np.asarray(flametex_forward(params, jnp.asarray(texcode)))
    assert got.shape == (2, 256, 256, 3)
    np.testing.assert_allclose(got, ref_nhwc, rtol=1e-4, atol=1e-2)


def test_load_flame_tex_flame_branch():
    """FLAME-type texture spaces divide by 255 and carry 200 components
    (`FLAME.py:235-242`)."""
    import tempfile
    from stylegan_directions_face_reenactment_tpu.weights import (
        load_flame_tex)
    rng = np.random.default_rng(1)
    n = 512 * 512 * 3
    mean = rng.random(n).astype(np.float32) * 255.0
    tex_dir = rng.standard_normal((n, 4)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "tex.npz")
        np.savez(path, mean=mean, tex_dir=tex_dir)
        params = load_flame_tex(path, tex_type="FLAME", n_tex=3)
        np.testing.assert_allclose(np.asarray(params["texture_mean"]),
                                   mean.reshape(1, -1) / 255.0, rtol=1e-6)
        assert params["texture_basis"].shape == (n, 3)
        np.testing.assert_allclose(np.asarray(params["texture_basis"]),
                                   tex_dir[:, :3] / 255.0, rtol=1e-6)
        with pytest.raises(ValueError):
            load_flame_tex(path, tex_type="nope")


@pytest.mark.slow
def test_detail_generator_live_parity():
    """Converted D_detail forward vs the live reference decoder
    (`decalib/models/decoders.py:19-56`): bilinear nn.Upsample chain,
    the eps=0.8 BatchNorm quirk, tanh·out_scale."""
    import torch
    from ref_loader import install_reference_path
    from stylegan_directions_face_reenactment_tpu.weights import (
        torch_convert as tc)
    install_reference_path()
    from test_converter_schema import _stub_modules
    _stub_modules("torchvision", "torchvision.models")
    from libs.DECA.decalib.models.decoders import Generator as DetailGen
    from libs.DECA.decalib.models import resnet as ref_resnet
    torch.manual_seed(0)
    latent = 128 + 53
    ref = DetailGen(latent_dim=latent, out_channels=1, out_scale=0.01).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    enc = ref_resnet.ResNet(ref_resnet.Bottleneck, [3, 4, 6, 3])
    e_flame = {f"encoder.{k}": v.detach().numpy()
               for k, v in enc.state_dict().items()}
    l0, l2 = torch.nn.Linear(2048, 1024), torch.nn.Linear(1024, 236)
    e_flame.update({f"layers.0.{k}": v.detach().numpy()
                    for k, v in l0.state_dict().items()})
    e_flame.update({f"layers.2.{k}": v.detach().numpy()
                    for k, v in l2.state_dict().items()})
    params = tc.convert_deca(
        {"E_flame": e_flame, "D_detail": sd},
        synthetic_flame_params(jax.random.PRNGKey(0), n_verts=16,
                               n_faces=20))["d_detail"]

    rng = np.random.default_rng(2)
    noise = rng.standard_normal((2, latent)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(noise)).numpy()          # (B,1,256,256)
    got = np.asarray(detail_generator_forward(params, jnp.asarray(noise)))
    assert got.shape == (2, 256, 256, 1)
    np.testing.assert_allclose(got[..., 0], want[:, 0], rtol=1e-4, atol=5e-5)
