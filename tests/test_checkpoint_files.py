"""Checkpoint-FILE round trips: real on-disk .pt/.pth/.tar/.pkl fixtures.

`test_converter_schema.py` proves the converters consume the reference's
in-memory state_dict layouts; these tests prove the FILE-loading half of
`cli/model_loading.py`: fabricated checkpoint files with the exact on-disk
formats of the reference registry (`libs/configs/config_models.py:4-20` +
README download table) — torch.save wrappers (`g_ema`/`e`/`state_dict`
keys, strict=False noise-buffer absence, the A-matrix torch bundle,
`utils_train.py:592-603`), a pickled FLAME dict for
`weights/flame_loader.py`, and the landmark-embedding npy — are written to
disk, loaded through the public loaders, and driven through one real
invert + reenact step. When real checkpoints appear, only the weight
VALUES remain to be certified (`test_pretrained.py`).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
from torch import nn

from ref_loader import (install_reference_path, load_backbone_class,
                        load_e4e_class, load_generator_module, state_dict_np)

pytestmark = pytest.mark.slow

from stylegan_directions_face_reenactment_tpu.cli import model_loading as ml
from stylegan_directions_face_reenactment_tpu.models import n_latent_for

SIZE = 64           # tiny generator/e4e: identical layer structure to 256
N_VERTS, N_FACES = 128, 200


def _sd_torch(module):
    return {k: v.detach().cpu() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def pretrained_dir(tmp_path_factory):
    """Fabricate every registry file with its real on-disk format."""
    root = tmp_path_factory.mktemp("pretrained")
    torch.manual_seed(0)

    # stylegan-voxceleb.pt — {"g_ema": sd, "latent_avg": ...}; the 256
    # voxceleb ckpt lacks the noise buffers (strict=False,
    # `run_inference.py:66-67`) so the fixture drops them too
    Generator = load_generator_module().Generator
    gen = Generator(SIZE, 512, 8, channel_multiplier=1)
    g_sd = {k: v for k, v in _sd_torch(gen).items()
            if not k.startswith("noises.")}
    torch.save({"g_ema": g_sd, "latent_avg": torch.randn(512)},
               root / "stylegan-voxceleb.pt")

    # e4e-voxceleb.pt — {"e": sd, ...extras the loader must ignore}
    E4E = load_e4e_class()
    enc = E4E(50, "ir_se", SIZE)
    torch.save({"e": _sd_torch(enc), "latent_avg": torch.randn(512),
                "opts": {"dataset_type": "voxceleb"}},
               root / "e4e-voxceleb.pt")

    # A_matrix.pt — the training bundle (`utils_train.py:592-603`)
    a_lin = nn.Linear(15, 512 * 8, bias=True)
    a_sd = {f"linear.{k}": v for k, v in _sd_torch(a_lin).items()}
    torch.save({"step": 32000, "A_matrix": a_sd,
                "learned_directions": 15, "shift_scale": 6.0,
                "w_plus": True, "num_layers_shift": 8},
               root / "A_matrix_voxceleb.pt")

    # s3fd-619a316812.pth — a raw state_dict
    install_reference_path()
    from test_converter_schema import _stub_modules
    _stub_modules("cv2", "skimage", "skimage.io", "matplotlib",
                  "matplotlib.pyplot")
    from libs.face_models.sfd.net_s3fd import s3fd
    torch.save(_sd_torch(s3fd()), root / "s3fd-619a316812.pth")

    # 2DFAN4-11f355bf06.pth.tar — {"state_dict": sd}
    from libs.face_models.fan_model.models import FAN
    torch.save({"state_dict": _sd_torch(FAN(num_modules=4))},
               root / "2DFAN4-11f355bf06.pth.tar")

    # model_ir_se50.pth — a raw state_dict
    Backbone = load_backbone_class()
    bb = Backbone(input_size=112, num_layers=50, drop_ratio=0.6, mode="ir_se")
    torch.save(_sd_torch(bb), root / "model_ir_se50.pth")

    # deca_model.tar — {"E_flame", "E_detail", "D_detail"} state_dicts
    # (`decalib/deca.py:67-98`)
    _stub_modules("torchvision", "torchvision.models")
    from libs.DECA.decalib.models import resnet as ref_resnet
    from libs.DECA.decalib.models.decoders import Generator as DetailGen

    def resnet_encoder_sd(outsize):
        enc = ref_resnet.ResNet(ref_resnet.Bottleneck, [3, 4, 6, 3])
        sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
        l0, l2 = nn.Linear(2048, 1024), nn.Linear(1024, outsize)
        sd.update({f"layers.0.{k}": v for k, v in l0.state_dict().items()})
        sd.update({f"layers.2.{k}": v for k, v in l2.state_dict().items()})
        return sd

    torch.save({"E_flame": resnet_encoder_sd(236),
                "E_detail": resnet_encoder_sd(128),
                "D_detail": _sd_torch(DetailGen(latent_dim=128 + 53,
                                                out_channels=1,
                                                out_scale=0.01))},
               root / "deca_model.tar")

    # generic_model.pkl — pickled dict of the FLAME arrays the loader
    # decodes (`FLAME.py:46-66`; chumpy objects in the real file are
    # handled by the stub unpickler, plain arrays load identically)
    import pickle
    rng = np.random.RandomState(0)
    flame_dict = {
        "v_template": rng.randn(N_VERTS, 3).astype(np.float64) * 0.1,
        "shapedirs": rng.randn(N_VERTS, 3, 400).astype(np.float64) * 0.01,
        "posedirs": rng.randn(N_VERTS, 3, 36).astype(np.float64) * 0.01,
        "J_regressor": np.abs(rng.randn(5, N_VERTS)).astype(np.float64),
        "weights": np.abs(rng.randn(N_VERTS, 5)).astype(np.float64),
        "f": rng.randint(0, N_VERTS, (N_FACES, 3)).astype(np.uint32),
    }
    with open(root / "generic_model.pkl", "wb") as f:
        pickle.dump(flame_dict, f, protocol=2)

    # landmark_embedding.npy — dict of arrays (np.save/allow_pickle like
    # the real file)
    lmk = {
        "static_lmk_faces_idx": rng.randint(0, N_FACES, (51,)),
        "static_lmk_bary_coords": np.abs(rng.rand(51, 3)),
        "dynamic_lmk_faces_idx": rng.randint(0, N_FACES, (79, 17)),
        "dynamic_lmk_bary_coords": np.abs(rng.rand(79, 17, 3)),
        "full_lmk_faces_idx": rng.randint(0, N_FACES, (1, 68)),
        "full_lmk_bary_coords": np.abs(rng.rand(1, 68, 3)),
    }
    np.save(root / "landmark_embedding.npy", lmk, allow_pickle=True)

    # lpips_alex_v0.1.pth — {"alex_features": ..., "lin": ...}
    alex_cfg = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3),
                (256, 256, 3)]
    alex_sd = {}
    for i, (cin, cout, k) in zip((0, 3, 6, 8, 10), alex_cfg):
        alex_sd[f"{i}.weight"] = torch.randn(cout, cin, k, k)
        alex_sd[f"{i}.bias"] = torch.randn(cout)
    lin_sd = {f"{i}.1.weight": torch.rand(1, c, 1, 1)
              for i, c in enumerate((64, 192, 384, 256, 256))}
    torch.save({"alex_features": alex_sd, "lin": lin_sd},
               root / "lpips_alex_v0.1.pth")

    return str(root)


def test_generator_file_loads(pretrained_dir):
    g = ml.load_generator("voxceleb",
                          path=os.path.join(pretrained_dir,
                                            "stylegan-voxceleb.pt"),
                          resolution=SIZE)
    assert g["meta"]["size"] == SIZE
    from stylegan_directions_face_reenactment_tpu.models.stylegan2 import (
        synthesis)
    w = jnp.zeros((1, n_latent_for(SIZE), 512))
    img = synthesis(g, w)
    assert img.shape == (1, SIZE, SIZE, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_a_matrix_file_loads(pretrained_dir):
    a = ml.load_direction_matrix(
        "voxceleb", path=os.path.join(pretrained_dir,
                                      "A_matrix_voxceleb.pt"))
    assert a["weight"].shape == (512 * 8, 15)
    from stylegan_directions_face_reenactment_tpu.models.direction_matrix import (
        direction_matrix_forward)
    shift = direction_matrix_forward(a, jnp.ones((2, 15)))
    assert shift.shape == (2, 8, 512)


def test_face_model_files_load(pretrained_dir):
    sfd, fan = ml.load_face_models(
        sfd_path=os.path.join(pretrained_dir, "s3fd-619a316812.pth"),
        fan_path=os.path.join(pretrained_dir, "2DFAN4-11f355bf06.pth.tar"))
    from stylegan_directions_face_reenactment_tpu.models.face import (
        estimate_landmarks)
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (1, 128, 128, 3)).astype(np.float32))
    pts, ok, _ = jax.jit(
        lambda im: estimate_landmarks(sfd, fan, im))(imgs)
    assert pts.shape == (1, 68, 2)


def test_id_backbone_and_lpips_files_load(pretrained_dir):
    bb = ml.load_id_backbone(os.path.join(pretrained_dir,
                                          "model_ir_se50.pth"))
    lp = ml.load_lpips(os.path.join(pretrained_dir, "lpips_alex_v0.1.pth"))
    from stylegan_directions_face_reenactment_tpu.losses.id_loss import (
        extract_id_feats)
    from stylegan_directions_face_reenactment_tpu.losses.lpips import lpips
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 256, 256, 3),
                             minval=-1.0, maxval=1.0)
    feats = jax.jit(lambda x: extract_id_feats(bb, x))(img)
    assert np.isfinite(np.asarray(feats)).all()
    d = jax.jit(lambda x: lpips(lp, x, -x))(img)
    assert np.isfinite(float(d))


def test_deca_file_loads_and_reenact_step_runs(pretrained_dir):
    """The full file→pipeline chain: DECA .tar + FLAME .pkl + landmark
    npy through `load_deca`, then one e4e invert + reenact step with the
    file-loaded generator/A/face models."""
    deca = ml.load_deca(
        path=os.path.join(pretrained_dir, "deca_model.tar"),
        flame_path=os.path.join(pretrained_dir, "generic_model.pkl"),
        flame_lmk_path=os.path.join(pretrained_dir,
                                    "landmark_embedding.npy"))
    g = ml.load_generator("voxceleb",
                          path=os.path.join(pretrained_dir,
                                            "stylegan-voxceleb.pt"),
                          resolution=SIZE)
    e4e = ml.load_e4e("voxceleb",
                      path=os.path.join(pretrained_dir, "e4e-voxceleb.pt"),
                      resolution=SIZE)
    a = ml.load_direction_matrix(
        "voxceleb", path=os.path.join(pretrained_dir,
                                      "A_matrix_voxceleb.pt"))

    from stylegan_directions_face_reenactment_tpu.geometry import (
        initialize_directions)
    from stylegan_directions_face_reenactment_tpu.pipeline import (
        make_reenact_fn)
    from stylegan_directions_face_reenactment_tpu.pipeline.inversion import (
        invert_image)
    from stylegan_directions_face_reenactment_tpu.pipeline.reenactment import (
        source_shape)

    trunc = ml.compute_trunc(g, n=32)
    spec = initialize_directions("voxceleb", 15, 6.0)
    src = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3),
                             minval=-1.0, maxval=1.0)
    _, code = invert_image(src, e4e, g, truncation=0.7,
                           truncation_latent=trunc)
    assert code.shape == (1, n_latent_for(SIZE), 512)
    p_src, ang_src = source_shape(deca, src)
    fn = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                         truncation_latent=trunc)
    tgts = jax.random.uniform(jax.random.PRNGKey(2), (2, 256, 256, 3),
                              minval=-1.0, maxval=1.0)
    reen, lat = fn(code, p_src, ang_src, tgts)
    assert reen.shape == (2, SIZE, SIZE, 3)
    assert np.isfinite(np.asarray(reen)).all()
