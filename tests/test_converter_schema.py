"""Checkpoint-converter schema contracts (VERDICT round-1 item 10).

Each converter must consume the EXACT state_dict layout the reference's
torch modules produce, and emit a pytree whose structure + leaf shapes match
our random-init models — so real-checkpoint conversion breaks loudly in CI,
not at first load. The reference modules are instantiated live (read-only;
for StyleGAN2 the CUDA `op` extension module is replaced by a
parameter-faithful stub — `FusedLeakyReLU` owns a bias Parameter,
`fused_act.py:73-82` — so the state_dict layout is identical).
"""

import sys
import types

import numpy as np
import jax
import pytest
import torch
from torch import nn

from ref_loader import install_reference_path, state_dict_np

from stylegan_directions_face_reenactment_tpu.utils.common import jit_build
from stylegan_directions_face_reenactment_tpu.weights import torch_convert as tc


def _stub_modules(*names):
    """Stub ABSENT vision deps (skimage, torchvision, kornia, ...) that
    reference modules import at module level but never use for the
    state_dict layout we read. Deps that really import (e.g. cv2) are
    imported for real — registering an empty stub for an importable module
    would poison every later test that needs it (this bit the live crop
    parity tests in full-suite order once)."""
    import importlib
    for name in names:
        if name in sys.modules:
            continue
        try:
            importlib.import_module(name)
            continue
        except ImportError:
            pass
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        if "." in name:
            parent, child = name.rsplit(".", 1)
            _stub_modules(parent)
            setattr(sys.modules[parent], child, mod)


def _tree_schema(tree):
    """(treedef, sorted leaf shapes) — the structural contract."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return treedef, [np.shape(l) for l in leaves]


def assert_same_schema(converted, inited, name):
    td_c, shapes_c = _tree_schema(converted)
    td_i, shapes_i = _tree_schema(inited)
    assert td_c == td_i, (f"{name}: converted treedef != init treedef\n"
                          f"converted: {td_c}\ninit:      {td_i}")
    assert shapes_c == shapes_i, (
        f"{name}: leaf shapes differ: "
        f"{[(a, b) for a, b in zip(shapes_c, shapes_i) if a != b][:5]}")


# ---------------------------------------------------------------------------
# StyleGAN2 generator — g_ema layout (`model.py:361-539`)
# ---------------------------------------------------------------------------

def _load_reference_generator_class():
    """The REAL reference model on CPU via ref_loader's FUNCTIONAL op stub
    (shared with the full-forward parity tests — a schema-only stub whose
    functions return None poisons any later test that actually runs the
    Generator, because model.py binds `fused_leaky_relu` at import)."""
    from ref_loader import load_generator_module
    return load_generator_module().Generator


def test_stylegan2_generator_schema():
    Generator = _load_reference_generator_class()
    torch.manual_seed(0)
    size = 64  # same layer structure as 256, ~30x fewer weights
    gen = Generator(size, 512, 8, channel_multiplier=2)
    sd = state_dict_np(gen)
    converted = tc.convert_stylegan2_generator(sd, size=size,
                                               channel_multiplier=2)

    from stylegan_directions_face_reenactment_tpu.models import init_generator
    inited = jit_build(lambda k: init_generator(k, size=size,
                                                channel_multiplier=2),
                       jax.random.PRNGKey(0))
    assert_same_schema(converted, inited, "stylegan2_generator")

    # strict=False contract (`run_inference.py:66-67`): noise buffers may be
    # absent from the 256 ckpt; conversion must still succeed
    sd_no_noise = {k: v for k, v in sd.items() if not k.startswith("noises.")}
    converted2 = tc.convert_stylegan2_generator(sd_no_noise, size=size,
                                                channel_multiplier=2)
    assert_same_schema(converted2, inited, "stylegan2_generator(no noise)")


def test_direction_matrix_bundle_schema():
    """A-matrix bundle {step, A_matrix, learned_directions, shift_scale,
    w_plus, num_layers_shift} (`utils_train.py:592-603`)."""
    # the reference module uses np.product (removed in numpy 2) at import,
    # so reproduce its exact layout: one nn.Linear named `linear`
    # (`direction_matrix.py:28`) with out_dim = 512·num_layers in w+ space
    torch.manual_seed(0)
    a = nn.Linear(15, 512 * 8, bias=True)
    sd = {f"linear.{k}": v.numpy() for k, v in a.state_dict().items()}
    bundle = {"step": 1000, "A_matrix": sd,
              "learned_directions": 15, "shift_scale": 6.0,
              "w_plus": True, "num_layers_shift": 8}
    converted = tc.convert_direction_matrix(bundle)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_direction_matrix)
    inited = init_direction_matrix(jax.random.PRNGKey(0), 512, 15,
                                   w_plus=True, num_layers=8)
    assert_same_schema(converted, inited, "direction_matrix")


def test_irse_backbone_schema():
    from ref_loader import load_backbone_class
    Backbone = load_backbone_class()
    torch.manual_seed(0)
    bb = Backbone(input_size=112, num_layers=50, drop_ratio=0.6, mode="ir_se")
    converted = tc.convert_irse_backbone(state_dict_np(bb))
    from stylegan_directions_face_reenactment_tpu.models.irse import (
        init_backbone)
    inited = jit_build(init_backbone, jax.random.PRNGKey(0))
    assert_same_schema(converted, inited, "irse_backbone")


@pytest.mark.slow
def test_e4e_encoder_schema():
    from ref_loader import load_e4e_class
    E4E = load_e4e_class()
    torch.manual_seed(0)
    enc = E4E(50, "ir_se", 256)
    converted = tc.convert_e4e_encoder(state_dict_np(enc),
                                       image_resolution=256)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_e4e_encoder)
    inited = jit_build(lambda k: init_e4e_encoder(k, image_resolution=256),
                       jax.random.PRNGKey(0))
    assert_same_schema(converted, inited, "e4e_encoder")


def test_s3fd_schema():
    install_reference_path()
    _stub_modules("cv2", "skimage", "skimage.io", "matplotlib",
                  "matplotlib.pyplot")
    from libs.face_models.sfd.net_s3fd import s3fd
    torch.manual_seed(0)
    net = s3fd()
    converted = tc.convert_s3fd(state_dict_np(net))
    from stylegan_directions_face_reenactment_tpu.models.face import init_s3fd
    inited = jit_build(init_s3fd, jax.random.PRNGKey(0))
    assert_same_schema(converted, inited, "s3fd")


def test_fan_schema():
    install_reference_path()
    from libs.face_models.fan_model.models import FAN
    torch.manual_seed(0)
    net = FAN(num_modules=4)
    converted = tc.convert_fan(state_dict_np(net))
    from stylegan_directions_face_reenactment_tpu.models.face import init_fan
    inited = jit_build(init_fan, jax.random.PRNGKey(0))
    assert_same_schema(converted, inited, "fan")


def test_deca_checkpoint_schema():
    """deca_model.tar layout: {E_flame, E_detail, D_detail} state_dicts
    (`decalib/deca.py:67-98`), FLAME arrays supplied separately."""
    install_reference_path()
    _stub_modules("torchvision", "torchvision.models")
    from libs.DECA.decalib.models import resnet as ref_resnet
    from libs.DECA.decalib.models.decoders import Generator as DetailGen
    torch.manual_seed(0)

    def resnet_encoder_sd(outsize):
        # ResnetEncoder(outsize) layout (`encoders.py:22-33`) without its
        # torchvision pretrained download: encoder.* = ResNet-50 bottleneck
        # stack, layers.{0,2}.* = the 2048→1024→outsize MLP
        enc = ref_resnet.ResNet(ref_resnet.Bottleneck, [3, 4, 6, 3])
        sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
        l0, l2 = nn.Linear(2048, 1024), nn.Linear(1024, outsize)
        sd.update({f"layers.0.{k}": v for k, v in l0.state_dict().items()})
        sd.update({f"layers.2.{k}": v for k, v in l2.state_dict().items()})
        return {k: v.detach().numpy() for k, v in sd.items()}

    ckpt = {
        "E_flame": resnet_encoder_sd(236),
        "E_detail": resnet_encoder_sd(128),
        "D_detail": state_dict_np(DetailGen(latent_dim=128 + 53,
                                            out_channels=1, out_scale=0.01)),
    }
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    flame = synthetic_flame_params(jax.random.PRNGKey(1), n_verts=128,
                                   n_faces=200)
    converted = tc.convert_deca(ckpt, flame)
    inited = jit_build(lambda k: init_deca(k, flame, with_detail=True),
                       jax.random.PRNGKey(0))
    assert_same_schema(converted, inited, "deca")
