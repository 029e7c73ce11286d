"""torch state_dict → JAX pytree converters (the checkpoint boundary).

The reference ships torch checkpoints (`libs/configs/config_models.py:4-20`,
README download table): StyleGAN2 `g_ema`, e4e `e`, DECA `deca_model.tar`,
IR-SE50 `model_ir_se50.pth`, the trained A-matrix bundle, S3FD/FAN detector
weights, and LPIPS linear heads. These functions map each state_dict onto
our NHWC/HWIO pytrees. Key layout conventions:

  * conv weights: torch OIHW → HWIO transpose;
  * linear weights: (out, in) both sides — copied as-is;
  * BatchNorm: {weight, bias, running_mean, running_var} →
    {scale, offset, mean, var} (affine=False norms get scale=1/offset=0);
  * PReLU: per-channel slopes copied.

Inputs can be torch tensors or numpy arrays — everything is converted via
``np.asarray`` so torch is only an optional dependency at conversion time.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Mapping

import numpy as np
import jax.numpy as jnp

Params = Dict[str, Any]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_w(t) -> jnp.ndarray:
    """OIHW → HWIO."""
    return jnp.asarray(np.transpose(_np(t), (2, 3, 1, 0)))


def lin_w(t) -> jnp.ndarray:
    return jnp.asarray(_np(t))


def vec(t) -> jnp.ndarray:
    return jnp.asarray(_np(t))


def bn(sd: Mapping[str, Any], prefix: str, affine: bool = True) -> Params:
    c = _np(sd[f"{prefix}.running_mean"]).shape[0]
    return {
        "scale": vec(sd[f"{prefix}.weight"]) if affine else jnp.ones((c,), jnp.float32),
        "offset": vec(sd[f"{prefix}.bias"]) if affine else jnp.zeros((c,), jnp.float32),
        "mean": vec(sd[f"{prefix}.running_mean"]),
        "var": vec(sd[f"{prefix}.running_var"]),
    }


# ---------------------------------------------------------------------------
# StyleGAN2 generator (`libs/gan/StyleGAN2/model.py`; ckpt key layout
# documented by `convert_weight.py`)
# ---------------------------------------------------------------------------

def _modconv(sd, prefix) -> Params:
    # torch weight (1, out, in, kh, kw) → HWIO (kh, kw, in, out)
    w = _np(sd[f"{prefix}.weight"])[0]
    return {
        "weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "mod": {"weight": lin_w(sd[f"{prefix}.modulation.weight"]),
                "bias": vec(sd[f"{prefix}.modulation.bias"])},
    }


def _styled_conv(sd, prefix) -> Params:
    return {
        "conv": _modconv(sd, f"{prefix}.conv"),
        "noise_weight": vec(sd[f"{prefix}.noise.weight"]).reshape(()),
        "act_bias": vec(sd[f"{prefix}.activate.bias"]),
    }


def _to_rgb(sd, prefix) -> Params:
    return {
        "conv": _modconv(sd, f"{prefix}.conv"),
        "bias": vec(sd[f"{prefix}.bias"]).reshape(3),
    }


def convert_stylegan2_generator(sd: Mapping[str, Any], size: int = 256,
                                style_dim: int = 512,
                                channel_multiplier: int = 2) -> Params:
    """`g_ema` state_dict → generator pytree. Tolerates missing noise
    buffers (the 256 ckpt loads with strict=False, `run_inference.py:66-67`)
    by zero-filling them (noise_weight-scaled, so absent buffers at trained
    layers match torch's missing-buffer default of registered init)."""
    n_mlp = 0
    while f"style.{n_mlp + 1}.weight" in sd:
        n_mlp += 1
    style = [{"weight": lin_w(sd[f"style.{i + 1}.weight"]),
              "bias": vec(sd[f"style.{i + 1}.bias"])} for i in range(n_mlp)]

    log_size = int(math.log2(size))
    params: Params = {
        "style": style,
        "input": jnp.asarray(np.transpose(_np(sd["input.input"]), (0, 2, 3, 1))),
        "conv1": _styled_conv(sd, "conv1"),
        "to_rgb1": _to_rgb(sd, "to_rgb1"),
        "convs": [], "to_rgbs": [], "noises": [],
        "meta": {"size": size, "style_dim": style_dim,
                 "channel_multiplier": channel_multiplier},
    }
    n_layers = (log_size - 2) * 2 + 1
    for layer_idx in range(n_layers):
        res = (layer_idx + 5) // 2
        key = f"noises.noise_{layer_idx}"
        if key in sd:
            params["noises"].append(jnp.asarray(
                np.transpose(_np(sd[key]), (0, 2, 3, 1))))
        else:
            params["noises"].append(jnp.zeros((1, 2 ** res, 2 ** res, 1),
                                              jnp.float32))
    n_convs = (log_size - 2) * 2
    for i in range(n_convs):
        params["convs"].append(_styled_conv(sd, f"convs.{i}"))
    for i in range(log_size - 2):
        params["to_rgbs"].append(_to_rgb(sd, f"to_rgbs.{i}"))
    return params


# ---------------------------------------------------------------------------
# Direction matrix bundle (`libs/utilities/utils_train.py:592-603`)
# ---------------------------------------------------------------------------

def convert_direction_matrix(bundle: Mapping[str, Any]) -> Params:
    """Checkpoint bundle {step, A_matrix (state_dict), learned_directions,
    shift_scale, w_plus, num_layers_shift} → A pytree."""
    sd = bundle["A_matrix"] if "A_matrix" in bundle else bundle
    weight = lin_w(sd["linear.weight"])
    out_dim = weight.shape[0]
    w_plus = bool(bundle.get("w_plus", True))
    num_layers = int(bundle.get("num_layers_shift", 8))
    shift_dim = out_dim // num_layers if w_plus else out_dim
    p: Params = {"weight": weight,
                 "meta": {"shift_dim": shift_dim,
                          "input_dim": weight.shape[1],
                          "w_plus": w_plus, "num_layers": num_layers}}
    if "linear.bias" in sd:
        p["bias"] = vec(sd["linear.bias"])
    return p


# ---------------------------------------------------------------------------
# IR-SE blocks / ArcFace backbone / e4e
# ---------------------------------------------------------------------------

def _irse_block(sd, prefix) -> Params:
    p: Params = {
        "bn0": bn(sd, f"{prefix}.res_layer.0"),
        "conv1": conv_w(sd[f"{prefix}.res_layer.1.weight"]),
        "prelu": vec(sd[f"{prefix}.res_layer.2.weight"]),
        "conv2": conv_w(sd[f"{prefix}.res_layer.3.weight"]),
        "bn2": bn(sd, f"{prefix}.res_layer.4"),
    }
    if f"{prefix}.shortcut_layer.0.weight" in sd:
        p["shortcut"] = {"conv": conv_w(sd[f"{prefix}.shortcut_layer.0.weight"]),
                         "bn": bn(sd, f"{prefix}.shortcut_layer.1")}
        p["_meta"] = {"stride": _np(sd[f"{prefix}.res_layer.3.weight"]).shape,
                      "identity_shortcut": False}
    if f"{prefix}.res_layer.5.fc1.weight" in sd:
        p["se"] = {"fc1": conv_w(sd[f"{prefix}.res_layer.5.fc1.weight"]),
                   "fc2": conv_w(sd[f"{prefix}.res_layer.5.fc2.weight"])}
    return p


def _irse_body(sd, prefix="body") -> List[Params]:
    from ..models.irse import IRSE50_BLOCKS
    blocks = []
    for i, (in_c, depth, stride) in enumerate(IRSE50_BLOCKS):
        p = _irse_block(sd, f"{prefix}.{i}")
        p["_meta"] = {"stride": stride, "identity_shortcut": in_c == depth}
        blocks.append(p)
    return blocks


def _input_layer(sd, prefix="input_layer") -> Params:
    return {"conv": conv_w(sd[f"{prefix}.0.weight"]),
            "bn": bn(sd, f"{prefix}.1"),
            "prelu": vec(sd[f"{prefix}.2.weight"])}


def convert_irse_backbone(sd: Mapping[str, Any], input_size: int = 112,
                          affine: bool = False) -> Params:
    """model_ir_se50.pth → ArcFace backbone pytree (`model_irse.py:9-48`)."""
    return {
        "input": _input_layer(sd),
        "body": _irse_body(sd),
        "out_bn2d": bn(sd, "output_layer.0"),
        "out_linear": {"weight": lin_w(sd["output_layer.3.weight"]),
                       "bias": vec(sd["output_layer.3.bias"])},
        "out_bn1d": bn(sd, "output_layer.4", affine=affine),
        "meta": {"input_size": input_size, "affine": affine},
    }


def convert_e4e_encoder(sd: Mapping[str, Any],
                        image_resolution: int = 256) -> Params:
    """e4e 'e' state_dict → encoder pytree (`psp_encoders.py:122-199`)."""
    style_count = 2 * int(math.log2(image_resolution)) - 2
    styles = []
    for i in range(style_count):
        convs, biases = [], []
        j = 0
        while f"styles.{i}.convs.{j}.weight" in sd:
            convs.append(conv_w(sd[f"styles.{i}.convs.{j}.weight"]))
            biases.append(vec(sd[f"styles.{i}.convs.{j}.bias"]))
            j += 2  # interleaved LeakyReLU modules hold no params
        styles.append({"convs": convs, "biases": biases,
                       "linear": {"weight": lin_w(sd[f"styles.{i}.linear.weight"]),
                                  "bias": vec(sd[f"styles.{i}.linear.bias"])}})
    return {
        "input": _input_layer(sd),
        "body": _irse_body(sd),
        "styles": styles,
        "latlayer1": {"weight": conv_w(sd["latlayer1.weight"]),
                      "bias": vec(sd["latlayer1.bias"])},
        "latlayer2": {"weight": conv_w(sd["latlayer2.weight"]),
                      "bias": vec(sd["latlayer2.bias"])},
        "meta": {"style_count": style_count},
    }


# ---------------------------------------------------------------------------
# DECA (ResNet-50 encoders; `deca_model.tar` with E_flame/E_detail/D_detail)
# ---------------------------------------------------------------------------

def _resnet_bn(sd, prefix):
    return bn(sd, prefix)


def _resnet_bottleneck(sd, prefix, stride) -> Params:
    p: Params = {
        "conv1": conv_w(sd[f"{prefix}.conv1.weight"]),
        "bn1": _resnet_bn(sd, f"{prefix}.bn1"),
        "conv2": conv_w(sd[f"{prefix}.conv2.weight"]),
        "bn2": _resnet_bn(sd, f"{prefix}.bn2"),
        "conv3": conv_w(sd[f"{prefix}.conv3.weight"]),
        "bn3": _resnet_bn(sd, f"{prefix}.bn3"),
        "_meta": {"stride": stride},
    }
    if f"{prefix}.downsample.0.weight" in sd:
        p["downsample"] = {"conv": conv_w(sd[f"{prefix}.downsample.0.weight"]),
                           "bn": _resnet_bn(sd, f"{prefix}.downsample.1")}
    return p


def convert_resnet50(sd: Mapping[str, Any], prefix: str = "encoder") -> Params:
    from ..models.deca.resnet import RESNET50_LAYERS
    params: Params = {
        "conv1": conv_w(sd[f"{prefix}.conv1.weight"]),
        "bn1": _resnet_bn(sd, f"{prefix}.bn1"),
        "layers": [],
    }
    for li, blocks in enumerate(RESNET50_LAYERS):
        stage = []
        for b in range(blocks):
            stride = (1 if li == 0 else 2) if b == 0 else 1
            stage.append(_resnet_bottleneck(
                sd, f"{prefix}.layer{li + 1}.{b}", stride))
        params["layers"].append(stage)
    return params


def convert_resnet_encoder(sd: Mapping[str, Any]) -> Params:
    """DECA ResnetEncoder state_dict (keys encoder.* + layers.*)."""
    return {
        "resnet": convert_resnet50(sd, "encoder"),
        "fc1": {"weight": lin_w(sd["layers.0.weight"]),
                "bias": vec(sd["layers.0.bias"])},
        "fc2": {"weight": lin_w(sd["layers.2.weight"]),
                "bias": vec(sd["layers.2.bias"])},
    }


def convert_deca(checkpoint: Mapping[str, Any],
                 flame_params: Params) -> Params:
    """deca_model.tar {E_flame, E_detail, D_detail} → DECA pytree."""
    params: Params = {
        "e_flame": convert_resnet_encoder(checkpoint["E_flame"]),
        "flame": flame_params,
    }
    if "E_detail" in checkpoint:
        params["e_detail"] = convert_resnet_encoder(checkpoint["E_detail"])
    if "D_detail" in checkpoint:
        dd = checkpoint["D_detail"]
        convs, bns = [], []
        # conv_blocks indices: 0 bn, (2,3) conv/bn, ... pattern per decoders.py
        conv_idx = [2, 6, 10, 14, 18]
        bn_idx = [3, 7, 11, 15, 19]
        for ci, bi in zip(conv_idx, bn_idx):
            convs.append({"weight": conv_w(dd[f"conv_blocks.{ci}.weight"]),
                          "bias": vec(dd[f"conv_blocks.{ci}.bias"])})
            bns.append(bn(dd, f"conv_blocks.{bi}"))
        params["d_detail"] = {
            "l1": {"weight": lin_w(dd["l1.0.weight"]),
                   "bias": vec(dd["l1.0.bias"])},
            "bn0": bn(dd, "conv_blocks.0"),
            "convs": convs, "bns": bns,
            "conv_out": {"weight": conv_w(dd["conv_blocks.21.weight"]),
                         "bias": vec(dd["conv_blocks.21.bias"])},
            "meta": {"out_scale": 0.01},
        }
    return params


# ---------------------------------------------------------------------------
# S3FD detector (`libs/face_models/sfd/net_s3fd.py`; s3fd-619a316812.pth)
# ---------------------------------------------------------------------------

def convert_s3fd(sd: Mapping[str, Any]) -> Params:
    from ..models.face.s3fd import _TRUNK, _HEADS
    params: Params = {}
    for name, *_ in _TRUNK:
        params[name] = {"weight": conv_w(sd[f"{name}.weight"]),
                        "bias": vec(sd[f"{name}.bias"])}
    for name, *_ in _HEADS:
        params[name] = {"weight": conv_w(sd[f"{name}.weight"]),
                        "bias": vec(sd[f"{name}.bias"])}
    for name in ("conv3_3_norm", "conv4_3_norm", "conv5_3_norm"):
        params[name] = vec(sd[f"{name}.weight"])
    return params


# ---------------------------------------------------------------------------
# FAN landmark network (`libs/face_models/fan_model/models.py`; 2DFAN4)
# ---------------------------------------------------------------------------

def _fan_conv_block(sd, prefix) -> Params:
    p: Params = {
        "bn1": bn(sd, f"{prefix}.bn1"),
        "conv1": conv_w(sd[f"{prefix}.conv1.weight"]),
        "bn2": bn(sd, f"{prefix}.bn2"),
        "conv2": conv_w(sd[f"{prefix}.conv2.weight"]),
        "bn3": bn(sd, f"{prefix}.bn3"),
        "conv3": conv_w(sd[f"{prefix}.conv3.weight"]),
    }
    if f"{prefix}.downsample.0.weight" in sd:
        p["downsample"] = {"bn": bn(sd, f"{prefix}.downsample.0"),
                           "conv": conv_w(sd[f"{prefix}.downsample.2.weight"])}
    return p


def _fan_hourglass(sd, prefix, depth: int = 4) -> Params:
    levels = {}
    for level in range(depth, 0, -1):
        entry = {"b1": _fan_conv_block(sd, f"{prefix}.b1_{level}"),
                 "b2": _fan_conv_block(sd, f"{prefix}.b2_{level}"),
                 "b3": _fan_conv_block(sd, f"{prefix}.b3_{level}")}
        if level == 1:
            entry["b2_plus"] = _fan_conv_block(sd, f"{prefix}.b2_plus_{level}")
        levels[str(level)] = entry
    return {"levels": levels, "_meta": {"depth": depth}}


def convert_fan(sd: Mapping[str, Any], num_modules: int = 4) -> Params:
    p: Params = {
        "conv1": {"weight": conv_w(sd["conv1.weight"]),
                  "bias": vec(sd["conv1.bias"])},
        "bn1": bn(sd, "bn1"),
        "conv2": _fan_conv_block(sd, "conv2"),
        "conv3": _fan_conv_block(sd, "conv3"),
        "conv4": _fan_conv_block(sd, "conv4"),
        "modules": [],
        "meta": {"num_modules": num_modules},
    }
    for m in range(num_modules):
        mod = {
            "hg": _fan_hourglass(sd, f"m{m}"),
            "top_m": _fan_conv_block(sd, f"top_m_{m}"),
            "conv_last": {"weight": conv_w(sd[f"conv_last{m}.weight"]),
                          "bias": vec(sd[f"conv_last{m}.bias"])},
            "bn_end": bn(sd, f"bn_end{m}"),
            "l": {"weight": conv_w(sd[f"l{m}.weight"]),
                  "bias": vec(sd[f"l{m}.bias"])},
        }
        if m < num_modules - 1:
            mod["bl"] = {"weight": conv_w(sd[f"bl{m}.weight"]),
                         "bias": vec(sd[f"bl{m}.bias"])}
            mod["al"] = {"weight": conv_w(sd[f"al{m}.weight"]),
                         "bias": vec(sd[f"al{m}.bias"])}
        else:
            # the checkpoint's last module has no bl/al; zero-fill so all
            # modules share one pytree structure for the scanned forward
            # (`models/face/fan.py::fan_forward`; the result is discarded)
            mod["bl"] = {"weight": jnp.zeros((1, 1, 256, 256), jnp.float32),
                         "bias": jnp.zeros((256,), jnp.float32)}
            mod["al"] = {"weight": jnp.zeros((1, 1, 68, 256), jnp.float32),
                         "bias": jnp.zeros((256,), jnp.float32)}
        p["modules"].append(mod)
    return p
