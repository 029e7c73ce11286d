"""DECA: 3D face shape regression (encoder + FLAME decode), TPU-native.

Functional equivalent of `libs/DECA/decalib/deca.py` and
`libs/DECA/estimate_DECA.py` (reference). Differences by design:

  * `extract_DECA_params` in the reference loops over the batch in Python,
    one FAN-detect + warp + ResNet encode per image
    (`estimate_DECA.py:30-53`). Here the whole batch is encoded in one
    jitted program; the face-alignment warp happens upstream in the
    pipeline (`pipeline/preprocess.py`) and is also batched.
  * The mesh rasterizer (`decalib/utils/renderer.py`) is visualization-only
    in the reference (never on the training path) and is not reimplemented.
  * `encode` is differentiable (the reference deliberately leaves
    `@torch.no_grad()` commented out, `deca.py:150-151`) — gradients flow
    loss → FLAME → ResNet → image → StyleGAN → A.

Parameter split: 236 = shape 100 + tex 50 + exp 50 + pose 6 + cam 3 + light 27
(`decalib/utils/config.py:34-40`). Input images are (B, 224, 224, 3) RGB in
[0, 1] (`decalib/datasets/datasets.py:80` divides by 255).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...geometry.rotations import (batch_axis2euler, batch_orth_proj, rad2deg)
from ..nn import (batch_norm, conv2d, leaky_relu, linear, relu, tanh,
                  resize_bilinear)
from .flame import flame_forward, synthetic_flame_params
from .resnet import init_resnet50, resnet50_features

Params = Dict[str, Any]

PARAM_SPLIT = (("shape", 100), ("tex", 50), ("exp", 50), ("pose", 6),
               ("cam", 3), ("light", 27))
N_PARAM = sum(n for _, n in PARAM_SPLIT)  # 236
N_DETAIL = 128
IMAGE_SIZE = 224


def init_resnet_encoder(key, outsize: int) -> Params:
    """ResNet-50 + MLP(2048→1024→ReLU→outsize) (`models/encoders.py:22-40`)."""
    k1, k2, k3 = jax.random.split(key, 3)
    lim1 = 1.0 / jnp.sqrt(2048.0)
    lim2 = 1.0 / jnp.sqrt(1024.0)
    return {
        "resnet": init_resnet50(k1),
        "fc1": {"weight": jax.random.uniform(k2, (1024, 2048), jnp.float32,
                                             -lim1, lim1),
                "bias": jnp.zeros((1024,), jnp.float32)},
        "fc2": {"weight": jax.random.uniform(k3, (outsize, 1024), jnp.float32,
                                             -lim2, lim2),
                "bias": jnp.zeros((outsize,), jnp.float32)},
    }


def resnet_encoder_forward(p: Params, images: jnp.ndarray) -> jnp.ndarray:
    feats = resnet50_features(p["resnet"], images)
    h = relu(linear(feats, p["fc1"]["weight"], p["fc1"]["bias"]))
    return linear(h, p["fc2"]["weight"], p["fc2"]["bias"])


def init_detail_generator(key, latent_dim: int = N_DETAIL + 53,
                          out_channels: int = 1) -> Params:
    """Displacement-map decoder (`decalib/models/decoders.py:19-56`);
    loaded but unused on the pipeline path — included for parity."""
    keys = jax.random.split(key, 8)
    chans = [(128, 128), (128, 64), (64, 64), (64, 32), (32, 16)]

    def conv_init(k, cin, cout, ksize=3):
        lim = 1.0 / jnp.sqrt(cin * ksize * ksize)
        return {"weight": jax.random.uniform(k, (ksize, ksize, cin, cout),
                                             jnp.float32, -lim, lim),
                "bias": jnp.zeros((cout,), jnp.float32)}

    def bn_init(c):
        return {"scale": jnp.ones((c,)), "offset": jnp.zeros((c,)),
                "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

    lim = 1.0 / jnp.sqrt(latent_dim)
    return {
        "l1": {"weight": jax.random.uniform(keys[0], (128 * 64, latent_dim),
                                            jnp.float32, -lim, lim),
               "bias": jnp.zeros((128 * 64,), jnp.float32)},
        "bn0": bn_init(128),
        "convs": [conv_init(keys[i + 1], cin, cout) for i, (cin, cout)
                  in enumerate(chans)],
        "bns": [bn_init(cout) for _, cout in chans],
        "conv_out": conv_init(keys[7], 16, out_channels),
        "meta": {"out_scale": 0.01},
    }


def detail_generator_forward(p: Params, noise: jnp.ndarray) -> jnp.ndarray:
    out = linear(noise, p["l1"]["weight"], p["l1"]["bias"])
    out = out.reshape(out.shape[0], 8, 8, 128)
    out = batch_norm(out, p["bn0"])
    for conv, bn in zip(p["convs"], p["bns"]):
        out = resize_bilinear(out, (out.shape[1] * 2, out.shape[2] * 2))
        out = conv2d(out, conv["weight"], conv["bias"], padding=1)
        out = leaky_relu(batch_norm(out, bn, eps=0.8), 0.2)
    out = conv2d(out, p["conv_out"]["weight"], p["conv_out"]["bias"], padding=1)
    return tanh(out) * p["meta"]["out_scale"]


def init_deca(key, flame_params: Optional[Params] = None,
              with_detail: bool = True) -> Params:
    """DECA parameter bundle: E_flame (+E_detail/D_detail) + FLAME data."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params: Params = {
        "e_flame": init_resnet_encoder(k1, N_PARAM),
        "flame": flame_params if flame_params is not None
                 else synthetic_flame_params(k2),
    }
    if with_detail:
        params["e_detail"] = init_resnet_encoder(k3, N_DETAIL)
        params["d_detail"] = init_detail_generator(k4)
    return params


def decompose_code(code: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """236-vector → {shape, tex, exp, pose, cam, light} (`deca.py:100-112`)."""
    out = {}
    start = 0
    for key, n in PARAM_SPLIT:
        out[key] = code[:, start:start + n]
        start += n
    out["light"] = out["light"].reshape(out["light"].shape[0], 9, 3)
    return out


def deca_encode(params: Params, images: jnp.ndarray,
                with_detail: bool = False) -> Dict[str, jnp.ndarray]:
    """images (B, 224, 224, 3) in [0,1] → coefficient dict (`deca.py:151-158`).

    The ResNet-50 follows the input dtype (bf16 images → bf16 trunk); the
    regressed coefficient vector is always returned in f32 — everything
    downstream (Δp maps, FLAME, losses) is f32 math."""
    code = resnet_encoder_forward(params["e_flame"], images).astype(jnp.float32)
    codedict = decompose_code(code)
    if with_detail and "e_detail" in params:
        codedict["detail"] = resnet_encoder_forward(
            params["e_detail"], images).astype(jnp.float32)
    return codedict


def deca_decode(params: Params, codedict: Dict[str, jnp.ndarray],
                image_size: int = IMAGE_SIZE
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Coefficients → (landmarks2d, landmarks3d, trans_verts) in image coords
    (`deca.py:229-239`): weak-perspective projection, y(-and-z) flip, scale
    to the 224 image frame."""
    verts, landmarks2d, landmarks3d = flame_forward(
        params["flame"], codedict["shape"], codedict["exp"], codedict["pose"])

    half = image_size / 2.0

    lm2d = batch_orth_proj(landmarks2d, codedict["cam"])[:, :, :2]
    lm2d = lm2d.at[:, :, 1:].multiply(-1.0)
    lm2d = lm2d * half + half

    lm3d = batch_orth_proj(landmarks3d, codedict["cam"])
    lm3d = lm3d.at[:, :, 1:].multiply(-1.0)
    lm3d = lm3d * half + half

    tverts = batch_orth_proj(verts, codedict["cam"])
    tverts = tverts.at[:, :, 1:].multiply(-1.0)
    tverts = tverts * half + half
    return lm2d, lm3d, tverts


def calculate_shape(params: Params, coefficients: Dict[str, jnp.ndarray]
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(landmarks2d, landmarks3d, trans_verts) from a coefficient dict with
    keys {shape, exp, pose, cam} (`estimate_DECA.py:55-57`)."""
    return deca_decode(params, coefficients)


def extract_deca_params(params: Params, images224: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                   jnp.ndarray, jnp.ndarray]:
    """Batched coefficient extraction (`estimate_DECA.py:30-53`).

    images224: already face-aligned (B, 224, 224, 3) RGB in [0, 1]
    (alignment is done upstream, batched). Returns
    (pose (B,6), shape (B,100), exp (B,50), angles_deg (B,3), cam (B,3)).
    """
    codedict = deca_encode(params, images224)
    angles = rad2deg(batch_axis2euler(codedict["pose"][:, :3]))
    return (codedict["pose"], codedict["shape"], codedict["exp"], angles,
            codedict["cam"])


def calculate_shapemodel(params: Params, images: jnp.ndarray,
                         image_space: str = "gan",
                         align_fn=None,
                         image_size: int = IMAGE_SIZE,
                         compute_dtype=None
                         ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """GAN-range ([-1,1]) or [0,255] images → coefficient dict + angles
    (`libs/utilities/generic.py:22-34`). DECA consumes [0,1] at 224.

    ``align_fn`` maps [0,1] images to 224-aligned crops. The reference
    FAN-detects and similarity-warps each image
    (`decalib/datasets/datasets.py:57-86`); pass
    `pipeline.alignment.make_fan_align(fan)` for that behavior (the
    default on the training/eval/inference paths when a FAN model is
    loaded). Fallback: bilinear resize to ``image_size`` (the fast path;
    also lets tiny-shape dry runs shrink the ResNet-50 graph).

    ``compute_dtype``: run the ResNet-50 encoder trunk in this dtype (the
    production serving path uses bf16, matching the alignment nets and the
    synthesis stack); coefficients always come back f32. Default None
    keeps f32 end to end (the training default and exact parity).
    """
    if image_space == "gan":
        # reference chain: torch_range_1_to_255 (with its /(2+1e-5) epsilon,
        # `image_utils.py:87-94`) then /255 inside the DECA dataset warp
        images = (jnp.clip(images, -1.0, 1.0) + 1.0) / 2.00001
    elif image_space == "255":
        images = images / 255.0
    ok = None
    if align_fn is not None:
        images = align_fn(images)
        if isinstance(images, tuple):
            images, ok = images
    elif images.shape[1] != image_size or images.shape[2] != image_size:
        images = resize_bilinear(images, (image_size, image_size))
    if compute_dtype is not None:
        images = images.astype(compute_dtype)
    p, shp, exp, angles, cam = extract_deca_params(params, images)
    if ok is not None:
        # reference behavior on failed detection: coefficients stay zero and
        # the angles carry a -180° sentinel (`estimate_DECA.py:33-51`)
        m = ok[:, None]
        p, shp, exp, cam = (jnp.where(m, t, 0.0) for t in (p, shp, exp, cam))
        angles = jnp.where(m, angles, -180.0)
    return {"pose": p, "alpha_shp": shp, "alpha_exp": exp, "cam": cam}, angles
