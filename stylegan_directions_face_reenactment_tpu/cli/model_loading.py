"""Checkpoint loading for the CLI entry points.

Loads the reference's torch checkpoints (README download table) through
`weights/torch_convert.py`, caching each converted pytree as .npz next to
the source file. `--random-init` builds randomly-initialized models instead
(smoke tests / environments without the pretrained files).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax

from ..configs.models_config import AUX_MODELS, MODELS
from ..utils.common import jit_build
from ..models import (init_generator, init_direction_matrix, init_e4e_encoder,
                      init_backbone, mean_latent)
from ..models.deca import init_deca, synthetic_flame_params
from ..models.face import init_s3fd, init_fan
from ..losses import init_lpips_alex

Params = Dict[str, Any]


def _torch_load(path: str):
    import torch
    return torch.load(path, map_location="cpu")


def load_generator(dataset_type: str = "voxceleb",
                   path: Optional[str] = None,
                   random_init: bool = False,
                   rng: Optional[jax.Array] = None,
                   resolution: Optional[int] = None) -> Params:
    cfg = MODELS[dataset_type]
    res = resolution or cfg["resolution"]
    if random_init:
        return jit_build(lambda k: init_generator(
            k, size=res, channel_multiplier=cfg["channel_multiplier"]),
            rng or jax.random.PRNGKey(0))
    from ..weights.torch_convert import convert_stylegan2_generator
    path = path or cfg["generator_path"]
    ckpt = _torch_load(path)
    sd = ckpt.get("g_ema", ckpt)
    return convert_stylegan2_generator(sd, size=res,
                                       channel_multiplier=cfg["channel_multiplier"])


def load_e4e(dataset_type: str = "voxceleb", path: Optional[str] = None,
             random_init: bool = False,
             rng: Optional[jax.Array] = None,
             resolution: Optional[int] = None) -> Params:
    cfg = MODELS[dataset_type]
    res = resolution or cfg["resolution"]
    if random_init:
        return jit_build(lambda k: init_e4e_encoder(k, image_resolution=res),
                         rng or jax.random.PRNGKey(1))
    from ..weights.torch_convert import convert_e4e_encoder
    path = path or cfg["e4e_path"]
    ckpt = _torch_load(path)
    sd = ckpt.get("e", ckpt)
    return convert_e4e_encoder(sd, image_resolution=res)


def load_direction_matrix(dataset_type: str = "voxceleb",
                          path: Optional[str] = None,
                          random_init: bool = False,
                          rng: Optional[jax.Array] = None) -> Params:
    if random_init:
        return init_direction_matrix(rng or jax.random.PRNGKey(2), 512, 15,
                                     w_plus=True, num_layers=8)
    from ..train.checkpoints import load_a_matrix
    path = path or MODELS[dataset_type]["directions_path"]
    _, params, _ = load_a_matrix(path)
    return params


def load_deca(path: Optional[str] = None, flame_path: Optional[str] = None,
              flame_lmk_path: Optional[str] = None,
              random_init: bool = False,
              rng: Optional[jax.Array] = None) -> Params:
    if random_init:
        return jit_build(lambda k: init_deca(k, synthetic_flame_params(
            jax.random.fold_in(k, 1), n_verts=5023, n_faces=9976),
            with_detail=False), rng or jax.random.PRNGKey(3))
    from ..weights.torch_convert import convert_deca
    from ..weights.flame_loader import load_flame_params
    flame = load_flame_params(flame_path or AUX_MODELS["flame"],
                              flame_lmk_path or AUX_MODELS["flame_landmarks"])
    ckpt = _torch_load(path or AUX_MODELS["deca"])
    return convert_deca(ckpt, flame)


def load_face_models(sfd_path: Optional[str] = None,
                     fan_path: Optional[str] = None,
                     random_init: bool = False,
                     rng: Optional[jax.Array] = None) -> Tuple[Params, Params]:
    if random_init:
        return jit_build(lambda k: (init_s3fd(k),
                                    init_fan(jax.random.fold_in(k, 1))),
                         rng or jax.random.PRNGKey(4))
    from ..weights.torch_convert import convert_s3fd, convert_fan
    sfd_sd = _torch_load(sfd_path or AUX_MODELS["sfd"])
    fan_ckpt = _torch_load(fan_path or AUX_MODELS["fan_2d"])
    fan_sd = fan_ckpt.get("state_dict", fan_ckpt)
    return convert_s3fd(sfd_sd), convert_fan(fan_sd)


def load_id_backbone(path: Optional[str] = None, random_init: bool = False,
                     rng: Optional[jax.Array] = None) -> Params:
    if random_init:
        return jit_build(init_backbone, rng or jax.random.PRNGKey(5))
    from ..weights.torch_convert import convert_irse_backbone
    return convert_irse_backbone(_torch_load(path or AUX_MODELS["ir_se50"]))


def load_lpips(path: Optional[str] = None, random_init: bool = False,
               rng: Optional[jax.Array] = None) -> Params:
    if random_init:
        return jit_build(init_lpips_alex, rng or jax.random.PRNGKey(6))
    from ..losses.lpips import convert_lpips_alex
    bundle = _torch_load(path or AUX_MODELS["lpips_alex"])
    return convert_lpips_alex(bundle["alex_features"], bundle["lin"])


def compute_trunc(g_params: Params, rng: Optional[jax.Array] = None,
                  n: int = 4096):
    return mean_latent(g_params, rng or jax.random.PRNGKey(42), n)
