"""Pretrained checkpoint registry (reference `libs/configs/config_models.py`).

Paths point at the torch checkpoints from the reference README download
table; `weights/torch_convert.py` maps them to our pytrees (cached as .npz
next to the source file on first load).
"""

from __future__ import annotations

import os

PRETRAINED_ROOT = os.environ.get("REENACT_PRETRAINED_ROOT", "./pretrained_models")

MODELS = {
    "voxceleb": {
        "resolution": 256,
        "generator_path": os.path.join(PRETRAINED_ROOT, "stylegan-voxceleb.pt"),
        "e4e_path": os.path.join(PRETRAINED_ROOT, "e4e-voxceleb.pt"),
        "directions_path": os.path.join(PRETRAINED_ROOT,
                                        "A_matrix_voxceleb.pt"),
        "channel_multiplier": 1,
    },
    "ffhq": {
        "resolution": 1024,
        "generator_path": os.path.join(PRETRAINED_ROOT, "stylegan2-ffhq-config-f.pt"),
        "e4e_path": os.path.join(PRETRAINED_ROOT, "e4e_ffhq_encode.pt"),
        "directions_path": os.path.join(PRETRAINED_ROOT, "A_matrix_ffhq.pt"),
        "channel_multiplier": 2,
    },
}

AUX_MODELS = {
    "sfd": os.path.join(PRETRAINED_ROOT, "s3fd-619a316812.pth"),
    "fan_2d": os.path.join(PRETRAINED_ROOT, "2DFAN4-11f355bf06.pth.tar"),
    "ir_se50": os.path.join(PRETRAINED_ROOT, "model_ir_se50.pth"),
    "deca": os.path.join(PRETRAINED_ROOT, "deca_model.tar"),
    "flame": os.path.join(PRETRAINED_ROOT, "generic_model.pkl"),
    "flame_landmarks": os.path.join(PRETRAINED_ROOT, "landmark_embedding.npy"),
    "lpips_alex": os.path.join(PRETRAINED_ROOT, "lpips_alex_v0.1.pth"),
}
