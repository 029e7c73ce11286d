"""Checkpoint save/resume for the direction matrix A.

Bundle layout mirrors the reference (`libs/utilities/utils_train.py:592-603`):
{step, A_matrix, learned_directions, shift_scale, w_plus, num_layers_shift}.
Stored as .npz (pure numpy; no torch dependency at train time). The loader
also accepts reference torch .pt bundles via `weights/torch_convert.py`.

Known deviation (fixed on purpose): the reference's resume is broken — it
checks ``step in state_dict`` with step=0 instead of ``'step' in ...``
(`utils_train.py:585`), so resumed runs always restart at step 0. We
recover the step correctly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

Params = Dict[str, Any]


def save_a_matrix(models_dir: str, a_params: Params, step: int,
                  learned_directions: int, shift_scale: float,
                  w_plus: bool, num_layers_shift: int) -> str:
    os.makedirs(models_dir, exist_ok=True)
    path = os.path.join(models_dir, f"A_matrix_{step:06d}.npz")
    np.savez(path,
             step=step,
             weight=np.asarray(a_params["weight"]),
             bias=np.asarray(a_params.get("bias", np.zeros(0))),
             learned_directions=learned_directions,
             shift_scale=shift_scale,
             w_plus=w_plus,
             num_layers_shift=num_layers_shift)
    return path


def load_a_matrix(path: str) -> Tuple[int, Params, Dict[str, Any]]:
    """Load an .npz bundle (ours) or a torch .pt bundle (reference)."""
    if path.endswith(".npz"):
        z = np.load(path)
        weight = jnp.asarray(z["weight"])
        num_layers = int(z["num_layers_shift"])
        w_plus = bool(z["w_plus"])
        out_dim = weight.shape[0]
        params: Params = {
            "weight": weight,
            "meta": {"shift_dim": out_dim // num_layers if w_plus else out_dim,
                     "input_dim": weight.shape[1],
                     "w_plus": w_plus, "num_layers": num_layers},
        }
        if z["bias"].size:
            params["bias"] = jnp.asarray(z["bias"])
        meta = {"learned_directions": int(z["learned_directions"]),
                "shift_scale": float(z["shift_scale"]),
                "w_plus": w_plus, "num_layers_shift": num_layers}
        return int(z["step"]), params, meta

    # torch bundle
    import torch
    from ..weights.torch_convert import convert_direction_matrix
    bundle = torch.load(path, map_location="cpu")
    params = convert_direction_matrix(bundle)
    meta = {k: bundle.get(k) for k in ("learned_directions", "shift_scale",
                                       "w_plus", "num_layers_shift")}
    return int(bundle.get("step", 0)), params, meta


def start_from_checkpoint(resume_path: Optional[str]
                          ) -> Tuple[int, Optional[Params]]:
    """`utils_train.py:578-589` with the step-recovery bug fixed."""
    if resume_path is None or not os.path.isfile(resume_path):
        return 0, None
    step, params, _ = load_a_matrix(resume_path)
    return step, params
