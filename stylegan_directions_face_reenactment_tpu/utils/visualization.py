"""Interpolation charts / GIFs (reference `libs/utilities/visualization.py`).

`make_interpolation_chart` sweeps each learned direction around a source
latent and assembles per-step frames; saved as an animated GIF via PIL
(the reference uses imageio, absent here).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax.numpy as jnp
from PIL import Image

from ..models.direction_matrix import direction_matrix_forward
from ..pipeline.synthesis import generate_image
from .image_utils import tensor_to_image

Params = Dict[str, Any]


def save_gif(frames: List[np.ndarray], path: str, fps: int = 15):
    """uint8 HWC frames → animated GIF (reference uses imageio.mimsave,
    `run_facial_editing.py:191-207`)."""
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=max(1, int(1000 / fps)), loop=0)


def make_interpolation_chart(g_params: Params, a_params: Params,
                             latent: jnp.ndarray, *,
                             truncation: float = 0.7,
                             truncation_latent: Optional[jnp.ndarray] = None,
                             num_layers_shift: int = 8,
                             directions: Optional[List[int]] = None,
                             shift_scale: float = 6.0, steps: int = 5,
                             input_is_latent: bool = True) -> List[np.ndarray]:
    """Per-direction shift sweeps → one frame per shift value, each frame a
    horizontal strip over directions (`visualization.py:21-73`)."""
    k = a_params["meta"]["input_dim"]
    if truncation_latent is None:
        truncation = 1.0  # no mean latent available → no truncation
    if directions is None:
        directions = list(range(k))
    values = np.linspace(-shift_scale, shift_scale, 2 * steps + 1)

    frames = []
    for v in values:
        dp = jnp.zeros((len(directions), k), jnp.float32)
        for row, d in enumerate(directions):
            dp = dp.at[row, d].set(float(v))
        shift = direction_matrix_forward(a_params, dp)
        codes = jnp.broadcast_to(latent, (len(directions),) + latent.shape[1:])
        imgs = generate_image(g_params, codes, truncation=truncation,
                              truncation_latent=truncation_latent,
                              w_plus=True, num_layers_shift=num_layers_shift,
                              shift_code=shift, input_is_latent=input_is_latent)
        strip = np.concatenate([tensor_to_image(im) for im in np.asarray(imgs)],
                               axis=1)
        frames.append(strip)
    return frames
