"""Single-attribute facial editing: direction sweeps.

Equivalent of `run_facial_editing.py:158-207` (reference `interpolate`):
for one direction, sweep the shift from −6−start to +6−start in steps of
0.6, generating one image per step. The whole sweep is one batched jitted
synthesis call instead of a per-step loop.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..geometry.directions import DirectionsSpec, get_direction_info
from ..models.direction_matrix import direction_matrix_forward
from .synthesis import generate_image

Params = Dict[str, Any]


def one_hot_shift(k: int, direction_index: int,
                  values: jnp.ndarray) -> jnp.ndarray:
    """(S,) sweep values → (S, k) Δp one-hot rows (`libs/utilities/utils.py:62-65`)."""
    return jnp.zeros((values.shape[0], k), jnp.float32).at[:, direction_index].set(values)


def sweep_direction(g_params: Params, a_params: Params, spec: DirectionsSpec,
                    source_code: jnp.ndarray, direction_index: int,
                    params_source: Dict[str, np.ndarray],
                    angles_source: np.ndarray, *,
                    shifts_count: int = 10,
                    truncation: float = 0.7,
                    truncation_latent: Optional[jnp.ndarray] = None,
                    num_layers_shift: int = 8,
                    input_is_latent: bool = True
                    ) -> Tuple[str, np.ndarray, jnp.ndarray]:
    """Sweep one direction for one source.

    Returns (direction name, sweep shift values (S,), images (S, 256, 256, 3)).
    """
    name, start, mn, mx, step = get_direction_info(
        spec, direction_index, params_source, angles_source,
        shifts_count=shifts_count)
    values = np.arange(mn, mx, step, dtype=np.float32)
    dp = one_hot_shift(spec.learned_directions, direction_index,
                       jnp.asarray(values))
    shift = direction_matrix_forward(a_params, dp)          # (S, L, 512)

    codes = jnp.broadcast_to(source_code, (len(values),) + source_code.shape[1:])
    imgs = generate_image(g_params, codes, truncation=truncation,
                          truncation_latent=truncation_latent, w_plus=True,
                          num_layers_shift=num_layers_shift, shift_code=shift,
                          input_is_latent=input_is_latent)
    return name, values, imgs
