"""Image inversion via e4e (`libs/utilities/utils_inference.py:85-102`)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.e4e import e4e_forward
from .synthesis import generate_image

Params = Dict[str, Any]


def make_invert_fn(e4e_params: Params, g_params: Params,
                   truncation: float = 0.7,
                   truncation_latent: Optional[jnp.ndarray] = None,
                   resynthesize: bool = True):
    """Jitted batch inverter: images → (reconstruction, W+ codes). Weights
    ride as jit arguments (closure constants of this size overflow the
    tunneled remote-compile; see make_reenact_fn)."""
    from ..train.steps import merge_statics, strip_statics

    weights, statics = strip_statics((e4e_params, g_params,
                                      truncation_latent))

    @jax.jit
    def _fn(weights, images):
        e4e, g, trunc = merge_statics(weights, statics)
        return invert_image(images, e4e, g, truncation=truncation,
                            truncation_latent=trunc,
                            resynthesize=resynthesize)

    return lambda images: _fn(weights, images)


def invert_image(images: jnp.ndarray, e4e_params: Params, g_params: Params,
                 truncation: float = 0.7,
                 truncation_latent: Optional[jnp.ndarray] = None,
                 resynthesize: bool = True
                 ) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """images (B, 256, 256, 3) in [-1, 1] → (reconstruction, W+ codes).

    Matches `invert_image` (`utils_inference.py:85-102`): encoder → codes,
    then G([codes], input_is_latent=True) for the reconstruction.
    """
    codes = e4e_forward(e4e_params, images)
    if not resynthesize:
        return None, codes
    inv = generate_image(g_params, codes, truncation=truncation,
                         truncation_latent=truncation_latent,
                         input_is_latent=True)
    return inv, codes
