"""Latent-shift application and image generation helpers.

Functional equivalents of `libs/utilities/generic.py:116-152`
(`get_shifted_latent_code`, `generate_image`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..models.nn import adaptive_avg_pool2d
from ..models.stylegan2 import generator_forward, mapping, n_latent_for

Params = Dict[str, Any]


def get_shifted_latent_code(g_params: Params, z: jnp.ndarray,
                            shift: jnp.ndarray, *,
                            input_is_latent: bool = False,
                            w_plus: bool = True,
                            num_layers: Optional[int] = None) -> jnp.ndarray:
    """Add a direction shift to a latent code (`generic.py:116-135`).

    z: (B, 512) z/w or (B, n_latent, 512) W+. shift: (B, num_layers, 512)
    when w_plus else (B, 512).
    Returns the shifted W+ code (B, n_latent, 512).
    """
    n_lat = n_latent_for(g_params["meta"]["size"])
    if not input_is_latent:
        w = mapping(g_params, z)
        latent = jnp.repeat(w[:, None, :], n_lat, axis=1)
    else:
        latent = z if z.ndim == 3 else jnp.repeat(z[:, None, :], n_lat, axis=1)

    if not w_plus:
        if num_layers is None:
            latent = latent + shift[:, None, :]
        else:
            latent = latent.at[:, :num_layers, :].add(shift[:, None, :])
    else:
        latent = latent.at[:, :shift.shape[1], :].add(shift)
    return latent


def generate_image(g_params: Params, latent_code: jnp.ndarray, *,
                   truncation: float = 1.0,
                   truncation_latent: Optional[jnp.ndarray] = None,
                   w_plus: bool = True, num_layers_shift: int = 8,
                   shift_code: Optional[jnp.ndarray] = None,
                   input_is_latent: bool = False,
                   return_latents: bool = False,
                   compute_dtype=jnp.float32):
    """Synthesize, optionally applying a direction shift; outputs pooled to
    256 when larger (`generic.py:137-152`)."""
    if shift_code is None:
        img, lat = generator_forward(
            g_params, [latent_code], truncation=truncation,
            truncation_latent=truncation_latent,
            input_is_latent=input_is_latent, return_latents=return_latents,
            compute_dtype=compute_dtype)
    else:
        shifted = get_shifted_latent_code(
            g_params, latent_code, shift_code, input_is_latent=input_is_latent,
            w_plus=w_plus, num_layers=num_layers_shift)
        img, lat = generator_forward(
            g_params, [shifted], truncation=truncation,
            truncation_latent=truncation_latent, input_is_latent=True,
            return_latents=return_latents, compute_dtype=compute_dtype)

    if img.shape[1] > 256:
        img = adaptive_avg_pool2d(img, (256, 256))
    if return_latents:
        return img, lat
    return img
