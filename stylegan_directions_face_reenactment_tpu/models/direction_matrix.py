"""Direction matrix A — the only trainable component.

Functional equivalent of `libs/models/direction_matrix.py` (reference): a
single linear map from the k-dim Δp vector (k=15 learned directions) to a
W+ latent shift (num_layers × 512 when ``w_plus``).

Checkpoint bundles mirror the reference's
(`libs/utilities/utils_train.py:592-603`): {step, A_matrix,
learned_directions, shift_scale, w_plus, num_layers_shift}.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def init_direction_matrix(key, shift_dim: int = 512, input_dim: int = 15,
                          *, w_plus: bool = True, num_layers: int = 8,
                          bias: bool = True,
                          initialization: str = "normal") -> Params:
    """Init A. ``normal``: N(0, 0.03) like `direction_matrix.py:31-32`;
    ``eye``: identity blocks per layer (`direction_matrix.py:33-39`)."""
    out_dim = shift_dim * num_layers if w_plus else shift_dim
    if initialization == "normal":
        weight = 0.03 * jax.random.normal(key, (out_dim, input_dim), jnp.float32)
    elif initialization == "eye":
        weight = jnp.zeros((out_dim, input_dim), jnp.float32)
        m = min(input_dim, out_dim)
        if w_plus:
            eye = jnp.eye(m, dtype=jnp.float32)
            for layer in range(num_layers):
                weight = weight.at[layer * shift_dim: layer * shift_dim + m, :m].set(eye)
        else:
            weight = weight.at[:m, :m].set(jnp.eye(m, dtype=jnp.float32))
    else:
        raise ValueError(f"unknown initialization {initialization!r}")

    params: Params = {"weight": weight}
    if bias:
        params["bias"] = jnp.zeros((out_dim,), jnp.float32)
    params["meta"] = {"shift_dim": shift_dim, "input_dim": input_dim,
                      "w_plus": w_plus, "num_layers": num_layers}
    return params


def direction_matrix_forward(params: Params, delta_p: jnp.ndarray) -> jnp.ndarray:
    """Δp (B, input_dim) → shift (B, num_layers, shift_dim) if w_plus else (B, shift_dim)."""
    meta = params["meta"]
    x = delta_p.reshape(-1, meta["input_dim"])
    out = jnp.dot(x, params["weight"].T, preferred_element_type=jnp.float32)
    if "bias" in params:
        out = out + params["bias"]
    if meta["w_plus"]:
        out = out.reshape(x.shape[0], meta["num_layers"], meta["shift_dim"])
    return out
