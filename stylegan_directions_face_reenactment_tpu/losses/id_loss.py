"""Identity loss via the ArcFace IR-SE-50 embedding.

Functional equivalent of `libs/criteria/id_loss.py` (reference): crop the
face region (rows 35:223, cols 32:220 of the 256-image), pool to 112,
embed, and take 1 − cosine similarity (mean over the batch). The same
embedding gives the CSIM eval metric (`utils_train.py:729-731`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..models.irse import backbone_forward
from ..models.nn import adaptive_avg_pool2d

Params = Dict[str, Any]


def extract_id_feats(backbone_params: Params, x: jnp.ndarray,
                     crop: bool = True) -> jnp.ndarray:
    """x (B, 256, 256, 3) in [-1, 1] → (B, 512) unit id embedding
    (`id_loss.py:20-25`)."""
    if crop:
        x = x[:, 35:223, 32:220, :]
    x = adaptive_avg_pool2d(x, (112, 112))
    return backbone_forward(backbone_params, x)


def id_loss(backbone_params: Params, y_hat: jnp.ndarray, y: jnp.ndarray,
            crop: bool = True) -> jnp.ndarray:
    """mean(1 − cos(feat(y_hat), feat(y))); y is treated as constant
    (`id_loss.py:27-34`)."""
    fy = jax.lax.stop_gradient(extract_id_feats(backbone_params, y, crop))
    fyh = extract_id_feats(backbone_params, y_hat, crop)
    cos = jnp.sum(fy * fyh, axis=-1)  # embeddings are unit-norm
    return jnp.mean(1.0 - cos)


def csim(backbone_params: Params, y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Cosine-similarity eval metric = 1 − id_loss (`utils_train.py:729-731`)."""
    return 1.0 - id_loss(backbone_params, y_hat, y)
