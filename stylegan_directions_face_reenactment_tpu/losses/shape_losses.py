"""Geometry losses on FLAME vertices / landmarks + pixel losses.

Functional equivalents of `libs/criteria/losses.py` and
`libs/criteria/l2_loss.py` (reference).
"""

from __future__ import annotations

import jax.numpy as jnp

# landmark index pairs (68-landmark convention), `losses.py:36,53`
EYE_PAIRS = ((36, 39), (37, 41), (38, 40), (42, 45), (43, 47), (44, 46))
MOUTH_PAIRS = ((48, 54), (49, 59), (50, 58), (51, 57), (52, 56), (53, 55),
               (60, 64), (61, 67), (62, 66), (63, 65))


def pixel_wise_loss(images_shifted: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
    """Mean L1 (`losses.py:14-18`)."""
    return jnp.mean(jnp.abs(images - images_shifted))


def l2_loss(real: jnp.ndarray, generated: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error (`l2_loss.py:6-8`), used by PTI."""
    return jnp.mean(jnp.square(real - generated))


def shape_loss(shape_gt: jnp.ndarray, shape_reenacted: jnp.ndarray,
               normalize: bool = False) -> jnp.ndarray:
    """L1 over projected FLAME vertices (`losses.py:20-28`)."""
    if normalize:
        shape_gt = shape_gt / 200.0
        shape_reenacted = shape_reenacted / 200.0
    return jnp.mean(jnp.abs(shape_gt - shape_reenacted))


def _pair_distance_loss(gt: jnp.ndarray, pred: jnp.ndarray, pairs) -> jnp.ndarray:
    """Mean-over-pairs L1 of |lmk_a − lmk_b| distance vectors
    (`losses.py:30-62`)."""
    idx_a = jnp.asarray([p[0] for p in pairs])
    idx_b = jnp.asarray([p[1] for p in pairs])
    d_gt = jnp.abs(gt[:, idx_a, :] - gt[:, idx_b, :])     # (B, P, C)
    d_pr = jnp.abs(pred[:, idx_a, :] - pred[:, idx_b, :])
    # reference: per-pair L1Loss (mean over batch+coords), then mean over pairs
    return jnp.mean(jnp.abs(d_gt - d_pr))


def eye_loss(landmarks_gt: jnp.ndarray, landmarks_pred: jnp.ndarray) -> jnp.ndarray:
    return _pair_distance_loss(landmarks_gt, landmarks_pred, EYE_PAIRS)


def mouth_loss(landmarks_gt: jnp.ndarray, landmarks_pred: jnp.ndarray) -> jnp.ndarray:
    return _pair_distance_loss(landmarks_gt, landmarks_pred, MOUTH_PAIRS)
