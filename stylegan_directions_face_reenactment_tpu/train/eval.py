"""Evaluation metrics: CSIM, pose error, normalized expression error.

Functional equivalents of `libs/utilities/utils_train.py:695-732`
(`extract_evaluation_metrics`). The reference computes metrics only on
batch index [0] of each validation batch (a quirk of `:697-707`); ours is
batched over the whole batch by default with a ``batch0_only`` switch for
bit-faithful comparison.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from ..geometry.directions import DirectionsSpec
from ..losses.id_loss import id_loss

Params = Dict[str, Any]


def expression_error(spec: DirectionsSpec, params_shifted, params_target
                     ) -> jnp.ndarray:
    """Mean |Δ normalized coeff| over the learned expressions + jaw
    (`utils_train.py:709-722`). Returns (B,)."""
    errs = []
    for j in range(spec.num_expressions):
        lo, hi = spec.exp_min[j], spec.exp_max[j]
        # reference indexes exp coefficients by j directly (`:714-715`)
        t = (params_target["alpha_exp"][:, j] - lo) / (hi - lo)
        s = (params_shifted["alpha_exp"][:, j] - lo) / (hi - lo)
        errs.append(jnp.abs(s - t))
    t = (params_target["pose"][:, 3] - spec.jaw_min) / (spec.jaw_max - spec.jaw_min)
    s = (params_shifted["pose"][:, 3] - spec.jaw_min) / (spec.jaw_max - spec.jaw_min)
    errs.append(jnp.abs(s - t))
    return jnp.stack(errs, axis=-1).mean(axis=-1)


def pose_error(angles_shifted: jnp.ndarray, angles_target: jnp.ndarray
               ) -> jnp.ndarray:
    """Mean |Δangle| over yaw/pitch/roll in degrees (`:724-725`). (B,)."""
    return jnp.abs(angles_shifted - angles_target).mean(axis=-1)


def extract_evaluation_metrics(spec: DirectionsSpec, id_params: Params,
                               params_shifted, params_target,
                               angles_shifted, angles_target,
                               imgs_shifted, imgs_source, *,
                               batch0_only: bool = False
                               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns scalar (csim, pose_err, exp_err) over the batch (or batch[0]
    when ``batch0_only`` replicates the reference exactly)."""
    if batch0_only:
        sl = slice(0, 1)
        params_shifted = {k: v[sl] for k, v in params_shifted.items()}
        params_target = {k: v[sl] for k, v in params_target.items()}
        angles_shifted = angles_shifted[sl]
        angles_target = angles_target[sl]
        # reference still feeds the FULL batch to the id loss (`:729`)

    exp_err = expression_error(spec, params_shifted, params_target).mean()
    pose_err = pose_error(angles_shifted, angles_target).mean()
    csim = 1.0 - id_loss(id_params, imgs_shifted, imgs_source)
    return csim, pose_err, exp_err
