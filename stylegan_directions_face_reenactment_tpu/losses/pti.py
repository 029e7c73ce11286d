"""PTI (pivotal tuning inversion) loss kit.

Functional equivalents of `libs/criteria/PTI/base_coach.py:24-43` (calc_loss
= pt_l2_lambda·L2 + LPIPS) and `libs/criteria/PTI/localitly_regulizer.py`
(Space_Regulizer ball-holder, off by default), with the hyperparameters of
`libs/criteria/PTI/hyperparameters.py` as a dataclass.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .lpips import lpips
from .shape_losses import l2_loss


@dataclasses.dataclass(frozen=True)
class PTIHyperparams:
    """`PTI/hyperparameters.py` defaults."""
    pt_l2_lambda: float = 1.0
    pt_lpips_lambda: float = 1.0
    regulizer_l2_lambda: float = 0.1
    regulizer_lpips_lambda: float = 0.1
    regulizer_alpha: float = 10.0
    latent_ball_num_of_samples: int = 1
    use_locality_regularization: bool = False
    pti_learning_rate: float = 3e-4
    max_pti_steps: int = 350
    lpips_value_threshold: float = 0.06


def pti_loss(lpips_params: Dict[str, Any], generated: jnp.ndarray,
             real: jnp.ndarray, pt_l2_lambda: float = 100.0,
             pt_lpips_lambda: float = 1.0
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """loss = λ_l2·MSE + λ_lpips·LPIPS (`base_coach.py:24-43`; optimize_g
    uses λ_l2=100 for the partial-tune path, `optimization.py:36-40`)."""
    l2 = l2_loss(real, generated)
    lp = lpips(lpips_params, generated, real)
    return pt_l2_lambda * l2 + pt_lpips_lambda * lp, l2, lp


def get_morphed_w_code(new_w: jnp.ndarray, fixed_w: jnp.ndarray,
                       alpha: float = 10.0) -> jnp.ndarray:
    """fixed_w + α·(new−fixed)/‖new−fixed‖ (`localitly_regulizer.py:15-22`)."""
    direction = new_w - fixed_w
    norm = jnp.linalg.norm(direction)
    return fixed_w + alpha * direction / norm


def space_regularizer_loss(generator_forward: Callable, new_g_params,
                           original_g_params, lpips_params,
                           w_batch: jnp.ndarray, rng: jax.Array,
                           hp: PTIHyperparams = PTIHyperparams()) -> jnp.ndarray:
    """Ball-holder locality regularizer (`localitly_regulizer.py:27-54`):
    sample latents near the pivot, penalize drift of the tuned G from the
    original G there. `generator_forward(params, w_code)` must return the
    image for a (1, 512)-or-W+ code."""
    keys = jax.random.split(rng, hp.latent_ball_num_of_samples)
    total = 0.0
    for k in keys:
        z = jax.random.normal(k, (1, w_batch.shape[-1]))
        w_morphed = get_morphed_w_code(z, w_batch, hp.regulizer_alpha)
        new_img = generator_forward(new_g_params, w_morphed)
        old_img = jax.lax.stop_gradient(
            generator_forward(original_g_params, w_morphed))
        if hp.regulizer_l2_lambda > 0:
            total = total + hp.regulizer_l2_lambda * l2_loss(old_img, new_img)
        if hp.regulizer_lpips_lambda > 0:
            total = total + hp.regulizer_lpips_lambda * lpips(
                lpips_params, old_img, new_img)
    return total / hp.latent_ball_num_of_samples
