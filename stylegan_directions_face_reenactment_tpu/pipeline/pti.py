"""PTI-style per-identity generator fine-tuning as one jitted program.

TPU-first re-design of `libs/optimization.py:25-72` (`optimize_g`): the
reference runs 200 Python-loop Adam steps over the parameters of
`convs[4..11]` (the 64²–256² StyledConvs) with loss 100·L2 + LPIPS against
the real source image. Here the whole optimization is a `lax.scan` over
optax Adam updates inside a single jit — the tuned subset is the only
traced parameter pytree; everything else is closed over as constants.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses.pti import pti_loss
from .synthesis import generate_image

Params = Dict[str, Any]

TUNED_CONV_RANGE = (4, 12)  # convs[4..11] (`optimization.py:31-36`)


def split_tunable(g_params: Params, optimize_all: bool = False
                  ) -> Tuple[Params, Any]:
    """Return (tunable subtree, closure rebuilding full G params)."""
    if optimize_all:
        tunable = {k: v for k, v in g_params.items() if k != "meta"}

        def rebuild(t):
            return {**t, "meta": g_params["meta"]}

        return tunable, rebuild

    lo, hi = TUNED_CONV_RANGE
    tunable = {"convs": g_params["convs"][lo:hi]}

    def rebuild(t):
        convs = list(g_params["convs"])
        convs[lo:hi] = t["convs"]
        return {**g_params, "convs": convs}

    return tunable, rebuild


def optimize_g(g_params: Params, latent: jnp.ndarray, real_imgs: jnp.ndarray,
               lpips_params: Params, truncation_latent: jnp.ndarray, *,
               opt_steps: int = 200, lr: float = 3e-3,
               optimize_all: bool = False, truncation: float = 0.7,
               compute_dtype=jnp.float32) -> Tuple[Params, Dict[str, jnp.ndarray]]:
    """Fine-tune G on one (latent, image) pivot. Returns (tuned G params,
    final loss dict). latent: (B, n_latent, 512) W+; real_imgs (B, 256, 256, 3)
    in [-1, 1]."""
    pt_l2_lambda = 1.0 if optimize_all else 100.0  # `optimization.py:36-40`
    tunable, rebuild_host = split_tunable(g_params, optimize_all)

    tx = optax.adam(lr)

    # frozen weights ride as jit ARGUMENTS (baked-in constants of this size
    # overflow the tunneled remote-compile; see make_reenact_fn)
    from ..train.steps import merge_statics, strip_statics
    frozen, statics = strip_statics((g_params, lpips_params))

    @jax.jit
    def run(t0, frozen, latent, real_imgs, truncation_latent):
        g_full, lpips_p = merge_statics(frozen, statics)
        tun0, rebuild = split_tunable(g_full, optimize_all)
        del tun0  # t0 (the jit argument) is the traced tunable subtree

        def loss_fn(t):
            g = rebuild(t)
            imgs = generate_image(g, latent, truncation=truncation,
                                  truncation_latent=truncation_latent,
                                  input_is_latent=True,
                                  compute_dtype=compute_dtype)
            if imgs.shape[1] != real_imgs.shape[1]:
                # generate_image pools >256 outputs to 256 like the
                # reference (`generic.py:148-151`), so production shapes
                # always match the 256 pivot crop; this branch covers
                # sub-256 (test-scale) generators
                from ..models.nn import resize_bilinear
                imgs = resize_bilinear(imgs, real_imgs.shape[1:3])
            total, l2v, lp = pti_loss(lpips_p, imgs, real_imgs,
                                      pt_l2_lambda=pt_l2_lambda)
            return total, (l2v, lp)

        opt_state = tx.init(t0)

        def step(carry, _):
            t, s = carry
            (total, (l2v, lp)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(t)
            updates, s = tx.update(grads, s, t)
            t = optax.apply_updates(t, updates)
            return (t, s), (total, l2v, lp)

        (t_final, _), history = jax.lax.scan(step, (t0, opt_state),
                                             None, length=opt_steps)
        return t_final, history

    t_final, (totals, l2s, lps) = run(tunable, frozen, latent, real_imgs,
                                      truncation_latent)
    tuned = rebuild_host(t_final)
    return tuned, {"loss": totals[-1], "l2_loss": l2s[-1],
                   "lpips_loss": lps[-1], "loss_history": totals}
