"""The training loss stack (shape + identity + perceptual [+ pixel/w-reg]).

Functional equivalents of `libs/utilities/utils_train.py:376-499`
(`calculate_losses`, `calculate_losses_paired`). Notable replicated
behaviors:
  * the camera is forced to [8, 0, 0] for BOTH coefficient sets before the
    FLAME decode so landmark losses are pose-comparable (`:392-394,405-406`);
  * the paired path feeds LPIPS and pixel-L1 with [0, 255]-range images
    (`:438-439,483`) unlike the unpaired path ([-1, 1]);
  * comparison targets are stop-gradient'ed like the reference `.detach()`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.directions import DirectionsSpec, get_params_gt_reenacted
from ..losses.id_loss import id_loss
from ..losses.lpips import lpips
from ..losses.shape_losses import (eye_loss, mouth_loss, pixel_wise_loss,
                                   shape_loss)
from ..models.deca.deca import calculate_shape

Params = Dict[str, Any]


def _fixed_cam(batch: int) -> jnp.ndarray:
    return jnp.tile(jnp.asarray([[8.0, 0.0, 0.0]], jnp.float32), (batch, 1))


def _shape_losses(deca_params: Params, coeff_gt: Dict[str, jnp.ndarray],
                  coeff_reen: Dict[str, jnp.ndarray], lambdas) -> Tuple:
    lm2d_gt, _, shape_gt = calculate_shape(deca_params, coeff_gt)
    lm2d_re, _, shape_re = calculate_shape(deca_params, coeff_reen)
    l_shape = lambdas["lambda_shape"] * shape_loss(shape_gt, shape_re)
    l_mouth = lambdas["lambda_mouth_shape"] * mouth_loss(lm2d_gt, lm2d_re)
    l_eye = lambdas["lambda_eye_shape"] * eye_loss(lm2d_gt, lm2d_re)
    return l_shape, l_mouth, l_eye


def calculate_losses(deca_params: Params, id_params: Params,
                     lpips_params: Params, spec: DirectionsSpec,
                     lambdas: Dict[str, float],
                     params_source, angles_source, params_shifted,
                     params_target, shift_vector, target_indices,
                     imgs_source, imgs_shifted, *,
                     disentanglement_50: bool = True
                     ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Unpaired loss (`utils_train.py:376-433`)."""
    loss_dict: Dict[str, jnp.ndarray] = {}
    total = 0.0
    b = imgs_shifted.shape[0]

    if lambdas["lambda_shape"] > 0:
        if disentanglement_50:
            gt = get_params_gt_reenacted(spec, params_source, params_target,
                                         shift_vector, target_indices,
                                         angles_source)
            gt_pose, gt_exp = gt["pose"], gt["exp"]
        else:
            gt_pose = params_target["pose"]
            gt_exp = params_target["alpha_exp"]

        coeff_gt = {"pose": jax.lax.stop_gradient(gt_pose),
                    "exp": jax.lax.stop_gradient(gt_exp),
                    "cam": _fixed_cam(b),
                    "shape": jax.lax.stop_gradient(params_source["alpha_shp"])}
        coeff_reen = {"pose": params_shifted["pose"],
                      "shape": params_shifted["alpha_shp"],
                      "exp": params_shifted["alpha_exp"],
                      "cam": _fixed_cam(b)}
        l_shape, l_mouth, l_eye = _shape_losses(deca_params, coeff_gt,
                                                coeff_reen, lambdas)
        loss_dict["loss_shape"] = l_shape
        loss_dict["loss_eye"] = l_eye
        loss_dict["loss_mouth"] = l_mouth
        total = total + l_shape + l_mouth + l_eye

    if lambdas["lambda_identity"] != 0:
        l_id = lambdas["lambda_identity"] * id_loss(
            id_params, imgs_shifted, jax.lax.stop_gradient(imgs_source))
        loss_dict["loss_identity"] = l_id
        total = total + l_id

    if lambdas["lambda_perceptual"] != 0:
        l_lp = lambdas["lambda_perceptual"] * lpips(
            lpips_params, imgs_shifted, jax.lax.stop_gradient(imgs_source))
        loss_dict["loss_perceptual"] = l_lp
        total = total + l_lp

    loss_dict["loss"] = total
    return total, loss_dict


def calculate_losses_paired(deca_params: Params, id_params: Params,
                            lpips_params: Params,
                            lambdas: Dict[str, float],
                            params_shifted, params_target,
                            imgs_shifted, imgs_target,
                            shifted_latents: Optional[jnp.ndarray] = None,
                            target_w: Optional[jnp.ndarray] = None
                            ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Paired loss vs the real target frame (`utils_train.py:435-499`)."""
    loss_dict: Dict[str, jnp.ndarray] = {}
    total = 0.0
    b = imgs_shifted.shape[0]

    # [0, 255]-range quirk of the paired path (`:438-439`), through the
    # reference's exact torch_range_1_to_255 (incl. its /(2+1e-5) epsilon)
    from ..utils.image_utils import torch_range_1_to_255
    shifted_255 = torch_range_1_to_255(imgs_shifted)
    target_255 = torch_range_1_to_255(imgs_target)

    if lambdas["lambda_shape"] > 0:
        coeff_gt = {"pose": jax.lax.stop_gradient(params_target["pose"]),
                    "exp": jax.lax.stop_gradient(params_target["alpha_exp"]),
                    "cam": _fixed_cam(b),
                    "shape": jax.lax.stop_gradient(params_target["alpha_shp"])}
        coeff_reen = {"pose": params_shifted["pose"],
                      "shape": params_shifted["alpha_shp"],
                      "exp": params_shifted["alpha_exp"],
                      "cam": _fixed_cam(b)}
        l_shape, l_mouth, l_eye = _shape_losses(deca_params, coeff_gt,
                                                coeff_reen, lambdas)
        loss_dict["loss_shape"] = l_shape
        loss_dict["loss_eye"] = l_eye
        loss_dict["loss_mouth"] = l_mouth
        total = total + l_shape + l_mouth + l_eye

    if lambdas["lambda_identity"] != 0:
        l_id = lambdas["lambda_identity"] * id_loss(
            id_params, imgs_shifted, jax.lax.stop_gradient(imgs_target))
        loss_dict["loss_identity"] = l_id
        total = total + l_id

    if lambdas["lambda_perceptual"] != 0:
        l_lp = lambdas["lambda_perceptual"] * lpips(
            lpips_params, shifted_255, jax.lax.stop_gradient(target_255))
        loss_dict["loss_perceptual"] = l_lp
        total = total + l_lp

    if lambdas["lambda_pixel_wise"] != 0:
        l_px = lambdas["lambda_pixel_wise"] * pixel_wise_loss(
            shifted_255, jax.lax.stop_gradient(target_255))
        loss_dict["loss_pixel_wise"] = l_px
        total = total + l_px

    if lambdas.get("lambda_w_reg", 0.0) != 0 and shifted_latents is not None:
        l_w = lambdas["lambda_w_reg"] * jnp.mean(
            jnp.abs(shifted_latents - target_w))
        loss_dict["loss_w_reg"] = l_w
        total = total + l_w

    loss_dict["loss"] = total
    return total, loss_dict
