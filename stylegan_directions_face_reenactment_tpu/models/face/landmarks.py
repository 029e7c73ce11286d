"""Landmark estimation orchestration: S3FD detect → crop → FAN → coords.

TPU-first re-design of `libs/face_models/landmarks_estimation.py`
(reference `LandmarksEstimation`): the reference crops with host-side numpy
(`fan_model/utils.py:140-165` crop_torch), runs FAN per face and refines
heatmap peaks with per-landmark python loops; here the whole path is one
batched jittable program:

  1. best face box per image (from `s3fd.detect_faces`);
  2. center/scale from the box (center.y -= 0.12·box_h; scale =
     (w+h)/reference_scale with reference_scale=195,
     `landmarks_estimation.py:143-150`, `sfd/sfd_detector.py`);
  3. affine crop to 256 (the 200·scale box convention of
     `fan_model/utils.py:63-97`) — bilinear warp instead of integer-slice
     copy (sub-pixel, differentiable);
  4. FAN heatmaps → vectorized sub-pixel peaks → image coords.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .fan import fan_forward, heatmaps_to_landmarks, landmarks_to_image_coords
from .s3fd import detect_faces

Params = Dict[str, Any]

REFERENCE_SCALE = 195.0  # `sfd/sfd_detector.py` (face-alignment convention)
CROP_RESOLUTION = 256.0


def box_to_center_scale(box: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """box (..., 4+) [x1, y1, x2, y2] → center (..., 2), scale (...,)
    (`landmarks_estimation.py:145-150`)."""
    cx = (box[..., 2] + box[..., 0]) / 2.0
    cy = (box[..., 3] + box[..., 1]) / 2.0
    cy = cy - (box[..., 3] - box[..., 1]) * 0.12
    scale = (box[..., 2] - box[..., 0] + box[..., 3] - box[..., 1]) / REFERENCE_SCALE
    return jnp.stack([cx, cy], axis=-1), scale


def crop_transform(center: jnp.ndarray, scale: jnp.ndarray,
                   resolution: float = CROP_RESOLUTION) -> jnp.ndarray:
    """(B,2),(B,) → (B, 3, 3) src→dst affine: dst = res/h·(src − center) + res/2
    with h = 200·scale (`fan_model/utils.py:63-97`)."""
    b = center.shape[0]
    h = 200.0 * scale
    s = resolution / h
    zeros = jnp.zeros((b,), jnp.float32)
    ones = jnp.ones((b,), jnp.float32)
    tx = resolution * (-center[:, 0] / h + 0.5)
    ty = resolution * (-center[:, 1] / h + 0.5)
    rows = jnp.stack([
        jnp.stack([s, zeros, tx], axis=-1),
        jnp.stack([zeros, s, ty], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ], axis=1)
    return rows


def crop_faces(images: jnp.ndarray, center: jnp.ndarray, scale: jnp.ndarray,
               resolution: int = 256) -> jnp.ndarray:
    """Batched 200·scale face crop, bit-matching the reference's
    `crop_torch` (`fan_model/utils.py:141-165`): crop corners come from the
    inverse transform TRUNCATED to int (`transform(...).int()`,
    ul = trunc(c − h/2 + h/res), br = trunc(c + h/2)), the integer patch is
    zero-padded outside the frame, then resized to ``resolution`` with
    torch bilinear interpolate semantics (half-pixel centers,
    align_corners=False, no antialias — what torchvision Resize does on
    tensors in the reference's torch-1.7 era; src clamped to the patch).
    A continuous affine instead would shift sampling by the fractional
    corner (≤1 px) + the half-pixel convention — enough to flip FAN argmax
    cells (4 image px each). Runs as two MXU einsums; images (B, H, W, C)
    in any range (values preserved)."""
    from ..nn import warp_from_coords
    res = float(resolution)
    h = 200.0 * scale                                      # (B,)
    ul_x = jnp.trunc(center[:, 0] - h / 2.0 + h / res)
    ul_y = jnp.trunc(center[:, 1] - h / 2.0 + h / res)
    br_x = jnp.trunc(center[:, 0] + h / 2.0)
    br_y = jnp.trunc(center[:, 1] + h / 2.0)
    wp = br_x - ul_x                                       # patch size (B,)
    hp = br_y - ul_y
    dst = jnp.arange(resolution, dtype=jnp.float32) + 0.5  # pixel centers
    # src in patch coords, clamped to the patch like F.interpolate, then
    # shifted to absolute image coords (patch pixel p == image ul + p)
    sx = jnp.clip(dst[None] * (wp[:, None] / res) - 0.5, 0.0,
                  wp[:, None] - 1.0) + ul_x[:, None]
    sy = jnp.clip(dst[None] * (hp[:, None] / res) - 0.5, 0.0,
                  hp[:, None] - 1.0) + ul_y[:, None]
    return warp_from_coords(images, sy, sx)


def select_reference_face(boxes: jnp.ndarray, valid: jnp.ndarray,
                          conf_thresh: float = 0.99
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick the face the reference would: `detect_landmarks` iterates the
    NMS-kept list (score-descending) and OVERWRITES `landmarks[0]` for
    every face above the confidence gate (`landmarks_estimation.py:
    203-208`) — so the LAST (lowest-scoring) face above 0.99 wins, not the
    best. Identical to best-box selection for single-face frames.

    boxes (B, K, 5) best-first, valid (B, K) → (box (B, 5), ok (B,))."""
    passing = valid & (boxes[..., 4] > conf_thresh)        # (B, K)
    k = boxes.shape[1]
    # index of the last True per row (0 when none — masked by ok)
    idx = (k - 1) - jnp.argmax(passing[:, ::-1], axis=1)
    ok = jnp.any(passing, axis=1)
    box = jnp.take_along_axis(boxes, jnp.where(ok, idx, 0)[:, None, None],
                              axis=1)[:, 0]
    return box, ok


def estimate_landmarks(s3fd_params: Params, fan_params: Params,
                       images_rgb255: jnp.ndarray,
                       conf_thresh: float = 0.99,
                       compute_dtype=None,
                       detector_input: str = "vendored"
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full batched pipeline: (B, H, W, 3) RGB 0-255 → landmarks (B, 68, 2)
    in image coords, validity mask (B,), heatmaps (B, 64, 64, 68).

    ``detector_input`` — the reference runs SFD with TWO input conventions:
      * "vendored" (default — this function rebuilds the vendored
        `landmarks_estimation.py`): the preprocessing path's
        `detect_from_batch` → `batch_detect` feeds the RAW RGB 0-255
        tensor straight to the net (`sfd/detect.py:36-45` has no mean
        subtraction or BGR flip; only the UNUSED single-image `detect()`
        helper at `sfd/detect.py:21` normalizes);
      * "fa": the pip face_alignment package (the DECA `detectors.FAN`
        path) flips RGB→BGR and subtracts the [104,117,123] mean inside
        its batch_detect.
    FAN consumes the [0,1] crop in both (`landmarks_estimation.py:152-153`).
    Detection is stop_gradient'ed: boxes are constants to autodiff, exactly
    like the reference (detection runs under no_grad).

    ``compute_dtype``: run the (HBM-bound) S3FD+FAN forwards in this dtype —
    bf16 halves their traffic; the outputs are stop-gradient crop metadata,
    so sub-pixel rounding only jitters downstream crop boxes by <1 px.
    Default None keeps f32 (exact reference parity).
    """
    if detector_input == "fa":
        det_in, sub_mean = images_rgb255[..., ::-1], True
    elif detector_input == "vendored":
        det_in, sub_mean = images_rgb255, False
    else:
        raise ValueError(f"unknown detector_input {detector_input!r}")
    det_in = jax.lax.stop_gradient(det_in)
    if compute_dtype is not None:
        det_in = det_in.astype(compute_dtype)
    boxes, valid = detect_faces(s3fd_params, det_in, subtract_mean=sub_mean)
    boxes = boxes.astype(jnp.float32)
    best, ok = select_reference_face(boxes, valid, conf_thresh)
    best = jax.lax.stop_gradient(best)

    center, scale = box_to_center_scale(best)
    crops = crop_faces(images_rgb255, center, scale, 256) / 255.0
    if compute_dtype is not None:
        crops = crops.astype(compute_dtype)
    heatmaps = fan_forward(fan_params, crops)[-1].astype(jnp.float32)
    # heatmaps_to_landmarks == the reference's `preds` exactly as fed to
    # the inverse transform (1-based argmax ± 0.25 refine, then −0.5);
    # adding anything here shifts every landmark by h/64 in image space
    pts_hm = heatmaps_to_landmarks(heatmaps)
    pts_img = landmarks_to_image_coords(pts_hm, center, scale)
    return pts_img, ok, heatmaps


def estimate_landmarks_3d(s3fd_params: Params, fan_params: Params,
                          depth_params: Params, images_rgb255: jnp.ndarray,
                          conf_thresh: float = 0.99):
    """3D variant (`landmarks_estimation.py` type='3D'): 2D landmarks plus
    depths from the ResNetDepth net fed with the crop + per-landmark
    gaussian heatmaps (`:165-181`). Returns ((B, 68, 3), valid mask).
    Detector input follows the vendored convention (raw RGB, no mean —
    see `estimate_landmarks`); the 3D path only exists in the vendored
    module."""
    from .fan import predict_depth

    boxes, valid = detect_faces(s3fd_params,
                                jax.lax.stop_gradient(images_rgb255),
                                subtract_mean=False)
    best = jax.lax.stop_gradient(boxes[:, 0])
    ok = valid[:, 0] & (best[:, 4] > conf_thresh)

    center, scale = box_to_center_scale(best)
    crops = crop_faces(images_rgb255, center, scale, 256) / 255.0
    heatmaps = fan_forward(fan_params, crops)[-1]
    pts_hm = heatmaps_to_landmarks(heatmaps)
    pts_img = landmarks_to_image_coords(pts_hm, center, scale)
    # reference: `pts.view(68, 2) * 4` — the same post-(−0.5) preds feed
    # the depth net's gaussians (`landmarks_estimation.py:166-171`)
    depth = predict_depth(depth_params, crops, pts_hm, scale)
    return jnp.concatenate([pts_img, depth[..., None]], axis=-1), ok
