"""DECA face alignment: FAN bbox → similarity warp to 224, batched.

Faithful equivalent of the reference DECA preprocessing
(`libs/DECA/decalib/datasets/datasets.py:44-86`): detect a face bbox from
FAN landmarks, convert to (center, size) with the kpt68 rule, build the
similarity transform sending the source square to the 224 frame, and
bilinear-warp. The reference runs this per image in a Python loop with
skimage+kornia; here it's one batched jittable program. The bbox is
stop-gradient'ed (constants to autodiff) while the warp itself stays
differentiable in the image — matching the reference's grad flow.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..models.face.fan import fan_forward, heatmaps_to_landmarks, landmarks_to_image_coords
from ..models.nn import resize_bilinear, scale_translate_warp

Params = Dict[str, Any]

DECA_CROP = 224
DECA_SCALE = 1.25  # `datasets.py:33`


def kpt68_center_size(landmarks: jnp.ndarray):
    """bbox2point(type='kpt68') (`datasets.py:47-49`): old_size =
    (w + h)/2 · 1.1, center = bbox center. landmarks: (B, 68, 2)."""
    mins = landmarks.min(axis=1)
    maxs = landmarks.max(axis=1)
    left, top = mins[:, 0], mins[:, 1]
    right, bottom = maxs[:, 0], maxs[:, 1]
    old_size = (right - left + bottom - top) / 2.0 * 1.1
    center = jnp.stack([right - (right - left) / 2.0,
                        bottom - (bottom - top) / 2.0], axis=-1)
    return center, old_size


def warp_to_224(images01: jnp.ndarray, center: jnp.ndarray,
                old_size: jnp.ndarray) -> jnp.ndarray:
    """Similarity warp of the (center, 1.25·old_size) square to 224
    (`datasets.py:70-80`). images01: (B, H, W, 3) in [0, 1].
    The reference truncates the box side to int (`size =
    int(old_size*self.scale)`, `datasets.py:69`) before fitting the
    3-point similarity to the [0, 223] corners."""
    size = jnp.trunc(old_size * DECA_SCALE)
    s = (DECA_CROP - 1.0) / jnp.maximum(size, 1.0)
    tx = -(center[:, 0] - size / 2.0) * s
    ty = -(center[:, 1] - size / 2.0) * s
    return scale_translate_warp(images01, s, tx, ty, (DECA_CROP, DECA_CROP))


def landmark_align(images01: jnp.ndarray, landmarks: jnp.ndarray,
                   ok: jnp.ndarray = None):
    """DECA alignment from PRECOMPUTED kpt68 landmarks (single-detection
    pipelines: the preprocessing stage already ran SFD+FAN on the raw
    frame; its landmarks, mapped into crop coordinates, feed the kpt68
    bbox directly instead of re-detecting on the crop like the reference
    does). Same bbox/warp math as `make_fan_align`, same whole-frame
    fallback + ok mask on failures. Returns (aligned224, ok)."""
    b, h = images01.shape[0], images01.shape[1]
    lms = jax.lax.stop_gradient(landmarks.astype(jnp.float32))
    if ok is None:
        ok = jnp.ones((b,), bool)
    center, old_size = kpt68_center_size(lms)
    center = jnp.where(ok[:, None], center, h / 2.0)
    old_size = jnp.where(ok, old_size, h / DECA_SCALE)
    return warp_to_224(images01, center, old_size), ok


def make_fan_align(fan_params: Params, s3fd_params: Params = None,
                   compute_dtype=None, return_ok: bool = False):
    """Batched DECA aligner: [0,1] images (any square size) → (B, 224, 224, 3).

    With ``s3fd_params`` (the default wiring on every CLI path) this is the
    faithful reference pipeline: the reference's `detectors.FAN` wraps the
    `face_alignment` package — SFD detect → 200·scale crop → FAN → landmarks
    in original coords (`decalib/datasets/detectors.py:23-42`; the crop math
    is the reference's own `landmarks_estimation.py:143-153`, identical to
    face_alignment's) — then kpt68 bbox → similarity warp to 224
    (`decalib/datasets/datasets.py:44-80`). On images where no face passes
    the confidence gate, the whole frame maps to 224 and the caller masks
    via ``return_ok`` (the reference skips DECA and writes a −180 sentinel,
    `estimate_DECA.py:48-51` — `calculate_shapemodel` replicates that when
    the aligner returns the mask).

    Without ``s3fd_params`` ('fan_frame' mode): FAN runs directly on the
    256 frame with a fixed center/scale — cheaper (no detector pass), and
    near-identical for FFHQ-cropped faces, which are centered by
    construction; a documented deviation for off-center faces.

    ``compute_dtype``: run the (HBM-bound) detector/FAN forwards in this
    dtype — bf16 halves their traffic; the landmark peaks are stop-gradient
    crop metadata, so sub-pixel rounding only jitters the crop box by <1 px.
    Default None keeps f32 (exact reference parity)."""

    def align(images01: jnp.ndarray):
        b, h = images01.shape[0], images01.shape[1]
        im256 = images01 if h == 256 else resize_bilinear(images01, (256, 256))
        if s3fd_params is not None:
            from ..models.face.landmarks import estimate_landmarks
            # detector_input="fa": this path rebuilds the pip
            # face_alignment detector DECA wraps (detectors.py:23-42),
            # which flips RGB→BGR and mean-subtracts inside batch_detect —
            # unlike the vendored preprocessing detector (raw RGB)
            lms, ok, _ = estimate_landmarks(
                s3fd_params, fan_params,
                jax.lax.stop_gradient(im256) * 255.0,
                compute_dtype=compute_dtype, detector_input="fa")
        else:
            fan_in = jax.lax.stop_gradient(im256)
            if compute_dtype is not None:
                fan_in = fan_in.astype(compute_dtype)
            heat = fan_forward(fan_params, fan_in)[-1].astype(jnp.float32)
            pts = heatmaps_to_landmarks(heat)
            # FAN ran on the full 256 frame: center (128,128), scale 256/200
            lms = landmarks_to_image_coords(
                pts, jnp.tile(jnp.asarray([[128.0, 128.0]]), (b, 1)),
                jnp.full((b,), 256.0 / 200.0))
            ok = jnp.ones((b,), bool)
        if h != 256:
            lms = lms * (h / 256.0)
        lms = jax.lax.stop_gradient(lms)
        center, old_size = kpt68_center_size(lms)
        # detection-failure fallback: warp the whole frame (size→h) so the
        # batch shape stays static; downstream masks by ``ok``
        center = jnp.where(ok[:, None], center, h / 2.0)
        old_size = jnp.where(ok, old_size, h / DECA_SCALE)
        aligned = warp_to_224(images01, center, old_size)
        return (aligned, ok) if return_ok else aligned

    return align
