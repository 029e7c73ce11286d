"""Image preprocessing: detect → landmarks → FFHQ crop → [-1,1] tensor.

Equivalent of `libs/utilities/utils_inference.py:61-82` (`preprocess_image`):
resize to width 1000 (ALWAYS — the reference upscales small inputs too, so
SFD sees large faces), run SFD+FAN landmarks, landmark-crop to 256,
normalize to [-1, 1]. The detector/landmark half runs batched on device;
the FFHQ crop (reflect-pad + fade) stays host-side like the reference.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp
from PIL import Image

from ..models.face import estimate_landmarks

Params = Dict[str, Any]

DETECT_WIDTH = 1000  # `utils_inference.py:67` image_resize(width=1000)


def resize_width(image: np.ndarray, width: int = DETECT_WIDTH) -> np.ndarray:
    """Rescale so the image width equals ``width`` (up- OR down-scaling,
    aspect preserved) — the reference's `image_resize(width=1000)`
    (`image_utils.py:36-66`, cv2.INTER_AREA). Uses cv2 when importable
    (exact); otherwise PIL (BOX ≈ area for downscale, BILINEAR for
    upscale — approximate, cv2's INTER_AREA upscale has its own weights)."""
    h, w = image.shape[:2]
    if w == width:
        return image
    r = width / float(w)
    dim = (width, int(h * r))
    try:
        import cv2
        return cv2.resize(image, dim, interpolation=cv2.INTER_AREA)
    except ImportError:
        resample = Image.BOX if width < w else Image.BILINEAR
        return np.array(Image.fromarray(image).resize(dim, resample))


def to_gan_range(image_uint8: np.ndarray) -> np.ndarray:
    """HWC uint8 → HWC float32 in [-1, 1] (the reference transform chain
    resize → ToTensor → Normalize(.5,.5,.5), `dataloader.py:31-34`)."""
    return image_uint8.astype(np.float32) / 127.5 - 1.0


def preprocess_batch_device(s3fd_params: Params, fan_params: Params,
                            frames_u8: jnp.ndarray, image_size: int = 256,
                            compute_dtype=None):
    """The whole preprocess as ONE jittable device program: SFD detect →
    FAN landmarks → FFHQ crop (fused cubic scale_and_translate) → [-1, 1].

    frames_u8: (B, H, W, 3) uint8/float RGB on device (uniform shape).
    Returns (crops_gan (B, s, s, 3) float32 in [-1,1], ok (B,) detection
    mask, in_frame (B,) — False where the crop box leaves the frame and the
    host pad+blur+fade path must take over — and the landmarks (B, 68, 2)
    for that fallback).
    """
    from ..models.face.cropping import ffhq_crop_device
    imgs = frames_u8.astype(jnp.float32)
    pts, ok, _ = estimate_landmarks(s3fd_params, fan_params, imgs,
                                    compute_dtype=compute_dtype)
    crops, in_frame = ffhq_crop_device(imgs, pts, image_size=image_size)
    return crops / 127.5 - 1.0, ok, in_frame, pts


def preprocess_images(s3fd_params: Params, fan_params: Params,
                      images: List[np.ndarray],
                      image_size: int = 256,
                      device_crop: bool = False,
                      return_landmarks: bool = False,
                      detect_width: Optional[int] = DETECT_WIDTH
                      ) -> Tuple[np.ndarray, ...]:
    """Batch preprocess: list of HWC uint8 RGB frames → (B, 256, 256, 3)
    float32 in [-1, 1] + validity mask (B,).

    ``detect_width``: rescale every frame to this width before detection
    (the reference does this unconditionally at 1000,
    `utils_inference.py:67` — small inputs are UPSCALED so SFD sees large
    faces). None/0 detects at the native frame size (faster; documented
    fast path — detection confidence can differ on small faces).

    Device part (detection + landmarks) is batched per unique input
    resolution. The FFHQ crop runs host-side by default (native threaded
    batch crop, PIL-exact box semantics); ``device_crop=True`` COMPUTES
    in-frame crops on device (fused cubic resample, ≲1 LSB mean deviation)
    and only routes out-of-frame boxes through the host pad+fade path.
    Note this function always returns host numpy (its list-of-frames
    contract), so device_crop saves the host crop WORK but not the
    device↔host transfer; the zero-round-trip variant is
    `preprocess_batch_device` (used fused into the bench/serving path).
    """
    resized = ([resize_width(im, detect_width) for im in images]
               if detect_width else [np.asarray(im) for im in images])

    # bucket by shape so each bucket is one fixed-shape device call
    buckets: Dict[Tuple[int, int], List[int]] = {}
    for i, im in enumerate(resized):
        buckets.setdefault(im.shape[:2], []).append(i)

    out = np.zeros((len(resized), image_size, image_size, 3), np.float32)
    lms = [None] * len(resized)
    ok = np.zeros(len(resized), bool)
    host_crop = [True] * len(resized)
    for shape, idxs in buckets.items():
        batch = jnp.asarray(np.stack([resized[i] for i in idxs]).astype(np.float32))
        if device_crop:
            crops_gan, valid, in_frame, pts = preprocess_batch_device(
                s3fd_params, fan_params, batch, image_size=image_size)
            in_frame = np.asarray(in_frame)
            crops_np = np.asarray(crops_gan)
            pts = np.asarray(pts)
            valid = np.asarray(valid)
            for j, i in enumerate(idxs):
                lms[i] = pts[j]
                ok[i] = bool(valid[j])
                if valid[j] and in_frame[j]:
                    out[i] = crops_np[j]
                    host_crop[i] = False
        else:
            pts, valid, _ = estimate_landmarks(s3fd_params, fan_params, batch)
            pts = np.asarray(pts)
            valid = np.asarray(valid)
            for j, i in enumerate(idxs):
                lms[i] = pts[j]
                ok[i] = bool(valid[j])

    det = [i for i in range(len(resized)) if ok[i] and host_crop[i]]
    if det:
        # native threaded batch crop (in-frame fast path; Python
        # pad+blur+fade fallback handled inside)
        from ..models.face.cropping import crop_using_landmarks_batch
        crops, crop_ok = crop_using_landmarks_batch(
            [resized[i] for i in det], [lms[i] for i in det],
            image_size=image_size)
        for j, i in enumerate(det):
            if crop_ok[j]:
                out[i] = to_gan_range(crops[j])
            else:
                ok[i] = False
    if not return_landmarks:
        return out, ok
    # single-detection pipelines: the raw landmarks mapped into crop
    # coordinates (same axis-aligned box on the device AND host crop
    # paths), so the DECA alignment can skip its own SFD+FAN pass
    from ..models.face.cropping import landmarks_in_crop
    lms_arr = np.stack([l if l is not None else np.zeros((68, 2), np.float32)
                        for l in lms]).astype(np.float32)
    lms_crop, _ = landmarks_in_crop(jnp.asarray(lms_arr),
                                    image_size=image_size)
    return out, ok, np.asarray(lms_crop)
