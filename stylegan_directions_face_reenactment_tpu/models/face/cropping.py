"""FFHQ-style landmark-driven cropping.

Host-side (numpy/PIL/scipy) equivalent of
`libs/face_models/ffhq_cropping.py` (reference) — "correct preprocessing
... is important" (reference README). The crop: center = landmark-bbox
center with y lifted by size/6, square of side 2·size, reflect-padded with
a blur + median fade where the box leaves the frame, bicubic-resized
to 256.

This runs on the host data path (like the reference), feeding the batched
device pipeline; a jittable central-crop variant for in-frame boxes lives
in `landmarks.crop_faces`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.ndimage
from PIL import Image


def _pad_and_fade(img: np.ndarray, x1: int, x2: int, y1: int, y2: int,
                  crop_box) -> tuple:
    """Reflect-pad to fit the crop box, then blur+median fade the padded
    border (`ffhq_cropping.py:13-37`)."""
    h0, w0 = img.shape[:2]
    top = -min(0, y1)
    bottom = max(y2 - h0, 0)
    left = -min(0, x1)
    right = max(x2 - w0, 0)
    img_p = np.pad(img, ((top, bottom), (left, right), (0, 0)), mode="reflect")

    y2 += top
    y1 += top
    x2 += left
    x1 += left

    pad = np.array([max(-crop_box[0], 0), max(-crop_box[1], 0),
                    max(crop_box[2] - w0, 0), max(crop_box[3] - h0, 0)],
                   dtype=np.float32)
    pad[pad == 0] = 1e-10

    h, w = img_p.shape[:2]
    y, x, _ = np.ogrid[:h, :w, :1]
    mask = np.maximum(
        1.0 - np.minimum(np.float32(x) / pad[0], np.float32(w - 1 - x) / pad[2]),
        1.0 - np.minimum(np.float32(y) / pad[1], np.float32(h - 1 - y) / pad[3]))

    out = img_p.astype(np.float32)
    blur = 5.0
    out += (scipy.ndimage.gaussian_filter(out, [blur, blur, 0]) - out) * \
        np.clip(mask * 3.0 + 1.0, 0.0, 1.0)
    out += (np.median(out, axis=(0, 1)) - out) * np.clip(mask, 0.0, 1.0)
    return out, x1, x2, y1, y2


def crop_from_bbox(img: np.ndarray, bbox) -> np.ndarray:
    """Crop (x1, y1, x2, y2), padding+fading when out of frame
    (`ffhq_cropping.py:39-47`)."""
    x1, y1, x2, y2 = bbox
    if x1 < 0 or y1 < 0 or x2 > img.shape[1] or y2 > img.shape[0]:
        img, x1, x2, y1, y2 = _pad_and_fade(img, x1, x2, y1, y2, bbox)
    return img[y1:y2, x1:x2]


def crop_using_landmarks(image: np.ndarray,
                         landmarks: np.ndarray,
                         image_size: int = 256) -> Optional[np.ndarray]:
    """(H, W, 3) uint8 image + (68, 2) landmarks → (256, 256, 3) uint8 crop,
    or None on degenerate landmarks (`ffhq_cropping.py:49-69`)."""
    landmarks = np.asarray(landmarks, dtype=np.float64)
    center = ((landmarks.min(0) + landmarks.max(0)) / 2).round().astype(int)
    size = int(max(landmarks[:, 0].max() - landmarks[:, 0].min(),
                   landmarks[:, 1].max() - landmarks[:, 1].min()))
    if size <= 0:
        return None
    center[1] -= size // 6

    crop_box = (int(center[0] - size), int(center[1] - size),
                int(center[0] + size), int(center[1] + size))
    cropped = crop_from_bbox(image, crop_box)
    if cropped.size == 0:
        return None
    img = Image.fromarray(np.clip(cropped, 0, 255).astype(np.uint8))
    img = img.resize((image_size, image_size), Image.BICUBIC)
    return np.array(img)


def crop_using_landmarks_batch(images, landmarks_list, image_size: int = 256):
    """Batch FFHQ crop: native threaded fast path for in-frame boxes
    (`native/reenact_io.cpp::rio_ffhq_crop_batch`), Python slow path
    (reflect-pad + blur + median fade) for the rest.

    images: list/array of (H, W, 3) uint8 (uniform shape for the native
    path; mixed shapes fall back per image); landmarks_list: (B, 68, 2).
    Returns (crops (B, image_size, image_size, 3) uint8, ok (B,) bool).
    """
    b = len(images)
    out = np.zeros((b, image_size, image_size, 3), np.uint8)
    ok = np.zeros((b,), bool)
    done = None
    shapes = {np.asarray(im).shape for im in images}
    if len(shapes) == 1:
        from ...native.imgproc import ffhq_crop_batch
        batch = np.stack([np.asarray(im, np.uint8) for im in images])
        crops, done = ffhq_crop_batch(batch,
                                      np.asarray(landmarks_list, np.float32),
                                      image_size)
        if done is not None:
            out[done] = crops[done]
            ok[done] = True
    for i in range(b):
        if done is not None and done[i]:
            continue
        crop = crop_using_landmarks(np.asarray(images[i]),
                                    np.asarray(landmarks_list[i]),
                                    image_size=image_size)
        if crop is not None:
            out[i] = crop
            ok[i] = True
    return out, ok
