"""FFHQ-style landmark-driven cropping.

Host-side (numpy/PIL/scipy) equivalent of
`libs/face_models/ffhq_cropping.py` (reference) — "correct preprocessing
... is important" (reference README). The crop: center = landmark-bbox
center with y lifted by size/6, square of side 2·size, reflect-padded with
a blur + median fade where the box leaves the frame, bicubic-resized
to 256.

Three implementations of the in-frame fast path share the box math:
  * `crop_using_landmarks` — PIL reference (exact `ffhq_cropping.py`);
  * the native C++ threaded batch crop (`native/reenact_io.cpp`,
    continuous-weight PIL-compatible bicubic);
  * `ffhq_crop_device` — jittable: the crop+resize as one cubic
    `scale_and_translate` (two MXU matmuls) so frames never round-trip to
    the host on the hot path (≲1 LSB mean deviation vs PIL, same class as
    the native path).
Out-of-frame boxes always take the host reflect-pad + blur + median-fade
slow path.
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
    # numpy 'symmetric' == cv2.BORDER_REFLECT (edge pixel duplicated), the
    # reference's border mode (`ffhq_cropping.py:16-17`); numpy 'reflect'
    # would be BORDER_REFLECT_101 and shifts the padded content by one px
    img_p = np.pad(img, ((top, bottom), (left, right), (0, 0)),
                   mode="symmetric")

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


def ffhq_crop_box(landmarks):
    """Shared box math of `crop_using_landmarks` (`ffhq_cropping.py:49-57`)
    as a jittable function. landmarks (B, 68, 2) float → (center (B,2) int32
    [x, y] with the y-size/6 lift applied, size (B,) int32, valid (B,))."""
    import jax.numpy as jnp
    lm = landmarks.astype(jnp.float32)
    mins, maxs = lm.min(axis=1), lm.max(axis=1)
    # host: ((min+max)/2).round().astype(int) — np.round is half-to-even,
    # as is jnp.round
    center = jnp.round((mins + maxs) / 2.0).astype(jnp.int32)
    ext = maxs - mins
    size = jnp.maximum(ext[:, 0], ext[:, 1]).astype(jnp.int32)  # int() trunc
    valid = size > 0
    center = center.at[:, 1].add(-(size // 6))
    return center, size, valid


def landmarks_in_crop(landmarks, image_size: int = 256):
    """Map raw-frame landmarks into FFHQ-crop coordinates: the crop is the
    axis-aligned square (center − size, side 2·size) scaled to
    ``image_size`` (same box on the device AND host paths — the host
    pad+fade fallback pads the identical box beyond the frame), so
    lm_crop = (lm − origin) · image_size / side. Single-detection
    pipelines reuse these for the DECA kpt68 bbox instead of re-running
    SFD+FAN on the crop. Returns (lms_crop (B, 68, 2), valid (B,))."""
    import jax.numpy as jnp
    center, size, valid = ffhq_crop_box(landmarks)
    origin = (center - size[:, None]).astype(jnp.float32)
    side = (2 * jnp.maximum(size, 1)).astype(jnp.float32)
    lms = (landmarks.astype(jnp.float32) - origin[:, None, :]) \
        * (image_size / side)[:, None, None]
    return lms, valid


def _cubic_kernel(x):
    """Keys cubic, a = -0.5 (PIL BICUBIC / `reenact_io.cpp::rio_cubic`)."""
    import jax.numpy as jnp
    x = jnp.abs(x)
    near = ((-0.5 + 2.0) * x - (-0.5 + 3.0)) * x * x + 1.0
    far = (((x - 5.0) * x + 8.0) * x - 4.0) * -0.5
    return jnp.where(x < 1.0, near, jnp.where(x < 2.0, far, 0.0))


def _pil_axis_weights(in_len: int, start, crop_len, out_len: int):
    """Dense per-image resampling weights replicating the native/PIL axis
    table (`reenact_io.cpp::rio_axis_table`): antialiased cubic, window
    [lo, hi) from the ±support rule, normalized over the (edge-clamped)
    window. start/crop_len: (B,) floats — crop origin and side in absolute
    image coords. Returns (B, out_len, in_len)."""
    import jax.numpy as jnp
    scale = crop_len / out_len                            # (B,)
    filterscale = jnp.maximum(scale, 1.0)
    support = 2.0 * filterscale
    i = jnp.arange(out_len, dtype=jnp.float32)
    center = (i[None] + 0.5) * scale[:, None]             # (B, O) crop coords
    lo = jnp.maximum(jnp.floor(center - support[:, None] + 0.5), 0.0)
    hi = jnp.minimum(jnp.floor(center + support[:, None] + 0.5),
                     crop_len[:, None])
    j = jnp.arange(in_len, dtype=jnp.float32)             # absolute coords
    jc = j[None, None, :] - start[:, None, None]          # (B, 1→O, In)
    w = _cubic_kernel((jc - center[..., None] + 0.5)
                      / filterscale[:, None, None])
    w = jnp.where((jc >= lo[..., None]) & (jc < hi[..., None]), w, 0.0)
    norm = jnp.sum(w, axis=-1, keepdims=True)
    return w / jnp.where(norm == 0.0, 1.0, norm)


def ffhq_crop_device(images, landmarks, image_size: int = 256):
    """Jittable FFHQ crop for IN-FRAME boxes: landmark bbox → square box of
    side 2·size → PIL-compatible antialiased bicubic resample to
    ``image_size``. The crop+resize is fused: per-image dense axis-weight
    matrices contracted as two MXU einsums, with the uint8 quantization
    between the passes that the PIL/native pipelines apply
    (`reenact_io.cpp::rio_ffhq_crop_one` q8) — so the result matches the
    host paths to ≤1 intensity unit without any host round-trip.

    images: (B, H, W, 3) uint8/float on device; landmarks: (B, 68, 2).
    Returns (crops (B, s, s, 3) float32 in [0, 255] (integer-valued),
    in_frame (B,) bool). Boxes that leave the frame (or degenerate
    landmarks) get ``in_frame=False`` — route those through the host
    pad+fade path.
    """
    import jax.numpy as jnp
    _, h, w, _ = images.shape
    center, size, valid = ffhq_crop_box(landmarks)
    cx, cy = center[:, 0], center[:, 1]
    x1, y1 = cx - size, cy - size
    in_frame = ((x1 >= 0) & (y1 >= 0) & (cx + size <= w) & (cy + size <= h)
                & valid)
    side = (2 * jnp.maximum(size, 1)).astype(jnp.float32)
    wx = _pil_axis_weights(w, x1.astype(jnp.float32), side, image_size)
    wy = _pil_axis_weights(h, y1.astype(jnp.float32), side, image_size)

    def q8(v):  # clip + round-half-up, the inter-pass u8 quantization
        return jnp.floor(jnp.clip(v, 0.0, 255.0) + 0.5)

    img = images.astype(jnp.float32)
    # horizontal pass (contract absolute x), then vertical (absolute y);
    # HIGHEST precision: TPU default f32 matmuls use single bf16 passes,
    # which would cost ~1-2 intensity units here
    import jax
    tmp = q8(jnp.einsum("box,byxc->byoc", wx, img,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32))
    out = q8(jnp.einsum("boy,byic->boic", wy, tmp,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32))
    return out, in_frame


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
