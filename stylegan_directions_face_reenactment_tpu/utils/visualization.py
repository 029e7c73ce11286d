"""Interpolation charts / GIFs (reference `libs/utilities/visualization.py`).

`make_interpolation_chart` sweeps each learned direction around a source
latent and assembles per-step frames; saved as an animated GIF via PIL
(the reference uses imageio, absent here).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax.numpy as jnp
from PIL import Image

from ..models.direction_matrix import direction_matrix_forward
from ..pipeline.synthesis import generate_image
from .image_utils import tensor_to_image

Params = Dict[str, Any]


# 68-landmark contour segmentation (`decalib/utils/util.py:522`):
# indices where the polyline breaks (jaw / brows / nose / eyes / lips)
END_LIST = np.array([17, 22, 27, 42, 48, 31, 36, 68], np.int32) - 1

_KPT_COLORS = {"r": (255, 0, 0), "g": (0, 255, 0),
               "b": (255, 0, 0)}  # 'b'→red replicates the reference bug


def _draw_disk(img: np.ndarray, x: float, y: float, color, radius: int = 2):
    """Filled disk (dx²+dy² ≤ r², cv2.circle-like rounding) clipped to the
    frame; off-frame centers draw nothing."""
    h, w = img.shape[:2]
    xi, yi = int(round(x)), int(round(y))
    if not (0 <= xi < w and 0 <= yi < h):
        return
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dx * dx + dy * dy <= radius * radius:
                yy, xx = yi + dy, xi + dx
                if 0 <= yy < h and 0 <= xx < w:
                    img[yy, xx] = color


def _draw_line(img: np.ndarray, p0, p1, color):
    """1-px segment, CLIPPED like cv2.line: out-of-frame samples are
    dropped, never projected onto the border."""
    h, w = img.shape[:2]
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]))) + 1
    xs = np.round(np.linspace(p0[0], p1[0], n))
    ys = np.round(np.linspace(p0[1], p1[1], n))
    keep = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[keep].astype(int), xs[keep].astype(int)] = color


def plot_kpts(image: np.ndarray, kpts: np.ndarray, color: str = "r"
              ) -> np.ndarray:
    """cv2-free `decalib/utils/util.py::plot_kpts`: 2-px point disks +
    white connecting segments between consecutive landmarks within each
    facial contour group, drawn in the reference's order (point i's disk,
    then the white line i→i+1 on top of it); 4-column kpts recolor
    per-point by visibility (green >0.5 else blue). image (H, W, 3)
    uint8-range float, kpts (68, 2|3|4) pixel coords. (cv2.circle's exact
    anti-alias/rounding is approximated by an integer disk.)"""
    img = image.copy()
    base = _KPT_COLORS[color]
    for i in range(kpts.shape[0]):
        c = base
        if kpts.shape[1] == 4:
            c = (0, 255, 0) if kpts[i, 3] > 0.5 else (0, 0, 255)
        _draw_disk(img, kpts[i, 0], kpts[i, 1], c)
        if i not in END_LIST and i + 1 < kpts.shape[0]:
            _draw_line(img, kpts[i, :2], kpts[i + 1, :2], (255, 255, 255))
    return img


def plot_verts(image: np.ndarray, kpts: np.ndarray, color: str = "r"
               ) -> np.ndarray:
    """`util.py::plot_verts`: point disks only (no contour lines)."""
    img = image.copy()
    for i in range(kpts.shape[0]):
        _draw_disk(img, kpts[i, 0], kpts[i, 1], _KPT_COLORS[color], 1)
    return img


def vis_landmarks(images, landmarks, gt_landmarks=None, color: str = "g",
                  is_scale: bool = True) -> np.ndarray:
    """`decalib/utils/util.py::tensor_vis_landmarks` without cv2/torch:
    images (B, H, W, 3) NHWC float [0, 1]; landmarks (B, 68, 2+) in pixel
    coords (is_scale=False) or [-1, 1] (is_scale=True). Returns drawn
    images, same layout, float [0, 1]. (The reference's double BGR flip
    cancels; colors land as written.)"""
    images = np.asarray(images, np.float32)
    landmarks = np.asarray(landmarks, np.float32)
    out = []
    for i in range(images.shape[0]):
        img = images[i] * 255.0
        kpts = landmarks[i]
        if is_scale:
            kpts = kpts * img.shape[0] / 2 + img.shape[0] / 2
        draw = plot_kpts if kpts.shape[0] == 68 else plot_verts
        img = draw(img, kpts, color)
        if gt_landmarks is not None:
            gt = np.asarray(gt_landmarks[i], np.float32)
            img = plot_verts(img, gt * img.shape[0] / 2 + img.shape[0] / 2,
                             "r")
        out.append(img)
    return np.stack(out) / 255.0


def save_gif(frames: List[np.ndarray], path: str, fps: int = 15):
    """uint8 HWC frames → animated GIF (reference uses imageio.mimsave,
    `run_facial_editing.py:191-207`)."""
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=max(1, int(1000 / fps)), loop=0)


def make_interpolation_chart(g_params: Params, a_params: Params,
                             latent: jnp.ndarray, *,
                             truncation: float = 0.7,
                             truncation_latent: Optional[jnp.ndarray] = None,
                             num_layers_shift: int = 8,
                             directions: Optional[List[int]] = None,
                             shift_scale: float = 6.0, steps: int = 5,
                             input_is_latent: bool = True) -> List[np.ndarray]:
    """Per-direction shift sweeps → one frame per shift value, each frame a
    horizontal strip over directions (`visualization.py:21-73`)."""
    k = a_params["meta"]["input_dim"]
    if truncation_latent is None:
        truncation = 1.0  # no mean latent available → no truncation
    if directions is None:
        directions = list(range(k))
    values = np.linspace(-shift_scale, shift_scale, 2 * steps + 1)

    frames = []
    for v in values:
        dp = jnp.zeros((len(directions), k), jnp.float32)
        for row, d in enumerate(directions):
            dp = dp.at[row, d].set(float(v))
        shift = direction_matrix_forward(a_params, dp)
        codes = jnp.broadcast_to(latent, (len(directions),) + latent.shape[1:])
        imgs = generate_image(g_params, codes, truncation=truncation,
                              truncation_latent=truncation_latent,
                              w_plus=True, num_layers_shift=num_layers_shift,
                              shift_code=shift, input_is_latent=input_is_latent)
        strip = np.concatenate([tensor_to_image(im) for im in np.asarray(imgs)],
                               axis=1)
        frames.append(strip)
    return frames
