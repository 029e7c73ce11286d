"""S3FD face detector — VGG anchor network with TPU-friendly dense decode.

Functional equivalent of `libs/face_models/sfd/` (reference): net_s3fd.py's
VGG trunk + 6 detection heads with L2Norm feature scaling and max-out
background on the stride-4 head, then anchor decoding and greedy NMS.

TPU-first redesign of the post-processing: the reference iterates
`np.where(score > 0.05)` positions per scale in Python
(`sfd/detect.py:54-73`) and runs list-based NMS (`sfd/bbox.py:44-66`).
Here every scale is decoded densely as one tensor op, candidates are
selected with a fixed-size top-k, and NMS is a masked O(K²) tensor program
— no data-dependent shapes, everything jittable and batchable.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import conv2d, max_pool2d, relu

Params = Dict[str, Any]

# (name, out_ch, kernel, stride, pad) of the VGG trunk, `net_s3fd.py:25-50`
_TRUNK = (
    ("conv1_1", 64, 3, 1, 1), ("conv1_2", 64, 3, 1, 1),
    ("conv2_1", 128, 3, 1, 1), ("conv2_2", 128, 3, 1, 1),
    ("conv3_1", 256, 3, 1, 1), ("conv3_2", 256, 3, 1, 1), ("conv3_3", 256, 3, 1, 1),
    ("conv4_1", 512, 3, 1, 1), ("conv4_2", 512, 3, 1, 1), ("conv4_3", 512, 3, 1, 1),
    ("conv5_1", 512, 3, 1, 1), ("conv5_2", 512, 3, 1, 1), ("conv5_3", 512, 3, 1, 1),
    ("fc6", 1024, 3, 1, 3), ("fc7", 1024, 1, 1, 0),
    ("conv6_1", 256, 1, 1, 0), ("conv6_2", 512, 3, 2, 1),
    ("conv7_1", 128, 1, 1, 0), ("conv7_2", 256, 3, 2, 1),
)

_HEADS = (
    ("conv3_3_norm_mbox_conf", 256, 4), ("conv3_3_norm_mbox_loc", 256, 4),
    ("conv4_3_norm_mbox_conf", 512, 2), ("conv4_3_norm_mbox_loc", 512, 4),
    ("conv5_3_norm_mbox_conf", 512, 2), ("conv5_3_norm_mbox_loc", 512, 4),
    ("fc7_mbox_conf", 1024, 2), ("fc7_mbox_loc", 1024, 4),
    ("conv6_2_mbox_conf", 512, 2), ("conv6_2_mbox_loc", 512, 4),
    ("conv7_2_mbox_conf", 256, 2), ("conv7_2_mbox_loc", 256, 4),
)

MEAN_BGR_SUB = (104.0, 117.0, 123.0)  # per-channel mean, `sfd/detect.py:21`


def init_s3fd(key) -> Params:
    keys = jax.random.split(key, len(_TRUNK) + len(_HEADS))
    params: Params = {}
    cin = 3
    for k, (name, cout, ks, st, pd) in zip(keys, _TRUNK):
        lim = 1.0 / math.sqrt(cin * ks * ks)
        params[name] = {"weight": jax.random.uniform(k, (ks, ks, cin, cout),
                                                     jnp.float32, -lim, lim),
                        "bias": jnp.zeros((cout,), jnp.float32)}
        cin = cout
    for k, (name, cin_h, cout) in zip(keys[len(_TRUNK):], _HEADS):
        lim = 1.0 / math.sqrt(cin_h * 9)
        params[name] = {"weight": jax.random.uniform(k, (3, 3, cin_h, cout),
                                                     jnp.float32, -lim, lim),
                        "bias": jnp.zeros((cout,), jnp.float32)}
    params["conv3_3_norm"] = jnp.full((256,), 10.0, jnp.float32)
    params["conv4_3_norm"] = jnp.full((512,), 8.0, jnp.float32)
    params["conv5_3_norm"] = jnp.full((512,), 5.0, jnp.float32)
    return params


def l2norm_scale(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """x / ||x||_c * w[c] (`net_s3fd.py:6-19`)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True)) + eps
    return x / norm * weight.astype(x.dtype)


def _c(p, name, x, stride=1, padding=1):
    spec = next(t for t in _TRUNK if t[0] == name)
    return conv2d(x, p[name]["weight"], p[name]["bias"], stride=spec[3],
                  padding=spec[4])


def s3fd_forward(params: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (B, H, W, 3) BGR-mean-subtracted. Returns 12 NHWC maps
    [cls1, reg1, … cls6, reg6] with cls1 max-out applied
    (`net_s3fd.py:70-129`)."""
    h = relu(_c(params, "conv1_1", x))
    h = relu(_c(params, "conv1_2", h))
    h = max_pool2d(h, 2, 2)
    h = relu(_c(params, "conv2_1", h))
    h = relu(_c(params, "conv2_2", h))
    h = max_pool2d(h, 2, 2)
    h = relu(_c(params, "conv3_1", h))
    h = relu(_c(params, "conv3_2", h))
    h = relu(_c(params, "conv3_3", h))
    f3_3 = h
    h = max_pool2d(h, 2, 2)
    h = relu(_c(params, "conv4_1", h))
    h = relu(_c(params, "conv4_2", h))
    h = relu(_c(params, "conv4_3", h))
    f4_3 = h
    h = max_pool2d(h, 2, 2)
    h = relu(_c(params, "conv5_1", h))
    h = relu(_c(params, "conv5_2", h))
    h = relu(_c(params, "conv5_3", h))
    f5_3 = h
    h = max_pool2d(h, 2, 2)
    h = relu(_c(params, "fc6", h))
    h = relu(_c(params, "fc7", h))
    ffc7 = h
    h = relu(_c(params, "conv6_1", h))
    h = relu(_c(params, "conv6_2", h))
    f6_2 = h
    h = relu(_c(params, "conv7_1", h))
    h = relu(_c(params, "conv7_2", h))
    f7_2 = h

    f3_3 = l2norm_scale(f3_3, params["conv3_3_norm"])
    f4_3 = l2norm_scale(f4_3, params["conv4_3_norm"])
    f5_3 = l2norm_scale(f5_3, params["conv5_3_norm"])

    def head(name, feat):
        return conv2d(feat, params[name]["weight"], params[name]["bias"],
                      padding=1)

    cls1 = head("conv3_3_norm_mbox_conf", f3_3)
    # max-out background: 4 channels → max of first 3 vs 4th
    bmax = jnp.max(cls1[..., :3], axis=-1, keepdims=True)
    cls1 = jnp.concatenate([bmax, cls1[..., 3:4]], axis=-1)

    return [
        cls1, head("conv3_3_norm_mbox_loc", f3_3),
        head("conv4_3_norm_mbox_conf", f4_3), head("conv4_3_norm_mbox_loc", f4_3),
        head("conv5_3_norm_mbox_conf", f5_3), head("conv5_3_norm_mbox_loc", f5_3),
        head("fc7_mbox_conf", ffc7), head("fc7_mbox_loc", ffc7),
        head("conv6_2_mbox_conf", f6_2), head("conv6_2_mbox_loc", f6_2),
        head("conv7_2_mbox_conf", f7_2), head("conv7_2_mbox_loc", f7_2),
    ]


def decode_boxes(loc: jnp.ndarray, priors: jnp.ndarray,
                 variances=(0.1, 0.2)) -> jnp.ndarray:
    """SSD box decode (`sfd/bbox.py:93-110`): center-offset → corner form."""
    centers = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    wh = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    return jnp.concatenate([centers - wh / 2, centers + wh / 2], axis=-1)


def dense_anchors(h: int, w: int, stride: int) -> np.ndarray:
    """All anchor priors for one scale: centers at stride/2 + i*stride,
    size 4*stride (`sfd/detect.py:59-68`). Returns (h*w, 4) [cx, cy, w, h]."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    cx = stride / 2.0 + xs * stride
    cy = stride / 2.0 + ys * stride
    size = np.full_like(cx, 4.0 * stride, dtype=np.float64)
    return np.stack([cx, cy, size, size], axis=-1).reshape(-1, 4).astype(np.float32)


def detect_candidates(params: Params, images_bgr: jnp.ndarray,
                      score_thresh: float = 0.05,
                      subtract_mean: bool = True) -> jnp.ndarray:
    """Dense batched detection: (B, H, W, 3) images (0-255) → (B, A, 5)
    [x1, y1, x2, y2, score] for ALL anchors, with scores below
    ``score_thresh`` zeroed (the reference drops them; fixed-shape masking
    is the TPU equivalent).

    ``subtract_mean=True`` applies the [104,117,123] BGR mean (the pip
    face_alignment convention; pass BGR images). The reference's vendored
    `batch_detect` feeds raw RGB with NO normalization
    (`sfd/detect.py:36-45`) — pass RGB with ``subtract_mean=False`` for
    that path."""
    # subtract in the input dtype (a f32 constant would silently promote a
    # bf16 batch back to f32 and defeat the mixed-precision trunk)
    x = images_bgr
    if subtract_mean:
        x = x - jnp.asarray(MEAN_BGR_SUB, images_bgr.dtype)
    olist = s3fd_forward(params, x)
    b = x.shape[0]
    outs = []
    for i in range(6):
        # head outputs decode in f32 regardless of trunk dtype: box coords
        # are sub-pixel crop metadata
        cls_map = jax.nn.softmax(olist[i * 2].astype(jnp.float32),
                                 axis=-1)[..., 1]                 # (B, h, w)
        loc_map = olist[i * 2 + 1].astype(jnp.float32)            # (B, h, w, 4)
        stride = 2 ** (i + 2)
        h, w = cls_map.shape[1], cls_map.shape[2]
        priors = jnp.asarray(dense_anchors(h, w, stride))         # (h*w, 4)
        boxes = decode_boxes(loc_map.reshape(b, -1, 4), priors[None])
        score = cls_map.reshape(b, -1)
        score = jnp.where(score > score_thresh, score, 0.0)
        outs.append(jnp.concatenate([boxes, score[..., None]], axis=-1))
    return jnp.concatenate(outs, axis=1)


def nms_fixed(dets: jnp.ndarray, iou_thresh: float = 0.3,
              top_k: int = 200) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over the top_k-scored candidates as a masked tensor
    program (replaces `sfd/bbox.py:44-66`). dets: (A, 5). Returns
    (kept (top_k, 5) sorted by score, keep_mask (top_k,))."""
    scores = dets[:, 4]
    top = jnp.argsort(-scores)[:top_k]
    d = dets[top]                                       # (K, 5)
    x1, y1, x2, y2, s = d[:, 0], d[:, 1], d[:, 2], d[:, 3], d[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    wh = jnp.maximum(0.0, xx2 - xx1 + 1) * jnp.maximum(0.0, yy2 - yy1 + 1)
    iou = wh / (areas[:, None] + areas[None, :] - wh)

    k = d.shape[0]
    suppressed_by = (iou > iou_thresh) & (jnp.arange(k)[None, :] < jnp.arange(k)[:, None])

    def body(i, keep):
        # i suppressed if any kept earlier candidate overlaps it
        sup = jnp.any(suppressed_by[i] & keep)
        return keep.at[i].set(~sup & (s[i] > 0))

    keep = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    return d, keep


def detect_faces(params: Params, images_bgr: jnp.ndarray,
                 score_thresh: float = 0.5, iou_thresh: float = 0.3,
                 top_k: int = 32,
                 subtract_mean: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full batched detection (`sfd/sfd_detector.py:31-45` semantics:
    candidates → NMS(0.3) → score > 0.5). Returns (boxes (B, top_k, 5),
    valid (B, top_k) bool), best-first. See `detect_candidates` for the
    two input conventions (``subtract_mean``)."""
    cands = detect_candidates(params, images_bgr, subtract_mean=subtract_mean)

    def per_image(d):
        kept, mask = nms_fixed(d, iou_thresh, top_k)
        valid = mask & (kept[:, 4] > score_thresh)
        return kept, valid

    return jax.vmap(per_image)(cands)
