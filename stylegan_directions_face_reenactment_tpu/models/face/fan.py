"""FAN landmark network — 4-stack hourglass → 68 heatmaps (+depth net).

Functional equivalent of `libs/face_models/fan_model/models.py` (reference):
ConvBlock (dense residual with 3 BN-ReLU-conv stages concatenated),
recursive HourGlass (depth 4), the 4-module FAN stack and the ResNetDepth
3D-landmark depth regressor.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..nn import (avg_pool2d, batch_norm, conv2d, linear, max_pool2d, relu,
                  upsample_nearest)

Params = Dict[str, Any]


def _conv_init(key, kh, kw, cin, cout):
    n = kh * kw * cout
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * math.sqrt(2.0 / n)


def _bn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "offset": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


def init_conv_block(key, in_planes: int, out_planes: int) -> Params:
    k = jax.random.split(key, 4)
    p: Params = {
        "bn1": _bn_init(in_planes),
        "conv1": _conv_init(k[0], 3, 3, in_planes, out_planes // 2),
        "bn2": _bn_init(out_planes // 2),
        "conv2": _conv_init(k[1], 3, 3, out_planes // 2, out_planes // 4),
        "bn3": _bn_init(out_planes // 4),
        "conv3": _conv_init(k[2], 3, 3, out_planes // 4, out_planes // 4),
    }
    if in_planes != out_planes:
        p["downsample"] = {"bn": _bn_init(in_planes),
                           "conv": _conv_init(k[3], 1, 1, in_planes, out_planes)}
    return p


def conv_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Dense residual block (`fan_model/models.py:13-55`).

    A fused whole-image Pallas kernel exists for the channels-equal 256-ch
    blocks (`ops/fused_conv_block.py`) but ships disabled: measured slower
    than this XLA path (12.7 vs 9.5 ms on the bf16 FAN batch; see the
    kernel's docstring for the analysis)."""
    from ...ops.fused_conv_block import (conv_block_fused,
                                         fused_convblock_enabled)
    if fused_convblock_enabled(p, x):
        return conv_block_fused(p, x)
    out1 = conv2d(relu(batch_norm(x, p["bn1"])), p["conv1"], padding=1)
    out2 = conv2d(relu(batch_norm(out1, p["bn2"])), p["conv2"], padding=1)
    out3 = conv2d(relu(batch_norm(out2, p["bn3"])), p["conv3"], padding=1)
    out = jnp.concatenate([out1, out2, out3], axis=-1)
    if "downsample" in p:
        res = conv2d(relu(batch_norm(x, p["downsample"]["bn"])),
                     p["downsample"]["conv"])
    else:
        res = x
    return out + res


def init_hourglass(key, depth: int = 4, features: int = 256) -> Params:
    """Recursive hourglass (`fan_model/models.py:98-142`). Stored per level:
    b1, b2, b3 (+ b2_plus at level 1)."""
    levels = {}
    keys = jax.random.split(key, depth * 4)
    ki = 0
    for level in range(depth, 0, -1):
        entry = {"b1": init_conv_block(keys[ki], features, features),
                 "b2": init_conv_block(keys[ki + 1], features, features),
                 "b3": init_conv_block(keys[ki + 2], features, features)}
        if level == 1:
            entry["b2_plus"] = init_conv_block(keys[ki + 3], features, features)
        levels[str(level)] = entry
        ki += 4
    return {"levels": levels, "_meta": {"depth": depth}}


def hourglass(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    def recurse(level, inp):
        lv = p["levels"][str(level)]
        up1 = conv_block(lv["b1"], inp)
        low1 = conv_block(lv["b2"], avg_pool2d(inp, 2, stride=2))
        if level > 1:
            low2 = recurse(level - 1, low1)
        else:
            low2 = conv_block(lv["b2_plus"], low1)
        low3 = conv_block(lv["b3"], low2)
        return up1 + upsample_nearest(low3, 2)

    return recurse(p["_meta"]["depth"], x)


def init_fan(key, num_modules: int = 4) -> Params:
    keys = jax.random.split(key, 6 + num_modules * 6)
    ki = iter(range(len(keys)))
    p: Params = {
        "conv1": {"weight": _conv_init(keys[next(ki)], 7, 7, 3, 64),
                  "bias": jnp.zeros((64,), jnp.float32)},
        "bn1": _bn_init(64),
        "conv2": init_conv_block(keys[next(ki)], 64, 128),
        "conv3": init_conv_block(keys[next(ki)], 128, 128),
        "conv4": init_conv_block(keys[next(ki)], 128, 256),
        "modules": [],
        "meta": {"num_modules": num_modules},
    }
    for m in range(num_modules):
        # every module carries bl/al (the reference's last module has none,
        # `models.py:168-173`) so the 4 modules share one pytree structure
        # and run as ONE lax.scan body — 4x less HLO to compile. The last
        # module's bl/al output is discarded (the scan carry is unused), so
        # zero weights there are exactly the reference semantics.
        mod = {
            "hg": init_hourglass(keys[next(ki)]),
            "top_m": init_conv_block(keys[next(ki)], 256, 256),
            "conv_last": {"weight": _conv_init(keys[next(ki)], 1, 1, 256, 256),
                          "bias": jnp.zeros((256,), jnp.float32)},
            "bn_end": _bn_init(256),
            "l": {"weight": _conv_init(keys[next(ki)], 1, 1, 256, 68),
                  "bias": jnp.zeros((68,), jnp.float32)},
        }
        if m < num_modules - 1:
            mod["bl"] = {"weight": _conv_init(keys[next(ki)], 1, 1, 256, 256),
                         "bias": jnp.zeros((256,), jnp.float32)}
            mod["al"] = {"weight": _conv_init(keys[next(ki)], 1, 1, 68, 256),
                         "bias": jnp.zeros((256,), jnp.float32)}
        else:
            mod["bl"] = {"weight": jnp.zeros((1, 1, 256, 256), jnp.float32),
                         "bias": jnp.zeros((256,), jnp.float32)}
            mod["al"] = {"weight": jnp.zeros((1, 1, 68, 256), jnp.float32),
                         "bias": jnp.zeros((256,), jnp.float32)}
        p["modules"].append(mod)
    return p


def fan_forward(p: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x (B, 256, 256, 3) in [0,1] → list of (B, 64, 64, 68) heatmaps, one
    per stacked module (`fan_model/models.py:174-202`); use the last.

    The 4 structurally-identical stacked modules run as one `lax.scan`
    body (identical math to the reference's unrolled loop; the last
    module's bl/al convs have zero weights and their result — the scan
    carry — is discarded), which cuts XLA compile time ~4x."""
    x = relu(batch_norm(conv2d(x, p["conv1"]["weight"], p["conv1"]["bias"],
                               stride=2, padding=3), p["bn1"]))
    x = avg_pool2d(conv_block(p["conv2"], x), 2, stride=2)
    x = conv_block(p["conv3"], x)
    x = conv_block(p["conv4"], x)

    mods = p["modules"]
    depth = mods[0]["hg"]["_meta"]["depth"]

    def _arrays_only(m):
        m = dict(m)
        m["hg"] = {"levels": m["hg"]["levels"]}  # depth stays static
        return m

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                     *[_arrays_only(m) for m in mods])

    def body(previous, mod):
        hg = hourglass({**mod["hg"], "_meta": {"depth": depth}}, previous)
        ll = conv_block(mod["top_m"], hg)
        ll = relu(batch_norm(conv2d(ll, mod["conv_last"]["weight"],
                                    mod["conv_last"]["bias"]), mod["bn_end"]))
        tmp_out = conv2d(ll, mod["l"]["weight"], mod["l"]["bias"])
        ll2 = conv2d(ll, mod["bl"]["weight"], mod["bl"]["bias"])
        tmp2 = conv2d(tmp_out, mod["al"]["weight"], mod["al"]["bias"])
        return previous + ll2 + tmp2, tmp_out

    # unroll=2: halves the while-loop trip count — the sequential scan
    # loop costs real wall-clock on TPU (no cross-iteration overlap) while
    # full unrolling quadruples the HLO the compiler must chew
    _, outs = jax.lax.scan(body, x, stacked, unroll=2)
    return [outs[i] for i in range(p["meta"]["num_modules"])]


# ---------------------------------------------------------------------------
# Heatmap → landmark coordinates (vectorized)
# ---------------------------------------------------------------------------

def heatmaps_to_landmarks(hm: jnp.ndarray) -> jnp.ndarray:
    """(B, 64, 64, 68) heatmaps → (B, 68, 2) sub-pixel peak coords in
    heatmap units, replacing the per-landmark python loops of
    `landmarks_estimation.py:50-88` with gathers.

    Matches the reference: argmax (+1-based), ±0.25px sign-of-gradient
    refinement for interior peaks, then −0.5.
    """
    b, h, w, n = hm.shape
    # stay channel-last: transposing (B,H,W,68) to put the spatial axis
    # minor forces a real relayout on TPU (~4 ms at batch 16); reducing
    # and gathering over the non-minor flattened-spatial axis does not
    flat = hm.reshape(b, h * w, n)                     # (B, H·W, 68)
    # peak via one big W-reduce + small index passes (argmax over the
    # flattened spatial axis lowers to expensive full-size compare-select
    # reductions on TPU). jnp.argmax semantics = FIRST maximum: the
    # min-over-iota on row/col matches (first row containing the max,
    # first column within it — row-major order, like flat argmax).
    row_max = hm.max(axis=2)                           # (B, H, 68): ONE big pass
    mx = row_max.max(axis=1, keepdims=True)            # (B, 1, 68)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, row_max.shape, 1)
    py_ = jnp.where(row_max == mx, iota_h, h).min(axis=1)     # (B, 68)
    rows = jnp.take_along_axis(hm, py_[:, None, None, :],
                               axis=1)[:, 0]           # (B, W, 68)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    px_ = jnp.where(rows == mx, iota_w, w).min(axis=1)        # (B, 68)
    idx = py_ * w + px_                                # (B, 68), 0-based
    px = (idx % w).astype(jnp.int32)                   # 0-based x
    py = (idx // w).astype(jnp.int32)                  # 0-based y

    def gather(dy, dx):
        yy = jnp.clip(py + dy, 0, h - 1)
        xx = jnp.clip(px + dx, 0, w - 1)
        lin = yy * w + xx                              # (B, 68)
        return jnp.take_along_axis(flat, lin[:, None, :], axis=1)[:, 0, :]

    diff_x = gather(0, 1) - gather(0, -1)
    diff_y = gather(1, 0) - gather(-1, 0)
    interior = ((px > 0) & (px < w - 1) & (py > 0) & (py < h - 1))

    fx = px.astype(jnp.float32) + 1.0   # reference works 1-based
    fy = py.astype(jnp.float32) + 1.0
    fx = fx + jnp.where(interior, jnp.sign(diff_x) * 0.25, 0.0)
    fy = fy + jnp.where(interior, jnp.sign(diff_y) * 0.25, 0.0)
    return jnp.stack([fx - 0.5, fy - 0.5], axis=-1)


def landmarks_to_image_coords(pts: jnp.ndarray, center: jnp.ndarray,
                              scale: jnp.ndarray,
                              resolution: float = 64.0,
                              truncate: bool = True) -> jnp.ndarray:
    """Map heatmap-frame points back to original-image coords — the inverse
    of the 200·scale crop transform (`fan_model/utils.py:63-97`).

    pts: (B, 68, 2) heatmap coords as `heatmaps_to_landmarks` emits them
    (== the reference's `preds` at the transform call); center (B, 2);
    scale (B,). The reference's `transform` returns ``.int()`` — integer
    truncation toward zero — and those integer landmarks feed the FFHQ
    crop box and the DECA kpt68 bbox, so ``truncate=True`` (the default)
    replicates it exactly (float32 dtype, integer values); live parity:
    `tests/test_face_models.py::test_landmark_pipeline_live_parity`.
    """
    h = 200.0 * scale[:, None, None]
    out = (pts / resolution) * h + (center[:, None, :] - h / 2.0)
    return jnp.trunc(out) if truncate else out


def init_resnet_depth(key, layers=(3, 8, 36, 3), num_classes: int = 68) -> Params:
    """ResNetDepth (`fan_model/models.py:205-265`) for 3D landmark depth."""
    from ..deca.resnet import _init_bottleneck
    keys = jax.random.split(key, sum(layers) + 3)
    ki = iter(range(len(keys)))
    p: Params = {
        "conv1": _conv_init(keys[next(ki)], 7, 7, 3 + 68, 64),
        "bn1": _bn_init(64),
        "layers": [],
    }
    cin = 64
    for li, (blocks, planes, stride) in enumerate(
            zip(layers, (64, 128, 256, 512), (1, 2, 2, 2))):
        stage = []
        for bi in range(blocks):
            stage.append(_init_bottleneck(keys[next(ki)], cin, planes,
                                          stride if bi == 0 else 1))
            cin = planes * 4
        p["layers"].append(stage)
    lim = 1.0 / math.sqrt(2048)
    p["fc"] = {"weight": jax.random.uniform(keys[next(ki)], (num_classes, 2048),
                                            jnp.float32, -lim, lim),
               "bias": jnp.zeros((num_classes,), jnp.float32)}
    return p


def resnet_depth_forward(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, 256, 256, 71) = image+heatmaps → (B, 68) depths."""
    from ..deca.resnet import _bottleneck
    out = conv2d(x, p["conv1"], stride=2, padding=3)
    out = relu(batch_norm(out, p["bn1"]))
    out = max_pool2d(out, 3, stride=2, padding=1)
    for stage in p["layers"]:
        for block in stage:
            out = _bottleneck(block, out)
    out = avg_pool2d(out, 7)
    out = out.reshape(out.shape[0], -1)
    return linear(out, p["fc"]["weight"], p["fc"]["bias"])


# ---------------------------------------------------------------------------
# 3D landmarks (depth) support
# ---------------------------------------------------------------------------

def draw_gaussians(points: jnp.ndarray, size: int = 256,
                   sigma: float = 2.0) -> jnp.ndarray:
    """Render one gaussian heatmap per landmark, batched.

    Vectorized equivalent of the reference per-landmark loop
    (`fan_model/utils.py:39-61` draw_gaussian as used by
    `landmarks_estimation.py:167-173`): peak at the (1-based) point,
    clipped at 1. points: (B, L, 2) → (B, size, size, L).
    """
    ys = jnp.arange(1, size + 1, dtype=jnp.float32)
    xs = jnp.arange(1, size + 1, dtype=jnp.float32)
    gy = ys[None, :, None, None] - points[:, None, None, :, 1]  # (B,H,1,L)
    gx = xs[None, None, :, None] - points[:, None, None, :, 0]  # (B,1,W,L)
    g = jnp.exp(-(gy ** 2 + gx ** 2) / (2.0 * sigma ** 2))
    # the reference skips landmarks with x <= 0 (`landmarks_estimation.py:169`)
    valid = (points[:, None, None, :, 0] > 0).astype(g.dtype)
    return jnp.minimum(g * valid, 1.0)


def predict_depth(depth_params: Params, crops01: jnp.ndarray,
                  pts_hm: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """3D landmark depths (`landmarks_estimation.py:165-181`).

    crops01: (B, 256, 256, 3) FAN input crops in [0,1];
    pts_hm: (B, 68, 2) heatmap-frame peaks (1-based); scale: (B,).
    Returns (B, 68) depths in image units: depth · 200·scale/256.
    """
    pts256 = pts_hm * 4.0
    heat = draw_gaussians(pts256, size=256, sigma=2.0)
    inp = jnp.concatenate([crops01, heat], axis=-1)  # (B,256,256,71)
    depth = resnet_depth_forward(depth_params, inp)  # (B, 68)
    return depth * (200.0 * scale[:, None] / 256.0)
