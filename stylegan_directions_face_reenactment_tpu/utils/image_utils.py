"""Image range conversions & helpers (reference `libs/utilities/image_utils.py`)."""

from __future__ import annotations


import numpy as np
import jax.numpy as jnp
from PIL import Image


def torch_range_1_to_255(x):
    """[-1, 1] → [0, 255] (`image_utils.py:87-94`, EXACT semantics incl.
    the reference's /(2 + 1e-5) epsilon — full range maps to
    [0, 254.99873], not [0, 255]), jnp or numpy. Feeds the DECA input and
    paired-loss conversions, so the epsilon matters for bit-parity."""
    return (jnp.clip(x, -1.0, 1.0) + 1.0) / 2.00001 * 255.0


def torch_range_255_to_1(x):
    return x / 127.5 - 1.0


def tensor_to_image(x) -> np.ndarray:
    """NHWC float [-1,1] (single image or batch of 1) → HWC uint8."""
    x = np.asarray(x)
    if x.ndim == 4:
        x = x[0]
    return np.clip((x + 1.0) * 127.5, 0, 255).astype(np.uint8)


def image_to_tensor(img: np.ndarray) -> np.ndarray:
    """HWC uint8 → HWC float32 [-1,1]."""
    return np.asarray(img, np.float32) / 127.5 - 1.0


def save_image(x, path: str):
    """Save a [-1,1] NHWC image (batch tiled horizontally) to disk
    (`generic.py:13-20` save_image semantics: normalize from (-1,1))."""
    x = np.asarray(x)
    if x.ndim == 3:
        x = x[None]
    tiles = [tensor_to_image(im) for im in x]
    out = np.concatenate(tiles, axis=1)
    Image.fromarray(out).save(path)


def load_image(path: str, size: int = None) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    if size is not None and img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img)


def add_border(img: np.ndarray, color=(255, 0, 0), width: int = 4) -> np.ndarray:
    """Red-box border (`image_utils.py:129-137`)."""
    out = img.copy()
    out[:width], out[-width:] = color, color
    out[:, :width], out[:, -width:] = color, color
    return out


def generate_grid_image(source, target, reenacted) -> np.ndarray:
    """Row-per-sample [source | target | reenacted] grid in [-1,1]
    (`utils_inference.py:20-33`; it hard-codes 256 cells and crashes on
    mixed sizes; here every cell is resized to the target's size. In
    production all three are 256 — generate_image pools >256 outputs to
    256 — so this only fires for sub-256 test-scale generators).
    Returns HWC uint8."""
    from PIL import Image
    rows = []
    source, target, reenacted = (np.asarray(source), np.asarray(target),
                                 np.asarray(reenacted))
    cell = target.shape[1:3]

    def _cell(x):
        img = tensor_to_image(x)
        if img.shape[:2] != cell:
            img = np.array(Image.fromarray(img).resize(
                (cell[1], cell[0]), Image.BILINEAR))
        return img

    for s, t, r in zip(source, target, reenacted):
        rows.append(np.concatenate([_cell(s), _cell(t), _cell(r)], axis=1))
    return np.concatenate(rows, axis=0)
