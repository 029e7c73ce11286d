"""Shared CLI source preparation: crop → invert → (PTI) → DECA coefficients.

One implementation of the block every entry point repeats
(`run_inference.py:103-127` load_source_data: preprocess_image →
invert_image → optimize_g; the same sequence opens `run_facial_editing.py`
and the parity harness).

The FFHQ crop is ALWAYS 256 regardless of the generator's resolution: the
reference's `crop_using_landmarks` hard-codes image_size = 256
(`libs/face_models/ffhq_cropping.py:50-65`) even for the ffhq-1024 config,
and e4e, ArcFace, and DECA all consume that 256 crop — only synthesis
emits `g.meta.size`. Sizing prep to the generator instead breaks the
e4e trunk (its style heads expect the 256-input feature pyramid).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

Params = Dict[str, Any]

CROP_SIZE = 256  # `ffhq_cropping.py:50` — fixed, independent of G's size


def pad_batch(x: np.ndarray, pad: int) -> np.ndarray:
    """Pad a frame chunk to the jitted program's static batch by repeating
    the last row (callers slice the outputs back to the true length)."""
    return np.concatenate([x] + [x[-1:]] * pad) if pad else x


def make_prep_fn(s3fd_params: Optional[Params], fan_params: Optional[Params],
                 *, skip_preprocess: bool = False, device_crop: bool = True,
                 crop_size: int = CROP_SIZE,
                 return_landmarks: bool = False,
                 detect_width: Optional[int] = None) -> Callable:
    """frames (list of HWC uint8) → ((B, 256, 256, 3) [-1,1], ok mask).

    ``skip_preprocess``: inputs are already FFHQ-cropped faces — plain
    resize (the CLIs' --skip_preprocess); otherwise the full SFD → FAN →
    FFHQ-crop chain (`utils_inference.py:61-82`).
    ``return_landmarks``: also return the detection landmarks mapped into
    crop coordinates (single-detection pipelines; incompatible with
    skip_preprocess, which never detects).
    ``detect_width``: pre-detection rescale width; None = the reference's
    unconditional 1000 (`preprocess.DETECT_WIDTH`), 0 = detect at native
    frame size."""
    if return_landmarks and skip_preprocess:
        raise ValueError("return_landmarks requires the detection prep "
                         "(incompatible with skip_preprocess)")

    def prep(frames: List[np.ndarray]) -> Tuple[np.ndarray, ...]:
        if skip_preprocess:
            from ..native.imgproc import resize_bilinear_u8
            batch = resize_bilinear_u8(np.stack(frames).astype(np.uint8),
                                       (crop_size, crop_size))
            return (batch.astype(np.float32) / 127.5 - 1.0,
                    np.ones(len(frames), bool))
        from .preprocess import DETECT_WIDTH, preprocess_images
        return preprocess_images(s3fd_params, fan_params, frames,
                                 image_size=crop_size,
                                 device_crop=device_crop,
                                 return_landmarks=return_landmarks,
                                 detect_width=(DETECT_WIDTH
                                               if detect_width is None
                                               else detect_width))

    return prep


def setup_source(g_params: Params, e4e_params: Params, deca_params: Params,
                 src_frames: List[np.ndarray], prep: Callable, *,
                 truncation_latent: jnp.ndarray,
                 optimize_generator: bool = True,
                 lpips_params: Optional[Params] = None,
                 fan_params: Optional[Params] = None,
                 s3fd_params: Optional[Params] = None,
                 opt_steps: int = 200, lr: float = 3e-3,
                 truncation: float = 0.7):
    """The reference's `load_source_data` (`run_inference.py:103-127`):
    crop the source, e4e-invert it, optionally PTI-fine-tune G on the
    pivot, and regress the source DECA coefficients.

    Returns (source_img [1,256,256,3], source_code W+, g_source,
    params_source, angles_source)."""
    from .inversion import invert_image
    from .pti import optimize_g
    from .reenactment import source_shape

    res = prep(src_frames)
    src_batch, ok = res[0], res[1]   # prep may also return landmarks
    if not ok[0]:
        raise RuntimeError("no face detected in the source image")
    source_img = jnp.asarray(src_batch[:1])
    _, source_code = invert_image(source_img, e4e_params, g_params,
                                  truncation=truncation,
                                  truncation_latent=truncation_latent)
    if optimize_generator:
        if lpips_params is None:
            raise ValueError("optimize_generator requires lpips_params")
        g_source, _ = optimize_g(g_params, source_code, source_img,
                                 lpips_params, truncation_latent,
                                 opt_steps=opt_steps, lr=lr,
                                 truncation=truncation)
    else:
        g_source = g_params
    params_source, angles_source = source_shape(deca_params, source_img,
                                                fan_params=fan_params,
                                                s3fd_params=s3fd_params)
    return source_img, source_code, g_source, params_source, angles_source
