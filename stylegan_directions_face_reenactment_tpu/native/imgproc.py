"""ctypes binding for the native IO runtime (libreenact_io.so).

Builds on first use if the shared library is missing (g++ + libav* are part
of the image). Every entry point has a graceful error if the native lib is
unavailable; video IO has no pure-python fallback (no cv2/imageio in the
environment — libav via this runtime IS the video path).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libreenact_io.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["sh", os.path.join(_DIR, "build.sh")], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)

    lib.rio_video_open.restype = ctypes.c_void_p
    lib.rio_video_open.argtypes = [ctypes.c_char_p]
    lib.rio_video_width.restype = ctypes.c_int
    lib.rio_video_width.argtypes = [ctypes.c_void_p]
    lib.rio_video_height.restype = ctypes.c_int
    lib.rio_video_height.argtypes = [ctypes.c_void_p]
    lib.rio_video_fps.restype = ctypes.c_double
    lib.rio_video_fps.argtypes = [ctypes.c_void_p]
    lib.rio_video_read.restype = ctypes.c_int
    lib.rio_video_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_int, ctypes.c_int]
    lib.rio_video_close.argtypes = [ctypes.c_void_p]

    lib.rio_writer_open.restype = ctypes.c_void_p
    lib.rio_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int]
    lib.rio_writer_write.restype = ctypes.c_int
    lib.rio_writer_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.rio_writer_close.restype = ctypes.c_int
    lib.rio_writer_close.argtypes = [ctypes.c_void_p]

    lib.rio_resize_bilinear_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.rio_to_gan_range.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int64]
    lib.rio_from_gan_range.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int64]
    lib.rio_ffhq_crop_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return get_lib() is not None


def extract_frames(path: str, stride: int = 1, max_frames: int = 100_000,
                   get_only_first: bool = False) -> List[np.ndarray]:
    """mp4/avi → list of HWC uint8 RGB frames (every stride-th), matching
    `utils_inference.py:35-58` (the reference's `fps` arg is a stride;
    get_only_first returns just frame 0)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native IO runtime unavailable (build failed)")
    h = lib.rio_video_open(path.encode())
    if not h:
        raise IOError(f"could not open video {path}")
    try:
        width = lib.rio_video_width(h)
        height = lib.rio_video_height(h)
        frames = []
        chunk = 1 if get_only_first else 64
        eff_stride = 1 if get_only_first else stride
        while len(frames) < (1 if get_only_first else max_frames):
            want = min(chunk, (1 if get_only_first else max_frames) - len(frames))
            buf = np.empty((want, height, width, 3), np.uint8)
            n = lib.rio_video_read(h, buf.ctypes.data_as(ctypes.c_void_p),
                                   want, eff_stride)
            frames.extend(buf[i].copy() for i in range(n))
            if n < want:
                break  # stream exhausted
        return frames
    finally:
        lib.rio_video_close(h)


def video_fps(path: str) -> float:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native IO runtime unavailable")
    h = lib.rio_video_open(path.encode())
    if not h:
        raise IOError(f"could not open video {path}")
    fps = lib.rio_video_fps(h)
    lib.rio_video_close(h)
    return fps


def generate_video(frames: List[np.ndarray], save_path: str,
                   fps: int = 25) -> None:
    """RGB uint8 frames → mp4 (`utils_inference.py:11-18`).

    The last frame is written twice: this libav build's decoders swallow
    the final sample of an mp4 at EOF (the flush yields nothing — see the
    round-trip test), so a duplicated trailing frame guarantees every real
    frame decodes everywhere; well-behaved players just hold the final
    image one extra frame interval.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native IO runtime unavailable")
    if not frames:
        return
    h, w = frames[0].shape[:2]
    wh = lib.rio_writer_open(save_path.encode(), w, h, fps)
    if not wh:
        raise IOError(f"could not open video writer {save_path}")
    try:
        for f in list(frames) + [frames[-1]]:
            f = np.ascontiguousarray(f, np.uint8)
            if lib.rio_writer_write(wh, f.ctypes.data_as(ctypes.c_void_p)) != 0:
                raise IOError("video encode failed")
    finally:
        lib.rio_writer_close(wh)


def resize_bilinear_u8(batch: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """(N, H, W, 3) uint8 → (N, oh, ow, 3) uint8, native bilinear."""
    lib = get_lib()
    batch = np.ascontiguousarray(batch, np.uint8)
    n, h, w, _ = batch.shape
    oh, ow = out_hw
    if lib is None:  # numpy fallback
        from PIL import Image
        return np.stack([np.array(Image.fromarray(b).resize((ow, oh),
                                                            Image.BILINEAR))
                         for b in batch])
    out = np.empty((n, oh, ow, 3), np.uint8)
    lib.rio_resize_bilinear_u8(batch.ctypes.data_as(ctypes.c_void_p), n, h, w,
                               out.ctypes.data_as(ctypes.c_void_p), oh, ow)
    return out


def to_gan_range(batch_u8: np.ndarray) -> np.ndarray:
    lib = get_lib()
    batch_u8 = np.ascontiguousarray(batch_u8, np.uint8)
    if lib is None:
        return batch_u8.astype(np.float32) / 127.5 - 1.0
    out = np.empty(batch_u8.shape, np.float32)
    lib.rio_to_gan_range(batch_u8.ctypes.data_as(ctypes.c_void_p),
                         out.ctypes.data_as(ctypes.c_void_p), batch_u8.size)
    return out


def from_gan_range(batch_f32: np.ndarray) -> np.ndarray:
    lib = get_lib()
    batch_f32 = np.ascontiguousarray(batch_f32, np.float32)
    if lib is None:
        return np.clip((batch_f32 + 1.0) * 127.5, 0, 255).astype(np.uint8)
    out = np.empty(batch_f32.shape, np.uint8)
    lib.rio_from_gan_range(batch_f32.ctypes.data_as(ctypes.c_void_p),
                           out.ctypes.data_as(ctypes.c_void_p),
                           batch_f32.size)
    return out


def ffhq_crop_batch(images: np.ndarray, landmarks: np.ndarray,
                    image_size: int = 256):
    """Batched, threaded native FFHQ landmark crop (in-frame fast path of
    `models/face/cropping.py::crop_using_landmarks`, PIL-compatible
    antialiased bicubic). Returns (crops (B, S, S, 3) u8, done (B,) bool);
    where done[i] is False the caller must run the Python slow path
    (out-of-frame box -> reflect-pad + blur + median fade).
    Returns (None, None) when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None, None
    images = np.ascontiguousarray(images, np.uint8)
    landmarks = np.ascontiguousarray(landmarks, np.float32)
    b, h, w, _ = images.shape
    out = np.empty((b, image_size, image_size, 3), np.uint8)
    done = np.zeros((b,), np.int32)
    lib.rio_ffhq_crop_batch(images.ctypes.data_as(ctypes.c_void_p), b, h, w,
                            landmarks.ctypes.data_as(ctypes.c_void_p),
                            out.ctypes.data_as(ctypes.c_void_p), image_size,
                            done.ctypes.data_as(ctypes.c_void_p))
    return out, done.astype(bool)
