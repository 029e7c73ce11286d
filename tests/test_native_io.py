"""Native IO runtime tests (libav decode/encode, batch preprocessing)."""

import os

import numpy as np
import pytest

from stylegan_directions_face_reenactment_tpu.native import imgproc

pytestmark = pytest.mark.skipif(not imgproc.native_available(),
                                reason="native IO lib unavailable")

REF_MP4 = "/root/reference/inference_examples/lWOTF8SdzJw#2614-2801.mp4"


def test_range_roundtrip(rng):
    u8 = (rng.rand(2, 16, 16, 3) * 255).astype(np.uint8)
    g = imgproc.to_gan_range(u8)
    assert g.dtype == np.float32 and g.min() >= -1 and g.max() <= 1
    back = imgproc.from_gan_range(g)
    np.testing.assert_array_equal(back, u8)


def test_resize_bilinear(rng):
    u8 = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
    out = imgproc.resize_bilinear_u8(u8, (32, 32))
    assert out.shape == (2, 32, 32, 3)
    # constant image stays constant
    const = np.full((1, 64, 64, 3), 77, np.uint8)
    np.testing.assert_array_equal(imgproc.resize_bilinear_u8(const, (32, 32)),
                                  np.full((1, 32, 32, 3), 77, np.uint8))


def test_encode_decode_roundtrip(tmp_path, rng):
    frames = [(rng.rand(64, 64, 3) * 255).astype(np.uint8) for _ in range(6)]
    path = str(tmp_path / "t.mp4")
    imgproc.generate_video(frames, path, fps=10)
    assert os.path.getsize(path) > 0
    back = imgproc.extract_frames(path)
    assert len(back) >= 5
    assert back[0].shape == (64, 64, 3)


@pytest.mark.skipif(not os.path.exists(REF_MP4),
                    reason="reference example video absent")
def test_decode_reference_example_strided():
    fr = imgproc.extract_frames(REF_MP4, stride=24, max_frames=4)
    assert 1 <= len(fr) <= 4
    assert fr[0].shape == (720, 1280, 3)
    first = imgproc.extract_frames(REF_MP4, get_only_first=True)
    assert len(first) == 1
    np.testing.assert_array_equal(first[0], fr[0])
