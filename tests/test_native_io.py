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


def test_native_ffhq_crop_matches_python():
    """The native threaded FFHQ crop (PIL-compatible antialiased bicubic,
    u8-quantized intermediate pass) must match crop_using_landmarks within
    1 intensity unit on in-frame boxes, and defer out-of-frame boxes to
    the Python slow path."""
    from stylegan_directions_face_reenactment_tpu.models.face.cropping import (
        crop_using_landmarks, crop_using_landmarks_batch)
    from stylegan_directions_face_reenactment_tpu.native.imgproc import (
        ffhq_crop_batch, get_lib)
    if get_lib() is None:
        import pytest
        pytest.skip("native runtime unavailable")
    rng = np.random.RandomState(0)
    imgs = (rng.rand(4, 300, 300, 3) * 255).astype(np.uint8)
    lms = (rng.rand(4, 68, 2) * 80 + 110).astype(np.float32)   # in-frame
    crops, done = ffhq_crop_batch(imgs, lms)
    assert done.all()
    for i in range(4):
        ref = crop_using_landmarks(imgs[i], lms[i])
        diff = np.abs(crops[i].astype(int) - ref.astype(int))
        assert diff.max() <= 1, diff.max()

    # out-of-frame landmarks: native defers, batch helper falls back
    lms_oob = lms.copy()
    lms_oob[0] -= 100.0
    _, done2 = ffhq_crop_batch(imgs, lms_oob)
    assert not done2[0] and done2[1:].all()
    out, ok = crop_using_landmarks_batch(list(imgs), lms_oob)
    assert ok.all()
    ref0 = crop_using_landmarks(imgs[0], lms_oob[0])
    np.testing.assert_array_equal(out[0], ref0)


def test_video_write_read_roundtrip_exact():
    """Every written frame decodes back, in order (h264 writer + trailing
    duplicate frame working around this libav build's swallowed-last-sample
    flush defect)."""
    import tempfile, os
    from stylegan_directions_face_reenactment_tpu.native.imgproc import (
        extract_frames, generate_video, get_lib)
    if get_lib() is None:
        import pytest
        pytest.skip("native runtime unavailable")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "rt.mp4")
        n = 23
        frames = [np.full((48, 48, 3), (i * 9) % 250, np.uint8)
                  for i in range(n)]
        generate_video(frames, path)
        back = extract_frames(path)
        assert len(back) == n
        vals = [int(round(b.mean() / 9)) for b in back]
        assert vals == [((i * 9) % 250) // 9 for i in range(n)]
        # stride decimation still works
        assert len(extract_frames(path, stride=5)) == (n + 1 + 4) // 5
