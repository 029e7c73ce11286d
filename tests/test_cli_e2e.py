"""End-to-end gates on the BUNDLED reference examples
(`/root/reference/inference_examples/`): each BASELINE.json config has a
driving test (VERDICT round-1 item 4). Checkpoints are absent in CI, so
these run `--random_init` and gate the full artifact layout + finiteness,
not pixel quality. All tests drive the real CLI mains on the real files.
"""

import glob
import os

import numpy as np
import pytest
from PIL import Image

EXAMPLES = "/root/reference/inference_examples"
PNG = os.path.join(EXAMPLES, "0002775.png")
MP4S = glob.glob(os.path.join(EXAMPLES, "*.mp4"))

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.exists(PNG),
                       reason="bundled reference examples unavailable"),
]

RES = "64"  # small generator: CPU-compilable; layout identical to 256


def _finite_png(path):
    arr = np.asarray(Image.open(path))
    assert arr.size > 0
    assert np.isfinite(arr.astype(np.float32)).all()
    return arr


def test_facial_editing_on_bundled_png(tmp_path):
    """BASELINE config 1: single-image edit of 0002775.png — per-direction
    pngs + GIFs (`run_facial_editing.py:209-250` output layout)."""
    from stylegan_directions_face_reenactment_tpu.cli.run_facial_editing import (
        main)
    out = tmp_path / "edit"
    main(["--source_path", PNG, "--output_path", str(out),
          "--directions", "0", "4", "--save_gif", "--random_init",
          "--skip_preprocess", "--image_resolution", RES,
          "--shifts_count", "4"])
    ddirs = [d for d in sorted(os.listdir(out)) if (out / d).is_dir()]
    assert len(ddirs) == 2
    for d in ddirs:
        pngs = sorted(glob.glob(str(out / d / "*.png")))
        assert len(pngs) >= 4
        _finite_png(pngs[0])
    gifs = glob.glob(str(out / "*.gif"))
    assert len(gifs) == 2


def test_facial_editing_full_preprocess_path(tmp_path):
    """The same edit WITHOUT --skip_preprocess: the real SFD→FAN→FFHQ-crop
    preprocessing runs on the bundled png. Random-init detectors rarely
    clear the 0.99 confidence gate, so either a full success or the
    documented no-face failure is a correct outcome — a crash is not."""
    from stylegan_directions_face_reenactment_tpu.cli.run_facial_editing import (
        main)
    out = tmp_path / "edit_pp"
    try:
        # --detect_width 0: native-size detection keeps the CPU SFD forward
        # tractable; the default 1000-width rescale (reference parity) is
        # unit-tested against the live reference resize
        main(["--source_path", PNG, "--output_path", str(out),
              "--directions", "0", "--random_init", "--detect_width", "0",
              "--image_resolution", RES, "--shifts_count", "2"])
    except RuntimeError as e:
        assert "no face detected" in str(e)
    else:
        assert glob.glob(str(out / "*" / "*.png"))


def test_run_inference_self_reenactment_on_bundled_mp4(tmp_path):
    """BASELINE config 2: self-reenactment — source frame of the bundled
    video driven by its own frames. Gates the reference's artifact layout
    (`run_inference.py:157-254`): per-frame pngs, grids/, and
    generated_video.mp4."""
    if not MP4S:
        pytest.skip("no bundled mp4")
    from stylegan_directions_face_reenactment_tpu.cli.run_inference import main
    out = tmp_path / "self"
    main(["--source_path", MP4S[0], "--target_path", MP4S[0],
          "--output_path", str(out), "--random_init", "--skip_preprocess",
          "--image_resolution", RES, "--frame_batch", "4",
          "--video_stride", "40", "--save_images", "--save_grid",
          "--no-optimize_generator"])
    frames = sorted(glob.glob(os.path.join(str(out), "[0-9]" * 6 + ".png")))
    assert frames, "no per-frame reenactment pngs written"
    _finite_png(frames[0])
    grids = sorted(glob.glob(str(out / "grids" / "*.png")))
    assert len(grids) == len(frames)
    g = _finite_png(grids[0])
    assert g.shape[1] == 3 * g.shape[0]  # source | target | reenacted strip
    video = out / "generated_video.mp4"
    assert video.exists() and video.stat().st_size > 0


def test_run_inference_full_preprocess_fused_path(tmp_path):
    """run_inference WITHOUT --skip_preprocess: the fused
    detect→crop→reenact device program (the default --device_crop path)
    drives the target loop. Random-init detectors rarely clear the 0.99
    confidence gate, so either a full success or the documented no-face
    failure on the SOURCE is a correct outcome — a crash is not."""
    if not MP4S:
        pytest.skip("no bundled mp4")
    from stylegan_directions_face_reenactment_tpu.cli.run_inference import main
    out = tmp_path / "fused"
    try:
        main(["--source_path", PNG, "--target_path", MP4S[0],
              "--output_path", str(out), "--random_init",
              "--detect_width", "0", "--image_resolution", RES,
              "--frame_batch", "2", "--video_stride", "60",
              "--save_images", "--no-optimize_generator"])
    except RuntimeError as e:
        assert "no face detected" in str(e)
    else:
        frames = sorted(glob.glob(os.path.join(str(out),
                                               "[0-9]" * 6 + ".png")))
        assert frames
        _finite_png(frames[0])


def test_run_inference_cross_subject(tmp_path):
    """BASELINE config 3 (proxy): cross-subject — bundled png source driven
    by the bundled video's frames."""
    if not MP4S:
        pytest.skip("no bundled mp4")
    from stylegan_directions_face_reenactment_tpu.cli.run_inference import main
    out = tmp_path / "cross"
    main(["--source_path", PNG, "--target_path", MP4S[0],
          "--output_path", str(out), "--random_init", "--skip_preprocess",
          "--image_resolution", RES, "--frame_batch", "4",
          "--video_stride", "40", "--save_images",
          "--no-optimize_generator"])
    frames = sorted(glob.glob(os.path.join(str(out), "[0-9]" * 6 + ".png")))
    assert frames
    _finite_png(frames[0])
    assert (out / "generated_video.mp4").exists()


def _make_tree_from_video(root, n_frames=4, size=64):
    """Fabricate a VoxCeleb id/video/frames_cropped tree from the bundled
    mp4's real frames."""
    from stylegan_directions_face_reenactment_tpu.native.imgproc import (
        extract_frames, resize_bilinear_u8)
    frames = extract_frames(MP4S[0], stride=40)[:n_frames]
    fdir = os.path.join(root, "id00001", "videoA", "frames_cropped")
    os.makedirs(fdir, exist_ok=True)
    for i, f in enumerate(frames):
        small = resize_bilinear_u8(f[None].astype(np.uint8), (size, size))[0]
        Image.fromarray(small).save(os.path.join(fdir, f"{i:06d}.png"))
    return len(frames)


def test_invert_images_cli_on_bundled_frames(tmp_path):
    """BASELINE config 4: batched e4e inversion of a VoxCeleb tree →
    inversion/frames/*.png + inversion/latent_codes/*.npy
    (`invert_images.py:93-127` output layout)."""
    if not MP4S:
        pytest.skip("no bundled mp4")
    from stylegan_directions_face_reenactment_tpu.cli.invert_images import main
    from stylegan_directions_face_reenactment_tpu.models import n_latent_for
    data = tmp_path / "vox"
    n = _make_tree_from_video(str(data))
    main(["--dataset_path", str(data), "--random_init",
          "--image_resolution", RES, "--batch_size", "2"])
    base = data / "id00001" / "videoA" / "inversion"
    pngs = sorted(glob.glob(str(base / "frames" / "*.png")))
    npys = sorted(glob.glob(str(base / "latent_codes" / "*.npy")))
    assert len(pngs) == n and len(npys) == n
    code = np.load(npys[0])
    assert code.shape == (n_latent_for(int(RES)), 512)
    assert np.isfinite(code).all()
    _finite_png(pngs[0])


def test_run_trainer_cli_smoke(tmp_path):
    """BASELINE config 5: run_trainer CLI end to end (paired method) on a
    tree fabricated from the bundled video frames."""
    if not MP4S:
        pytest.skip("no bundled mp4")
    from stylegan_directions_face_reenactment_tpu.cli.invert_images import (
        main as invert_main)
    from stylegan_directions_face_reenactment_tpu.cli.run_trainer import (
        main as trainer_main)
    data = tmp_path / "vox"
    _make_tree_from_video(str(data))
    invert_main(["--dataset_path", str(data), "--random_init",
                 "--image_resolution", RES, "--batch_size", "2"])
    exp = tmp_path / "exp"
    trainer_main(["--training_method", "paired", "--random_init",
                  "--image_resolution", RES, "--batch_size", "2",
                  "--n_steps", "1", "--no_evaluation",
                  "--deca_alignment", "resize",
                  "--train_dataset_path", str(data),
                  "--test_dataset_path", str(data),
                  "--experiment_path", str(exp)])
    exp_dir = f"{exp}_voxceleb_paired"
    assert os.path.exists(os.path.join(exp_dir, "arguments.json"))
    log = os.path.join(exp_dir, "logs", "train_log.jsonl")
    assert os.path.exists(log)
    import json
    rec = json.loads(open(log).readline())
    assert np.isfinite(rec["loss"])


def test_run_trainer_cli_n_devices(tmp_path):
    """run_trainer --n_devices 2: the CLI builds the mesh and trains
    data-parallel (conftest provides 8 virtual CPU devices)."""
    if not MP4S:
        pytest.skip("no bundled mp4")
    from stylegan_directions_face_reenactment_tpu.cli.invert_images import (
        main as invert_main)
    from stylegan_directions_face_reenactment_tpu.cli.run_trainer import (
        main as trainer_main)
    data = tmp_path / "vox"
    _make_tree_from_video(str(data), n_frames=4)
    invert_main(["--dataset_path", str(data), "--random_init",
                 "--image_resolution", RES, "--batch_size", "2"])
    exp = tmp_path / "exp"
    trainer_main(["--training_method", "paired", "--random_init",
                  "--image_resolution", RES, "--batch_size", "2",
                  "--n_steps", "1", "--no_evaluation",
                  "--deca_alignment", "resize", "--n_devices", "2",
                  "--train_dataset_path", str(data),
                  "--test_dataset_path", str(data),
                  "--experiment_path", str(exp)])
    import json
    log = os.path.join(f"{exp}_voxceleb_paired", "logs", "train_log.jsonl")
    rec = json.loads(open(log).readline())
    assert np.isfinite(rec["loss"])


def test_parity_report_random_init(tmp_path):
    """The quality-parity harness (`cli/parity_report.py`) runs end-to-end
    with --random_init: self-reenactment over the bundled mp4, the three
    `utils_train.py:695-732` metrics, PARITY_REPORT.json with the
    unverified label, and a gate verdict against a supplied reference
    metrics file."""
    if not MP4S:
        pytest.skip("no bundled mp4")
    import json
    from stylegan_directions_face_reenactment_tpu.cli.parity_report import (
        main)
    ref = tmp_path / "ref.json"
    ref.write_text(json.dumps({"csim": 0.99, "pose": 0.5, "exp": 0.1}))
    out = tmp_path / "report"
    # fan_frame: the FAN alignment program runs but cannot fail detection —
    # random-init SFD never clears the 0.99 gate under the default 'fan'
    # mode, and the harness (correctly) refuses a report with zero
    # detected frames
    rep = main(["--target_path", MP4S[0], "--output_path", str(out),
                "--random_init", "--skip_preprocess",
                "--deca_alignment", "fan_frame",
                "--image_resolution", RES, "--frame_batch", "4",
                "--video_stride", "60", "--no-optimize_generator",
                "--reference_metrics", str(ref)])
    saved = json.loads((out / "PARITY_REPORT.json").read_text())
    for rec in (rep, saved):
        m = rec["metrics"]
        assert np.isfinite([m["csim"], m["pose_error_deg"],
                            m["expression_error"]]).all()
        assert -1.0 <= m["csim"] <= 1.0
        assert rec["checkpoints"] == "random_init"
        assert rec["verified"] is False
        assert rec["self_reenactment"] is True
        assert rec["n_frames"] > 0
        assert rec["n_frames_dropped_no_detection"] == 0
        assert rec["gate"]["tolerance"] == 0.01
        assert set(rec["gate"]["checks"]) == {"csim", "pose", "exp"}
        assert rec["compute_dtype"] == "float32"


def test_parity_report_bf16(tmp_path):
    """--compute_dtype bfloat16: the reenact program under test runs at
    the benched serving dtype while the metric programs stay f32 — the
    report is labeled with the dtype so serving-drift runs are
    distinguishable (r4 VERDICT #2b)."""
    if not MP4S:
        pytest.skip("no bundled mp4")
    import json
    from stylegan_directions_face_reenactment_tpu.cli.parity_report import (
        main)
    out = tmp_path / "report"
    rep = main(["--target_path", MP4S[0], "--output_path", str(out),
                "--random_init", "--skip_preprocess",
                "--deca_alignment", "fan_frame",
                "--image_resolution", RES, "--frame_batch", "4",
                "--video_stride", "90", "--no-optimize_generator",
                "--compute_dtype", "bfloat16"])
    m = rep["metrics"]
    assert np.isfinite([m["csim"], m["pose_error_deg"],
                        m["expression_error"]]).all()
    assert rep["compute_dtype"] == "bfloat16"


def test_extract_statistics_cli(tmp_path):
    """The fifth entry point (`extract_statistics.py:58-109`): N synthetic
    samples → DECA coefficient rows → ranges_{dataset}.npy of shape (54, 2)
    with min <= max per dimension. 'resize' alignment: random-init SFD
    would fail every sample under the default 'fan' mode, which the CLI now
    (correctly) refuses to turn into a ranges file."""
    from stylegan_directions_face_reenactment_tpu.cli.extract_statistics import (
        main)
    main(["--output_path", str(tmp_path), "--num_samples", "6",
          "--batch_size", "3", "--random_init", "--deca_alignment",
          "resize", "--dataset_type", "voxceleb",
          "--image_resolution", RES])
    ranges = np.load(tmp_path / "ranges_voxceleb.npy")
    assert ranges.shape == (54, 2)
    assert np.isfinite(ranges).all()
    assert (ranges[:, 0] <= ranges[:, 1]).all()


def test_extract_statistics_sentinel_filter():
    """Detection-failure rows (-180° angles, zeroed coefficients) must not
    reach the min/max reduction; all-failed raises instead of writing a
    meaningless ranges file."""
    from stylegan_directions_face_reenactment_tpu.cli.extract_statistics import (
        filter_detected_rows)
    good = np.random.default_rng(0).normal(size=(5, 54)).astype(np.float32)
    bad = np.zeros((2, 54), np.float32)
    bad[:, :3] = -180.0
    kept = filter_detected_rows(np.concatenate([good, bad]))
    np.testing.assert_array_equal(kept, good)
    with pytest.raises(RuntimeError, match="every sample"):
        filter_detected_rows(bad)


def test_run_inference_reuse_landmarks_needs_detection_prep(tmp_path):
    """--reuse_landmarks is a single-detection pipeline: it needs the
    SFD+FAN prep (no landmarks exist with --skip_preprocess) and a
    bbox-based alignment."""
    from stylegan_directions_face_reenactment_tpu.cli.run_inference import main
    with pytest.raises(ValueError, match="reuse_landmarks"):
        main(["--source_path", PNG, "--target_path", PNG,
              "--output_path", str(tmp_path), "--random_init",
              "--skip_preprocess", "--reuse_landmarks",
              "--image_resolution", RES, "--no-optimize_generator"])
    with pytest.raises(ValueError, match="reuse_landmarks"):
        main(["--source_path", PNG, "--target_path", PNG,
              "--output_path", str(tmp_path), "--random_init",
              "--deca_alignment", "resize", "--reuse_landmarks",
              "--image_resolution", RES, "--no-optimize_generator"])
