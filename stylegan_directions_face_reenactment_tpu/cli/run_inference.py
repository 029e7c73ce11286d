"""Face reenactment inference (reference `run_inference.py`).

Self- or cross-reenactment: invert the source face, optionally PTI-tune the
generator on it, then transfer each target frame's pose+expression. The
device path is batched over target frames (reference loops per frame).

Usage:
  python -m stylegan_directions_face_reenactment_tpu.cli.run_inference \
      --source_path img.png --target_path video.mp4 --output_path ./out
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Neural face reenactment")
    p.add_argument("--source_path", required=True,
                   help="source identity: .png/.jpg/.mp4")
    p.add_argument("--target_path", required=True,
                   help="target pose source: image, folder, or video")
    p.add_argument("--output_path", required=True)
    p.add_argument("--optimize_generator", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="PTI-style per-identity fine-tune (default ON like "
                        "the reference; --no-optimize_generator disables — "
                        "the reference's bare --optimize_generator flag "
                        "confusingly meant disable)")
    p.add_argument("--save_images", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--save_grid", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--save_video", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--video_content", default="grid",
                   choices=["grid", "reenact"],
                   help="what --save_video writes: 'grid' = the "
                        "reference's [source|target|reenacted] rows "
                        "(`utils_inference.py:20-33`); 'reenact' = only "
                        "the reenacted frames — halves the device→host "
                        "payload (no crop download; PERF.md e2e-video "
                        "analysis)")
    p.add_argument("--dataset_type", default="voxceleb")
    p.add_argument("--image_resolution", type=int, default=None,
                   help="override the dataset's generator resolution "
                        "(default: the checkpoint registry's, 256 voxceleb / "
                        "1024 ffhq)")
    p.add_argument("--frame_batch", type=int, default=16,
                   help="target frames per device batch")
    p.add_argument("--video_stride", type=int, default=1)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--deca_alignment", default="fan",
                   choices=["fan", "fan_frame", "resize"],
                   help="DECA preprocessing: 'fan' = the reference's "
                        "SFD-detect → crop → FAN → bbox → similarity warp "
                        "to 224 (decalib/datasets/detectors.py:23-42, "
                        "datasets.py:57-86); 'fan_frame' = FAN directly on "
                        "the 256 frame (no detector pass — faster, "
                        "near-identical for centered FFHQ-crop faces); "
                        "'resize' = plain bilinear (fastest)")
    p.add_argument("--n_devices", type=int, default=None,
                   help="shard target-frame batches over an N-device "
                        "jax.sharding.Mesh (frame data parallelism; "
                        "--frame_batch must divide it)")
    p.add_argument("--skip_preprocess", action="store_true",
                   help="inputs are already FFHQ-cropped 256 faces: bypass "
                        "detection/landmark cropping (also the smoke path "
                        "with --random_init detectors)")
    p.add_argument("--device_crop", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="run the FFHQ crop on device (fused bicubic, ≤1 "
                        "intensity unit vs the PIL host path; out-of-frame "
                        "boxes still take the host pad+fade path). "
                        "--no-device_crop forces the host-exact crop")
    p.add_argument("--detect_width", type=int, default=None,
                   help="rescale frames to this width before detection "
                        "(default: the reference's unconditional 1000, "
                        "`utils_inference.py:67`; 0 = detect at native "
                        "frame size — faster, documented fast path)")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="device compute dtype for the reenactment program "
                        "(synthesis + detection/alignment nets + DECA "
                        "trunk; coefficients stay f32). float32 matches "
                        "the reference bit-for-bit-class numerics "
                        "(`libs/trainer.py:25` is implicit f32); bfloat16 "
                        "is the benched serving config (~halves HBM "
                        "traffic on the MXU path — see PERF.md and the "
                        "drift gate tests/test_parity_gate.py)")
    p.add_argument("--reuse_landmarks", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="single-detection pipeline: feed the preprocessing "
                        "FAN landmarks (mapped into crop coordinates) to "
                        "the DECA kpt68 bbox instead of re-running SFD+FAN "
                        "on every crop inside the alignment (the reference "
                        "re-detects; documented deviation — faster, bbox "
                        "from the raw frame instead of the crop). Needs "
                        "--deca_alignment fan/fan_frame and detection prep")
    return p


def effective_frame_batch(frame_batch: int, generator_size: int,
                          n_devices: int = 1) -> int:
    """Guard the measured XLA tiling pathology at 1024: batch 3-7 synthesis
    compiles to a poor layout for the 1024 tail convolutions and is slower
    in absolute ms than batch 8 (PERF.md FFHQ-1024 table: batch 4 = 26.9
    fps vs batch 8 = 128.6). Chunks shorter than the batch are padded
    anyway, so rounding the batch up to 8 never changes the delivered
    frames — only the padding. With ``n_devices`` > 1 the override rounds
    up to the next multiple of n_devices ≥ 8 so a batch that divided the
    mesh still does after the guard."""
    if generator_size >= 1024 and 2 < frame_batch < 8:
        fb = 8
        if n_devices > 1:
            fb = ((fb + n_devices - 1) // n_devices) * n_devices
        return fb
    return frame_batch


def _run_targets_fused(args, resized, reenact_fused, source_img,
                       source_code, params_source, angles_source,
                       make_fallback, outputs_mode="grid", mesh=None):
    """The fused target loop: raw (detect-width) frames upload as uint8,
    ONE device program per chunk (detect → crop → reenact,
    `pipeline/reenactment.py::reenact_raw_batch`), and ONE reduced u8
    output buffer downloads per chunk — the [crop|reenacted] grid row
    composed on device (``outputs_mode='grid'``; the constant source cell
    is prepended host-side once) or just the reenacted frames
    (``'reenact'``, half the payload, when no grid artifact is
    requested). Host uploads are prefetched 3 chunks deep (the unfused
    loop overlapped exactly one), downloads start asynchronously the
    moment a chunk's program is dispatched, and the host-side work for
    chunk i (PNG saves, the rare out-of-frame fallback) runs while the
    device computes chunk i+1 — a 3-stage software pipeline. Frames
    whose FFHQ box leaves the frame are re-run through the host-exact
    pad+fade crop + the unfused program (rare: real faces are
    overwhelmingly in-frame)."""
    import jax
    from ..utils.image_utils import tensor_to_image

    bi = args.frame_batch
    chunks = [resized[s:s + bi] for s in range(0, len(resized), bi)]
    src_raw = tensor_to_image(np.asarray(source_img))
    src_cell_cache = {}

    def src_cell(h):
        """Source column resized once to the device grid's cell height
        (256 in production; sub-256 for test-scale generators)."""
        if h not in src_cell_cache:
            if src_raw.shape[:2] != (h, h):
                from PIL import Image
                src_cell_cache[h] = np.array(Image.fromarray(src_raw).resize(
                    (h, h), Image.BILINEAR))
            else:
                src_cell_cache[h] = src_raw
        return src_cell_cache[h]

    def upload(chunk):
        arr = np.stack(chunk).astype(np.uint8)
        pad = bi - len(chunk)
        if pad:
            arr = np.concatenate([arr] + [arr[-1:]] * pad)
        # with a mesh the program shards the batch itself
        return arr if mesh is not None else jax.device_put(arr)

    from concurrent.futures import ThreadPoolExecutor
    depth = 3
    pool = ThreadPoolExecutor(2)
    futs = {i: pool.submit(upload, chunks[i])
            for i in range(min(depth, len(chunks)))}

    frames_out = []
    idx = 0
    n_no_face = 0
    fallback = None

    def process(chunk, outs):
        nonlocal idx, n_no_face, fallback
        n = len(chunk)
        if outputs_mode == "grid":
            grid_u8, ok, in_frame, pts = outs
            grid_u8 = np.array(grid_u8)[:n]          # (n, h, 2h, 3)
            half = grid_u8.shape[2] // 2
            crops_u8 = grid_u8[:, :, :half]          # views into the grid:
            reen_u8 = grid_u8[:, :, half:]           # patching them patches it
        else:
            reen_u8, ok, in_frame, pts = outs
            reen_u8 = np.array(reen_u8)[:n]
            crops_u8 = None
        ok = np.asarray(ok)[:n]
        in_frame = np.asarray(in_frame)[:n]
        n_no_face += int((~ok).sum())
        bad = np.nonzero(ok & ~in_frame)[0]
        if bad.size:
            if fallback is None:
                fallback = make_fallback()
            pts_np = np.asarray(pts)[:n]
            crops_f, reen_f, ok_f = fallback([chunk[i] for i in bad],
                                             pts_np[bad])
            for j, i in enumerate(bad):
                if ok_f[j]:
                    if crops_u8 is not None:
                        crops_u8[i] = crops_f[j]
                    reen_u8[i] = reen_f[j]
        for j in range(n):
            if args.save_images:
                from PIL import Image
                Image.fromarray(reen_u8[j]).save(
                    os.path.join(args.output_path, f"{idx:06d}.png"))
            if args.save_grid or args.save_video:
                if outputs_mode == "grid":
                    frame = np.concatenate(
                        [src_cell(grid_u8.shape[1]), grid_u8[j]], axis=1)
                else:
                    frame = reen_u8[j]
                if args.save_grid:
                    gdir = os.path.join(args.output_path, "grids")
                    os.makedirs(gdir, exist_ok=True)
                    from PIL import Image
                    Image.fromarray(frame).save(
                        os.path.join(gdir, f"{idx:06d}.png"))
                if args.save_video:
                    frames_out.append(frame)
            idx += 1

    pending = None
    for ci, chunk in enumerate(chunks):
        dev = futs.pop(ci).result()
        nxt = ci + depth
        if nxt < len(chunks):
            futs[nxt] = pool.submit(upload, chunks[nxt])
        outs = reenact_fused(source_code, params_source, angles_source, dev)
        for o in outs:
            try:
                o.copy_to_host_async()
            except AttributeError:  # non-jax.Array output (mesh path lists)
                pass
        if pending is not None:
            process(*pending)
        pending = (chunk, outs)
    if pending is not None:
        process(*pending)
    pool.shutdown(wait=False)
    if n_no_face:
        print(f"warning: no face detected in {n_no_face} target frame(s)")
    return frames_out


def _load_target_frames(path: str, stride: int):
    from ..native.imgproc import extract_frames
    from ..utils.common import get_image_files
    from ..utils.image_utils import load_image
    if os.path.isdir(path):
        files = get_image_files(path)
        if not files:
            raise FileNotFoundError(f"no images in {path}")
        return [load_image(f) for f in files]
    ext = path.rsplit(".", 1)[-1].lower()
    if ext in ("png", "jpg", "jpeg"):
        return [load_image(path)]
    if ext in ("mp4", "avi"):
        return extract_frames(path, stride=stride)
    raise ValueError(f"unsupported target path: {path}")


def main(argv=None):
    from ..utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_path, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from ..geometry import initialize_directions
    from ..pipeline import make_reenact_fn
    from ..utils.image_utils import (generate_grid_image, load_image,
                                     save_image)
    from .model_loading import (compute_trunc, load_deca,
                                load_direction_matrix, load_e4e,
                                load_face_models, load_generator, load_lpips)

    # --- models -----------------------------------------------------------
    g = load_generator(args.dataset_type, random_init=args.random_init,
                       resolution=args.image_resolution)
    e4e = load_e4e(args.dataset_type, random_init=args.random_init,
                   resolution=args.image_resolution)
    a = load_direction_matrix(args.dataset_type, random_init=args.random_init)
    deca = load_deca(random_init=args.random_init)
    need_fan = args.deca_alignment in ("fan", "fan_frame")
    sfd = fan = None
    if not args.skip_preprocess or need_fan:
        sfd, fan = load_face_models(random_init=args.random_init)
    fan_deca = fan if need_fan else None
    sfd_deca = sfd if args.deca_alignment == "fan" else None
    spec = initialize_directions(args.dataset_type, 15, 6.0)
    trunc = compute_trunc(g)

    # the FFHQ crop is 256 regardless of the generator's size — e4e /
    # ArcFace / DECA consume the 256 crop; only synthesis emits
    # g.meta.size (`ffhq_cropping.py:50`; see pipeline/source_setup.py)
    from ..pipeline import make_prep_fn, setup_source
    if args.reuse_landmarks and (args.skip_preprocess
                                 or args.deca_alignment == "resize"):
        raise ValueError("--reuse_landmarks needs the detection prep and a "
                         "bbox-based --deca_alignment (fan/fan_frame)")
    prep = make_prep_fn(sfd, fan, skip_preprocess=args.skip_preprocess,
                        device_crop=args.device_crop,
                        return_landmarks=args.reuse_landmarks,
                        detect_width=args.detect_width)

    # --- source -----------------------------------------------------------
    ext = args.source_path.rsplit(".", 1)[-1].lower()
    if ext in ("mp4", "avi"):
        from ..native.imgproc import extract_frames
        src_raw = [extract_frames(args.source_path, get_only_first=True)[0]]
    else:
        src_raw = [load_image(args.source_path)]
    lp = (load_lpips(random_init=args.random_init)
          if args.optimize_generator else None)
    (source_img, source_code, g_src, params_source,
     angles_source) = setup_source(
        g, e4e, deca, src_raw, prep, truncation_latent=trunc,
        optimize_generator=args.optimize_generator, lpips_params=lp,
        fan_params=fan_deca, s3fd_params=sfd_deca)

    # --- targets, batched -------------------------------------------------
    frames = _load_target_frames(args.target_path, args.video_stride)
    print(f"Run reenactment for {len(frames)} frames")
    # mesh divisibility is checked against the USER's frame_batch first, so
    # the error cites the value they set; the 1024 tiling-pathology override
    # then rounds up in multiples of n_devices (divisibility preserved)
    n_dev = args.n_devices or 1
    mesh = None
    if n_dev > 1:
        if args.frame_batch % n_dev:
            raise ValueError("--n_devices must divide --frame_batch")
        from ..parallel import make_mesh
        mesh = make_mesh(n_dev)
    fb = effective_frame_batch(args.frame_batch, g["meta"]["size"], n_dev)
    if fb != args.frame_batch:
        print(f"frame_batch {args.frame_batch} at "
              f"{g['meta']['size']} hits a measured XLA tiling pathology "
              f"(PERF.md); padding batches to {fb}")
        args.frame_batch = fb
    compute_dtype = (jnp.bfloat16 if args.compute_dtype == "bfloat16"
                     else jnp.float32)

    # fused fast path (default): detect → crop → reenact as ONE device
    # program per chunk, uint8 both ways, no host sync inside the chunk
    use_fused = args.device_crop and not args.skip_preprocess
    resized = None
    if use_fused:
        from ..pipeline.preprocess import DETECT_WIDTH, resize_width
        dw = (DETECT_WIDTH if args.detect_width is None
              else args.detect_width)
        resized = ([resize_width(np.asarray(f), dw) for f in frames] if dw
                   else [np.asarray(f) for f in frames])
        if len({im.shape for im in resized}) != 1:
            use_fused = False  # mixed frame shapes: bucketed unfused path
    if use_fused:
        from ..pipeline import make_fused_reenact_fn
        # reduced device→host payload: one [crop|reenacted] u8 grid row
        # when any grid artifact is requested, reenacted frames only
        # otherwise (half the bytes; the crop never crosses the link)
        need_crops = args.save_grid or (args.save_video
                                        and args.video_content == "grid")
        outputs_mode = "grid" if need_crops else "reenact"
        reenact_fused = make_fused_reenact_fn(
            g_src, a, deca, spec, sfd, fan, truncation=0.7,
            truncation_latent=trunc, fan_params=fan_deca,
            s3fd_params=sfd_deca, reuse_landmarks=args.reuse_landmarks,
            compute_dtype=compute_dtype, outputs=outputs_mode, mesh=mesh)

        def make_fallback():
            # host-exact pad+blur+fade crop + the unfused program, for the
            # rare out-of-frame boxes (always the faithful full alignment)
            import jax.numpy as jnp
            from ..models.face.cropping import crop_using_landmarks_batch
            from ..pipeline.source_setup import pad_batch
            reenact_host = make_reenact_fn(
                g_src, a, deca, spec, truncation=0.7,
                truncation_latent=trunc, fan_params=fan_deca,
                s3fd_params=sfd_deca, compute_dtype=compute_dtype)

            def fb(frames_list, lms):
                crops, cok = crop_using_landmarks_batch(
                    frames_list, list(lms), image_size=256)
                gan = np.asarray(crops, np.float32) / 127.5 - 1.0
                tgt = pad_batch(gan, args.frame_batch - len(frames_list))
                reen = np.asarray(reenact_host(
                    source_code, params_source, angles_source,
                    jnp.asarray(tgt))[0])[:len(frames_list)]
                reen_u8 = np.round(
                    np.clip((reen + 1.0) * 127.5, 0, 255)).astype(np.uint8)
                return np.asarray(crops, np.uint8), reen_u8, np.asarray(cok)

            return fb

        frames_out = _run_targets_fused(args, resized, reenact_fused,
                                        source_img, source_code,
                                        params_source, angles_source,
                                        make_fallback,
                                        outputs_mode=outputs_mode, mesh=mesh)
        if args.save_video and frames_out:
            from ..native.imgproc import generate_video
            generate_video(frames_out, os.path.join(args.output_path,
                                                    "generated_video.mp4"))
        print("done")
        return

    reenact = make_reenact_fn(g_src, a, deca, spec, truncation=0.7,
                              truncation_latent=trunc, fan_params=fan_deca,
                              s3fd_params=sfd_deca, mesh=mesh,
                              compute_dtype=compute_dtype,
                              reuse_landmarks=args.reuse_landmarks)

    grids = []
    bi = args.frame_batch
    idx = 0
    # host preprocessing of chunk i+1 overlaps device reenactment of chunk
    # i (the reference's loop is fully sequential, `run_inference.py:170-195`)
    from concurrent.futures import ThreadPoolExecutor
    chunks = [frames[s:s + bi] for s in range(0, len(frames), bi)]
    pool = ThreadPoolExecutor(1)
    fut = pool.submit(prep, chunks[0]) if chunks else None

    from ..pipeline.source_setup import pad_batch as _pad

    for ci, chunk in enumerate(chunks):
        res = fut.result()
        tgt_batch, ok = res[0], res[1]
        if ci + 1 < len(chunks):
            fut = pool.submit(prep, chunks[ci + 1])
        pad = bi - len(chunk)
        tgt = _pad(tgt_batch, pad)
        if args.reuse_landmarks:
            reenacted = reenact(source_code, params_source, angles_source,
                                jnp.asarray(tgt),
                                jnp.asarray(_pad(res[2], pad)),
                                jnp.asarray(_pad(ok, pad)))[0]
        else:
            reenacted = reenact(source_code, params_source, angles_source,
                                jnp.asarray(tgt))[0]
        reenacted = np.asarray(reenacted)[:len(chunk)]
        for j in range(len(chunk)):
            if args.save_images:
                save_image(reenacted[j],
                           os.path.join(args.output_path, f"{idx:06d}.png"))
            need_grid = args.save_grid or (args.save_video
                                           and args.video_content == "grid")
            if need_grid:
                grid = generate_grid_image(np.asarray(source_img),
                                           tgt_batch[j:j + 1],
                                           reenacted[j:j + 1])
                if args.save_grid:
                    gdir = os.path.join(args.output_path, "grids")
                    os.makedirs(gdir, exist_ok=True)
                    from PIL import Image
                    Image.fromarray(grid).save(
                        os.path.join(gdir, f"{idx:06d}.png"))
            if args.save_video:
                if args.video_content == "reenact":
                    from ..utils.image_utils import tensor_to_image
                    grids.append(tensor_to_image(reenacted[j]))
                else:
                    grids.append(grid)
            idx += 1
    pool.shutdown(wait=False)

    if args.save_video and grids:
        from ..native.imgproc import generate_video
        generate_video(grids,
                       os.path.join(args.output_path, "generated_video.mp4"))
    print("done")


if __name__ == "__main__":
    main()
