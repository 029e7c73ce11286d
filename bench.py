"""Benchmark: reenacted 256x256 frames/sec/chip on the flagship pipeline.

One JSON line. Every image-path number is reported at the compute dtype
stated here; the CLI reaches either via `--compute_dtype`:

  * value / "reenact_fps_256" — bf16 (the benched serving config, CLI
    `--compute_dtype bfloat16`): the device-side reenactment path exactly
    as the reference computes it per frame: SFD-crop→FAN DECA alignment
    (`decalib/datasets/detectors.py:23-42` + `datasets.py:57-86`) → DECA
    shape regression → Δp → direction-matrix shift → StyleGAN2 synthesis,
    batched over frames as ONE jitted program (the reference loops per
    frame, `run_inference.py:170-195`).
  * "reenact_fps_256_f32" — the same program at float32, the CLI default
    and the parity-suite dtype (the reference's implicit dtype,
    `libs/trainer.py:25`).
  * "full_path_fps" — apples-to-apples with the reference's whole loop AT
    THE FAITHFUL DETECTION SHAPE: frames rescaled to width 1000 exactly
    like `utils_inference.py:67` (the CLI default), then SFD detection +
    FAN landmarks + FFHQ crop + the reenactment program, fused into ONE
    device dispatch per chunk (`pipeline/reenactment.py::reenact_raw_batch`,
    the CLI's default --device_crop path). uint8 both ways, no host sync
    mid-chunk; only out-of-frame boxes would take the host pad+fade
    fallback (none in this stream).
  * "full_path_fps_detect480" — the same loop detecting at native 480²
    (the CLI's `--detect_width 0` fast path; ~4.3× fewer detection FLOPs
    than width-1000).
  * "full_path_realistic_fps" — full_path_fps's program on a
    generator-synthesized moving face clip (deterministic keys) instead
    of uniform noise: real-image statistics through the data-dependent
    host stages (top-k/NMS are fixed-shape on device, but ok/in-frame
    routing is content-dependent). Detector weights are random-init in
    this environment, so box statistics still differ from production.
  * "full_path_reuse_lms_fps" — the single-detection variant
    (`--reuse_landmarks`, width-1000 detection): the preprocessing FAN
    landmarks, mapped into crop coordinates, feed the DECA kpt68 bbox
    directly — no second SFD+FAN pass inside the alignment (documented
    deviation; the reference re-detects on every crop).
  * "full_path_host_crop_fps" — the 480² loop with the host-side native
    crop (the `--no-device_crop` CLI path), host work pipelined against
    device compute the way the CLI overlaps them.
  * "fan_frame_fps" / "resize_fps" — the lighter DECA alignments
    (`--deca_alignment fan_frame` / `resize`).
  * "e2e_video_fps" — TRUE video→video: libav mp4 decode → fused reenact
    → mp4 encode, host work pipelined 3 chunks deep like the CLI, with
    the CLI's device-composed [crop|reenacted] u8 grid row (ONE download
    per chunk; the constant source cell is prepended host-side).
    Matches `run_inference.py:157-199` end to end, including IO.
  * "e2e_video_reenact_fps" — the `--video_content reenact` variant:
    only the reenacted frames cross the link (half the payload).
  * "train_paired_imgs_per_s" / "train_b16_imgs_per_s" — the paired
    cached-GT train step at batch 12 (reference default) / 16 (the
    measured TPU knee, PERF.md).
  * "ffhq1024_fps" — the 1024 FFHQ generator config (BASELINE.md's
    optional row): fused reenact with resize alignment at batch 8, bf16.
  * "e4e_inversion_ips" — e4e W+ inversion images/s at batch 16
    (`invert_images.py` path), distinct input per call (tunnel dedup).
  * "pti_warm_s" — the 200-step PTI per-identity generator fine-tune
    (`libs/optimization.py:25-72`), warm one-scan wall seconds.

vs_baseline is relative to the 500 fps/chip north-star target (BASELINE.md;
the reference publishes no numbers).
"""

import json
import time

import numpy as np


def _time_loop(fn, iters=30):
    out = fn()  # warm-up / compile
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _require_devices(timeout_s: float) -> None:
    """Fail fast if the accelerator backend never initializes.

    With the tunneled TPU endpoint down, `jax.devices()` blocks forever
    inside backend init (env vars cannot prevent it — see
    .claude/skills/verify/SKILL.md). A bench that hangs indefinitely is
    worse than one that exits with a diagnosis; probe from a daemon
    thread and bail if the backend does not come up in time."""
    import os
    import sys
    import threading

    done = threading.Event()

    def probe():
        import jax
        jax.devices()
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(f"bench: accelerator backend failed to initialize within "
              f"{timeout_s:.0f}s (TPU tunnel down?); aborting",
              file=sys.stderr)
        os._exit(2)


def main():
    import os

    _require_devices(float(os.environ.get("REENACT_BENCH_DEVICE_TIMEOUT",
                                          "600")))
    import jax
    import jax.numpy as jnp

    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    backend = os.environ.get("REENACT_RESAMPLE_BACKEND")
    if backend:
        from stylegan_directions_face_reenactment_tpu.ops.upfirdn2d import (
            set_resample_backend)
        set_resample_backend(backend)

    from stylegan_directions_face_reenactment_tpu.geometry import (
        initialize_directions)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_generator, mean_latent, init_direction_matrix, n_latent_for)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.face import (
        estimate_landmarks, init_fan, init_s3fd)
    from stylegan_directions_face_reenactment_tpu.pipeline.reenactment import (
        make_reenact_fn, source_shape)

    from stylegan_directions_face_reenactment_tpu.utils.common import jit_build

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)

    size = 256
    batch = 16
    compute_dtype = jnp.bfloat16

    # per-model jitted inits: eager init pays one dispatch+compile
    # round-trip per leaf (~2 min total on the tunneled TPU)
    g = jit_build(lambda k: init_generator(k, size=size), ks[0])
    deca = jit_build(lambda k: init_deca(
        k, synthetic_flame_params(jax.random.fold_in(k, 1), n_verts=5023,
                                  n_faces=9976), with_detail=False), ks[1])
    a = jit_build(lambda k: init_direction_matrix(k, 512, 15, w_plus=True,
                                                  num_layers=8), ks[3])
    trunc = jax.jit(lambda k: mean_latent(g, k, 4096))(ks[4])
    fan = jit_build(init_fan, ks[8])
    sfd = jit_build(init_s3fd, ks[9])
    spec = initialize_directions("voxceleb", 15, 6.0)

    source_img = jax.random.uniform(ks[5], (1, 256, 256, 3),
                                    minval=-1.0, maxval=1.0)

    from stylegan_directions_face_reenactment_tpu.train.steps import (
        merge_statics as _merge, strip_statics as _strip)
    src_w, src_statics = _strip((deca, fan))

    @jax.jit
    def _src_shape(w, img):
        deca_p, fan_p = _merge(w, src_statics)
        return source_shape(deca_p, img, fan_params=fan_p)

    params_source, angles_source = _src_shape(src_w, source_img)
    source_code = jax.random.normal(ks[6], (1, n_latent_for(size), 512))
    targets = jax.random.uniform(ks[7], (batch, 256, 256, 3),
                                 minval=-1.0, maxval=1.0)

    fn_fan = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                             truncation_latent=trunc,
                             compute_dtype=compute_dtype, fan_params=fan,
                             s3fd_params=sfd)
    fn_fan_f32 = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                                 truncation_latent=trunc,
                                 compute_dtype=jnp.float32, fan_params=fan,
                                 s3fd_params=sfd)
    fn_fan_frame = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                                   truncation_latent=trunc,
                                   compute_dtype=compute_dtype,
                                   fan_params=fan)
    fn_resize = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                                truncation_latent=trunc,
                                compute_dtype=compute_dtype)

    dt_fan = _time_loop(lambda: fn_fan(source_code, params_source,
                                       angles_source, targets)[0])
    dt_fan_f32 = _time_loop(lambda: fn_fan_f32(source_code, params_source,
                                               angles_source, targets)[0])
    dt_fan_frame = _time_loop(lambda: fn_fan_frame(
        source_code, params_source, angles_source, targets)[0])
    dt_resize = _time_loop(lambda: fn_resize(source_code, params_source,
                                             angles_source, targets)[0])

    # ---- full per-frame path: SFD detect + FAN landmarks + FFHQ crop +
    # FAN-aligned DECA + Δp + A + synthesis (reference loop
    # `run_inference.py:170-195`) — ONE fused device program per chunk
    # (`pipeline/reenactment.py::reenact_raw_batch`, the CLI's default
    # --device_crop path): no host sync between detection and synthesis --
    from stylegan_directions_face_reenactment_tpu.pipeline.reenactment import (
        make_fused_reenact_fn)

    # faithful CLI-default shape: frames rescaled to width 1000 before
    # detection exactly like the reference (`utils_inference.py:67`,
    # `pipeline/preprocess.py::DETECT_WIDTH`); a 16:9 source frame lands
    # at 562×1000. The 480² native shape is the labeled --detect_width 0
    # fast path.
    frames_1000 = np.asarray(
        jax.random.randint(jax.random.PRNGKey(3), (batch, 562, 1000, 3),
                           0, 256, jnp.int32), dtype=np.uint8)
    frames_1000_dev = jnp.asarray(frames_1000)
    frames_u8 = np.asarray(
        jax.random.randint(jax.random.PRNGKey(3), (batch, 480, 480, 3),
                           0, 256, jnp.int32), dtype=np.uint8)
    frames_dev = jnp.asarray(frames_u8)  # upload u8; convert on device

    fused_fan = make_fused_reenact_fn(
        g, a, deca, spec, sfd, fan, truncation=0.7, truncation_latent=trunc,
        compute_dtype=compute_dtype, fan_params=fan, s3fd_params=sfd)

    dt_full = _time_loop(lambda: fused_fan(source_code, params_source,
                                           angles_source,
                                           frames_1000_dev)[0], iters=12)
    dt_full_480 = _time_loop(lambda: fused_fan(source_code, params_source,
                                               angles_source,
                                               frames_dev)[0], iters=12)

    # realistic content at the faithful shape: a moving face synthesized
    # by the generator itself (deterministic keys), pasted into a gray
    # 562×1000 canvas with a drifting offset
    def make_realistic_frames():
        ws = jax.random.normal(jax.random.PRNGKey(11), (batch, 512))
        faces = jax.jit(
            lambda z: generate_image_for_bench(g, z, trunc))(ws)
        faces_u8 = np.asarray(jnp.round(
            jnp.clip((faces + 1.0) * 127.5, 0, 255)).astype(jnp.uint8))
        canvas = np.full((batch, 562, 1000, 3), 127, np.uint8)
        for i in range(batch):
            y = 80 + (i * 9) % 200
            x = 150 + (i * 37) % 550
            canvas[i, y:y + 256, x:x + 256] = faces_u8[i]
        return jnp.asarray(canvas)

    from stylegan_directions_face_reenactment_tpu.pipeline.synthesis import (
        generate_image as _gen_img)

    def generate_image_for_bench(g_params, z, trunc_lat):
        return _gen_img(g_params, z, truncation=0.7,
                        truncation_latent=trunc_lat,
                        compute_dtype=compute_dtype)

    try:
        frames_real_dev = make_realistic_frames()
        dt_full_real = _time_loop(
            lambda: fused_fan(source_code, params_source, angles_source,
                              frames_real_dev)[0], iters=12)
    except Exception:
        dt_full_real = None

    # ---- single-detection variant (--reuse_landmarks): the fused
    # program's detection landmarks, mapped into crop coords, feed the
    # DECA bbox directly — no second SFD+FAN pass inside the alignment ---
    fused_reuse = make_fused_reenact_fn(
        g, a, deca, spec, sfd, fan, truncation=0.7, truncation_latent=trunc,
        compute_dtype=compute_dtype, reuse_landmarks=True)

    dt_full_reuse = _time_loop(lambda: fused_reuse(
        source_code, params_source, angles_source, frames_1000_dev)[0],
        iters=12)

    # ---- host-crop comparison path (--no-device_crop CLI) ---------------
    lm_rng = np.random.RandomState(0)
    fake_lms = (lm_rng.rand(batch, 68, 2) * 100 + 190).astype(np.float32)

    # detector weights as jit arguments (remote-compile payload limit)
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        merge_statics, strip_statics)
    det_w, det_statics = strip_statics((sfd, fan))

    from stylegan_directions_face_reenactment_tpu.models.face.cropping import (
        crop_using_landmarks_batch)

    @jax.jit
    def _el(det_w, imgs_u8):
        sfd_p, fan_p = merge_statics(det_w, det_statics)
        return estimate_landmarks(sfd_p, fan_p, imgs_u8.astype(jnp.float32),
                                  compute_dtype=compute_dtype)

    @jax.jit
    def _to_gan(u8):
        # uint8 crops upload 4x fewer bytes over the (tunneled) host link;
        # the [-1,1] conversion runs on device
        return u8.astype(jnp.float32) / 127.5 - 1.0

    def host_stage():
        """The --no-device_crop CLI `prep`: device detect+landmarks, host
        FFHQ crop (native threaded), device upload of the u8 crops."""
        pts, valid, _ = _el(det_w, frames_dev)
        np.asarray(pts)   # landmark fetch (tiny)
        crops, _ok = crop_using_landmarks_batch(frames_u8, fake_lms,
                                                image_size=256)
        return jax.device_put(crops)

    def full_path_host_stream(n_iters=12):
        """Pipelined like the CLI: host_stage(i+1) overlaps the device
        reenactment of chunk i (`cli/run_inference.py` ThreadPoolExecutor).
        Returns seconds per chunk at steady state."""
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(1)
        # warm-up / compile outside the timed window
        out = fn_fan(source_code, params_source, angles_source,
                     _to_gan(host_stage()))[0]
        jax.block_until_ready(out)
        fut = pool.submit(host_stage)
        t0 = time.perf_counter()
        for i in range(n_iters):
            crops_dev = fut.result()
            if i + 1 < n_iters:
                fut = pool.submit(host_stage)
            out = fn_fan(source_code, params_source, angles_source,
                         _to_gan(crops_dev))[0]
        jax.block_until_ready(out)
        pool.shutdown(wait=False)
        return (time.perf_counter() - t0) / n_iters

    dt_full_host = full_path_host_stream()

    # ---- true video→video: libav decode → fused reenact (uint8 both
    # ways, the CLI's device-composed grid row = ONE download per chunk)
    # → libav encode, pipelined like the CLI -----------------------------
    def measure_e2e_video(n_frames=48, outputs_mode="grid"):
        import tempfile
        from concurrent.futures import ThreadPoolExecutor

        from stylegan_directions_face_reenactment_tpu.native.imgproc import (
            extract_frames, generate_video)

        fused_u8 = make_fused_reenact_fn(
            g, a, deca, spec, sfd, fan, truncation=0.7,
            truncation_latent=trunc, compute_dtype=compute_dtype,
            fan_params=fan, s3fd_params=sfd, outputs=outputs_mode)
        # smooth moving-gradient frames: random NOISE video is an x264
        # pathology (all-intra ~26 Mb/s: 9.8 s to decode 48 frames vs
        # 0.5 s for these) and no real face video looks like noise —
        # smooth frames measure the codec at representative statistics
        yy, xx = np.mgrid[0:480, 0:480].astype(np.float32)
        vid = []
        for t in range(n_frames):
            vid.append(np.stack(
                [(127 + 100 * np.sin(xx / 60 + t * 0.2)),
                 (127 + 100 * np.cos(yy / 70 - t * 0.15)),
                 (127 + 80 * np.sin((xx + yy) / 90 + t * 0.1))],
                axis=-1).astype(np.uint8))
        src_cell = np.ascontiguousarray(vid[0][:256, :256])

        def upload(chunk):
            arr = np.stack(chunk)
            pad = batch - len(chunk)
            if pad:
                arr = np.concatenate([arr] + [arr[-1:]] * pad)
            return jax.device_put(arr)

        # compile outside the timed window (the CLI reuses a warm cache)
        jax.block_until_ready(fused_u8(source_code, params_source,
                                       angles_source, upload(vid[:batch]))[0])

        with tempfile.TemporaryDirectory() as td:
            src_mp4 = os.path.join(td, "src.mp4")
            generate_video(vid, src_mp4)
            t0 = time.perf_counter()
            frames = extract_frames(src_mp4)[:n_frames]
            chunks = [frames[s:s + batch]
                      for s in range(0, len(frames), batch)]
            pool = ThreadPoolExecutor(2)
            futs = {i: pool.submit(upload, chunks[i])
                    for i in range(min(3, len(chunks)))}
            grids = []

            def process(chunk, outs):
                # the CLI's reduced-payload downloads: one u8 grid row
                # ([crop|reenacted], source cell prepended host-side) or
                # the reenacted frames alone (--video_content reenact)
                img_u8, ok, in_frame, _pts = outs
                n = len(chunk)
                img_np = np.asarray(img_u8)[:n]
                np.asarray(ok), np.asarray(in_frame)  # CLI fallback check
                for j in range(n):
                    if outputs_mode == "grid":
                        grids.append(np.concatenate([src_cell, img_np[j]],
                                                    axis=1))
                    else:
                        grids.append(img_np[j])

            # 3-stage software pipeline like the CLI: upload(i+3) ∥
            # device(i) ∥ host-assembly(i-1), downloads started async
            pending = None
            for ci, chunk in enumerate(chunks):
                dev = futs.pop(ci).result()
                if ci + 3 < len(chunks):
                    futs[ci + 3] = pool.submit(upload, chunks[ci + 3])
                outs = fused_u8(source_code, params_source,
                                angles_source, dev)
                for o in outs:
                    o.copy_to_host_async()
                if pending is not None:
                    process(*pending)
                pending = (chunk, outs)
            if pending is not None:
                process(*pending)
            generate_video(grids, os.path.join(td, "out.mp4"))
            dt = time.perf_counter() - t0
            pool.shutdown(wait=False)
        return len(frames) / dt

    try:
        e2e_video_fps = measure_e2e_video(outputs_mode="grid")
    except Exception:
        e2e_video_fps = None  # native libav runtime unavailable
    try:
        e2e_video_reenact_fps = measure_e2e_video(outputs_mode="reenact")
    except Exception:
        e2e_video_reenact_fps = None

    # ---- paired training step (informational; steady-state GT-coefficient
    # cache, `--cache_gt_shape` default): batch 12 (reference default) and
    # 16 (the measured TPU knee, PERF.md) @256, SFD-faithful alignment,
    # grads through FLAME→ResNet50→G→A -----------------------------------
    train_imgs_per_s = train_b16_imgs_per_s = None
    if os.environ.get("REENACT_BENCH_TRAIN", "1") != "0":
        try:
            from stylegan_directions_face_reenactment_tpu.configs.arguments import (
                TrainingArguments)
            from stylegan_directions_face_reenactment_tpu.losses.lpips import (
                init_lpips_alex)
            from stylegan_directions_face_reenactment_tpu.models.irse import (
                init_backbone)
            from stylegan_directions_face_reenactment_tpu.train.steps import (
                FrozenModels, make_optimizer, make_paired_step,
                make_shape_program)
            idb = jit_build(init_backbone, jax.random.fold_in(key, 20))
            lp = jit_build(init_lpips_alex, jax.random.fold_in(key, 21))
            models = FrozenModels(g, deca, idb, lp, trunc, fan, sfd)

            def measure_train(bs, n_tr=8):
                targs = TrainingArguments(batch_size=bs,
                                          deca_alignment="fan")
                tx = make_optimizer(targs)
                step = make_paired_step(models, spec, targs, tx,
                                        cached_shape=True)
                shape_prog = make_shape_program(models, targs)
                opt_state = tx.init({k: v for k, v in a.items()
                                     if k != "meta"})
                kk = jax.random.split(jax.random.fold_in(key, 22 + bs), 4)
                tw = jax.random.normal(kk[0], (bs, n_latent_for(size), 512))
                sw = jax.random.normal(kk[1], (bs, n_latent_for(size), 512))
                s_img = jax.random.uniform(kk[2], (bs, 256, 256, 3),
                                           minval=-1.0, maxval=1.0)
                t_img = jax.random.uniform(kk[3], (bs, 256, 256, 3),
                                           minval=-1.0, maxval=1.0)
                p_s, ang_s = shape_prog(s_img)
                p_t, ang_t = shape_prog(t_img)
                a_tr, o_tr, ld = step(a, opt_state, kk[0], sw, tw, t_img,
                                      p_s, ang_s, p_t, ang_t)
                jax.block_until_ready(ld["loss"])
                t0 = time.perf_counter()
                a_tr, o_tr = a, opt_state
                for i in range(n_tr):
                    a_tr, o_tr, ld = step(a_tr, o_tr, kk[1], sw, tw, t_img,
                                          p_s, ang_s, p_t, ang_t)
                jax.block_until_ready(a_tr["weight"])
                return bs * n_tr / (time.perf_counter() - t0)

            train_imgs_per_s = measure_train(12)
            train_b16_imgs_per_s = measure_train(16)
        except Exception:
            pass  # informational only; never sink bench

    # ---- extended shipped-config metrics (each guarded; absent on error) --
    ffhq1024_fps = e4e_inversion_ips = pti_warm_s = None
    if os.environ.get("REENACT_BENCH_EXTENDED", "1") != "0":
        try:
            # 1024 FFHQ config: fused reenact w/ resize alignment, batch 8
            # (the healthy batch; PERF.md FFHQ-1024 table), bf16
            g1k = jit_build(lambda k: init_generator(k, size=1024),
                            jax.random.fold_in(key, 30))
            trunc1k = jax.jit(lambda k: mean_latent(g1k, k, 4096))(
                jax.random.fold_in(key, 31))
            spec_ffhq = initialize_directions("ffhq", 15, 6.0)
            fn_1k = make_reenact_fn(g1k, a, deca, spec_ffhq, truncation=0.7,
                                    truncation_latent=trunc1k,
                                    compute_dtype=compute_dtype)
            code_1k = jax.random.normal(jax.random.fold_in(key, 32),
                                        (1, n_latent_for(1024), 512))
            tgt_1k = jax.random.uniform(jax.random.fold_in(key, 33),
                                        (8, 256, 256, 3),
                                        minval=-1.0, maxval=1.0)
            dt_1k = _time_loop(lambda: fn_1k(code_1k, params_source,
                                             angles_source, tgt_1k)[0],
                               iters=8)
            ffhq1024_fps = 8 / dt_1k
        except Exception:
            pass
        try:
            # e4e inversion at batch 16 — rotate inputs so the tunnel's
            # duplicate-dispatch dedup cannot fake the number
            from stylegan_directions_face_reenactment_tpu.models.e4e import (
                e4e_forward, init_e4e_encoder)
            from stylegan_directions_face_reenactment_tpu.train.steps import (
                merge_statics as _m, strip_statics as _s)
            e4e = jit_build(lambda k: init_e4e_encoder(
                k, image_resolution=256), jax.random.fold_in(key, 40))
            e_arr, e_st = _s(e4e)

            @jax.jit
            def invert(e_arr, imgs):
                return e4e_forward(_m(e_arr, e_st), imgs)

            pool_imgs = [jax.random.uniform(jax.random.fold_in(key, 41 + i),
                                            (16, 256, 256, 3),
                                            minval=-1.0, maxval=1.0)
                         for i in range(4)]
            jax.block_until_ready(invert(e_arr, pool_imgs[0]))
            n_it = 16
            t0 = time.perf_counter()
            for i in range(n_it):
                out = invert(e_arr, pool_imgs[i % 4])
            jax.block_until_ready(out)
            e4e_inversion_ips = 16 * n_it / (time.perf_counter() - t0)
        except Exception:
            pass
        try:
            # 200-step PTI fine-tune, warm scan (tools/measure_pti.py)
            from stylegan_directions_face_reenactment_tpu.losses.lpips import (
                init_lpips_alex)
            from stylegan_directions_face_reenactment_tpu.pipeline.pti import (
                optimize_g)
            lp_pti = jit_build(init_lpips_alex, jax.random.fold_in(key, 50))
            lat = jnp.tile(trunc[:, None], (1, n_latent_for(size), 1))
            real = jax.random.uniform(jax.random.fold_in(key, 51),
                                      (1, size, size, 3),
                                      minval=-1.0, maxval=1.0)

            def pti_run():
                _tuned, info = optimize_g(g, lat, real, lp_pti, trunc,
                                          opt_steps=200)
                return info["loss"]

            jax.block_until_ready(pti_run())  # compile + first run
            t0 = time.perf_counter()
            jax.block_until_ready(pti_run())
            pti_warm_s = time.perf_counter() - t0
        except Exception:
            pass

    fps = batch / dt_fan
    result = {
        "metric": "reenact_fps_256",
        "value": round(float(fps), 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(float(fps) / 500.0, 3),
        "reenact_fps_256_f32": round(batch / dt_fan_f32, 1),
        "fan_frame_fps": round(batch / dt_fan_frame, 1),
        "resize_fps": round(batch / dt_resize, 1),
        "full_path_fps": round(batch / dt_full, 1),
        "full_path_fps_detect480": round(batch / dt_full_480, 1),
        "full_path_reuse_lms_fps": round(batch / dt_full_reuse, 1),
        "full_path_host_crop_fps": round(batch / dt_full_host, 1),
    }
    if dt_full_real is not None:
        result["full_path_realistic_fps"] = round(batch / dt_full_real, 1)
    if e2e_video_fps is not None:
        result["e2e_video_fps"] = round(e2e_video_fps, 1)
    if e2e_video_reenact_fps is not None:
        result["e2e_video_reenact_fps"] = round(e2e_video_reenact_fps, 1)
    if train_imgs_per_s is not None:
        result["train_paired_imgs_per_s"] = round(train_imgs_per_s, 1)
    if train_b16_imgs_per_s is not None:
        result["train_b16_imgs_per_s"] = round(train_b16_imgs_per_s, 1)
    if ffhq1024_fps is not None:
        result["ffhq1024_fps"] = round(ffhq1024_fps, 1)
    if e4e_inversion_ips is not None:
        result["e4e_inversion_ips"] = round(e4e_inversion_ips, 1)
    if pti_warm_s is not None:
        result["pti_warm_s"] = round(pti_warm_s, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
