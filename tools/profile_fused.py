"""Stage decomposition + roofline for the FUSED full per-frame path.

The fused program (`pipeline/reenactment.py::reenact_raw_batch`) is
raw frames → SFD detect → FAN landmarks → FFHQ crop (device bicubic) →
[second SFD+FAN inside the DECA alignment, reference-faithful] → DECA →
Δp → A → synthesis, as ONE device dispatch. This times each prefix stage
at the detection resolution plus the whole program (faithful and
--reuse_landmarks variants), pulls XLA FLOP/byte counts, and prints the
stage-sum vs measured-total roofline — the evidence behind PERF.md's
full-path floor claim.

Run on TPU:  python tools/profile_fused.py [batch] [detect_hw]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench(fn, *args, iters=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _cost(fn, *args):
    import jax
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return (float(c.get("flops", 0.0)),
            float(c.get("bytes accessed", 0.0)))


def main():
    import jax
    import jax.numpy as jnp
    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    det_hw = int(sys.argv[2]) if len(sys.argv) > 2 else 480
    compute_dtype = jnp.bfloat16

    from stylegan_directions_face_reenactment_tpu.geometry import (
        initialize_directions)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_generator, mean_latent, init_direction_matrix, n_latent_for)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.face import (
        init_fan, init_s3fd)
    from stylegan_directions_face_reenactment_tpu.models.face.landmarks import (
        estimate_landmarks)
    from stylegan_directions_face_reenactment_tpu.models.face.cropping import (
        ffhq_crop_device)
    from stylegan_directions_face_reenactment_tpu.pipeline.reenactment import (
        make_fused_reenact_fn, make_reenact_fn, source_shape)
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        merge_statics, strip_statics)
    from stylegan_directions_face_reenactment_tpu.utils.common import jit_build

    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    size = 256
    g = jit_build(lambda k: init_generator(k, size=size), ks[0])
    deca = jit_build(lambda k: init_deca(
        k, synthetic_flame_params(jax.random.fold_in(k, 1), n_verts=5023,
                                  n_faces=9976), with_detail=False), ks[1])
    a = jit_build(lambda k: init_direction_matrix(k, 512, 15, w_plus=True,
                                                  num_layers=8), ks[2])
    trunc = jax.jit(lambda k: mean_latent(g, k, 4096))(ks[3])
    fan = jit_build(init_fan, ks[4])
    sfd = jit_build(init_s3fd, ks[5])
    spec = initialize_directions("voxceleb", 15, 6.0)

    raws = jax.random.randint(ks[6], (batch, det_hw, det_hw, 3), 0, 256,
                              jnp.int32).astype(jnp.uint8)
    src_img = jax.random.uniform(ks[7], (1, 256, 256, 3), minval=-1.0,
                                 maxval=1.0)
    source_code = jax.random.normal(ks[8], (1, n_latent_for(size), 512))
    targets = jax.random.uniform(ks[9], (batch, 256, 256, 3), minval=-1.0,
                                 maxval=1.0)

    stages = {}

    def add(name, fn, *args, iters=30):
        dt = _bench(fn, *args, iters=iters)
        flops, bts = _cost(fn, *args)
        stages[name] = (dt, flops, bts)
        print(f"  .. {name}: {dt * 1e3:.2f} ms", flush=True)

    det_w, det_st = strip_statics((sfd, fan))

    # stage 1: detection pass on the raw frames (SFD @ det_hw + FAN)
    @jax.jit
    def _detect(w, u8):
        sp, fp = merge_statics(w, det_st)
        return estimate_landmarks(sp, fp, u8.astype(jnp.float32),
                                  compute_dtype=compute_dtype)[0]

    add(f"detect_raw_{det_hw} (SFD+FAN)", _detect, det_w, raws)

    # stage 2: + device FFHQ crop (bicubic)
    @jax.jit
    def _detect_crop(w, u8):
        sp, fp = merge_statics(w, det_st)
        imgs = u8.astype(jnp.float32)
        pts, ok, _ = estimate_landmarks(sp, fp, imgs,
                                        compute_dtype=compute_dtype)
        return ffhq_crop_device(imgs, pts, image_size=256)[0]

    add("detect+crop", _detect_crop, det_w, raws)

    # reenact program alone on 256 crops (faithful second SFD+FAN inside)
    fn_reenact = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                                 truncation_latent=trunc,
                                 compute_dtype=compute_dtype,
                                 fan_params=fan, s3fd_params=sfd)
    src_w, src_st = strip_statics((deca, fan))

    @jax.jit
    def _src(w, img):
        d, f = merge_statics(w, src_st)
        return source_shape(d, img, fan_params=f)

    ps, ang = _src(src_w, src_img)
    dt_reenact = _bench(
        lambda: fn_reenact(source_code, ps, ang, targets)[0])
    stages["reenact_256 (2nd SFD+FAN+DECA+Δp+A+synth)"] = (dt_reenact,
                                                           None, None)

    # whole fused program: faithful + reuse_landmarks variants
    fused = make_fused_reenact_fn(g, a, deca, spec, sfd, fan, truncation=0.7,
                                  truncation_latent=trunc,
                                  compute_dtype=compute_dtype,
                                  fan_params=fan, s3fd_params=sfd)
    dt_fused = _bench(lambda: fused(source_code, ps, ang, raws)[0], iters=20)
    stages["TOTAL fused (faithful)"] = (dt_fused, None, None)

    fused_r = make_fused_reenact_fn(g, a, deca, spec, sfd, fan,
                                    truncation=0.7, truncation_latent=trunc,
                                    compute_dtype=compute_dtype,
                                    reuse_landmarks=True)
    dt_fused_r = _bench(lambda: fused_r(source_code, ps, ang, raws)[0],
                        iters=20)
    stages["TOTAL fused (--reuse_landmarks)"] = (dt_fused_r, None, None)

    peak = 197.0  # v5e bf16 dense TFLOP/s
    print(f"\nbatch={batch}  detect_hw={det_hw}  "
          f"backend={jax.default_backend()}\n")
    print("| stage | ms/batch | ms/frame | GFLOP | TFLOP/s | %peak | GB/s |")
    print("|---|---|---|---|---|---|---|")
    for name, (dt, flops, bts) in stages.items():
        ms = dt * 1e3
        if flops:
            tf = flops / dt / 1e12
            print(f"| {name} | {ms:.2f} | {ms / batch:.3f} | "
                  f"{flops / 1e9:.1f} | {tf:.1f} | {100 * tf / peak:.1f}% | "
                  f"{bts / dt / 1e9:.0f} |")
        else:
            print(f"| {name} | {ms:.2f} | {ms / batch:.3f} | — | — | — | — |")
    dt_dc = stages["detect+crop"][0]
    print(f"\nfaithful fps {batch / dt_fused:.1f} | reuse fps "
          f"{batch / dt_fused_r:.1f} | reenact-only fps "
          f"{batch / dt_reenact:.1f}")
    print(f"stage sum (detect+crop) + reenact = "
          f"{(dt_dc + dt_reenact) * 1e3:.2f} ms vs fused total "
          f"{dt_fused * 1e3:.2f} ms (XLA overlap across the boundary)")


if __name__ == "__main__":
    main()
