"""Stage-level profile + MFU/roofline artifact for the reenactment path.

Times each stage of the flagship per-frame program (SFD detect, FAN
landmarks, DECA alignment warp, DECA ResNet-50 encode, Δp+A, StyleGAN2
synthesis) on the real chip, pulls XLA's own FLOP/byte estimates from
`compiled.cost_analysis()`, and prints a markdown table with achieved
TFLOP/s and % of peak — the numbers behind PERF.md.

Run on TPU:  python tools/profile_reenact.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


PEAKS = {
    # dense peak TFLOP/s per chip, bf16 / f32 (v5e: 197 bf16)
    "tpu": {"bf16": 197.0, "f32": 49.0},
    "cpu": {"bf16": 1.0, "f32": 1.0},   # placeholder; CPU runs are smoke only
}


def _bench(fn, *args, iters=50):
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
    compute_dtype = jnp.bfloat16

    from stylegan_directions_face_reenactment_tpu.geometry import (
        initialize_directions)
    from stylegan_directions_face_reenactment_tpu.geometry.directions import (
        make_shift_vector)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_generator, mean_latent, init_direction_matrix, n_latent_for)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        calculate_shapemodel, init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.deca.deca import (
        resnet_encoder_forward)
    from stylegan_directions_face_reenactment_tpu.models.direction_matrix import (
        direction_matrix_forward)
    from stylegan_directions_face_reenactment_tpu.models.face import (
        init_fan, init_s3fd)
    from stylegan_directions_face_reenactment_tpu.models.face.fan import (
        fan_forward)
    from stylegan_directions_face_reenactment_tpu.models.face.s3fd import (
        detect_faces)
    from stylegan_directions_face_reenactment_tpu.pipeline.alignment import (
        make_fan_align)
    from stylegan_directions_face_reenactment_tpu.pipeline.reenactment import (
        make_reenact_fn, source_shape)
    from stylegan_directions_face_reenactment_tpu.pipeline.synthesis import (
        generate_image)
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

    targets = jax.random.uniform(ks[6], (batch, 256, 256, 3),
                                 minval=-1.0, maxval=1.0)
    im01 = (targets + 1.0) / 2.0
    im01_bf = im01.astype(compute_dtype)
    im224 = jax.image.resize(im01, (batch, 224, 224, 3), "bilinear")
    codes = jax.random.normal(ks[7], (batch, n_latent_for(size), 512))
    source_code = codes[:1]

    stages = {}

    def add(name, fn, *args, iters=50):
        dt = _bench(fn, *args, iters=iters)
        flops, bts = _cost(fn, *args)
        stages[name] = (dt, flops, bts)

    # --- stages (bf16 like the production path) ---------------------------
    sfd_w, sfd_st = strip_statics(sfd)
    add("sfd_detect_256", jax.jit(lambda w, x: detect_faces(
        merge_statics(w, sfd_st), x.astype(compute_dtype))[0]), sfd_w,
        im01 * 255.0)

    fan_w, fan_st = strip_statics(fan)
    add("fan_forward_256", jax.jit(lambda w, x: fan_forward(
        merge_statics(w, fan_st), x)[-1]), fan_w, im01_bf)

    al_w, al_st = strip_statics((fan, sfd))
    add("align_sfd_fan_warp", jax.jit(lambda w, x: make_fan_align(
        merge_statics(w, al_st)[0], s3fd_params=merge_statics(w, al_st)[1],
        compute_dtype=compute_dtype)(x)), al_w, im01)

    deca_w, deca_st = strip_statics(deca)
    add("deca_resnet50_encode", jax.jit(lambda w, x: resnet_encoder_forward(
        merge_statics(w, deca_st)["e_flame"], x.astype(compute_dtype))),
        deca_w, im224)

    g_w, g_st = strip_statics(g)
    add("stylegan2_synthesis", jax.jit(lambda w, c: generate_image(
        merge_statics(w, g_st), c, truncation=0.7, truncation_latent=trunc,
        input_is_latent=True, compute_dtype=compute_dtype)), g_w, codes)

    # --- whole jitted program --------------------------------------------
    src_w, src_st = strip_statics((deca, fan, sfd))

    @jax.jit
    def _src(w, img):
        d, f, s = merge_statics(w, src_st)
        return source_shape(d, img, fan_params=f, s3fd_params=s)

    ps, angs = _src(src_w, targets[:1])
    fn = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                         truncation_latent=trunc, compute_dtype=compute_dtype,
                         fan_params=fan, s3fd_params=sfd)
    dt_total = _bench(lambda: fn(source_code, ps, angs, targets)[0])
    stages["TOTAL reenact (jitted)"] = (dt_total, None, None)

    backend = jax.default_backend()
    peak = PEAKS["tpu" if backend in ("tpu", "axon") else "cpu"]["bf16"]
    print(f"\nbackend={backend}  batch={batch}  peak_bf16={peak} TFLOP/s\n")
    print("| stage | ms/batch | ms/frame | GFLOP | TFLOP/s | %peak | GB/s |")
    print("|---|---|---|---|---|---|---|")
    for name, (dt, flops, bts) in stages.items():
        ms = dt * 1e3
        if flops:
            tf = flops / dt / 1e12
            gbs = bts / dt / 1e9
            print(f"| {name} | {ms:.2f} | {ms / batch:.3f} | "
                  f"{flops / 1e9:.1f} | {tf:.1f} | {100 * tf / peak:.1f}% | "
                  f"{gbs:.0f} |")
        else:
            print(f"| {name} | {ms:.2f} | {ms / batch:.3f} | — | — | — | — |")
    print(f"\nTOTAL fps: {batch / dt_total:.1f}")
    known = sum(dt for n, (dt, *_rest) in stages.items()
                if not n.startswith("TOTAL") and n != "fan_forward_256"
                and n != "sfd_detect_256")
    print(f"stage sum (align+deca+synth): {known * 1e3:.2f} ms vs total "
          f"{dt_total * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
