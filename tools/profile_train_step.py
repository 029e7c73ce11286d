"""Roofline / MFU profile for the paired train step (VERDICT r4 #5).

Applies the same cost_analysis discipline as the inference profiles
(tools/profile_fused.py) to the cached-GT paired step at the measured
TPU knee (batch 16, PERF.md training batch sweep): per-program FLOPs,
HBM bytes, measured ms, achieved FLOP/s and the % of the chip's bf16
peak, for

  * the forward loss evaluation alone (synthesis → DECA alignment+encode
    → FLAME decode + ID + LPIPS + pixel),
  * the full step (value_and_grad + Adam) — the production program,
  * the cache-fill shape program (first-epoch only, amortized).

The backward share is inferred as full − forward. Run on TPU:

  python tools/profile_train_step.py [batch] [f32|bf16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 394e12   # v5e MXU peak (bf16)  — scale reference only
PEAK_F32 = 197e12    # f32 convs lower via bf16 passes; nominal /2


def _cost_of(compiled):
    c = compiled.cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return (float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0)))


def main():
    import jax
    import jax.numpy as jnp

    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = sys.argv[2] if len(sys.argv) > 2 else "f32"

    from stylegan_directions_face_reenactment_tpu.configs.arguments import (
        TrainingArguments)
    from stylegan_directions_face_reenactment_tpu.geometry import (
        initialize_directions)
    from stylegan_directions_face_reenactment_tpu.losses.lpips import (
        init_lpips_alex)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_backbone, init_direction_matrix, init_generator, mean_latent,
        n_latent_for)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.face import (
        init_fan, init_s3fd)
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        FrozenModels, _lambdas, make_align_fn, make_optimizer,
        make_paired_step, make_shape_program, merge_statics, split_a,
        strip_statics)
    from stylegan_directions_face_reenactment_tpu.utils.common import jit_build

    print(f"devices: {jax.devices()}  batch {batch}  dtype {dtype}")
    ks = jax.random.split(jax.random.PRNGKey(7), 12)
    g = jit_build(lambda k: init_generator(k, size=256), ks[0])
    deca = jit_build(lambda k: init_deca(
        k, synthetic_flame_params(jax.random.fold_in(k, 1), n_verts=5023,
                                  n_faces=9976), with_detail=False), ks[1])
    fan = jit_build(init_fan, ks[2])
    sfd = jit_build(init_s3fd, ks[3])
    models = FrozenModels(g, deca, jit_build(init_backbone, ks[4]),
                          jit_build(init_lpips_alex, ks[5]),
                          mean_latent(g, ks[6], n_latent=4096), fan, sfd)
    args = TrainingArguments(
        batch_size=batch, deca_alignment="fan", evaluation=False,
        training_method="paired",
        train_compute_dtype="bfloat16" if dtype == "bf16" else "float32")
    spec = initialize_directions("voxceleb", 15, 6.0)
    tx = make_optimizer(args)

    a = init_direction_matrix(ks[7], 512, 15, w_plus=True, num_layers=8)
    n_lat = n_latent_for(256)
    sw = jax.random.normal(ks[8], (batch, n_lat, 512))
    tw = jax.random.normal(ks[9], (batch, n_lat, 512))
    s_img = jax.random.uniform(ks[10], (batch, 256, 256, 3),
                               minval=-1.0, maxval=1.0)
    t_img = jax.random.uniform(ks[11], (batch, 256, 256, 3),
                               minval=-1.0, maxval=1.0)

    shape_prog = make_shape_program(models, args)
    p_s, ang_s = shape_prog(s_img)
    p_t, ang_t = shape_prog(t_img)
    jax.block_until_ready(ang_t)

    # ---- forward-only loss program (same math as the step's loss_fn) ----
    from stylegan_directions_face_reenactment_tpu.models.deca.deca import (
        calculate_shapemodel)
    from stylegan_directions_face_reenactment_tpu.pipeline.synthesis import (
        generate_image)
    from stylegan_directions_face_reenactment_tpu.train.losses_stack import (
        calculate_losses_paired)
    from stylegan_directions_face_reenactment_tpu.geometry.directions import (
        make_shift_vector)
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        _a_apply, _compute_dtype)

    lambdas = _lambdas(args)
    m_arr, m_st = strip_statics(models)

    def fwd(m_arr, a_train, sw, tw, t_img, p_s, ang_s, p_t, ang_t):
        m = merge_statics(m_arr, m_st)
        align = make_align_fn(m, args)
        sv = make_shift_vector(spec, p_s, p_t, ang_s, ang_t)
        shift = _a_apply(a_train, sv, args)
        imgs_shifted, lat = generate_image(
            m.generator, sw, truncation=args.truncation,
            truncation_latent=m.truncation_latent, shift_code=shift,
            input_is_latent=True, return_latents=True,
            num_layers_shift=args.num_layers_shift, w_plus=args.w_plus,
            compute_dtype=_compute_dtype(args))
        p_sh, _ = calculate_shapemodel(m.deca, imgs_shifted, align_fn=align,
                                       image_size=args.deca_image_size)
        loss, _ld = calculate_losses_paired(
            m.deca, m.id_backbone, m.lpips, lambdas, p_sh, p_t,
            imgs_shifted, t_img, lat, tw)
        return loss

    a_train, _ = split_a(a)
    fwd_c = jax.jit(fwd).lower(m_arr, a_train, sw, tw, t_img, p_s, ang_s,
                               p_t, ang_t).compile()
    fl_f, by_f = _cost_of(fwd_c)

    def time_it(fn, *a_, iters=12):
        out = fn(*a_)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a_)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    dt_f = time_it(lambda *a_: fwd_c(*a_), m_arr, a_train, sw, tw, t_img,
                   p_s, ang_s, p_t, ang_t)

    # ---- full step ------------------------------------------------------
    step = make_paired_step(models, spec, args, tx, cached_shape=True)
    opt = tx.init(a_train)
    a1, o1, ld = step(a, opt, ks[0], sw, tw, t_img, p_s, ang_s, p_t, ang_t)
    jax.block_until_ready(a1["weight"])

    t0 = time.perf_counter()
    n = 12
    aa, oo = a, opt
    for i in range(n):
        aa, oo, ld = step(aa, oo, ks[0], sw, tw, t_img, p_s, ang_s, p_t,
                          ang_t)
    jax.block_until_ready(aa["weight"])
    dt_s = (time.perf_counter() - t0) / n

    # cost of the step program itself (trace the inner jit)
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        make_paired_step as _mps)
    # re-lower the inner program via a fresh grads path for cost numbers
    def step_math(m_arr, a_train, sw, tw, t_img, p_s, ang_s, p_t, ang_t):
        def loss_fn(at):
            return fwd(m_arr, at, sw, tw, t_img, p_s, ang_s, p_t, ang_t)
        l, g_ = jax.value_and_grad(loss_fn)(a_train)
        return l, g_

    grad_c = jax.jit(step_math).lower(m_arr, a_train, sw, tw, t_img, p_s,
                                      ang_s, p_t, ang_t).compile()
    fl_g, by_g = _cost_of(grad_c)
    dt_g = time_it(lambda *a_: grad_c(*a_), m_arr, a_train, sw, tw, t_img,
                   p_s, ang_s, p_t, ang_t)

    # cache-fill program (first-epoch only; amortized in steady state)
    dt_sp = None
    try:
        dt_sp = time_it(lambda imgs: shape_prog(imgs)[1], s_img)
    except Exception:
        pass

    peak = PEAK_BF16 if dtype == "bf16" else PEAK_F32
    print(f"{'program':<22}{'ms':>8}{'GFLOP':>10}{'GB':>8}"
          f"{'TFLOP/s':>10}{'%peak':>7}")

    def row(name, dt, fl, by):
        tf = fl / dt / 1e12 if dt else 0
        print(f"{name:<22}{dt*1e3:>8.1f}{fl/1e9:>10.1f}{by/1e9:>8.2f}"
              f"{tf:>10.1f}{100*fl/dt/peak:>6.1f}%")

    row("fwd loss", dt_f, fl_f, by_f)
    row("fwd+bwd (grads)", dt_g, fl_g, by_g)
    row("full step (ld+Adam)", dt_s, fl_g, by_g)
    if dt_sp:
        print(f"{'cache-fill shapes':<22}{dt_sp*1e3:>8.1f}"
              f"{'—':>10}{'—':>8}")
    bwd_ms = (dt_g - dt_f) * 1e3
    print(f"backward share: {bwd_ms:.1f} ms "
          f"({100 * (dt_g - dt_f) / dt_g:.0f}% of fwd+bwd); "
          f"optimizer+dispatch overhead: {(dt_s - dt_g)*1e3:.1f} ms")
    print(f"imgs/s full step: {batch / dt_s:.1f}")


if __name__ == "__main__":
    main()
