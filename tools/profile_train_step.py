"""Roofline / MFU profile for the paired train step (VERDICT r4 #5).

Applies the same cost_analysis discipline as the inference profiles
(tools/profile_fused.py) to the cached-GT paired step at the measured
TPU knee (batch 16, PERF.md training batch sweep): per-program FLOPs,
HBM bytes, measured ms, achieved FLOP/s and bandwidth, for

  * the full step (value_and_grad + Adam) — the production program,
  * the forward loss evaluation alone (synthesis → DECA alignment+encode
    → FLAME decode + ID + LPIPS + pixel),
  * fwd+bwd without the optimizer,
  * the cache-fill shape program (first-epoch only, amortized).

TIMING METHODOLOGY (validated against physics on the tunneled chip —
see the in-code notes): programs are timed with chained data
dependencies or individually-blocked dispatches, the full-step loop
first, and **cost_analysis is collected only after every timing loop has
finished** — in several earlier orderings of this same tool the process
read 20–50× faster than the chip's peak FLOP/s allows (cross-checked:
a process that times the step loop alone reads 74–78 ms stably and
scales with n; bench.py agrees).

Run on TPU:  python tools/profile_train_step.py [batch] [f32|bf16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12   # v5e (v5 lite) MXU dense bf16 peak FLOP/s
HBM_GBPS = 819       # v5e HBM bandwidth


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
    from stylegan_directions_face_reenactment_tpu.geometry.directions import (
        make_shift_vector)
    from stylegan_directions_face_reenactment_tpu.losses.lpips import (
        init_lpips_alex)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_backbone, init_direction_matrix, init_generator, mean_latent,
        n_latent_for)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.deca.deca import (
        calculate_shapemodel)
    from stylegan_directions_face_reenactment_tpu.models.face import (
        init_fan, init_s3fd)
    from stylegan_directions_face_reenactment_tpu.pipeline.synthesis import (
        generate_image)
    from stylegan_directions_face_reenactment_tpu.train.losses_stack import (
        calculate_losses_paired)
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        FrozenModels, _a_apply, _compute_dtype, _lambdas, make_align_fn,
        make_optimizer, make_paired_step, make_shape_program, merge_statics,
        split_a, strip_statics)
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

    step = make_paired_step(models, spec, args, tx, cached_shape=True)
    shape_prog = make_shape_program(models, args)
    a = init_direction_matrix(ks[7], 512, 15, w_plus=True, num_layers=8)
    opt = tx.init(split_a(a)[0])
    n_lat = n_latent_for(256)
    kk = jax.random.split(ks[8], 4)
    sw = jax.random.normal(kk[0], (batch, n_lat, 512))
    tw = jax.random.normal(kk[1], (batch, n_lat, 512))
    s_img = jax.random.uniform(kk[2], (batch, 256, 256, 3),
                               minval=-1.0, maxval=1.0)
    t_img = jax.random.uniform(kk[3], (batch, 256, 256, 3),
                               minval=-1.0, maxval=1.0)
    p_s, ang_s = shape_prog(s_img)
    p_t, ang_t = shape_prog(t_img)
    extra = (sw, tw, t_img, p_s, ang_s, p_t, ang_t)

    # ---- full step: chained-optimizer loop (the validated reading) ------
    a1, o1, ld = step(a, opt, ks[0], *extra)
    jax.block_until_ready(a1["weight"])

    def run_step(n=32):
        aa, oo = a, opt
        t0 = time.perf_counter()
        for _ in range(n):
            aa, oo, _ld = step(aa, oo, ks[0], *extra)
        jax.block_until_ready(aa["weight"])
        return (time.perf_counter() - t0) / n

    dt_s = run_step()

    # ---- forward-only loss (same math as the step's loss_fn) ------------
    lambdas = _lambdas(args)
    m_arr, m_st = strip_statics(models)
    a_train, _ = split_a(a)

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

    fwd_j = jax.jit(fwd)
    l0 = fwd_j(m_arr, a_train, *extra)
    jax.block_until_ready(l0)

    def run_singles(fn, iters=10):
        """Individually-blocked dispatches, median."""
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    dt_f = run_singles(lambda: fwd_j(m_arr, a_train, *extra))

    def grads(m_arr, a_train, *e):
        return jax.value_and_grad(lambda at: fwd(m_arr, at, *e))(a_train)

    grad_j = jax.jit(grads)
    out = grad_j(m_arr, a_train, *extra)
    jax.block_until_ready(out[0])
    dt_g = run_singles(lambda: grad_j(m_arr, a_train, *extra)[0])

    out = shape_prog(s_img)
    jax.block_until_ready(out[1])
    dt_sp = run_singles(lambda: shape_prog(s_img)[1])

    # ---- static cost collection — AFTER all timing (ordering note in the
    # module docstring) ----------------------------------------------------
    fl_f, by_f = _cost_of(fwd_j.lower(m_arr, a_train, *extra).compile())
    fl_g, by_g = _cost_of(grad_j.lower(m_arr, a_train, *extra).compile())

    print(f"{'program':<22}{'ms':>8}{'GFLOP':>10}{'GB':>8}"
          f"{'TFLOP/s':>10}{'%bf16pk':>8}{'GB/s':>8}{'%HBM':>6}")

    def row(name, dt, fl, by):
        tf = fl / dt / 1e12 if (dt and fl) else 0
        gbs = by / dt / 1e9 if (dt and by) else 0
        flag = "  UNRELIABLE(>peak)" if tf > PEAK_BF16 / 1e12 else ""
        print(f"{name:<22}{dt*1e3:>8.1f}"
              f"{(fl or 0)/1e9:>10.1f}{(by or 0)/1e9:>8.2f}"
              f"{tf:>10.1f}{100*tf*1e12/PEAK_BF16:>7.1f}%"
              f"{gbs:>8.0f}{100*gbs/HBM_GBPS:>5.0f}%{flag}")

    row("fwd loss", dt_f, fl_f, by_f)
    row("fwd+bwd (grads)", dt_g, fl_g, by_g)
    row("full step (ld+Adam)", dt_s, fl_g, by_g)
    row("cache-fill shapes", dt_sp, None, None)
    print(f"imgs/s full step: {batch / dt_s:.1f}")


if __name__ == "__main__":
    main()
