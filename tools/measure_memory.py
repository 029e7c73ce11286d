"""HBM footprint + batch-1 latency of the flagship device programs.

Production deployment needs two numbers the throughput bench doesn't
give: (a) the peak HBM each program requires (sizing chips / co-tenancy)
from XLA's `compiled.memory_analysis()`, and (b) the single-frame latency
of the serving path (interactive/webcam use is latency-bound, not
throughput-bound). Run on TPU:

  python tools/measure_memory.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mem(compiled):
    m = compiled.memory_analysis()
    if m is None:
        return None
    gb = 1024 ** 3
    return {"args_gb": round(m.argument_size_in_bytes / gb, 3),
            "out_gb": round(m.output_size_in_bytes / gb, 3),
            "temp_gb": round(m.temp_size_in_bytes / gb, 3),
            "peak_gb": round((m.argument_size_in_bytes
                              + m.output_size_in_bytes
                              + m.temp_size_in_bytes) / gb, 3)}


def main():
    import jax
    import jax.numpy as jnp

    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    from stylegan_directions_face_reenactment_tpu.configs.arguments import (
        TrainingArguments)
    from stylegan_directions_face_reenactment_tpu.geometry import (
        initialize_directions)
    from stylegan_directions_face_reenactment_tpu.losses.lpips import (
        init_lpips_alex)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_generator, mean_latent, init_direction_matrix, n_latent_for)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.face import (
        init_fan, init_s3fd)
    from stylegan_directions_face_reenactment_tpu.models.irse import (
        init_backbone)
    from stylegan_directions_face_reenactment_tpu.pipeline.reenactment import (
        make_fused_reenact_fn, make_reenact_fn, source_shape)
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        FrozenModels, make_optimizer, make_paired_step, make_shape_program,
        merge_statics, strip_statics)
    from stylegan_directions_face_reenactment_tpu.utils.common import jit_build

    size = 256
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    g = jit_build(lambda k: init_generator(k, size=size), ks[0])
    deca = jit_build(lambda k: init_deca(
        k, synthetic_flame_params(jax.random.fold_in(k, 1), n_verts=5023,
                                  n_faces=9976), with_detail=False), ks[1])
    a = jit_build(lambda k: init_direction_matrix(k, 512, 15, w_plus=True,
                                                  num_layers=8), ks[2])
    trunc = jax.jit(lambda k: mean_latent(g, k, 4096))(ks[3])
    fan = jit_build(init_fan, ks[4])
    sfd = jit_build(init_s3fd, ks[5])
    idb = jit_build(init_backbone, ks[6])
    lp = jit_build(init_lpips_alex, ks[7])
    spec = initialize_directions("voxceleb", 15, 6.0)

    src_img = jax.random.uniform(ks[8], (1, size, size, 3), minval=-1.0,
                                 maxval=1.0)
    dw, dst = strip_statics((deca, fan))

    @jax.jit
    def _src(w, img):
        dp, fp = merge_statics(w, dst)
        return source_shape(dp, img, fan_params=fp)

    ps, ang = _src(dw, src_img)
    code = jax.random.normal(ks[9], (1, n_latent_for(size), 512))

    report = {}

    def add(name, fn_compiled, latency_fn=None, n_lat=30):
        report[name] = _mem(fn_compiled) or {}
        if latency_fn is not None:
            out = latency_fn()
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(n_lat):
                out = latency_fn()
            jax.block_until_ready(out)
            report[name]["latency_ms"] = round(
                (time.perf_counter() - t0) / n_lat * 1e3, 2)
        print(f"  .. {name}: {report[name]}", flush=True)

    # --- serving: fused full path, batch 16 (throughput shape) and
    # batch 1 (interactive latency) -------------------------------------
    for b in (16, 1):
        fused = make_fused_reenact_fn(
            g, a, deca, spec, sfd, fan, truncation=0.7,
            truncation_latent=trunc, compute_dtype=jnp.bfloat16,
            fan_params=fan, s3fd_params=sfd)
        raw = jnp.zeros((b, 480, 480, 3), jnp.uint8)
        # the factory returns a plain callable wrapping its jit; lower an
        # equivalent jit here for memory_analysis and time the public
        # callable for latency
        add(f"fused_full_path_b{b}",
            jax.jit(lambda c, p, an, r: fused(c, p, an, r)[0]).lower(
                code, ps, ang, raw).compile(),
            latency_fn=lambda: fused(code, ps, ang, raw)[0],
            n_lat=30)

    # --- reenact program (256 crops in), batch 16 and 1 ------------------
    for b in (16, 1):
        fn = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                             truncation_latent=trunc,
                             compute_dtype=jnp.bfloat16, fan_params=fan,
                             s3fd_params=sfd)
        tgts = jnp.zeros((b, size, size, 3), jnp.float32)
        add(f"reenact_256_b{b}",
            jax.jit(lambda c, p, an, t: fn(c, p, an, t)[0]).lower(
                code, ps, ang, tgts).compile(),
            latency_fn=lambda: fn(code, ps, ang, tgts)[0],
            n_lat=30)

    # --- paired training step (batch 12 reference default / 16 knee) ----
    models = FrozenModels(g, deca, idb, lp, trunc, fan, sfd)
    for b in (12, 16):
        targs = TrainingArguments(batch_size=b, deca_alignment="fan")
        tx = make_optimizer(targs)
        step = make_paired_step(models, spec, targs, tx, cached_shape=True)
        shape_prog = make_shape_program(models, targs)
        kk = jax.random.split(ks[10], 4)
        sw = jax.random.normal(kk[0], (b, n_latent_for(size), 512))
        tw = jax.random.normal(kk[1], (b, n_latent_for(size), 512))
        t_img = jax.random.uniform(kk[2], (b, size, size, 3), minval=-1.0,
                                   maxval=1.0)
        p_s, ang_s = shape_prog(t_img)
        opt_state = tx.init({k: v for k, v in a.items() if k != "meta"})
        # the step factory wraps jit internally; reconstruct the lowering
        # through one call for memory, and time the public callable
        a1, o1, ld = step(a, opt_state, kk[3], sw, tw, t_img,
                          p_s, ang_s, p_s, ang_s)
        jax.block_until_ready(ld["loss"])
        t0 = time.perf_counter()
        for _ in range(10):
            a1, o1, ld = step(a, opt_state, kk[3], sw, tw, t_img,
                              p_s, ang_s, p_s, ang_s)
        jax.block_until_ready(a1["weight"])
        report[f"train_paired_cached_b{b}"] = {
            "latency_ms": round((time.perf_counter() - t0) / 10 * 1e3, 2)}
        print(f"  .. train_paired_cached_b{b}: "
              f"{report[f'train_paired_cached_b{b}']}", flush=True)

    # device memory stats after everything is resident
    try:
        stats = jax.devices()[0].memory_stats()
        report["device"] = {
            "bytes_in_use_gb": round(stats.get("bytes_in_use", 0) / 1024**3,
                                     3),
            "peak_bytes_in_use_gb": round(
                stats.get("peak_bytes_in_use", 0) / 1024**3, 3),
            "bytes_limit_gb": round(stats.get("bytes_limit", 0) / 1024**3,
                                    3)}
    except Exception:
        pass

    print(json.dumps(report))


if __name__ == "__main__":
    main()
