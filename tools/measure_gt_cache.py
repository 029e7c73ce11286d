"""GT shape-coefficient cache: paired-step speedup on the real chip.

The paired method's source/target frames are fixed dataset images, so
their (stop-gradient) DECA coefficients are training invariants; the
reference recomputes the FAN-align + DECA-encode pass on them every step
(`libs/trainer.py:361-365`). With `cache_gt_shape` (default) the Trainer
memoizes them and the jitted step runs only the shifted image's pass.

This script measures, on TPU, the steady-state (cache-hit) paired step at
reference settings (batch 12, 256^2, SFD-faithful alignment) for both
variants, plus the one-off fill-program cost. Run:

  python tools/measure_gt_cache.py [n_steps] [batch]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 12

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
        FrozenModels, make_optimizer, make_paired_step, make_shape_program)
    from stylegan_directions_face_reenactment_tpu.utils.common import jit_build

    ks = jax.random.split(jax.random.PRNGKey(7), 12)
    g = jit_build(lambda k: init_generator(k, size=256), ks[0])
    deca = jit_build(lambda k: init_deca(
        k, synthetic_flame_params(jax.random.fold_in(k, 1), n_verts=5023,
                                  n_faces=9976), with_detail=False), ks[1])
    idb = jit_build(init_backbone, ks[2])
    lp = jit_build(init_lpips_alex, ks[3])
    fan = jit_build(init_fan, ks[4])
    sfd = jit_build(init_s3fd, ks[5])
    trunc = jax.jit(lambda k: mean_latent(g, k, 4096))(ks[6])
    models = FrozenModels(g, deca, idb, lp, trunc, fan, sfd)
    spec = initialize_directions("voxceleb", 15, 6.0)
    a0 = init_direction_matrix(ks[7], 512, 15, w_plus=True, num_layers=8)

    args = TrainingArguments(batch_size=batch, deca_alignment="fan")
    tx = make_optimizer(args)
    opt_state = tx.init({k: v for k, v in a0.items() if k != "meta"})

    nl = n_latent_for(256)
    src_w = jax.random.normal(ks[8], (batch, nl, 512))
    src_img = jax.random.uniform(ks[9], (batch, 256, 256, 3), minval=-1.0,
                                 maxval=1.0)
    tgt_w = jax.random.normal(ks[10], (batch, nl, 512))
    tgt_img = jax.random.uniform(ks[11], (batch, 256, 256, 3), minval=-1.0,
                                 maxval=1.0)

    def timed(step, *extra):
        a, o, ld = step(a0, opt_state, jax.random.PRNGKey(0), *extra)
        jax.block_until_ready(ld["loss"])
        t0 = time.perf_counter()
        a, o = a0, opt_state
        for i in range(n_steps):
            a, o, ld = step(a, o, jax.random.PRNGKey(i + 1), *extra)
        jax.block_until_ready(a["weight"])
        return (time.perf_counter() - t0) / n_steps, float(ld["loss"])

    out = {"n_steps": n_steps, "batch": batch, "deca_alignment": "fan"}

    step_u = make_paired_step(models, spec, args, tx)
    dt_u, loss_u = timed(step_u, src_w, src_img, tgt_w, tgt_img)
    out["uncached"] = {"ms_per_step": round(dt_u * 1e3, 1),
                       "imgs_per_s": round(batch / dt_u, 1),
                       "loss_last": loss_u}

    shape = make_shape_program(models, args)
    p_src, ang_src = shape(src_img)
    jax.block_until_ready(ang_src)
    t0 = time.perf_counter()
    p_src, ang_src = shape(src_img)
    jax.block_until_ready(ang_src)
    fill_ms = (time.perf_counter() - t0) * 1e3
    p_tgt, ang_tgt = shape(tgt_img)

    step_c = make_paired_step(models, spec, args, tx, cached_shape=True)
    dt_c, loss_c = timed(step_c, src_w, tgt_w, tgt_img,
                         p_src, ang_src, p_tgt, ang_tgt)
    out["cached"] = {"ms_per_step": round(dt_c * 1e3, 1),
                     "imgs_per_s": round(batch / dt_c, 1),
                     "loss_last": loss_c}
    out["fill_program_ms_per_batch"] = round(fill_ms, 1)
    out["speedup"] = round(dt_u / dt_c, 2)
    out["loss_rel_diff_last"] = float(abs(loss_u - loss_c)
                                      / max(abs(loss_u), 1e-9))

    # real method: one of its three alignment+encode passes is cacheable
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        make_real_step)
    step_ru = make_real_step(models, spec, args, tx)
    dt_ru, loss_ru = timed(step_ru, src_w, src_img)
    step_rc = make_real_step(models, spec, args, tx, cached_shape=True)
    dt_rc, loss_rc = timed(step_rc, src_w, src_img, p_src, ang_src)
    out["real_uncached"] = {"ms_per_step": round(dt_ru * 1e3, 1),
                            "imgs_per_s": round(batch / dt_ru, 1)}
    out["real_cached"] = {"ms_per_step": round(dt_rc * 1e3, 1),
                          "imgs_per_s": round(batch / dt_rc, 1)}
    out["real_speedup"] = round(dt_ru / dt_rc, 2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
