"""Paired training-step batch sweep on the real chip.

The reference's batch-12 default was GPU-memory-bound, not TPU-informed
(`run_trainer.py:88-93`). This sweeps the paired step (SFD-faithful
alignment, 256², grads through FLAME→ResNet50→G→A) over batch sizes for
both variants — uncached (the reference's recompute-GT-coefficients
semantics) and cached (`--cache_gt_shape`, the production default) — to
find the throughput knee on TPU. Methodology mirrors
tools/measure_gt_cache.py: warm-up step outside the window, n timed
steps chained through the optimizer state. Run:

  python tools/train_batch_sweep.py [n_steps] [batch,batch,...] [variant]

variant: both (default) | cached | uncached | cached_remat (the `--remat`
jax.checkpoint step). Batches 24 and 48 reproducibly fault the TPU
runtime on v5e (remat or not — a shape-specific backend fault, not
memory: plain batch 32 runs fine) and a fault poisons the client, so
sweep one (batch, variant) per process when probing the upper end.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time


def main():
    import jax
    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    batches = ([int(b) for b in sys.argv[2].split(",")]
               if len(sys.argv) > 2 else [6, 12, 24, 48])
    variant = sys.argv[3] if len(sys.argv) > 3 else "both"

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
    nl = n_latent_for(256)

    def timed(step, batch, *extra):
        opt_state = tx.init({k: v for k, v in a0.items() if k != "meta"})
        a, o, ld = step(a0, opt_state, jax.random.PRNGKey(0), *extra)
        jax.block_until_ready(ld["loss"])
        t0 = time.perf_counter()
        a, o = a0, opt_state
        for i in range(n_steps):
            a, o, ld = step(a, o, jax.random.PRNGKey(i + 1), *extra)
        jax.block_until_ready(a["weight"])
        return (time.perf_counter() - t0) / n_steps

    rows = []
    for batch in batches:
        kd = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(3),
                                                 batch), 4)
        src_w = jax.random.normal(kd[0], (batch, nl, 512))
        src_img = jax.random.uniform(kd[1], (batch, 256, 256, 3),
                                     minval=-1.0, maxval=1.0)
        tgt_w = jax.random.normal(kd[2], (batch, nl, 512))
        tgt_img = jax.random.uniform(kd[3], (batch, 256, 256, 3),
                                     minval=-1.0, maxval=1.0)

        args = TrainingArguments(batch_size=batch, deca_alignment="fan",
                                 remat=(variant == "cached_remat"))
        tx = make_optimizer(args)
        row = {"batch": batch, "remat": args.remat}

        if variant in ("both", "uncached"):
            step_u = make_paired_step(models, spec, args, tx)
            dt_u = timed(step_u, batch, src_w, src_img, tgt_w, tgt_img)
            row["uncached_ms"] = round(dt_u * 1e3, 1)
            row["uncached_imgs_per_s"] = round(batch / dt_u, 1)

        if variant in ("both", "cached", "cached_remat"):
            shape = make_shape_program(models, args)
            p_src, ang_src = shape(src_img)
            p_tgt, ang_tgt = shape(tgt_img)
            jax.block_until_ready(ang_tgt)
            step_c = make_paired_step(models, spec, args, tx,
                                      cached_shape=True)
            dt_c = timed(step_c, batch, src_w, tgt_w, tgt_img,
                         p_src, ang_src, p_tgt, ang_tgt)
            row["cached_ms"] = round(dt_c * 1e3, 1)
            row["cached_imgs_per_s"] = round(batch / dt_c, 1)

        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"n_steps": n_steps, "sweep": rows}))


if __name__ == "__main__":
    main()
