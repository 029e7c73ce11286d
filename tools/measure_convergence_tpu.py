"""Real-TPU training convergence: paired-step loss trajectory at 256².

The CPU convergence gates (`tests/test_convergence.py`) prove the loss
decreases at 64² tiny shapes; this runs the production-shape paired step
(256², SFD-faithful alignment, cached GT coefficients — the trainer's
defaults) on the real chip for N steps over a small pool of identities
and reports the loss trajectory, the reference's own training QC
(`libs/utilities/utils_train.py:516-527` plots exactly this curve).

Targets are SYNTHESIZED from their latents (the paired method's
"GT reenacted" semantics: the target frame is the ground-truth image the
shifted source must match), so the optimization problem is well-posed
even on a random-init zoo. Run on TPU:

  python tools/measure_convergence_tpu.py [n_steps] [batch] [pool]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    pool = int(sys.argv[3]) if len(sys.argv) > 3 else 48

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
    from stylegan_directions_face_reenactment_tpu.pipeline.synthesis import (
        generate_image)
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
    models = FrozenModels(g, deca, idb, lp, trunc, fan, sfd)

    args = TrainingArguments(batch_size=batch, deca_alignment="fan")
    tx = make_optimizer(args)
    step = make_paired_step(models, spec, args, tx, cached_shape=True)
    shape_prog = make_shape_program(models, args)

    # identity pool: w codes through the mapping network (realistic W
    # statistics), targets synthesized from their own latents
    g_w, g_statics = strip_statics(g)

    @jax.jit
    def sample_pool(gw, k):
        gp = merge_statics(gw, g_statics)
        z = jax.random.normal(k, (pool, 512))
        imgs, w = generate_image(gp, z, truncation=args.truncation,
                                 truncation_latent=trunc,
                                 input_is_latent=False, return_latents=True,
                                 compute_dtype=jnp.bfloat16)
        return imgs, w

    imgs_pool, w_pool = sample_pool(g_w, ks[8])
    jax.block_until_ready(w_pool)

    # GT coefficients for the whole pool (the trainer's --cache_gt_shape
    # fill pass), in batch-sized slices so the shape program reuses the
    # bench-warmed executable
    p_parts, ang_parts = [], []
    for s in range(0, pool, batch):
        p, ang = shape_prog(imgs_pool[s:s + batch])
        p_parts.append(p)
        ang_parts.append(ang)
    p_pool = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, 0), *p_parts)
    ang_pool = jnp.concatenate(ang_parts, 0)
    jax.block_until_ready(ang_pool)

    opt_state = tx.init({k: v for k, v in a.items() if k != "meta"})
    rng = np.random.RandomState(7)

    losses, gnorms = [], []
    t0 = None
    for i in range(n_steps + 1):  # step 0 is warm-up/compile
        if i == 1:
            t0 = time.perf_counter()
        si = rng.choice(pool, batch, replace=False)
        ti = rng.choice(pool, batch, replace=False)
        sw, tw = w_pool[si], w_pool[ti]
        t_img = imgs_pool[ti]
        p_s = jax.tree_util.tree_map(lambda x: x[si], p_pool)
        p_t = jax.tree_util.tree_map(lambda x: x[ti], p_pool)
        a, opt_state, ld = step(a, opt_state, jax.random.PRNGKey(i), sw, tw,
                                t_img, p_s, ang_pool[si], p_t, ang_pool[ti])
        if i > 0:
            losses.append(float(ld["loss"]))
            gnorms.append(float(ld["grad_norm"]))
    jax.block_until_ready(a["weight"])
    dt = (time.perf_counter() - t0) / n_steps

    first = float(np.mean(losses[:10]))
    last = float(np.mean(losses[-10:]))
    out = {
        "n_steps": n_steps, "batch": batch, "pool": pool,
        "ms_per_step": round(dt * 1e3, 1),
        "imgs_per_s": round(batch / dt, 1),
        "loss_first10_mean": round(first, 3),
        "loss_last10_mean": round(last, 3),
        "reduction": round(1.0 - last / first, 4),
        "grad_norm_first10": round(float(np.mean(gnorms[:10])), 3),
        "grad_norm_last10": round(float(np.mean(gnorms[-10:])), 3),
        "loss_every_20": [round(l, 2) for l in losses[::20]],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
