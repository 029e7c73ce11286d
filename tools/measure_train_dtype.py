"""bf16 vs f32 paired training step: step time AND loss-trajectory delta.

The trainer's `train_compute_dtype` knob routes the synthesis/DECA compute
through bf16 or f32 (`train/steps.py::_compute_dtype`). This script
measures, on the real chip, (a) the wall-clock paired step at reference
settings (batch 12, 256², FAN-parity alignment) for both dtypes and (b) the
loss trajectory over N identical steps from the same init/data, so the
default can be picked on data instead of guesswork. Run on TPU:

  python tools/measure_train_dtype.py [n_steps] [batch]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def run(dtype_name, n_steps, batch, shared):
    import jax
    import jax.numpy as jnp
    import optax
    from stylegan_directions_face_reenactment_tpu.configs.arguments import (
        TrainingArguments)
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        make_optimizer, make_paired_step)

    models, spec, a0, data = shared
    args = TrainingArguments(batch_size=batch, deca_alignment="fan",
                             train_compute_dtype=dtype_name)
    tx = make_optimizer(args)
    step = make_paired_step(models, spec, args, tx)
    a = jax.tree_util.tree_map(lambda x: x, a0)
    opt_state = tx.init({k: v for k, v in a.items() if k != "meta"})

    src_w, src_img, tgt_w, tgt_img = data
    losses = []
    # warm-up/compile
    a1, o1, ld = step(a, opt_state, jax.random.PRNGKey(0), src_w, src_img,
                      tgt_w, tgt_img)
    jax.block_until_ready(ld["loss"])

    t0 = time.perf_counter()
    for i in range(n_steps):
        a, opt_state, ld = step(a, opt_state, jax.random.PRNGKey(i + 1),
                                src_w, src_img, tgt_w, tgt_img)
        losses.append(float(ld["loss"]))
    jax.block_until_ready(a["weight"])
    dt = (time.perf_counter() - t0) / n_steps
    return dt, losses, a


def main():
    import jax
    import jax.numpy as jnp
    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 12

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
        FrozenModels)
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
    data = (jax.random.normal(ks[8], (batch, nl, 512)),
            jax.random.uniform(ks[9], (batch, 256, 256, 3), minval=-1.0,
                               maxval=1.0),
            jax.random.normal(ks[10], (batch, nl, 512)),
            jax.random.uniform(ks[11], (batch, 256, 256, 3), minval=-1.0,
                               maxval=1.0))
    shared = (models, spec, a0, data)

    out = {"n_steps": n_steps, "batch": batch}
    results = {}
    for dtype in ("float32", "bfloat16"):
        dt, losses, a_final = run(dtype, n_steps, batch, shared)
        results[dtype] = (losses, a_final)
        out[dtype] = {"ms_per_step": round(dt * 1e3, 1),
                      "imgs_per_s": round(batch / dt, 1),
                      "loss_first": losses[0], "loss_last": losses[-1]}

    l32 = np.asarray(results["float32"][0])
    l16 = np.asarray(results["bfloat16"][0])
    w32 = np.asarray(results["float32"][1]["weight"])
    w16 = np.asarray(results["bfloat16"][1]["weight"])
    out["trajectory_delta"] = {
        "mean_abs_loss_diff": float(np.abs(l32 - l16).mean()),
        "rel_loss_diff_last": float(abs(l32[-1] - l16[-1])
                                    / max(abs(l32[-1]), 1e-9)),
        "final_A_weight_max_abs_diff": float(np.abs(w32 - w16).max()),
        "speedup_bf16": round(out["float32"]["ms_per_step"]
                              / out["bfloat16"]["ms_per_step"], 2),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
