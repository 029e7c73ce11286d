"""FFHQ-1024 path on the real chip: synthesis + reenactment throughput.

The second shipped dataset config (`configs/models_config.py` ffhq,
reference `libs/configs/config_models.py:4-20`) runs the 1024 StyleGAN2
with the 18-row W+ space and the roll-less FFHQ direction spec. This
script measures, on TPU:

  * 1024 synthesis fps (W+ -> image, bf16 compute), batch sweep
  * full reenactment fps at 1024 (resize DECA alignment + Dp + A +
    synthesis) — the fan/SFD alignment chain is measured separately at
    256 in PERF.md; FFHQ driving frames go through the same nets after
    the detector crop, so the synthesis delta is what 1024 adds.

Run: python tools/measure_ffhq1024.py [batches...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    batches = [int(a) for a in sys.argv[1:]] or [1, 4, 8]

    from stylegan_directions_face_reenactment_tpu.geometry import (
        initialize_directions)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_direction_matrix, init_generator, mean_latent, n_latent_for)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.pipeline.reenactment import (
        make_reenact_fn)
    from stylegan_directions_face_reenactment_tpu.pipeline.synthesis import (
        generate_image)
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        merge_statics, strip_statics)
    from stylegan_directions_face_reenactment_tpu.utils.common import jit_build

    SIZE = 1024
    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    g = jit_build(lambda k: init_generator(k, size=SIZE), ks[0])
    deca = jit_build(lambda k: init_deca(
        k, synthetic_flame_params(jax.random.fold_in(k, 1), n_verts=5023,
                                  n_faces=9976), with_detail=False), ks[1])
    trunc = jax.jit(lambda k: mean_latent(g, k, 4096))(ks[2])
    spec = initialize_directions("ffhq", 15, 6.0)
    a0 = init_direction_matrix(ks[3], 512, 15, w_plus=True, num_layers=8)
    nl = n_latent_for(SIZE)

    g_arr, g_st = strip_statics(g)

    @jax.jit
    def synth(g_arr, w, trunc):
        gg = merge_statics(g_arr, g_st)
        return generate_image(gg, w, truncation=0.7, truncation_latent=trunc,
                              input_is_latent=True,
                              compute_dtype=jnp.bfloat16)

    out = {"size": SIZE, "n_latent": nl, "synthesis_bf16": {},
           "reenact_resize_align": {}}

    for b in batches:
        w = jax.random.normal(ks[4], (b, nl, 512))
        r = synth(g_arr, w, trunc)
        jax.block_until_ready(r)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(4):
                r = synth(g_arr, w, trunc)
            jax.block_until_ready(r)
            ts.append((time.perf_counter() - t0) / 4)
        dt = min(ts)
        out["synthesis_bf16"][str(b)] = {
            "ms_per_batch": round(dt * 1e3, 2), "fps": round(b / dt, 1)}

    fn = make_reenact_fn(g, a0, deca, spec, truncation_latent=trunc,
                         compute_dtype=jnp.bfloat16)
    for b in batches:
        src = jax.random.normal(ks[5], (1, nl, 512))
        p_src = {"pose": jnp.zeros((1, 6)), "alpha_exp": jnp.zeros((1, 50)),
                 "alpha_shp": jnp.zeros((1, 100)),
                 "cam": jnp.asarray([[8.0, 0.0, 0.0]])}
        ang_src = jnp.zeros((1, 3))
        tgts = jax.random.uniform(ks[6], (b, SIZE, SIZE, 3), minval=-1.0,
                                  maxval=1.0)
        r, _ = fn(src, p_src, ang_src, tgts)
        jax.block_until_ready(r)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(4):
                r, _ = fn(src, p_src, ang_src, tgts)
            jax.block_until_ready(r)
            ts.append((time.perf_counter() - t0) / 4)
        dt = min(ts)
        out["reenact_resize_align"][str(b)] = {
            "ms_per_batch": round(dt * 1e3, 2), "fps": round(b / dt, 1)}

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
