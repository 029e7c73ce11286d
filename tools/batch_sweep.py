"""Throughput vs frame-batch for the reference-parity reenact program.

The per-frame cost has a fixed component (dispatch, small tensors) that a
larger frame batch amortizes; HBM-bound stages (FAN) scale linearly. This
sweep picks the shipping --frame_batch default on data. Run on TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    from stylegan_directions_face_reenactment_tpu.geometry import (
        initialize_directions)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_generator, mean_latent, init_direction_matrix, n_latent_for)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.face import (
        init_fan, init_s3fd)
    from stylegan_directions_face_reenactment_tpu.pipeline.reenactment import (
        make_reenact_fn)
    from stylegan_directions_face_reenactment_tpu.utils.common import jit_build

    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    g = jit_build(lambda k: init_generator(k, size=256), ks[0])
    deca = jit_build(lambda k: init_deca(
        k, synthetic_flame_params(jax.random.fold_in(k, 1), n_verts=5023,
                                  n_faces=9976), with_detail=False), ks[1])
    a = jit_build(lambda k: init_direction_matrix(k, 512, 15, w_plus=True,
                                                  num_layers=8), ks[2])
    trunc = jax.jit(lambda k: mean_latent(g, k, 4096))(ks[3])
    fan = jit_build(init_fan, ks[4])
    sfd = jit_build(init_s3fd, ks[5])
    spec = initialize_directions("voxceleb", 15, 6.0)

    ps = {"pose": jnp.zeros((1, 6)), "alpha_shp": jnp.zeros((1, 100)),
          "alpha_exp": jnp.zeros((1, 50)),
          "cam": jnp.asarray([[8.0, 0.0, 0.0]])}
    angs = jnp.zeros((1, 3))
    code = jax.random.normal(ks[6], (1, n_latent_for(256), 512))

    fn = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                         truncation_latent=trunc,
                         compute_dtype=jnp.bfloat16, fan_params=fan,
                         s3fd_params=sfd)
    for b in (8, 16, 32, 64):
        tgt = jax.random.uniform(jax.random.fold_in(ks[7], b),
                                 (b, 256, 256, 3), minval=-1.0, maxval=1.0)
        out = fn(code, ps, angs, tgt)[0]
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = max(10, 512 // b)
        for _ in range(iters):
            out = fn(code, ps, angs, tgt)[0]
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"batch {b:3d}: {dt*1e3:7.2f} ms  {b/dt:8.1f} fps", flush=True)


if __name__ == "__main__":
    main()
