"""Benchmark: reenacted 256x256 frames/sec/chip on the flagship pipeline.

Measures the full device-side reenactment path — DECA shape regression on
the target frames, Δp construction, direction-matrix shift, and StyleGAN2
synthesis — as one jitted program batched over frames (the reference runs
this as a sequential per-frame Python loop, `run_inference.py:170-195`).

Prints ONE JSON line:
  {"metric": "reenact_fps_256", "value": N, "unit": "frames/s/chip",
   "vs_baseline": N / 500}
vs_baseline is relative to the 500 fps/chip north-star target
(BASELINE.md; the reference publishes no numbers).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import os

    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    backend = os.environ.get("REENACT_RESAMPLE_BACKEND")
    if backend:
        from stylegan_directions_face_reenactment_tpu.ops.upfirdn2d import (
            set_resample_backend)
        set_resample_backend(backend)

    from stylegan_directions_face_reenactment_tpu.geometry import (
        initialize_directions)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_generator, mean_latent, init_direction_matrix, n_latent_for)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.pipeline.reenactment import (
        make_reenact_fn, source_shape)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    size = 256
    batch = 16
    compute_dtype = jnp.bfloat16

    g = init_generator(ks[0], size=size)
    deca = init_deca(ks[1],
                     synthetic_flame_params(ks[2], n_verts=5023, n_faces=9976),
                     with_detail=False)
    a = init_direction_matrix(ks[3], 512, 15, w_plus=True, num_layers=8)
    spec = initialize_directions("voxceleb", 15, 6.0)
    trunc = mean_latent(g, ks[4], 4096)

    source_img = jax.random.uniform(ks[5], (1, 256, 256, 3),
                                    minval=-1.0, maxval=1.0)
    params_source, angles_source = source_shape(deca, source_img)
    source_code = jax.random.normal(ks[6], (1, n_latent_for(size), 512))
    targets = jax.random.uniform(ks[7], (batch, 256, 256, 3),
                                 minval=-1.0, maxval=1.0)

    fn = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                         truncation_latent=trunc,
                         compute_dtype=compute_dtype)

    # warm up (compile)
    out, _ = fn(source_code, params_source, angles_source, targets)
    out.block_until_ready()

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out, _ = fn(source_code, params_source, angles_source, targets)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    fps = batch / dt

    print(json.dumps({
        "metric": "reenact_fps_256",
        "value": round(float(fps), 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(float(fps) / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
