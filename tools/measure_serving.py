"""AOT serving bundle vs the live pipeline on the real chip.

Measures, for the headline config (256², faithful SFD→FAN alignment,
bf16 compute, frame_batch 16, random-init weights):

* export + save wall time and on-disk bundle size;
* serve-side cold start: `load_reenact_bundle` + first batch (no model
  code imported, no tracing — just StableHLO → XLA compile) vs the live
  path's cold start (build params + `make_reenact_fn` trace + compile);
* steady-state throughput parity between the bundle call and the live
  jitted fn (they must be the same XLA program).

Run: python tools/measure_serving.py [frame_batch]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _steady_fps(fn, args, frame_batch, iters=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return frame_batch / dt, dt * 1e3


def main():
    import jax
    import jax.numpy as jnp

    frame_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    path = "/tmp/serving_bundle_measure"
    shutil.rmtree(path, ignore_errors=True)

    from stylegan_directions_face_reenactment_tpu.geometry import (
        initialize_directions)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_direction_matrix, init_generator, mean_latent, n_latent_for)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.face.fan import (
        init_fan)
    from stylegan_directions_face_reenactment_tpu.models.face.s3fd import (
        init_s3fd)
    from stylegan_directions_face_reenactment_tpu.pipeline import (
        make_reenact_fn)
    from stylegan_directions_face_reenactment_tpu.serving import (
        export_reenact, load_reenact_bundle, save_reenact_bundle)

    def build_zoo():
        ks = jax.random.split(jax.random.PRNGKey(0), 7)
        g = init_generator(ks[0], size=256)
        deca = init_deca(ks[1],
                         synthetic_flame_params(ks[2], n_verts=5023,
                                                n_faces=9976),
                         with_detail=False)
        a = init_direction_matrix(ks[3], 512, 15, w_plus=True, num_layers=8)
        fan = init_fan(ks[4])
        sfd = init_s3fd(ks[5])
        trunc = mean_latent(g, ks[6], n_latent=4096)
        spec = initialize_directions("voxceleb", 15, 6.0)
        return g, a, deca, fan, sfd, trunc, spec

    t0 = time.perf_counter()
    g, a, deca, fan, sfd, trunc, spec = build_zoo()
    jax.block_until_ready(trunc)
    t_zoo = time.perf_counter() - t0

    # ---- export + save -----------------------------------------------------
    t0 = time.perf_counter()
    exported, weights, meta = export_reenact(
        g, a, deca, spec, frame_batch=frame_batch, truncation=0.7,
        truncation_latent=trunc, compute_dtype=jnp.bfloat16,
        fan_params=fan, s3fd_params=sfd)
    t_export = time.perf_counter() - t0
    t0 = time.perf_counter()
    save_reenact_bundle(path, exported, weights, meta)
    t_save = time.perf_counter() - t0
    size_mb = sum(os.path.getsize(os.path.join(path, f))
                  for f in os.listdir(path)) / 1e6

    code = jax.random.normal(jax.random.PRNGKey(1), (1, n_latent_for(256),
                                                     512))
    params = {"pose": jnp.zeros((1, 6)), "alpha_shp": jnp.zeros((1, 100)),
              "alpha_exp": jnp.zeros((1, 50)), "cam": jnp.zeros((1, 3))}
    ang = jnp.zeros((1, 3))
    tgts = jax.random.uniform(jax.random.PRNGKey(2),
                              (frame_batch, 256, 256, 3),
                              minval=-1.0, maxval=1.0)
    args = (code, params, ang, tgts)

    # ---- serve-side cold start ----------------------------------------------
    t0 = time.perf_counter()
    prog = load_reenact_bundle(path)
    t_load = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = prog(*args)
    jax.block_until_ready(out)
    t_first_bundle = time.perf_counter() - t0

    # ---- live-path cold start (same process; persistent cache applies to
    # both equally) -----------------------------------------------------------
    t0 = time.perf_counter()
    live = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                           truncation_latent=trunc,
                           compute_dtype=jnp.bfloat16,
                           fan_params=fan, s3fd_params=sfd)
    lout = live(*args)
    jax.block_until_ready(lout)
    t_first_live = time.perf_counter() - t0

    d = float(jnp.abs(out[0] - lout[0]).max())

    fps_bundle, ms_bundle = _steady_fps(prog, args, frame_batch)
    fps_live, ms_live = _steady_fps(live, args, frame_batch)

    print(json.dumps({
        "frame_batch": frame_batch,
        "bundle_mb": round(size_mb, 1),
        "t_build_zoo_s": round(t_zoo, 2),
        "t_export_s": round(t_export, 2),
        "t_save_s": round(t_save, 2),
        "t_load_s": round(t_load, 2),
        "t_first_call_bundle_s": round(t_first_bundle, 2),
        "t_first_call_live_s": round(t_first_live, 2),
        "steady_fps_bundle": round(fps_bundle, 1),
        "steady_fps_live": round(fps_live, 1),
        "ms_per_batch_bundle": round(ms_bundle, 2),
        "ms_per_batch_live": round(ms_live, 2),
        "max_abs_diff": d,
    }))


if __name__ == "__main__":
    main()
