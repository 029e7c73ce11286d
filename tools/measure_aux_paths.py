"""TPU throughput for the two remaining reference workloads without
numbers: e4e batch inversion and direction-statistics extraction.

* e4e inversion (`invert_images.py` path, `psp_encoders.py` IR-SE50 trunk
  + 14 gradual-style heads): the dataset-preparation workload — every
  VoxCeleb frame is inverted once before paired training.
* extract_statistics (`extract_statistics.py:60,104-109`): 2000 synthetic
  images → DECA coefficient min/max ranges; one calibration run per
  dataset config.

Run: python tools/measure_aux_paths.py [batch]
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    from stylegan_directions_face_reenactment_tpu.models import (
        init_generator, mean_latent)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        calculate_shapemodel, init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.e4e import (
        e4e_forward, init_e4e_encoder)
    from stylegan_directions_face_reenactment_tpu.pipeline.synthesis import (
        generate_image)
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        merge_statics, strip_statics)
    from stylegan_directions_face_reenactment_tpu.utils.common import jit_build

    ks = jax.random.split(jax.random.PRNGKey(11), 6)
    out = {"batch": batch}

    def timed(f, inputs):
        """Each call gets a DIFFERENT input — repeated identical dispatches
        through the tunnel get deduplicated and read absurdly fast."""
        r = f(inputs[0])
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for x in inputs[1:]:
            r = f(x)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / (len(inputs) - 1)

    # --- e4e inversion ----------------------------------------------------
    e4e = jit_build(lambda k: init_e4e_encoder(k, image_resolution=256),
                    ks[0])
    e_arr, e_st = strip_statics(e4e)

    @jax.jit
    def invert(e_arr, imgs):
        return e4e_forward(merge_statics(e_arr, e_st), imgs)

    img_in = [jax.random.uniform(jax.random.fold_in(ks[1], i),
                                 (batch, 256, 256, 3), minval=-1.0,
                                 maxval=1.0) for i in range(21)]
    dt = timed(lambda x: invert(e_arr, x), img_in)
    out["e4e_inversion"] = {"ms_per_batch": round(dt * 1e3, 2),
                            "imgs_per_s": round(batch / dt, 1)}

    # --- extract_statistics (synthesize + DECA per batch) -----------------
    g = jit_build(lambda k: init_generator(k, size=256), ks[2])
    deca = jit_build(lambda k: init_deca(
        k, synthetic_flame_params(jax.random.fold_in(k, 1), n_verts=5023,
                                  n_faces=9976), with_detail=False), ks[3])
    trunc = jax.jit(lambda k: mean_latent(g, k, 4096))(ks[4])
    weights, statics = strip_statics((g, deca, trunc))

    @jax.jit
    def stats_batch(weights, z):
        g_p, deca_p, trunc_p = merge_statics(weights, statics)
        imgs = generate_image(g_p, z, truncation=0.7,
                              truncation_latent=trunc_p)
        params, angles = calculate_shapemodel(deca_p, imgs)
        return jnp.concatenate([angles, params["pose"][:, 3:4],
                                params["alpha_exp"]], axis=-1)

    z_in = [jax.random.normal(jax.random.fold_in(ks[5], i), (batch, 512))
            for i in range(21)]
    dt = timed(lambda z: stats_batch(weights, z), z_in)
    n = 2000
    out["extract_statistics"] = {
        "ms_per_batch": round(dt * 1e3, 2),
        "imgs_per_s": round(batch / dt, 1),
        "secs_for_2000": round(n / (batch / dt), 2)}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
