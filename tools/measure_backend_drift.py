"""End-to-end pixel drift of the resample backends at 256² synthesis.

On TPU, XLA f32 convolutions use bf16 multiply passes (~1e-2 abs per op);
the Pallas polyphase kernel is exact f32 like the reference CUDA kernel.
The production default is 'mixed' (Pallas for the 2x upsamples, XLA for the
small blurs). This script measures the COMPOSED 256² synthesis drift of
'mixed' and 'xla' against exact 'pallas' — the number the README quotes
(replacing the per-op "~1e-2" bound). Run on TPU.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    from stylegan_directions_face_reenactment_tpu.models import (
        init_generator, mean_latent, n_latent_for)
    from stylegan_directions_face_reenactment_tpu.ops.upfirdn2d import (
        set_resample_backend)
    from stylegan_directions_face_reenactment_tpu.pipeline.synthesis import (
        generate_image)
    from stylegan_directions_face_reenactment_tpu.train.steps import (
        merge_statics, strip_statics)
    from stylegan_directions_face_reenactment_tpu.utils.common import jit_build

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    g = jit_build(lambda k: init_generator(k, size=256), ks[0])
    trunc = jax.jit(lambda k: mean_latent(g, k, 4096))(ks[1])
    codes = jax.random.normal(ks[2], (4, n_latent_for(256), 512))
    w, st = strip_statics(g)

    outs = {}
    for backend in ("pallas", "mixed", "xla"):
        set_resample_backend(backend)

        @jax.jit
        def _syn(w, c):
            return generate_image(merge_statics(w, st), c, truncation=0.7,
                                  truncation_latent=trunc,
                                  input_is_latent=True)

        outs[backend] = np.asarray(_syn(w, codes))

    ref = outs["pallas"]
    # images are in [-1, 1]; report absolute drift (2.0 = full range)
    report = {"image_range": "[-1, 1]", "batch": 4, "size": 256}
    for backend in ("mixed", "xla"):
        d = np.abs(outs[backend] - ref)
        report[backend] = {"max_abs": float(d.max()),
                           "mean_abs": float(d.mean()),
                           "p99_abs": float(np.percentile(d, 99))}
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
