"""Measure the PTI per-identity generator fine-tune (`pipeline/pti.py`)
on the real TPU: wall time for the reference's 200-step program
(`libs/optimization.py:25-72`: Adam over convs[4..11], 100*L2 + LPIPS)
and the per-step cost, at 256^2 with a random-init zoo.

Run: python tools/measure_pti.py [--steps 200] [--batch 1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    from stylegan_directions_face_reenactment_tpu.losses.lpips import (
        init_lpips_alex)
    from stylegan_directions_face_reenactment_tpu.models import (
        init_generator, mean_latent, n_latent_for)
    from stylegan_directions_face_reenactment_tpu.pipeline.pti import (
        optimize_g)
    from stylegan_directions_face_reenactment_tpu.utils.common import (
        jit_build)

    print(f"devices: {jax.devices()}")
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    g = jit_build(lambda k: init_generator(k, size=args.size), ks[0])
    lpips = jit_build(init_lpips_alex, ks[1])
    trunc = mean_latent(g, ks[2])  # (1, 512)
    latent = jnp.tile(trunc[:, None], (args.batch, n_latent_for(args.size), 1))
    real = jax.random.uniform(ks[3], (args.batch, args.size, args.size, 3),
                              minval=-1.0, maxval=1.0)

    def run(steps):
        tuned, info = optimize_g(g, latent, real, lpips, trunc,
                                 opt_steps=steps)
        return info["loss"]

    t0 = time.time()
    run(1).block_until_ready()
    print(f"compile (1-step variant): {time.time() - t0:.1f} s")

    t0 = time.time()
    loss = run(args.steps)
    loss.block_until_ready()
    cold = time.time() - t0
    print(f"{args.steps}-step PTI (compile + run): {cold:.1f} s")

    t0 = time.time()
    loss = run(args.steps)
    loss.block_until_ready()
    warm = time.time() - t0
    print(f"{args.steps}-step PTI (warm): {warm:.2f} s "
          f"({warm / args.steps * 1e3:.1f} ms/step, batch {args.batch}) "
          f"final loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
