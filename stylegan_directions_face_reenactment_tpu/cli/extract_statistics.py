"""Measure direction ranges over synthetic images (reference
`extract_statistics.py`): generate N random faces, run DECA, record per-dim
min/max of [yaw, pitch, roll, jaw, 50 expressions] → ranges_{dataset}.npy
(54, 2). The reference loops image-by-image; here generation + DECA run in
jitted batches.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Extract direction range statistics")
    p.add_argument("--output_path", default="./")
    p.add_argument("--dataset_type", default="voxceleb")
    p.add_argument("--image_resolution", type=int, default=None,
                   help="override the dataset's generator resolution "
                        "(small sizes for CPU smoke runs)")
    p.add_argument("--num_samples", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--truncation", type=float, default=0.7)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--deca_alignment", default="fan",
                   choices=["fan", "fan_frame", "resize"],
                   help="DECA preprocessing: 'fan' = reference SFD-crop→FAN "
                        "warp, 'fan_frame' = FAN on the full frame, "
                        "'resize' = plain bilinear")
    p.add_argument("--seed", type=int, default=0)
    return p


def filter_detected_rows(all_rows: np.ndarray) -> np.ndarray:
    """Drop detection-failure rows before the min/max reduction.

    With the 'fan' alignment, samples whose in-graph SFD detection misses
    the confidence gate carry the -180° sentinel in yaw/pitch/roll and
    zeroed coefficients (`estimate_DECA.py:48-51` semantics). One such row
    would make the angle mins -180 and silently corrupt the direction
    scaling built from this file. (The reference's extract_statistics.py
    shares this failure mode unfiltered — known deviation, see README.)
    """
    detected = ~np.all(all_rows[:, :3] == -180.0, axis=1)
    if not detected.all():
        print(f"dropping {int((~detected).sum())}/{len(all_rows)} samples "
              "with failed face detection")
        all_rows = all_rows[detected]
    if len(all_rows) == 0:
        raise RuntimeError("face detection failed on every sample; ranges "
                           "would be meaningless (random-init models?)")
    return all_rows


def main(argv=None):
    from ..utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..models.deca import calculate_shapemodel
    from ..pipeline.reenactment import align_for
    from ..pipeline.synthesis import generate_image
    from .model_loading import (compute_trunc, load_deca, load_face_models,
                                load_generator)

    g = load_generator(args.dataset_type, random_init=args.random_init,
                       resolution=args.image_resolution)
    deca = load_deca(random_init=args.random_init)
    trunc = compute_trunc(g)
    fan_deca = sfd_deca = None
    if args.deca_alignment in ("fan", "fan_frame"):
        sfd_deca, fan_deca = load_face_models(random_init=args.random_init)
        if args.deca_alignment == "fan_frame":
            sfd_deca = None

    # weights as jit arguments, not closure constants (remote-compile limit)
    from ..train.steps import merge_statics, strip_statics
    weights, statics = strip_statics((g, deca, fan_deca, sfd_deca, trunc))

    @jax.jit
    def _batch_stats(weights, z):
        g_p, deca_p, fan_p, sfd_p, trunc_p = merge_statics(weights, statics)
        imgs = generate_image(g_p, z, truncation=args.truncation,
                              truncation_latent=trunc_p)
        params, angles = calculate_shapemodel(deca_p, imgs,
                                              align_fn=align_for(fan_p, sfd_p))
        # rows: yaw, pitch, roll, jaw, exp_0..exp_49  → (B, 54)
        return jnp.concatenate([angles, params["pose"][:, 3:4],
                                params["alpha_exp"]], axis=1)

    def batch_stats(z):
        return _batch_stats(weights, z)

    rng = jax.random.PRNGKey(args.seed)
    rows = []
    n_batches = -(-args.num_samples // args.batch_size)
    for i in range(n_batches):
        rng, k = jax.random.split(rng)
        z = jax.random.normal(k, (args.batch_size, 512))
        rows.append(np.asarray(batch_stats(z)))
        if (i + 1) % 10 == 0:
            print(f"{(i + 1) * args.batch_size}/{args.num_samples}")
    all_rows = filter_detected_rows(np.concatenate(rows)[:args.num_samples])

    ranges = np.stack([all_rows.min(axis=0), all_rows.max(axis=0)],
                      axis=1).astype(np.float64)  # (54, 2)
    out = os.path.join(args.output_path,
                       f"ranges_{args.dataset_type}.npy")
    np.save(out, ranges)
    print(f"saved {out} shape {ranges.shape}")


if __name__ == "__main__":
    main()
