"""Batch e4e inversion of a VoxCeleb tree (reference `invert_images.py`).

Walks `dataset/<id>/<video>/frames_cropped/*.png`, inverts each frame with
e4e (batched, jitted), and writes `inversion/frames/*.png` +
`inversion/latent_codes/*.npy` next to the sources — the on-disk cache the
training datasets consume.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Invert a VoxCeleb dataset tree")
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--dataset_type", default="voxceleb")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--save_images", action="store_true", default=True)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--image_resolution", type=int, default=None,
                   help="override the dataset's generator resolution "
                        "(random_init smoke runs)")
    return p


def main(argv=None):
    from ..utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..data.datasets import DatasetInversion, Loader
    from ..pipeline.inversion import make_invert_fn
    from ..utils.image_utils import save_image
    from .model_loading import compute_trunc, load_e4e, load_generator

    g = load_generator(args.dataset_type, random_init=args.random_init,
                       resolution=args.image_resolution)
    e4e = load_e4e(args.dataset_type, random_init=args.random_init,
                   resolution=args.image_resolution)
    trunc = compute_trunc(g)

    invert = make_invert_fn(e4e, g, truncation=0.7, truncation_latent=trunc)

    dataset = DatasetInversion(args.dataset_path,
                               image_size=g["meta"]["size"])
    loader = Loader(dataset, args.batch_size, shuffle=False, drop_last=False)
    print(f"Inverting {len(dataset)} frames from {args.dataset_path}")

    for batch in loader:
        imgs = jnp.asarray(batch["image"])
        inv, codes = invert(imgs)
        inv = np.asarray(inv)
        codes = np.asarray(codes)
        for i in range(len(batch["path"])):
            video_dir = os.path.dirname(os.path.dirname(batch["path"][i]))
            frames_dir = os.path.join(video_dir, "inversion", "frames")
            codes_dir = os.path.join(video_dir, "inversion", "latent_codes")
            os.makedirs(frames_dir, exist_ok=True)
            os.makedirs(codes_dir, exist_ok=True)
            name = batch["filename"][i]
            if args.save_images:
                save_image(inv[i], os.path.join(frames_dir, f"{name}.png"))
            np.save(os.path.join(codes_dir, f"{name}.npy"),
                    codes[i].astype(np.float32))
    print("done")


if __name__ == "__main__":
    main()
