"""Single-attribute facial editing (reference `run_facial_editing.py`).

Edit one or more directions (0=yaw, 1=pitch, 2=roll, 3=jaw, 4=smile,
5..14=expressions) of a source face: sweep each direction around the
source's current value and save per-step images and/or a GIF. The source
may be an image (inverted with e4e), a .npy W+ latent, or None → random z.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Facial attribute editing")
    p.add_argument("--source_path", default=None,
                   help="image (.png/.jpg), W+ latent (.npy), or omit for a "
                        "random z")
    p.add_argument("--output_path", required=True)
    p.add_argument("--directions", type=int, nargs="+", required=True,
                   help="direction indices 0..14 (0 yaw, 1 pitch, 2 roll, "
                        "3 jaw, 4 smile, 5-14 expressions)")
    p.add_argument("--save_gif", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--save_images", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--optimize_generator", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--dataset_type", default="voxceleb")
    p.add_argument("--shifts_count", type=int, default=10)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--image_resolution", type=int, default=None,
                   help="override the dataset's generator resolution "
                        "(random_init smoke runs)")
    p.add_argument("--skip_preprocess", action="store_true",
                   help="source image is already an FFHQ-cropped face: "
                        "bypass detection/landmark cropping")
    p.add_argument("--device_crop", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="on-device FFHQ crop like the other CLIs "
                        "(--no-device_crop = PIL-exact host path)")
    p.add_argument("--detect_width", type=int, default=None,
                   help="pre-detection rescale width (default: the "
                        "reference's 1000; 0 = native frame size)")
    p.add_argument("--deca_alignment", default="fan",
                   choices=["fan", "fan_frame", "resize"],
                   help="DECA preprocessing: 'fan' = reference SFD-crop→FAN "
                        "warp (decalib/datasets/detectors.py:23-42, "
                        "datasets.py:57-86), 'fan_frame' = FAN on the full "
                        "frame, 'resize' = plain bilinear")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    from ..utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_path, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from ..geometry import initialize_directions
    from ..models.stylegan2 import mapping, n_latent_for
    from ..pipeline import invert_image, optimize_g, sweep_direction
    from ..models.deca import calculate_shapemodel
    from ..utils.image_utils import load_image, save_image, tensor_to_image
    from ..utils.visualization import save_gif
    from .model_loading import (compute_trunc, load_deca,
                                load_direction_matrix, load_e4e,
                                load_face_models, load_generator, load_lpips)

    g = load_generator(args.dataset_type, random_init=args.random_init,
                       resolution=args.image_resolution)
    a = load_direction_matrix(args.dataset_type, random_init=args.random_init)
    deca = load_deca(random_init=args.random_init)
    spec = initialize_directions(args.dataset_type, 15, 6.0)
    trunc = compute_trunc(g)
    size = g["meta"]["size"]
    fan_deca = sfd_deca = sfd_full = fan_full = None
    if args.deca_alignment in ("fan", "fan_frame"):
        # load_face_models always returns the (SFD, FAN) pair; keep both so
        # the preprocessing branch below never re-loads the checkpoints
        sfd_full, fan_full = load_face_models(random_init=args.random_init)
        fan_deca = fan_full
        if args.deca_alignment == "fan":
            sfd_deca = sfd_full

    # --- source latent ------------------------------------------------
    if args.source_path is None:
        z = jax.random.normal(jax.random.PRNGKey(args.seed), (1, 512))
        w = trunc + 0.7 * (mapping(g, z) - trunc)
        source_code = jnp.repeat(w[:, None], n_latent_for(size), axis=1)
        from ..pipeline.synthesis import generate_image
        source_img = generate_image(g, source_code, truncation=0.7,
                                    truncation_latent=trunc,
                                    input_is_latent=True)
    elif args.source_path.endswith(".npy"):
        code = np.load(args.source_path).astype(np.float32)
        source_code = jnp.asarray(code.reshape(1, -1, 512))
        from ..pipeline.synthesis import generate_image
        source_img = generate_image(g, source_code, truncation=0.7,
                                    truncation_latent=trunc,
                                    input_is_latent=True)
    else:
        e4e = load_e4e(args.dataset_type, random_init=args.random_init,
                       resolution=args.image_resolution)
        # crop/invert at 256 regardless of the generator's size, through
        # the shared source flow (pipeline/source_setup.py) — same block
        # as run_inference / parity_report
        from ..pipeline import make_prep_fn, setup_source
        if args.skip_preprocess:
            sfd = fan = None
        elif fan_full is not None:
            sfd, fan = sfd_full, fan_full     # reuse the alignment models
        else:
            sfd, fan = load_face_models(random_init=args.random_init)
        prep = make_prep_fn(sfd, fan, skip_preprocess=args.skip_preprocess,
                            device_crop=args.device_crop,
                            detect_width=args.detect_width)
        lp = (load_lpips(random_init=args.random_init)
              if args.optimize_generator else None)
        (source_img, source_code, g, params_source,
         angles_source) = setup_source(
            g, e4e, deca, [load_image(args.source_path)], prep,
            truncation_latent=trunc,
            optimize_generator=args.optimize_generator, lpips_params=lp,
            fan_params=fan_deca, s3fd_params=sfd_deca)

    if args.source_path is None or args.source_path.endswith(".npy"):
        from ..pipeline.reenactment import align_for
        params_source, angles_source = calculate_shapemodel(
            deca, source_img, align_fn=align_for(fan_deca, sfd_deca))

    params_np = {k: np.asarray(v) for k, v in params_source.items()}
    angles_np = np.asarray(angles_source)

    for d in args.directions:
        name, values, imgs = sweep_direction(
            g, a, spec, source_code, d, params_np, angles_np,
            shifts_count=args.shifts_count, truncation=0.7,
            truncation_latent=trunc)
        imgs = np.asarray(imgs)
        ddir = os.path.join(args.output_path, name)
        os.makedirs(ddir, exist_ok=True)
        if args.save_images:
            for i in range(len(values)):
                save_image(imgs[i],
                           os.path.join(ddir, f"{name}_{i:03d}.png"))
        if args.save_gif:
            frames = [tensor_to_image(im) for im in imgs]
            save_gif(frames + frames[::-1],
                     os.path.join(args.output_path, f"{name}.gif"), fps=15)
        print(f"direction {d} ({name}): {len(values)} steps -> {ddir}")


if __name__ == "__main__":
    main()
