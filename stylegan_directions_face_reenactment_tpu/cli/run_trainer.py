"""Train the direction matrix A (reference `run_trainer.py`).

Usage:
  python -m stylegan_directions_face_reenactment_tpu.cli.run_trainer \
      --training_method paired --experiment_path ./attempts/v00 \
      --train_dataset_path ... --test_dataset_path ...

Flags mirror the reference (`run_trainer.py:67-99`); the static
hyperparameter dict (`config_arguments.py`) is merged via
`configs/arguments.TrainingArguments`. The experiment directory gets the
`_{dataset}_{method}` suffix like `run_trainer.py:105`.
"""

from __future__ import annotations

import argparse

import jax


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the direction matrix A")
    p.add_argument("--experiment_path", default="./training_attempts/exp_v00")
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--log_images_wandb", action="store_true")
    p.add_argument("--project_wandb", default="face-reenactment")
    p.add_argument("--resume_training_model", default=None)
    p.add_argument("--training_method", default="synthetic",
                   choices=["synthetic", "real", "real_synthetic", "paired"])
    p.add_argument("--synthetic_dataset_path", default=None)
    p.add_argument("--train_dataset_path", default=None)
    p.add_argument("--test_dataset_path", default=None)
    p.add_argument("--dataset_type", default="voxceleb",
                   choices=["voxceleb", "ffhq"])
    p.add_argument("--image_resolution", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--test_batch_size", type=int, default=4)
    p.add_argument("--workers", type=int, default=1)
    p.add_argument("--n_steps", type=int, default=100_000)
    p.add_argument("--random_init", action="store_true",
                   help="random-init frozen models (smoke test; no ckpts)")
    p.add_argument("--deca_alignment", default="fan",
                   choices=["fan", "fan_frame", "resize"],
                   help="DECA preprocessing on the training path: 'fan' = "
                        "reference SFD-crop→FAN warp (detectors.py:23-42, "
                        "datasets.py:57-86), 'fan_frame' = FAN on the full "
                        "frame (no detector pass), 'resize' = plain "
                        "bilinear (fastest)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--grad_accum", type=int, default=None,
                   help="gradient-accumulation microbatches per step: "
                        "grads averaged, ONE Adam update — identical "
                        "optimizer semantics, every compiled program at "
                        "batch_size/grad_accum shape. Default: 1, except "
                        "batch 24/48 auto-select 2/3 to dodge the measured "
                        "XLA:TPU runtime fault at those shapes (PERF.md; "
                        "tools/repro_batch24_fault.py)")
    p.add_argument("--train_compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="synthesis compute dtype inside the train step")
    p.add_argument("--cache_gt_shape", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="paired method: memoize the fixed dataset frames' "
                        "DECA coefficients (training invariants) instead of "
                        "recomputing their alignment+encode pass every step")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="rematerialize the under-grad blocks in the "
                        "backward (jax.checkpoint): HBM for FLOPs — for "
                        "memory-constrained configs; costs ~1.54x step "
                        "time at 256²/batch 16 (PERF.md)")
    p.add_argument("--no_evaluation", action="store_true",
                   help="disable the eval cadence (smoke runs without a "
                        "validation set)")
    p.add_argument("--n_devices", type=int, default=None,
                   help="data-parallel device count: builds a "
                        "jax.sharding.Mesh, replicates the frozen zoo and "
                        "shards batches on axis 0 (parallel/mesh.py); "
                        "default = single device")
    p.add_argument("--dcn_slices", type=int, default=1,
                   help="multi-host pods: outer mesh axis crossing the "
                        "data-center network (one row per host/ICI slice); "
                        "builds a 2-D (dcn, dp) mesh so gradient reduction "
                        "is hierarchical — ICI psum within a slice, then a "
                        "tiny (~61k-param) DCN all-reduce of the A-matrix "
                        "grads. Pair with JAX_COORDINATOR_ADDRESS / "
                        "JAX_NUM_PROCESSES / JAX_PROCESS_ID for real "
                        "multi-process runs (parallel.distributed_init)")
    return p


def main(argv=None):
    args_ns = build_parser().parse_args(argv)
    if args_ns.dcn_slices > 1:
        # must precede ANY backend-initializing JAX call (model loads,
        # device ops) — jax.distributed.initialize refuses afterwards
        from ..parallel import distributed_init
        distributed_init()

    from ..utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    from ..configs.arguments import TrainingArguments
    from ..train import FrozenModels, Trainer
    from .model_loading import (compute_trunc, load_deca, load_face_models,
                                load_generator, load_id_backbone, load_lpips)

    targs = TrainingArguments(
        experiment_path=(f"{args_ns.experiment_path}_"
                         f"{args_ns.dataset_type}_{args_ns.training_method}"),
        training_method=args_ns.training_method,
        dataset_type=args_ns.dataset_type,
        image_resolution=args_ns.image_resolution,
        lr=args_ns.lr, batch_size=args_ns.batch_size,
        test_batch_size=args_ns.test_batch_size,
        n_steps=args_ns.n_steps,
        train_dataset_path=args_ns.train_dataset_path,
        test_dataset_path=args_ns.test_dataset_path,
        resume_training_model=args_ns.resume_training_model,
        use_wandb=args_ns.use_wandb, workers=args_ns.workers,
        log_images_wandb=args_ns.log_images_wandb,
        deca_alignment=args_ns.deca_alignment,
        train_compute_dtype=args_ns.train_compute_dtype,
        cache_gt_shape=args_ns.cache_gt_shape,
        remat=args_ns.remat,
        evaluation=not args_ns.no_evaluation,
        grad_accum=args_ns.grad_accum or 1,
    )
    if args_ns.grad_accum is None and targs.batch_size in (24, 48):
        # batch 24/48 reproducibly fault the XLA:TPU runtime on v5e (kernel
        # fault, not memory — PERF.md training batch sweep;
        # tools/repro_batch24_fault.py). Auto-microbatch to known-good
        # shapes (24 → 2×12, 48 → 3×16) with identical Adam semantics
        # (steps.make_accum_step); --grad_accum 1 forces monolithic.
        targs.grad_accum = {24: 2, 48: 3}[targs.batch_size]
        print(f"batch_size {targs.batch_size} hits a measured XLA:TPU "
              f"runtime fault at this shape (PERF.md); microbatching as "
              f"{targs.grad_accum}x{targs.batch_size // targs.grad_accum} "
              "with identical optimizer semantics (--grad_accum 1 to force "
              "the monolithic step)")

    g = load_generator(targs.dataset_type, random_init=args_ns.random_init,
                       resolution=targs.image_resolution)
    deca = load_deca(random_init=args_ns.random_init)
    idb = load_id_backbone(random_init=args_ns.random_init)
    lp = load_lpips(random_init=args_ns.random_init)
    trunc = compute_trunc(g)
    fan = sfd = None
    if targs.deca_alignment in ("fan", "fan_frame"):
        sfd, fan = load_face_models(random_init=args_ns.random_init)
        if targs.deca_alignment == "fan_frame":
            sfd = None
    models = FrozenModels(g, deca, idb, lp, trunc, fan, sfd)

    mesh = None
    if args_ns.dcn_slices > 1:
        from ..parallel import make_hybrid_mesh
        mesh = make_hybrid_mesh(args_ns.n_devices,
                                dcn_slices=args_ns.dcn_slices)
    elif args_ns.n_devices is not None and args_ns.n_devices > 1:
        from ..parallel import make_mesh
        mesh = make_mesh(args_ns.n_devices)
    trainer = Trainer(targs, models, mesh=mesh)
    rng = jax.random.PRNGKey(args_ns.seed)
    if targs.training_method == "synthetic":
        trainer.train(rng)
    elif targs.training_method in ("real", "real_synthetic"):
        trainer.train_real(rng)
    elif targs.training_method == "paired":
        trainer.train_paired(rng)


if __name__ == "__main__":
    main()
