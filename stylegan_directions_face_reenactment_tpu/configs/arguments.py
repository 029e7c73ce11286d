"""Training hyperparameters (reference `libs/configs/config_arguments.py`)."""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class TrainingArguments:
    """Defaults mirror `config_arguments.py:6-33` + `run_trainer.py:88-93`."""
    # direction space
    shift_scale: float = 6.0
    min_shift: float = 0.1
    learned_directions: int = 15
    num_layers_shift: int = 8
    w_plus: bool = True
    disentanglement_50: bool = True

    # loss weights
    lambda_identity: float = 10.0
    lambda_perceptual: float = 10.0
    lambda_pixel_wise: float = 1.0     # paired only
    lambda_shape: float = 1.0
    lambda_mouth_shape: float = 1.0
    lambda_eye_shape: float = 1.0
    lambda_w_reg: float = 0.0

    # cadence
    steps_per_log: int = 10
    steps_per_save: int = 1000
    steps_per_ev_log: int = 1000
    validation_samples: int = 100

    # logging artifacts
    reenactment_fig: bool = True
    num_pairs_log: int = 4
    gif: bool = False
    evaluation: bool = True
    log_images_wandb: bool = True   # eval grids/GIF frames → wandb
                                    # (`utils_train.py:790-794,865-869`)

    # optimizer / schedule (`run_trainer.py:88-93`, `trainer.py:144`)
    lr: float = 1e-4
    weight_decay: float = 5e-4
    batch_size: int = 12
    # gradient-accumulation microbatching: split each batch into this many
    # microbatches, average grads, ONE Adam update — identical optimizer
    # semantics (every loss is batch-mean-reduced), every compiled program
    # at microbatch shape (dodges the measured XLA:TPU fault at batch
    # 24/48; PERF.md, steps.make_accum_step)
    grad_accum: int = 1
    test_batch_size: int = 4
    n_steps: int = 100_000

    # model / data
    training_method: str = "synthetic"   # synthetic | real | real_synthetic | paired
    dataset_type: str = "voxceleb"
    image_resolution: int = 256
    # DECA preprocessing: 'fan' = FAN-bbox → similarity warp to 224 like the
    # reference (`decalib/datasets/datasets.py:57-86`; needs FrozenModels.fan),
    # 'resize' = plain bilinear (fast path / no FAN weights)
    deca_alignment: str = "fan"
    deca_image_size: int = 224          # resize-path target (tiny dry runs shrink it)
    # synthesis compute dtype inside the train step: 'bfloat16' roughly
    # halves the StyleGAN2 forward/backward HBM traffic (A stays f32)
    train_compute_dtype: str = "float32"   # float32 | bfloat16
    # paired method: memoize the fixed dataset frames' DECA coefficients
    # (training invariants) instead of recomputing the alignment+encode
    # pass on them every step like the reference (`trainer.py:361-365`)
    cache_gt_shape: bool = True
    # rematerialize the under-grad blocks (shifted synthesis; DECA +
    # loss nets) in the backward pass (jax.checkpoint): HBM for FLOPs.
    # Opt-in — measured 1.54x step time at 256²/batch 16 where memory is
    # not the constraint (PERF.md); for memory-constrained configs
    remat: bool = False
    channel_multiplier: int = 2
    truncation: float = 0.7
    dim_z: int = 512

    train_dataset_path: Optional[str] = None
    test_dataset_path: Optional[str] = None
    experiment_path: str = "./training_attempts/exp_v00"
    resume_training_model: Optional[str] = None
    use_wandb: bool = False
    workers: int = 1
