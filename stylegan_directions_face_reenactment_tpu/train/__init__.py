"""Training engine: jitted steps, loss stack, trainer, eval, checkpoints."""

from .steps import (FrozenModels, make_accum_step, make_optimizer,
                    make_synthetic_step, make_real_step, make_paired_step)
from .losses_stack import calculate_losses, calculate_losses_paired
from .trainer import Trainer
from .eval import extract_evaluation_metrics, expression_error, pose_error
from .checkpoints import save_a_matrix, load_a_matrix, start_from_checkpoint
