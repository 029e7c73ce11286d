"""Utilities: image ranges, visualization, misc helpers, XLA cache."""

from .image_utils import (torch_range_1_to_255, torch_range_255_to_1,
                          tensor_to_image, image_to_tensor, save_image,
                          load_image, add_border, generate_grid_image)
from .visualization import make_interpolation_chart, save_gif
from .common import (make_noise, one_hot, make_path, save_arguments_json,
                     get_image_files)
from .jax_cache import enable_persistent_cache
from .profiling import trace, StepTimer
