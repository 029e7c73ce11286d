"""Composed pipelines: preprocess, invert, PTI, reenact, edit."""

from .synthesis import get_shifted_latent_code, generate_image
from .inversion import invert_image
from .pti import optimize_g, split_tunable, TUNED_CONV_RANGE
from .reenactment import (reenact_batch, reenact_raw_batch, make_reenact_fn,
                          make_fused_reenact_fn, make_reenact_program,
                          source_shape)
from .editing import sweep_direction, one_hot_shift
from .preprocess import (preprocess_images, resize_width, to_gan_range,
                         DETECT_WIDTH)
from .alignment import (make_fan_align, landmark_align, kpt68_center_size,
                        warp_to_224)
from .source_setup import make_prep_fn, setup_source, CROP_SIZE
