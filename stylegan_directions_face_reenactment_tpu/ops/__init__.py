"""TPU-native compute primitives (L0 of the layer map, SURVEY.md §1).

Replaces the reference's CUDA extensions (`libs/gan/StyleGAN2/op/`) with XLA
formulations and Pallas TPU kernels.
"""

from .upfirdn2d import (upfirdn2d, upfirdn2d_output_shape, make_kernel,
                        upsample2d, downsample2d, blur)
from .fused_act import (fused_leaky_relu, fused_leaky_relu_pallas,
                        scaled_leaky_relu)
from .equalized import equal_linear, equal_conv2d, pixel_norm
from .modulated_conv import modulated_conv2d, modulation_demod

__all__ = [
    "upfirdn2d", "upfirdn2d_output_shape", "make_kernel", "upsample2d",
    "downsample2d", "blur", "fused_leaky_relu", "fused_leaky_relu_pallas",
    "scaled_leaky_relu", "equal_linear", "equal_conv2d", "pixel_norm",
    "modulated_conv2d", "modulation_demod",
]
