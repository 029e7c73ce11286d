"""Checkpoint conversion: torch state_dicts → NHWC/HWIO pytrees."""

from .torch_convert import (convert_stylegan2_generator,
                            convert_direction_matrix, convert_irse_backbone,
                            convert_e4e_encoder, convert_resnet50,
                            convert_resnet_encoder, convert_deca,
                            convert_s3fd, convert_fan, conv_w, lin_w, bn)
from .flame_loader import load_flame_params, load_flame_tex
