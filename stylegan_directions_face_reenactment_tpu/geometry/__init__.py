"""Geometry: Δp direction space, rotation converters, projection (L3)."""

from .rotations import (deg2rad, rad2deg, euler_to_quaternion,
                        angle_axis_to_quaternion, quaternion_to_angle_axis,
                        quaternion_to_rotation_matrix,
                        rotation_matrix_to_quaternion, batch_rodrigues,
                        batch_euler2axis, batch_euler2matrix, batch_axis2matrix,
                        batch_matrix2axis, batch_matrix2euler, batch_axis2euler,
                        batch_orth_proj)
from .directions import (DirectionsSpec, initialize_directions,
                         get_direction_ranges, make_shift_vector,
                         make_shift_vector_50, make_shift_vector_50_from,
                         get_params_gt_reenacted,
                         start_positions, get_direction_info, DATASET_DICTS)
