"""Face detection / landmarks / cropping (reference `libs/face_models/`)."""

from .s3fd import (init_s3fd, s3fd_forward, detect_faces, detect_candidates,
                   nms_fixed, decode_boxes, dense_anchors, l2norm_scale)
from .fan import (init_fan, fan_forward, heatmaps_to_landmarks,
                  landmarks_to_image_coords, init_conv_block, conv_block,
                  init_hourglass, hourglass, init_resnet_depth,
                  resnet_depth_forward)
from .landmarks import (estimate_landmarks, box_to_center_scale,
                        crop_transform, crop_faces, REFERENCE_SCALE)
from .cropping import (crop_using_landmarks, crop_from_bbox,
                       landmarks_in_crop)
