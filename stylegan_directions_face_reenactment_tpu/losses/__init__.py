"""Loss stack: identity (ArcFace), perceptual (LPIPS), shape, pixel, PTI."""

from .lpips import (lpips, alex_features, init_lpips_alex, convert_lpips_alex,
                    normalize_activation)
from .id_loss import id_loss, extract_id_feats, csim
from .shape_losses import (pixel_wise_loss, shape_loss, eye_loss, mouth_loss,
                           l2_loss, EYE_PAIRS, MOUTH_PAIRS)
from .pti import pti_loss, space_regularizer_loss, PTIHyperparams
