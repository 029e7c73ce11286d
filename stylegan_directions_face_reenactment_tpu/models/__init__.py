"""Neural network model families (L1/L2 of the layer map, SURVEY.md §1).

All models are pure functions over parameter pytrees. Frozen nets (G, e4e,
DECA, loss nets, detectors) are plain pytrees closed over by jitted
programs; the only trainable component is the direction matrix A.
"""

from .stylegan2 import (init_generator, generator_forward, mapping, synthesis,
                        mean_latent, style_to_wplus, n_latent_for, channel_map,
                        init_discriminator, discriminator_forward,
                        init_wplus_encoder, wplus_encoder_forward)
from .direction_matrix import init_direction_matrix, direction_matrix_forward
from .e4e import (init_e4e_encoder, e4e_forward, init_gradual_style_encoder,
                  gradual_style_encoder_forward, init_backbone_encoder_into_w,
                  backbone_encoder_into_w_forward)
from .irse import init_backbone, backbone_forward
