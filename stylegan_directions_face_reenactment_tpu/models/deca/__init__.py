"""DECA 3D shape model: ResNet-50 regressor + FLAME LBS decode."""

from .resnet import init_resnet50, resnet50_features
from .flame import (flame_forward, lbs, vertices2landmarks, blend_shapes,
                    vertices2joints, batch_rigid_transform, select_3d68,
                    flametex_forward, synthetic_flame_params,
                    find_dynamic_lmk_idx)
from .deca import (init_deca, init_resnet_encoder, resnet_encoder_forward,
                   init_detail_generator, detail_generator_forward,
                   decompose_code, deca_encode, deca_decode, calculate_shape,
                   extract_deca_params, calculate_shapemodel,
                   PARAM_SPLIT, N_PARAM, IMAGE_SIZE)
from .render import (render_shape, shape_visualization, rasterize,
                     vertex_normals, face_vertices, add_directionlight)
from .mesh_io import (write_obj, upsample_mesh, save_obj, save_ply,
                      visualize, load_dense_template)
