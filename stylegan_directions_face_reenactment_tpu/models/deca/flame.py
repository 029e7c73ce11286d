"""FLAME head model: blendshapes + linear blend skinning + landmarks.

Functional JAX equivalent of `libs/DECA/decalib/models/FLAME.py` and
`libs/DECA/decalib/models/lbs.py` (reference). The FLAME graph:

    v = LBS(v_template + shapedirs·[β, ψ] + posedirs·(R − I))

with 5 joints (global, neck, jaw, left-eye, right-eye), static 51-landmark
barycentric embedding plus a 17-landmark dynamic contour selected by the
neck-rotation angle through a 79-entry LUT.

Everything is batched tensor code (gathers + einsums) — fully differentiable
and jittable; the LUT lookup uses stop-gradient indices exactly like the
reference (integer index_select).

Model data (v_template, shapedirs, …) comes from the FLAME
``generic_model.pkl`` via `weights/flame_loader.py`, or from
:func:`synthetic_flame_params` for tests.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...geometry.rotations import batch_rodrigues

Params = Dict[str, Any]

NUM_JOINTS = 5
PARENTS = (-1, 0, 1, 1, 1)
NECK_KIN_CHAIN = (1, 0)  # neck, then its parent (global)


def blend_shapes(betas: jnp.ndarray, shape_disps: jnp.ndarray) -> jnp.ndarray:
    """(B, L) x (V, 3, L) → (B, V, 3) (`lbs.py:250-271`)."""
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps)


def vertices2joints(j_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """(J, V) x (B, V, 3) → (B, J, 3) (`lbs.py:230-247`)."""
    return jnp.einsum("bik,ji->bjk", vertices, j_regressor)


def _transform_mat(rot: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3), (…, 3, 1) → (…, 4, 4) rigid transform (`lbs.py:308-318`)."""
    top = jnp.concatenate([rot, t], axis=-1)                  # (...,3,4)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def batch_rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward kinematics over the (static, 5-joint) FLAME tree
    (`lbs.py:321-377`). Returns posed joints (B, J, 3) and relative
    transforms (B, J, 4, 4)."""
    rel_joints = joints
    rel_joints = rel_joints.at[:, 1:].add(
        -joints[:, jnp.asarray(PARENTS[1:], jnp.int32)])
    transforms_mat = _transform_mat(rot_mats, rel_joints[..., None])

    chain = [transforms_mat[:, 0]]
    for i in range(1, NUM_JOINTS):
        chain.append(jnp.matmul(chain[PARENTS[i]], transforms_mat[:, i]))
    transforms = jnp.stack(chain, axis=1)                      # (B, J, 4, 4)

    posed_joints = transforms[:, :, :3, 3]
    joints_h = jnp.concatenate(
        [joints, jnp.zeros_like(joints[..., :1])], axis=-1)    # (B, J, 4)
    tj = jnp.einsum("bjmn,bjn->bjm", transforms, joints_h)     # (B, J, 4)
    rel = transforms.at[:, :, :3, 3].add(-tj[:, :, :3])
    return posed_joints, rel


def lbs(betas: jnp.ndarray, pose: jnp.ndarray, v_template: jnp.ndarray,
        shapedirs: jnp.ndarray, posedirs: jnp.ndarray,
        j_regressor: jnp.ndarray, lbs_weights: jnp.ndarray
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear blend skinning (`lbs.py:140-227`).

    betas (B, n_shape+n_exp); pose (B, J*3) axis-angle;
    v_template (V, 3); shapedirs (V, 3, L); posedirs (P=36, V*3);
    j_regressor (J, V); lbs_weights (V, J).
    Returns (verts (B, V, 3), posed joints (B, J, 3)).
    """
    b = betas.shape[0]
    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    joints = vertices2joints(j_regressor, v_shaped)

    rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(b, -1, 3, 3)
    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(b, -1)    # (B, 36)
    pose_offsets = jnp.dot(pose_feature, posedirs,
                           preferred_element_type=jnp.float32).reshape(b, -1, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, rel_transforms = batch_rigid_transform(rot_mats, joints)

    # skinning: (V, J) x (B, J, 16) → (B, V, 4, 4)
    t = jnp.einsum("vj,bjmn->bvmn", lbs_weights, rel_transforms)
    v_h = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    verts = jnp.einsum("bvmn,bvn->bvm", t, v_h)[..., :3]
    return verts, posed_joints


def vertices2landmarks(vertices: jnp.ndarray, faces: jnp.ndarray,
                       lmk_faces_idx: jnp.ndarray,
                       lmk_bary_coords: jnp.ndarray) -> jnp.ndarray:
    """Barycentric landmark extraction (`lbs.py:101-137`).

    vertices (B, V, 3); faces (F, 3) int; lmk_faces_idx (B, L) or (L,);
    lmk_bary_coords (B, L, 3) or (L, 3).
    """
    b = vertices.shape[0]
    if lmk_faces_idx.ndim == 1:
        lmk_faces_idx = jnp.broadcast_to(lmk_faces_idx[None],
                                         (b,) + lmk_faces_idx.shape)
    if lmk_bary_coords.ndim == 2:
        lmk_bary_coords = jnp.broadcast_to(lmk_bary_coords[None],
                                           (b,) + lmk_bary_coords.shape)
    lmk_faces = faces[lmk_faces_idx]                           # (B, L, 3)
    lmk_vertices = jnp.take_along_axis(
        vertices[:, :, None, :],
        lmk_faces[..., None].astype(jnp.int32), axis=1)        # (B, L, 3, 3)
    return jnp.einsum("blfi,blf->bli", lmk_vertices,
                      lmk_bary_coords.astype(vertices.dtype))


def _rot_mat_to_euler_y(rot_mats: jnp.ndarray) -> jnp.ndarray:
    """atan2(-R[2,0], sqrt(R00² + R10²)) (`lbs.py:26-32`)."""
    sy = jnp.sqrt(rot_mats[..., 0, 0] ** 2 + rot_mats[..., 1, 0] ** 2)
    return jnp.arctan2(-rot_mats[..., 2, 0], sy)


def find_dynamic_lmk_idx(pose: jnp.ndarray, dynamic_lmk_faces_idx: jnp.ndarray,
                         dynamic_lmk_bary_coords: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Contour LUT lookup from the neck-chain rotation
    (`FLAME.py:93-135`). pose: (B, J*3) full axis-angle pose."""
    b = pose.shape[0]
    aa = pose.reshape(b, -1, 3)[:, jnp.asarray(NECK_KIN_CHAIN, jnp.int32)]
    rot_mats = batch_rodrigues(aa.reshape(-1, 3)).reshape(b, -1, 3, 3)
    rel = jnp.broadcast_to(jnp.eye(3, dtype=pose.dtype), (b, 3, 3))
    for i in range(len(NECK_KIN_CHAIN)):
        rel = jnp.matmul(rot_mats[:, i], rel)

    y_deg = jnp.round(jnp.clip(_rot_mat_to_euler_y(rel) * (180.0 / math.pi),
                               a_max=39.0)).astype(jnp.int32)
    neg = y_deg < 0
    big_neg = y_deg < -39
    neg_vals = jnp.where(big_neg, 78, 39 - y_deg)
    idx = jnp.where(neg, neg_vals, y_deg)
    idx = jax.lax.stop_gradient(idx)
    return dynamic_lmk_faces_idx[idx], dynamic_lmk_bary_coords[idx]


def flame_forward(params: Params, shape_params: jnp.ndarray,
                  expression_params: jnp.ndarray, pose_params: jnp.ndarray,
                  eye_pose_params: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FLAME forward (`FLAME.py:175-214`).

    shape (B, 100); expression (B, 50); pose (B, 6) = [global aa(3), jaw aa(3)].
    Returns (vertices (B,V,3), landmarks2d (B,68,3), landmarks3d (B,68,3)).
    """
    b = shape_params.shape[0]
    if eye_pose_params is None:
        eye_pose_params = jnp.zeros((b, 6), shape_params.dtype)
    neck_pose = jnp.zeros((b, 3), shape_params.dtype)
    betas = jnp.concatenate([shape_params, expression_params], axis=1)
    full_pose = jnp.concatenate([pose_params[:, :3], neck_pose,
                                 pose_params[:, 3:], eye_pose_params], axis=1)

    verts, _ = lbs(betas, full_pose, params["v_template"], params["shapedirs"],
                   params["posedirs"], params["j_regressor"],
                   params["lbs_weights"])

    dyn_idx, dyn_bary = find_dynamic_lmk_idx(
        full_pose, params["dynamic_lmk_faces_idx"],
        params["dynamic_lmk_bary_coords"])
    lmk_idx = jnp.concatenate(
        [dyn_idx, jnp.broadcast_to(params["lmk_faces_idx"][None],
                                   (b,) + params["lmk_faces_idx"].shape)], axis=1)
    lmk_bary = jnp.concatenate(
        [dyn_bary, jnp.broadcast_to(params["lmk_bary_coords"][None],
                                    (b,) + params["lmk_bary_coords"].shape)],
        axis=1)

    landmarks2d = vertices2landmarks(verts, params["faces"], lmk_idx, lmk_bary)
    landmarks3d = vertices2landmarks(verts, params["faces"],
                                     params["full_lmk_faces_idx"],
                                     params["full_lmk_bary_coords"])
    return verts, landmarks2d, landmarks3d


def select_3d68(params: Params, vertices: jnp.ndarray) -> jnp.ndarray:
    """68 3D landmarks from vertices (`FLAME.py:169-173`)."""
    return vertices2landmarks(vertices, params["faces"],
                              params["full_lmk_faces_idx"],
                              params["full_lmk_bary_coords"])


def flametex_forward(params: Params, texcode: jnp.ndarray) -> jnp.ndarray:
    """FLAME texture PCA (`FLAME.py:216-262`; unused on the pipeline —
    use_tex=False — included for component parity). params from
    ``weights.load_flame_tex``.

    Returns (B, 256, 256, 3) NHWC texture (BGR-flipped like the reference).
    The 512→256 downsample is ``F.interpolate``'s default NEAREST
    (`FLAME.py:260`) — src index ⌊dst·2⌋, i.e. every other pixel.
    """
    tex = params["texture_mean"] + (params["texture_basis"]
                                    * texcode[:, None, :]).sum(-1)
    tex = tex.reshape(texcode.shape[0], 512, 512, 3)
    tex = tex[:, ::2, ::2, :]
    return tex[..., ::-1]


def synthetic_flame_params(key, n_verts: int = 256, n_faces: int = 400,
                           n_shape: int = 100, n_exp: int = 50) -> Params:
    """Random, structurally-correct FLAME params for tests (the real
    generic_model.pkl is licensed separately and not bundled)."""
    keys = jax.random.split(key, 10)
    faces = jax.random.randint(keys[0], (n_faces, 3), 0, n_verts)
    j_reg = jax.nn.softmax(
        jax.random.normal(keys[1], (NUM_JOINTS, n_verts)), axis=-1)
    lbsw = jax.nn.softmax(jax.random.normal(keys[2], (n_verts, NUM_JOINTS)),
                          axis=-1)
    bary = jax.nn.softmax(jax.random.normal(keys[3], (51, 3)), axis=-1)
    dyn_bary = jax.nn.softmax(jax.random.normal(keys[4], (79, 17, 3)), axis=-1)
    full_bary = jax.nn.softmax(jax.random.normal(keys[5], (68, 3)), axis=-1)
    return {
        "v_template": jax.random.normal(keys[6], (n_verts, 3)) * 0.1,
        "shapedirs": jax.random.normal(keys[7], (n_verts, 3, n_shape + n_exp)) * 0.01,
        "posedirs": jax.random.normal(keys[8], (36, n_verts * 3)) * 0.01,
        "j_regressor": j_reg,
        "lbs_weights": lbsw,
        "faces": faces,
        "lmk_faces_idx": jax.random.randint(keys[9], (51,), 0, n_faces),
        "lmk_bary_coords": bary,
        "dynamic_lmk_faces_idx": jax.random.randint(keys[0], (79, 17), 0, n_faces),
        "dynamic_lmk_bary_coords": dyn_bary,
        "full_lmk_faces_idx": jax.random.randint(keys[1], (68,), 0, n_faces),
        "full_lmk_bary_coords": full_bary,
    }
