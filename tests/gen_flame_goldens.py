"""Generate goldens for the FLAME/LBS stack by RUNNING the reference's
pure-torch `lbs.py` (read-only) on synthetic model parameters.

Also reproduces the dynamic-landmark LUT lookup exactly as
`FLAME._find_dynamic_lmk_idx_and_bcoords` (FLAME.py:93-135) does it —
composed here from the reference's own primitives (batch_rodrigues,
rot_mat_to_euler) with the FLAME.py sign convention (no negation, unlike
the standalone lbs.py variant).

Usage: python tests/gen_flame_goldens.py → tests/goldens/flame.npz
"""

import importlib.util
import os

import numpy as np
import torch

REF = "/root/reference/libs/DECA/decalib/models/lbs.py"
OUT = os.path.join(os.path.dirname(__file__), "goldens", "flame.npz")

N_VERTS, N_FACES, N_JOINTS = 256, 400, 5
N_SHAPE, N_EXP = 100, 50
PARENTS = np.array([-1, 0, 1, 1, 1])


def load_ref():
    spec = importlib.util.spec_from_file_location("ref_lbs", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def main():
    lb = load_ref()
    rng = np.random.RandomState(7)

    v_template = (rng.randn(N_VERTS, 3) * 0.1).astype(np.float32)
    shapedirs = (rng.randn(N_VERTS, 3, N_SHAPE + N_EXP) * 0.01).astype(np.float32)
    posedirs = (rng.randn(36, N_VERTS * 3) * 0.01).astype(np.float32)
    j_regressor = softmax(rng.randn(N_JOINTS, N_VERTS), axis=-1).astype(np.float32)
    lbs_weights = softmax(rng.randn(N_VERTS, N_JOINTS), axis=-1).astype(np.float32)
    faces = rng.randint(0, N_VERTS, (N_FACES, 3)).astype(np.int64)

    B = 4
    betas = (rng.randn(B, N_SHAPE + N_EXP) * 0.3).astype(np.float32)
    full_pose = (rng.randn(B, N_JOINTS * 3) * 0.3).astype(np.float32)

    verts, joints = lb.lbs(
        torch.from_numpy(betas), torch.from_numpy(full_pose),
        torch.from_numpy(v_template).unsqueeze(0).expand(B, -1, -1).contiguous(),
        torch.from_numpy(shapedirs), torch.from_numpy(posedirs),
        torch.from_numpy(j_regressor), torch.from_numpy(PARENTS),
        torch.from_numpy(lbs_weights))

    # static landmark extraction
    lmk_faces_idx = rng.randint(0, N_FACES, (51,)).astype(np.int64)
    lmk_bary = softmax(rng.randn(51, 3), axis=-1).astype(np.float32)
    lmks = lb.vertices2landmarks(
        verts, torch.from_numpy(faces),
        torch.from_numpy(lmk_faces_idx).unsqueeze(0).expand(B, -1).contiguous(),
        torch.from_numpy(lmk_bary).unsqueeze(0).expand(B, -1, -1).contiguous())

    # dynamic LUT lookup, FLAME.py convention (no negation)
    dyn_faces = rng.randint(0, N_FACES, (79, 17)).astype(np.int64)
    dyn_bary = softmax(rng.randn(79, 17, 3), axis=-1).astype(np.float32)
    neck_chain = torch.tensor([1, 0], dtype=torch.long)
    pose_t = torch.from_numpy(full_pose)
    aa_pose = torch.index_select(pose_t.view(B, -1, 3), 1, neck_chain)
    rot_mats = lb.batch_rodrigues(aa_pose.view(-1, 3)).view(B, -1, 3, 3)
    rel = torch.eye(3).unsqueeze(0).expand(B, -1, -1).contiguous()
    for i in range(2):
        rel = torch.bmm(rot_mats[:, i], rel)
    y = torch.round(torch.clamp(lb.rot_mat_to_euler(rel) * 180.0 / np.pi,
                                max=39)).to(torch.long)
    neg_mask = y.lt(0).to(torch.long)
    mask = y.lt(-39).to(torch.long)
    neg_vals = mask * 78 + (1 - mask) * (39 - y)
    y = neg_mask * neg_vals + (1 - neg_mask) * y
    dyn_idx_sel = torch.from_numpy(dyn_faces)[y]
    dyn_bary_sel = torch.from_numpy(dyn_bary)[y]

    # rodrigues golden
    aa = (rng.randn(8, 3) * 0.8).astype(np.float32)
    rod = lb.batch_rodrigues(torch.from_numpy(aa)).numpy()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT,
             v_template=v_template, shapedirs=shapedirs, posedirs=posedirs,
             j_regressor=j_regressor, lbs_weights=lbs_weights, faces=faces,
             betas=betas, full_pose=full_pose,
             verts=verts.numpy(), joints=joints.numpy(),
             lmk_faces_idx=lmk_faces_idx, lmk_bary=lmk_bary, lmks=lmks.numpy(),
             dyn_faces=dyn_faces, dyn_bary=dyn_bary,
             dyn_idx_sel=dyn_idx_sel.numpy(), dyn_bary_sel=dyn_bary_sel.numpy(),
             aa=aa, rod=rod)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
