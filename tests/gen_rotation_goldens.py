"""Generate golden outputs for rotation converters by RUNNING the reference
implementation (read-only, pure torch-CPU) on random inputs.

Usage: python tests/gen_rotation_goldens.py
Writes tests/goldens/rotations.npz. The goldens are data, not code; the JAX
implementations in geometry/rotations.py are written independently and must
agree with these numerics.
"""

import importlib.util
import os
import sys

import numpy as np
import torch

REF = "/root/reference/libs/DECA/decalib/utils/rotation_converter.py"
OUT = os.path.join(os.path.dirname(__file__), "goldens", "rotations.npz")


def load_ref():
    spec = importlib.util.spec_from_file_location("ref_rotconv", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    rc = load_ref()
    rng = np.random.RandomState(42)

    euler = rng.uniform(-0.7, 0.7, (16, 3)).astype(np.float32)
    aa = rng.uniform(-1.2, 1.2, (16, 3)).astype(np.float32)

    te = torch.from_numpy(euler)
    ta = torch.from_numpy(aa)

    quat_from_euler = rc.euler_to_quaternion(te).numpy()
    quat_from_aa = rc.angle_axis_to_quaternion(ta).numpy()
    aa_from_quat = rc.quaternion_to_angle_axis(torch.from_numpy(quat_from_aa)).numpy()
    rot_from_quat = rc.quaternion_to_rotation_matrix(torch.from_numpy(quat_from_aa)).numpy()
    quat_from_rot = rc.rotation_matrix_to_quaternion(torch.from_numpy(rot_from_quat)).numpy()
    aa_from_euler = rc.batch_euler2axis(te).numpy()
    mat_from_aa = rc.batch_axis2matrix(ta).numpy()

    # batch_axis2euler: reference is batch-buggy; call per-sample (as the
    # pipeline does via estimate_DECA's per-image loop).
    euler_from_aa = np.stack([
        rc.batch_axis2euler(ta[i:i + 1]).numpy()[0] for i in range(len(aa))
    ])

    X = rng.randn(4, 7, 3).astype(np.float32)
    cam = rng.randn(4, 3).astype(np.float32)
    proj = rc.batch_orth_proj(torch.from_numpy(X), torch.from_numpy(cam)).numpy()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, euler=euler, aa=aa, X=X, cam=cam,
             quat_from_euler=quat_from_euler,
             quat_from_aa=quat_from_aa,
             aa_from_quat=aa_from_quat,
             rot_from_quat=rot_from_quat,
             quat_from_rot=quat_from_rot,
             aa_from_euler=aa_from_euler,
             mat_from_aa=mat_from_aa,
             euler_from_aa=euler_from_aa,
             proj=proj)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
