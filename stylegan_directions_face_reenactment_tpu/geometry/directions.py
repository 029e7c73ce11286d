"""Δp direction space: ranges, linear maps, shift-vector construction.

TPU-first re-design of the direction machinery in
`libs/utilities/generic.py:36-114` (initialize_directions) and
`libs/utilities/utils_train.py:127-374` (make_shift_vector,
make_shift_vector_50, get_params_gt_reenacted).

The Δp vector has ``learned_directions`` (k=15) entries:
[yaw, pitch, roll, jaw, exp_0 … exp_{k-5}] (voxceleb layout; FFHQ drops roll).
Pose entries are degrees rescaled by ``shift_scale / angle_scale``; jaw and
expression entries go through per-direction affine maps ``a·x + b`` that send
the measured [min, max] range (from `ranges_*.npy`, produced by
extract_statistics) to [-shift_scale, +shift_scale].

The reference builds these with python loops over batch entries and
directions; here everything is a fixed-size masked/gathered tensor program
so it jits and shards (no data-dependent control flow).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .rotations import batch_euler2axis, deg2rad

_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

DATASET_DICTS = {
    # `libs/configs/config_directions.py:5-28`
    "voxceleb": dict(yaw_direction=0, pitch_direction=1, roll_direction=2,
                     jaw_direction=3, yaw_scale=40.0, pitch_scale=20.0,
                     roll_scale=20.0, ranges_file="ranges_voxceleb.npy"),
    "ffhq": dict(yaw_direction=0, pitch_direction=1, roll_direction=-1,
                 jaw_direction=3, yaw_scale=40.0, pitch_scale=20.0,
                 roll_scale=20.0, ranges_file="ranges_FFHQ.npy"),
}


def _line_through(x0, y0, x1, y1) -> Tuple[float, float]:
    """Exact a·x+b through two points (the reference solves this with lstsq,
    `generic.py:91-96`; identical for two points)."""
    a = (y1 - y0) / (x1 - x0)
    return float(a), float(y0 - a * x0)


def get_direction_ranges(path: str) -> np.ndarray:
    """Load the (54, 2) [min, max] statistics file (`config_directions.py:30-39`)."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"direction ranges file not found: {path}")
    return np.load(path).astype(np.float64)


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class DirectionsSpec:
    """Static direction-space config (hashable; closed over by jitted fns)."""
    learned_directions: int
    shift_scale: float
    count_pose: int
    num_expressions: int
    yaw_direction: int
    pitch_direction: int
    roll_direction: int
    angle_scales: Tuple[float, float, float]   # yaw, pitch, roll
    a_jaw: float
    b_jaw: float
    exp_a: Tuple[float, ...]                   # per learned expression
    exp_b: Tuple[float, ...]
    exp_components: Tuple[int, ...]            # DECA exp coefficient index
    exp_min: Tuple[float, ...]
    exp_max: Tuple[float, ...]
    jaw_min: float = 0.0
    jaw_max: float = 0.0

    @property
    def jaw_index(self) -> int:
        """Δp slot of the jaw direction (= count_pose - 1)."""
        return self.count_pose - 1

    def exp_slot(self, i: int) -> int:
        """Δp slot of learned expression i."""
        return self.count_pose + i


def initialize_directions(dataset_type: str = "voxceleb",
                          learned_directions: int = 15,
                          shift_scale: float = 6.0,
                          ranges_path: Optional[str] = None) -> DirectionsSpec:
    """Build the DirectionsSpec (`generic.py:36-114`)."""
    d = DATASET_DICTS[dataset_type.lower()]
    if ranges_path is None:
        ranges_path = os.path.join(_CONFIG_DIR, d["ranges_file"])
    ranges = get_direction_ranges(ranges_path)

    jaw_min, jaw_max = float(ranges[3][0]), float(ranges[3][1])
    exp_ranges = ranges[4:]

    count_pose = sum(1 for k in ("yaw_direction", "pitch_direction",
                                 "roll_direction") if d[k] != -1) + 1  # + jaw
    num_expressions = learned_directions - count_pose

    exp_a, exp_b, exp_c, exp_lo, exp_hi = [], [], [], [], []
    for i in range(num_expressions):
        lo, hi = float(exp_ranges[i][0]), float(exp_ranges[i][1])
        a, b = _line_through(lo, -shift_scale, hi, shift_scale)
        exp_a.append(a)
        exp_b.append(b)
        exp_c.append(i)
        exp_lo.append(lo)
        exp_hi.append(hi)

    # Jaw map always targets [-6, 6] (`generic.py:100-105`).
    a_jaw, b_jaw = _line_through(jaw_min, -6.0, jaw_max, 6.0)

    return DirectionsSpec(
        learned_directions=learned_directions,
        shift_scale=shift_scale,
        count_pose=count_pose,
        num_expressions=num_expressions,
        yaw_direction=d["yaw_direction"],
        pitch_direction=d["pitch_direction"],
        roll_direction=d["roll_direction"],
        angle_scales=(d["yaw_scale"], d["pitch_scale"], d["roll_scale"]),
        a_jaw=a_jaw, b_jaw=b_jaw,
        exp_a=tuple(exp_a), exp_b=tuple(exp_b), exp_components=tuple(exp_c),
        exp_min=tuple(exp_lo), exp_max=tuple(exp_hi),
        jaw_min=jaw_min, jaw_max=jaw_max,
    )


# ---------------------------------------------------------------------------
# Shift-vector construction (vectorized, jittable)
# ---------------------------------------------------------------------------

def _pose_entries(spec: DirectionsSpec, angles: jnp.ndarray) -> jnp.ndarray:
    """Per-sample shift-space coordinates of the 3 pose angles; (B, 3)."""
    scales = jnp.asarray(spec.angle_scales)
    return angles * (spec.shift_scale / scales)


def start_positions(spec: DirectionsSpec, params: Dict[str, jnp.ndarray],
                    angles: jnp.ndarray) -> jnp.ndarray:
    """Shift-space 'current position' per direction; (B, k).

    Pose slots: angle·shift_scale/scale; jaw slot: a·jaw + b;
    exp slots: a·exp + b. Used for both the random-direction sampler and the
    editing sweeps (`config_directions.py:42-85`).
    """
    b = angles.shape[0]
    k = spec.learned_directions
    start = jnp.zeros((b, k), jnp.float32)
    pose = _pose_entries(spec, angles)
    for axis, direction in enumerate((spec.yaw_direction, spec.pitch_direction,
                                      spec.roll_direction)):
        if direction != -1:
            start = start.at[:, direction].set(pose[:, axis])
    start = start.at[:, spec.jaw_index].set(
        spec.a_jaw * params["pose"][:, 3] + spec.b_jaw)
    exp_a = jnp.asarray(spec.exp_a)
    exp_b = jnp.asarray(spec.exp_b)
    comp = jnp.asarray(spec.exp_components, jnp.int32)
    exp_vals = params["alpha_exp"][:, comp]  # (B, num_exp)
    start = start.at[:, spec.count_pose:spec.count_pose + spec.num_expressions].set(
        exp_a * exp_vals + exp_b)
    return start


def make_shift_vector(spec: DirectionsSpec,
                      param_source: Dict[str, jnp.ndarray],
                      param_target: Dict[str, jnp.ndarray],
                      angles_source: jnp.ndarray,
                      angles_target: jnp.ndarray) -> jnp.ndarray:
    """Full-reenactment Δp = start(target) − start(source); (B, k).

    Vectorizes `utils_train.py:127-174` (the affine offsets b cancel in the
    difference, leaving exactly the reference's a·(x_t − x_s) terms).
    """
    return (start_positions(spec, param_target, angles_target)
            - start_positions(spec, param_source, angles_source))


def make_shift_vector_50_from(spec: DirectionsSpec,
                              param_source: Dict[str, jnp.ndarray],
                              param_target: Dict[str, jnp.ndarray],
                              angles_source: jnp.ndarray,
                              angles_target: jnp.ndarray,
                              target_indices: jnp.ndarray,
                              u: jnp.ndarray) -> jnp.ndarray:
    """Disentanglement-50 construction with the random draws made explicit:
    ``target_indices`` (B/2,) picks the single direction per second-half
    sample and ``u`` (B/2, in [0,1)) its uniform shift position. Pure — the
    live-parity tests drive it with the reference's exact draws; production
    goes through :func:`make_shift_vector_50`."""
    b = angles_source.shape[0]
    half = b // 2
    k = spec.learned_directions

    full = make_shift_vector(spec, param_source, param_target,
                             angles_source, angles_target)

    start = start_positions(spec, param_source, angles_source)[half:]  # (half,k)
    start_sel = jnp.take_along_axis(start, target_indices[:, None], axis=1)[:, 0]
    min_shift = -spec.shift_scale - start_sel
    max_shift = spec.shift_scale - start_sel
    shift_val = (min_shift - max_shift) * u + max_shift

    second = jnp.zeros((half, k), jnp.float32)
    second = second.at[jnp.arange(half), target_indices].set(shift_val)

    return jnp.concatenate([full[:half], second], axis=0)


def make_shift_vector_50(spec: DirectionsSpec,
                         param_source: Dict[str, jnp.ndarray],
                         param_target: Dict[str, jnp.ndarray],
                         angles_source: jnp.ndarray,
                         angles_target: jnp.ndarray,
                         rng: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Disentanglement-50 batch: first half full Δp, second half a single
    random direction with a uniform shift (`utils_train.py:177-288`).

    Batch size must be even. Returns (shift_vector (B,k),
    target_indices (B/2,) — the chosen direction per second-half sample).
    """
    b = angles_source.shape[0]
    if b % 2 != 0:
        raise ValueError("batch size must be even for disentanglement_50")
    half = b // 2
    k = spec.learned_directions

    k_ind, k_shift = jax.random.split(rng)
    target_indices = jax.random.randint(k_ind, (half,), 0, k)
    u = jax.random.uniform(k_shift, (half,))
    shift_vector = make_shift_vector_50_from(
        spec, param_source, param_target, angles_source, angles_target,
        target_indices, u)
    return shift_vector, target_indices


def get_params_gt_reenacted(spec: DirectionsSpec,
                            param_source: Dict[str, jnp.ndarray],
                            param_target: Dict[str, jnp.ndarray],
                            shift_vector: jnp.ndarray,
                            target_indices: jnp.ndarray,
                            angles_source: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Ground-truth FLAME coefficients for the reenacted face.

    First half of the batch: target pose+exp. Second half: source
    coefficients with ONE attribute moved by the sampled shift
    (`utils_train.py:291-374`), including the euler→axis conversion with the
    (x, y) → (y, −x) component swap for pose directions
    (`utils_train.py:310-314`).
    """
    b = angles_source.shape[0]
    half = b // 2
    k = spec.learned_directions

    pose_gt = jnp.concatenate([param_target["pose"][:half],
                               param_source["pose"][half:]], axis=0)
    exp_gt = jnp.concatenate([param_target["alpha_exp"][:half],
                              param_source["alpha_exp"][half:]], axis=0)

    # --- second half, vectorized over the 'which direction' choice ---
    ang_s = angles_source[half:]                       # (half, 3) degrees
    pose_s = param_source["pose"][half:]               # (half, 6)
    exp_s = param_source["alpha_exp"][half:]           # (half, 50)
    shift_sel = jnp.take_along_axis(shift_vector[half:], target_indices[:, None],
                                    axis=1)[:, 0]      # (half,)

    scales = jnp.asarray(spec.angle_scales)

    # Candidate poses for each of the 3 pose directions.
    cand_axis_pose = []
    pose_dirs = (spec.yaw_direction, spec.pitch_direction, spec.roll_direction)
    for axis in range(3):
        start = ang_s[:, axis] * (spec.shift_scale / scales[axis])
        target_deg = (start + shift_sel) * (scales[axis] / spec.shift_scale)
        ang_tmp = ang_s.at[:, axis].set(target_deg)
        aa = batch_euler2axis(deg2rad(ang_tmp))        # (half, 3)
        # component swap (x, y) -> (y, -x)
        aa = jnp.stack([aa[:, 1], -aa[:, 0], aa[:, 2]], axis=-1)
        cand_axis_pose.append(aa)
    cand_axis_pose = jnp.stack(cand_axis_pose, axis=1)  # (half, 3, 3)

    new_pose3 = pose_s[:, :3]
    for axis in range(3):
        if pose_dirs[axis] != -1:
            m = (target_indices == pose_dirs[axis])[:, None]
            new_pose3 = jnp.where(m, cand_axis_pose[:, axis], new_pose3)

    # Jaw: x' = x + shift / a  (from ((a·x+b)+s − b)/a).
    is_jaw = target_indices == spec.jaw_index
    new_jaw = jnp.where(is_jaw, pose_s[:, 3] + shift_sel / spec.a_jaw, pose_s[:, 3])

    # Expressions (components are static config ints -> plain scatter updates).
    exp_new = exp_s
    for i in range(spec.num_expressions):
        m = target_indices == spec.exp_slot(i)
        ci = spec.exp_components[i]
        exp_new = exp_new.at[:, ci].set(
            jnp.where(m, exp_s[:, ci] + shift_sel / spec.exp_a[i],
                      exp_new[:, ci]))

    pose_second = jnp.concatenate(
        [new_pose3, new_jaw[:, None], pose_s[:, 4:]], axis=1)
    pose_gt = pose_gt.at[half:, :].set(pose_second)
    exp_gt = exp_gt.at[half:, :].set(exp_new)

    return {"pose": pose_gt, "exp": exp_gt}


# ---------------------------------------------------------------------------
# Editing sweeps (host-side; `config_directions.py:42-85`)
# ---------------------------------------------------------------------------

def get_direction_info(spec: DirectionsSpec, direction_index: int,
                       params_source: Dict[str, np.ndarray],
                       angles_source: np.ndarray,
                       shifts_count: int = 10):
    """Sweep metadata for one direction of a single source sample.

    Returns (type_direction, start_pose, min_shift, max_shift, step).
    """
    ss = spec.shift_scale
    pose_dirs = {spec.yaw_direction: ("yaw", 0),
                 spec.pitch_direction: ("pitch", 1),
                 spec.roll_direction: ("roll", 2)}
    pose_dirs.pop(-1, None)

    if direction_index in pose_dirs:
        name, axis = pose_dirs[direction_index]
        source_angle = float(np.asarray(angles_source).reshape(-1, 3)[0, axis])
        start = source_angle * ss / spec.angle_scales[axis]
        type_direction = name
    elif direction_index == spec.jaw_index:
        jaw = float(np.asarray(params_source["pose"]).reshape(-1, 6)[0, 3])
        start = spec.a_jaw * jaw + spec.b_jaw
        type_direction = "jaw"
    else:
        i = direction_index - spec.count_pose
        if not (0 <= i < spec.num_expressions):
            raise ValueError(f"unknown direction index {direction_index}")
        ci = spec.exp_components[i]
        val = float(np.asarray(params_source["alpha_exp"]).reshape(1, -1)[0, ci])
        start = spec.exp_a[i] * val + spec.exp_b[i]
        type_direction = f"exp_{ci:02d}"

    min_shift = -ss - start
    max_shift = ss - start + 1e-5
    step = ss / shifts_count
    return type_direction, float(start), float(min_shift), float(max_shift), step
