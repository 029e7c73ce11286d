"""Exact-numerics parity of rotation converters vs reference goldens.

Goldens are produced by tests/gen_rotation_goldens.py, which runs the
reference's pure-torch converters on random inputs (data only; the JAX
implementations are independent).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.geometry import (
    euler_to_quaternion, angle_axis_to_quaternion, quaternion_to_angle_axis,
    quaternion_to_rotation_matrix, rotation_matrix_to_quaternion,
    batch_euler2axis, batch_axis2euler, batch_axis2matrix, batch_orth_proj,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "rotations.npz")

pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN),
                                reason="goldens not generated")


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN)


def test_euler_to_quaternion_parity(g):
    got = np.asarray(euler_to_quaternion(jnp.asarray(g["euler"])))
    np.testing.assert_allclose(got, g["quat_from_euler"], rtol=1e-5, atol=1e-6)


def test_angle_axis_to_quaternion_parity(g):
    got = np.asarray(angle_axis_to_quaternion(jnp.asarray(g["aa"])))
    np.testing.assert_allclose(got, g["quat_from_aa"], rtol=1e-5, atol=1e-6)


def test_quaternion_to_angle_axis_parity(g):
    got = np.asarray(quaternion_to_angle_axis(jnp.asarray(g["quat_from_aa"])))
    np.testing.assert_allclose(got, g["aa_from_quat"], rtol=1e-5, atol=1e-6)


def test_quaternion_to_rotation_matrix_parity(g):
    got = np.asarray(quaternion_to_rotation_matrix(jnp.asarray(g["quat_from_aa"])))
    np.testing.assert_allclose(got, g["rot_from_quat"], rtol=1e-5, atol=1e-6)


def test_rotation_matrix_to_quaternion_parity(g):
    got = np.asarray(rotation_matrix_to_quaternion(jnp.asarray(g["rot_from_quat"])))
    np.testing.assert_allclose(got, g["quat_from_rot"], rtol=1e-4, atol=1e-5)


def test_batch_euler2axis_parity(g):
    got = np.asarray(batch_euler2axis(jnp.asarray(g["euler"])))
    np.testing.assert_allclose(got, g["aa_from_euler"], rtol=1e-5, atol=1e-6)


def test_batch_axis2matrix_parity(g):
    got = np.asarray(batch_axis2matrix(jnp.asarray(g["aa"])))
    np.testing.assert_allclose(got, g["mat_from_aa"], rtol=1e-5, atol=1e-6)


def test_batch_axis2euler_parity(g):
    # reference evaluated per-sample (its batched version is buggy);
    # ours is vectorized and must match the per-sample results.
    got = np.asarray(batch_axis2euler(jnp.asarray(g["aa"])))
    np.testing.assert_allclose(got, g["euler_from_aa"], rtol=1e-4, atol=1e-5)


def test_batch_orth_proj_parity(g):
    got = np.asarray(batch_orth_proj(jnp.asarray(g["X"]), jnp.asarray(g["cam"])))
    np.testing.assert_allclose(got, g["proj"], rtol=1e-5, atol=1e-6)
