"""Geometry tests: rotation converters + Δp direction space."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.geometry import (
    deg2rad, rad2deg, euler_to_quaternion, quaternion_to_angle_axis,
    angle_axis_to_quaternion, quaternion_to_rotation_matrix,
    rotation_matrix_to_quaternion, batch_rodrigues, batch_euler2axis,
    batch_axis2euler, batch_axis2matrix, batch_matrix2euler, batch_orth_proj,
    initialize_directions, make_shift_vector, make_shift_vector_50,
    get_params_gt_reenacted, start_positions, get_direction_info,
)


def _rand_angles(rng, n, scale=0.5):
    return jnp.asarray(rng.uniform(-scale, scale, (n, 3)).astype(np.float32))


def test_deg_rad_roundtrip():
    x = jnp.asarray([0.0, 90.0, -180.0, 45.0])
    np.testing.assert_allclose(np.asarray(rad2deg(deg2rad(x))), np.asarray(x),
                               rtol=1e-6)


def test_euler_zero_is_identity():
    q = euler_to_quaternion(jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(q), [[1, 0, 0, 0]], atol=1e-7)
    m = quaternion_to_rotation_matrix(q)
    np.testing.assert_allclose(np.asarray(m)[0], np.eye(3), atol=1e-7)


def test_axis_quaternion_roundtrip(rng):
    aa = _rand_angles(rng, 8, scale=1.0)
    back = quaternion_to_angle_axis(angle_axis_to_quaternion(aa))
    np.testing.assert_allclose(np.asarray(back), np.asarray(aa), rtol=1e-4,
                               atol=1e-5)


def test_axis_zero_stable():
    aa = jnp.zeros((2, 3))
    q = angle_axis_to_quaternion(aa)
    np.testing.assert_allclose(np.asarray(q), [[1, 0, 0, 0]] * 2, atol=1e-7)
    back = quaternion_to_angle_axis(q)
    assert np.isfinite(np.asarray(back)).all()
    # gradient is finite at zero (the where-guards protect both branches)
    g = jax.grad(lambda a: jnp.sum(angle_axis_to_quaternion(a)))(aa)
    assert np.isfinite(np.asarray(g)).all()


def test_rodrigues_matches_quaternion_path(rng):
    aa = _rand_angles(rng, 8, scale=1.5)
    m1 = batch_rodrigues(aa)
    m2 = batch_axis2matrix(aa)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-4,
                               atol=1e-5)


def test_matrix_quaternion_roundtrip(rng):
    aa = _rand_angles(rng, 16, scale=1.5)
    m = batch_rodrigues(aa)
    q = rotation_matrix_to_quaternion(m)
    m2 = quaternion_to_rotation_matrix(q)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), rtol=1e-4,
                               atol=1e-4)


# exact matrix2euler numerics are pinned by tests/test_rotation_parity.py
# against goldens generated from the reference implementation


def test_matrix2euler_gimbal_lock():
    # rotation matrices with R[2,0] = ±1 hit the lock branch: must not NaN
    m_up = jnp.asarray([[[0.0, 0.0, -1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]]])
    m_dn = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]]])
    for m, sign in ((m_up, 1.0), (m_dn, -1.0)):
        out = np.asarray(batch_matrix2euler(m))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out[0, 0], sign * np.pi / 2, atol=1e-6)
        np.testing.assert_allclose(out[0, 2], 0.0, atol=1e-6)


def test_batch_orth_proj():
    X = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    cam = jnp.asarray([[8.0, 1.0, -1.0]])
    out = np.asarray(batch_orth_proj(X, cam))
    assert out.shape == (1, 4, 3)
    np.testing.assert_allclose(out[0, 0], [8 * (0 + 1), 8 * (1 - 1), 8 * 2])


# ---------------------------------------------------------------------------
# Directions / Δp
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def spec():
    return initialize_directions("voxceleb", learned_directions=15,
                                 shift_scale=6.0)


def _fake_params(rng, b):
    return {
        "pose": jnp.asarray(rng.uniform(-0.2, 0.2, (b, 6)).astype(np.float32)),
        "alpha_exp": jnp.asarray(rng.uniform(-1, 1, (b, 50)).astype(np.float32)),
        "alpha_shp": jnp.asarray(rng.uniform(-1, 1, (b, 100)).astype(np.float32)),
        "cam": jnp.asarray(np.tile([8.0, 0.0, 0.0], (b, 1)).astype(np.float32)),
    }


def test_spec_layout(spec):
    assert spec.count_pose == 4
    assert spec.num_expressions == 11
    assert spec.jaw_index == 3
    assert spec.exp_slot(0) == 4
    # affine maps send [min, max] -> [-6, 6]
    for i in range(spec.num_expressions):
        lo, hi = spec.exp_min[i], spec.exp_max[i]
        np.testing.assert_allclose(spec.exp_a[i] * lo + spec.exp_b[i], -6.0,
                                   atol=1e-9)
        np.testing.assert_allclose(spec.exp_a[i] * hi + spec.exp_b[i], 6.0,
                                   atol=1e-9)
    np.testing.assert_allclose(spec.a_jaw * spec.jaw_min + spec.b_jaw, -6.0,
                               atol=1e-9)


def test_ffhq_spec_drops_roll():
    s = initialize_directions("ffhq", learned_directions=15)
    assert s.roll_direction == -1
    assert s.count_pose == 3
    assert s.num_expressions == 12


def test_shift_vector_zero_for_identical(rng, spec):
    p = _fake_params(rng, 4)
    ang = _rand_angles(rng, 4, scale=20.0)
    sv = make_shift_vector(spec, p, p, ang, ang)
    np.testing.assert_allclose(np.asarray(sv), 0.0, atol=1e-5)


def test_shift_vector_yaw_scaling(rng, spec):
    p = _fake_params(rng, 2)
    ang_s = jnp.zeros((2, 3))
    ang_t = jnp.asarray([[20.0, 0, 0], [-40.0, 0, 0]])
    sv = np.asarray(make_shift_vector(spec, p, p, ang_s, ang_t))
    # yaw scale 40: Δp_yaw = Δdeg * 6/40
    np.testing.assert_allclose(sv[:, 0], [20 * 6 / 40, -40 * 6 / 40], rtol=1e-5)
    np.testing.assert_allclose(sv[:, 1:], 0.0, atol=1e-5)


def test_shift_vector_jaw_and_exp(rng, spec):
    ps = _fake_params(rng, 2)
    pt = jax.tree_util.tree_map(lambda x: x, ps)
    pt = dict(pt)
    pt["pose"] = ps["pose"].at[:, 3].add(0.05)
    pt["alpha_exp"] = ps["alpha_exp"].at[:, 2].add(0.5)
    ang = jnp.zeros((2, 3))
    sv = np.asarray(make_shift_vector(spec, ps, pt, ang, ang))
    np.testing.assert_allclose(sv[:, 3], spec.a_jaw * 0.05, rtol=1e-4)
    np.testing.assert_allclose(sv[:, 4 + 2], spec.exp_a[2] * 0.5, rtol=1e-4)


def test_shift_vector_50_structure(rng, spec):
    b = 8
    ps, pt = _fake_params(rng, b), _fake_params(rng, b)
    ang_s, ang_t = _rand_angles(rng, b, 15.0), _rand_angles(rng, b, 15.0)
    sv, idx = make_shift_vector_50(spec, ps, pt, ang_s, ang_t,
                                   jax.random.PRNGKey(0))
    sv = np.asarray(sv)
    assert sv.shape == (b, 15) and idx.shape == (b // 2,)
    # first half equals full shift vector
    full = np.asarray(make_shift_vector(spec, ps, pt, ang_s, ang_t))
    np.testing.assert_allclose(sv[:4], full[:4], rtol=1e-5)
    # second half: exactly one non-zero entry per row, at idx
    for r in range(4):
        row = sv[4 + r]
        nz = np.nonzero(np.abs(row) > 1e-9)[0]
        assert len(nz) <= 1
        if len(nz) == 1:
            assert nz[0] == int(idx[r])
    # sampled shift keeps the result inside [-shift_scale, +shift_scale]
    start = np.asarray(start_positions(spec, ps, ang_s))[4:]
    for r in range(4):
        val = start[r, int(idx[r])] + sv[4 + r, int(idx[r])]
        assert -6.0 - 1e-4 <= val <= 6.0 + 1e-4


def test_gt_reenacted_first_half_is_target(rng, spec):
    b = 8
    ps, pt = _fake_params(rng, b), _fake_params(rng, b)
    ang_s, ang_t = _rand_angles(rng, b, 15.0), _rand_angles(rng, b, 15.0)
    sv, idx = make_shift_vector_50(spec, ps, pt, ang_s, ang_t,
                                   jax.random.PRNGKey(1))
    gt = get_params_gt_reenacted(spec, ps, pt, sv, idx, ang_s)
    np.testing.assert_allclose(np.asarray(gt["pose"][:4]),
                               np.asarray(pt["pose"][:4]))
    np.testing.assert_allclose(np.asarray(gt["exp"][:4]),
                               np.asarray(pt["alpha_exp"][:4]))


def test_gt_reenacted_jaw_inverse_map(rng, spec):
    b = 4
    ps, pt = _fake_params(rng, b), _fake_params(rng, b)
    ang_s = jnp.zeros((b, 3))
    # force the jaw direction for the second half
    sv = jnp.zeros((b, 15)).at[2:, 3].set(1.5)
    idx = jnp.asarray([3, 3])
    gt = get_params_gt_reenacted(spec, ps, pt, sv, idx, ang_s)
    want = np.asarray(ps["pose"][2:, 3]) + 1.5 / spec.a_jaw
    np.testing.assert_allclose(np.asarray(gt["pose"][2:, 3]), want, rtol=1e-4)
    # other pose components unchanged for jaw-direction rows
    np.testing.assert_allclose(np.asarray(gt["pose"][2:, 4:]),
                               np.asarray(ps["pose"][2:, 4:]))


def test_gt_reenacted_yaw_direction(rng, spec):
    b = 4
    ps, pt = _fake_params(rng, b), _fake_params(rng, b)
    ang_s = jnp.asarray(np.tile([10.0, 5.0, -3.0], (b, 1)).astype(np.float32))
    sv = jnp.zeros((b, 15)).at[2:, 0].set(2.0)
    idx = jnp.asarray([0, 0])
    gt = get_params_gt_reenacted(spec, ps, pt, sv, idx, ang_s)
    # expected: euler (target_yaw, 5, -3) deg -> axis -> swap (x,y)->(y,-x)
    target_yaw = (10.0 * 6 / 40 + 2.0) * 40 / 6
    e = deg2rad(jnp.asarray([[target_yaw, 5.0, -3.0]]))
    aa = np.asarray(batch_euler2axis(e))[0]
    want = np.asarray([aa[1], -aa[0], aa[2]])
    np.testing.assert_allclose(np.asarray(gt["pose"][2, :3]), want, rtol=1e-4,
                               atol=1e-5)


def test_gt_reenacted_exp_direction(rng, spec):
    b = 4
    ps, pt = _fake_params(rng, b), _fake_params(rng, b)
    ang_s = jnp.zeros((b, 3))
    slot = spec.exp_slot(5)
    sv = jnp.zeros((b, 15)).at[2:, slot].set(-1.0)
    idx = jnp.asarray([slot, slot])
    gt = get_params_gt_reenacted(spec, ps, pt, sv, idx, ang_s)
    ci = spec.exp_components[5]
    want = np.asarray(ps["alpha_exp"][2:, ci]) - 1.0 / spec.exp_a[5]
    np.testing.assert_allclose(np.asarray(gt["exp"][2:, ci]), want, rtol=1e-4)


def test_get_direction_info(rng, spec):
    p = _fake_params(rng, 1)
    ang = jnp.asarray([[12.0, 0.0, 0.0]])
    name, start, mn, mx, step = get_direction_info(spec, 0, p, np.asarray(ang))
    assert name == "yaw"
    np.testing.assert_allclose(start, 12.0 * 6 / 40, rtol=1e-5)
    np.testing.assert_allclose(mn, -6 - start, rtol=1e-5)
    np.testing.assert_allclose(mx, 6 - start + 1e-5, rtol=1e-4)
    assert step == 0.6
    name, *_ = get_direction_info(spec, 3, p, np.asarray(ang))
    assert name == "jaw"
    name, *_ = get_direction_info(spec, 7, p, np.asarray(ang))
    assert name == "exp_03"


def test_shift_vector_jits(rng, spec):
    b = 4
    ps, pt = _fake_params(rng, b), _fake_params(rng, b)
    ang = _rand_angles(rng, b, 10.0)
    f = jax.jit(lambda a, c, d, e: make_shift_vector(spec, a, c, d, e))
    out = f(ps, pt, ang, ang)
    assert out.shape == (b, 15)
