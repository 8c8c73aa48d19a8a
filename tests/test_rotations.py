"""Rotation/quaternion identities (parity model: ref unit_test_rotations.cpp,
unit_test_quat_alg.cpp — tolerance checks on closed-form identities)."""
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu.math import rotations as rot


def random_quats(rng, n):
    q = rng.standard_normal((n, 4))
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def test_qmul_identity(rng):
    q = random_quats(rng, 16)
    e = rot.qidentity(q.dtype, (16,))
    np.testing.assert_allclose(rot.qmul(e, q), q, atol=1e-12)
    np.testing.assert_allclose(rot.qmul(q, e), q, atol=1e-12)


def test_qconj_inverse(rng):
    q = random_quats(rng, 16)
    e = rot.qmul(q, rot.qconj(q))
    np.testing.assert_allclose(e[:, 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(e[:, 1:], 0.0, atol=1e-12)


def test_qrot_matches_matrix(rng):
    q = random_quats(rng, 16)
    v = jnp.asarray(rng.standard_normal((16, 3)))
    R = rot.q_to_matrix(q)
    np.testing.assert_allclose(rot.qrot(q, v), (R @ v[..., None])[..., 0], atol=1e-12)
    np.testing.assert_allclose(
        rot.qrot_inv(q, v), (jnp.swapaxes(R, -1, -2) @ v[..., None])[..., 0], atol=1e-12
    )


def test_qrot_composition(rng):
    q1, q2 = random_quats(rng, 8), random_quats(rng, 8)
    v = jnp.asarray(rng.standard_normal((8, 3)))
    np.testing.assert_allclose(
        rot.qrot(rot.qmul(q1, q2), v), rot.qrot(q1, rot.qrot(q2, v)), atol=1e-12
    )


def test_matrix_roundtrip(rng):
    q = random_quats(rng, 64)
    # canonicalize sign for comparison
    q = q * jnp.where(q[:, :1] < 0, -1.0, 1.0)
    q2 = rot.q_from_matrix(rot.q_to_matrix(q))
    np.testing.assert_allclose(q2, q, atol=1e-9)


def test_axis_angle_roundtrip(rng):
    axis = rng.standard_normal((16, 3))
    axis = jnp.asarray(axis / np.linalg.norm(axis, axis=-1, keepdims=True))
    angle = jnp.asarray(rng.uniform(0.1, 3.0, 16))
    q = rot.q_from_axis_angle(axis, angle)
    a2, ang2 = rot.q_to_axis_angle(q)
    np.testing.assert_allclose(a2, axis, atol=1e-10)
    np.testing.assert_allclose(ang2, angle, atol=1e-10)


def test_exp_log_roundtrip(rng):
    v = jnp.asarray(rng.standard_normal((16, 3)) * 0.8)
    np.testing.assert_allclose(rot.q_log(rot.q_exp(v)), v, atol=1e-10)


def test_exp_small_angle():
    v = jnp.asarray([[1e-10, 0.0, 0.0]])
    q = rot.q_exp(v)
    np.testing.assert_allclose(q[0, 0], 1.0, atol=1e-15)


def test_euler_tb_roundtrip(rng):
    yaw = jnp.asarray(rng.uniform(-3, 3, 16))
    pitch = jnp.asarray(rng.uniform(-1.5, 1.5, 16))
    roll = jnp.asarray(rng.uniform(-3, 3, 16))
    y2, p2, r2 = rot.q_to_euler_tb(rot.q_from_euler_tb(yaw, pitch, roll))
    np.testing.assert_allclose(y2, yaw, atol=1e-10)
    np.testing.assert_allclose(p2, pitch, atol=1e-10)
    np.testing.assert_allclose(r2, roll, atol=1e-10)


def test_qdot_omega_roundtrip(rng):
    q = random_quats(rng, 16)
    w = jnp.asarray(rng.standard_normal((16, 3)))
    qdot = rot.qdot_from_omega(q, w)
    np.testing.assert_allclose(rot.omega_from_qdot(q, qdot), w, atol=1e-12)


def test_slerp_endpoints(rng):
    q0, q1 = random_quats(rng, 8), random_quats(rng, 8)
    np.testing.assert_allclose(rot.qslerp(q0, q1, 0.0), q0, atol=1e-9)
    # t=1 may differ by sign (shortest arc); compare rotation action
    v = jnp.asarray(rng.standard_normal((8, 3)))
    np.testing.assert_allclose(
        rot.qrot(rot.qslerp(q0, q1, 1.0), v), rot.qrot(q1, v), atol=1e-8
    )


def test_hat_vee(rng):
    v = jnp.asarray(rng.standard_normal((8, 3)))
    u = jnp.asarray(rng.standard_normal((8, 3)))
    np.testing.assert_allclose(rot.vee(rot.hat(v)), v, atol=1e-12)
    np.testing.assert_allclose(
        (rot.hat(v) @ u[..., None])[..., 0], jnp.cross(v, u), atol=1e-12
    )


def test_rot2d(rng):
    th = jnp.asarray(rng.uniform(-3, 3, 8))
    v = jnp.asarray(rng.standard_normal((8, 2)))
    R = rot.rot2d(th)
    np.testing.assert_allclose(rot.rot2d_apply(th, v), (R @ v[..., None])[..., 0], atol=1e-12)
    # det = 1
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)
