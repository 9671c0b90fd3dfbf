"""Golden-value tests for the SE(3) substrate (ref: dbot/pose/*.h algebra)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbot_ros_tpu.utils import se3


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return se3.quat_normalize(q)


def test_quat_identity_rotate():
    v = jnp.array([[1.0, 2.0, 3.0]])
    q = se3.quat_identity((1,))
    np.testing.assert_allclose(se3.quat_rotate(q, v), v, atol=1e-6)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(0)
    q = random_quats(key, 32)
    v = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    R = se3.quat_to_matrix(q)
    np.testing.assert_allclose(
        se3.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-5)


def test_quat_multiply_composes_rotations():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    q1, q2 = random_quats(k1, 16), random_quats(k2, 16)
    v = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
    lhs = se3.quat_rotate(se3.quat_multiply(q1, q2), v)
    rhs = se3.quat_rotate(q1, se3.quat_rotate(q2, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_matrix_quat_roundtrip():
    q = random_quats(jax.random.PRNGKey(4), 64)
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    q2 = se3.matrix_to_quat(se3.quat_to_matrix(q))
    np.testing.assert_allclose(q, q2, atol=1e-5)


def test_matrix_quat_180deg_rotations():
    # The degenerate trace cases that break naive conversions.
    for axis in range(3):
        w = np.zeros(3)
        w[axis] = np.pi
        q = se3.so3_exp_quat(jnp.asarray(w, jnp.float32))
        R = se3.quat_to_matrix(q)
        q2 = se3.matrix_to_quat(R)
        np.testing.assert_allclose(
            se3.quat_to_matrix(q2), R, atol=1e-5)


def test_so3_exp_log_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(5), (64, 3))
    # log∘exp is identity only inside the injectivity radius ‖w‖ < π.
    norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    w = w / norm * jnp.minimum(norm, 0.95 * np.pi)
    w2 = se3.so3_log(se3.so3_exp_quat(w))
    np.testing.assert_allclose(w, w2, atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.array([[1e-9, 0.0, 0.0]])
    q = se3.so3_exp_quat(w)
    assert jnp.all(jnp.isfinite(q))
    np.testing.assert_allclose(q[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(se3.so3_log(q), w, atol=1e-8)


def test_so3_exp_known_rotation():
    # 90° about z: (1,0,0) → (0,1,0)
    q = se3.so3_exp_quat(jnp.array([0.0, 0.0, np.pi / 2]))
    v = se3.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)


def test_pose_compose_inverse():
    key = jax.random.PRNGKey(6)
    k1, k2, k3 = jax.random.split(key, 3)
    p = jnp.concatenate([jax.random.normal(k1, (8, 3)),
                         random_quats(k2, 8)], -1)
    pts = jax.random.normal(k3, (8, 3))
    pinv = se3.pose_inverse(p)
    np.testing.assert_allclose(
        se3.pose_apply(pinv, se3.pose_apply(p, pts)), pts, atol=1e-5)
    ident = se3.pose_compose(p, pinv)
    np.testing.assert_allclose(se3.pose_trans(ident),
                               jnp.zeros((8, 3)), atol=1e-5)


def test_pose_matrix_roundtrip():
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    p = jnp.concatenate([jax.random.normal(k1, (8, 3)),
                         random_quats(k2, 8)], -1)
    pts = jax.random.normal(jax.random.PRNGKey(8), (8, 3))
    M = se3.pose_to_matrix(p)
    hom = jnp.concatenate([pts, jnp.ones((8, 1))], -1)
    np.testing.assert_allclose(
        se3.pose_apply(p, pts), jnp.einsum("nij,nj->ni", M, hom)[:, :3],
        atol=1e-5)
    p2 = se3.matrix_to_pose(M)
    np.testing.assert_allclose(
        se3.pose_apply(p2, pts), se3.pose_apply(p, pts), atol=1e-5)


def test_boxplus_boxminus_consistency():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    s1 = jnp.concatenate([jax.random.normal(k1, (8, 3)),
                          random_quats(k2, 8),
                          jax.random.normal(k3, (8, 6))], -1)
    xi = jax.random.normal(jax.random.PRNGKey(10), (8, 12)) * 0.5
    s2 = se3.state_boxplus(s1, xi)
    xi2 = se3.state_boxminus(s2, s1)
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_states_mean_uniform_rotations():
    # Mean of slight perturbations around a base quat ≈ base quat.
    base = se3.so3_exp_quat(jnp.array([0.3, -0.2, 0.5]))
    eps = jax.random.normal(jax.random.PRNGKey(11), (256, 3)) * 0.05
    qs = se3.quat_boxplus(jnp.broadcast_to(base, (256, 4)), eps)
    states = jnp.concatenate(
        [jnp.zeros((256, 3)), qs, jnp.zeros((256, 6))], -1)
    m = se3.states_mean(states)
    err = jnp.linalg.norm(se3.quat_boxminus(m[3:7], base))
    assert float(err) < 0.02


def test_states_mean_weighted():
    # All weight on one particle → that particle.
    k1, k2 = jax.random.split(jax.random.PRNGKey(12))
    states = jnp.concatenate([
        jax.random.normal(k1, (16, 3)), random_quats(k2, 16),
        jnp.zeros((16, 6))], -1)
    w = jnp.zeros((16,)).at[5].set(1.0)
    m = se3.states_mean(states, w)
    np.testing.assert_allclose(m[:3], states[5, :3], atol=1e-5)
    dq = se3.quat_boxminus(m[3:7], states[5, 3:7])
    assert float(jnp.linalg.norm(dq)) < 1e-3


def test_rotation_error_symmetric_quotients_box_flips():
    from dbot_ros_tpu.utils import se3 as s3
    import jax.numpy as jnp

    sym = s3.box_symmetry_quats()
    q_gt = s3.so3_exp_quat(jnp.array([0.2, -0.1, 0.4]))
    # estimate = gt composed with a pi-flip about y (a box symmetry)
    q_est = s3.quat_multiply(q_gt, s3.so3_exp_quat(jnp.array([0., np.pi, 0.])))
    plain = float(jnp.linalg.norm(s3.quat_boxminus(q_est, q_gt)))
    assert plain > 3.0                        # naive metric: ~pi
    assert float(s3.rotation_error_symmetric(q_est, q_gt, sym)) < 1e-5
    # a genuine 0.3-rad error stays 0.3 under the quotient
    q_bad = s3.quat_multiply(s3.so3_exp_quat(jnp.array([0., 0., 0.3])), q_gt)
    e = float(s3.rotation_error_symmetric(q_bad, q_gt, sym))
    assert abs(e - 0.3) < 0.02, e
    # batched shapes
    qe = jnp.stack([q_est, q_bad])
    qg = jnp.stack([q_gt, q_gt])
    out = s3.rotation_error_symmetric(qe, qg, sym)
    assert out.shape == (2,)
