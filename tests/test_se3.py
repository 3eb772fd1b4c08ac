import numpy as np
import jax.numpy as jnp
import pytest

from gradient_sdf_tpu.utils import se3


RNG = np.random.RandomState(0)


def random_twist(scale=1.0):
    return RNG.randn(6).astype(np.float32) * scale


def test_so3_exp_log_roundtrip():
    for scale in [1e-6, 1e-3, 0.1, 1.0, 2.0]:
        w = RNG.randn(3).astype(np.float32) * scale
        R = se3.so3_exp(w)
        w2 = se3.so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), w, rtol=1e-3, atol=1e-5)


def test_so3_exp_is_rotation():
    w = RNG.randn(10, 3).astype(np.float32)
    R = se3.so3_exp(w)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (10, 3, 3))
    np.testing.assert_allclose(np.asarray(R @ np.swapaxes(R, -1, -2)), eye, atol=1e-5)
    det = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(det, np.ones(10), atol=1e-5)


def test_so3_log_near_pi():
    axis = np.array([1.0, 0.3, -0.5], dtype=np.float32)
    axis /= np.linalg.norm(axis)
    for theta in [np.pi - 1e-3, np.pi - 1e-5]:
        w = (axis * theta).astype(np.float32)
        R = se3.so3_exp(w)
        w2 = np.asarray(se3.so3_log(R))
        # log may return the equivalent negative rotation; compare rotations
        R2 = np.asarray(se3.so3_exp(w2))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-4)


def test_se3_exp_log_roundtrip():
    for scale in [1e-6, 0.01, 0.5, 1.5]:
        xi = random_twist(scale)
        R, t = se3.se3_exp(xi)
        xi2 = np.asarray(se3.se3_log(R, t))
        np.testing.assert_allclose(xi2, xi, rtol=1e-3, atol=1e-5)


def test_se3_exp_zero():
    R, t = se3.se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(t), np.zeros(3), atol=1e-7)


def test_se3_mul_inv():
    xia, xib = random_twist(0.7), random_twist(0.7)
    Ra, ta = se3.se3_exp(xia)
    Rb, tb = se3.se3_exp(xib)
    Rc, tc = se3.se3_mul(Ra, ta, Rb, tb)
    Ri, ti = se3.se3_inv(Rc, tc)
    Rid, tid = se3.se3_mul(Rc, tc, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rid), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tid), np.zeros(3), atol=1e-5)


def test_se3_apply_matches_matrix():
    xi = random_twist(0.5)
    R, t = se3.se3_exp(xi)
    pts = RNG.randn(17, 3).astype(np.float32)
    out = np.asarray(se3.se3_apply(R, t, pts))
    expected = pts @ np.asarray(R).T + np.asarray(t)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_quat_roundtrip():
    for _ in range(20):
        w = RNG.randn(3).astype(np.float32)
        R = se3.so3_exp(w)
        q = se3.rotmat_to_quat(R)
        R2 = se3.quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
        assert abs(np.linalg.norm(np.asarray(q)) - 1.0) < 1e-5


def test_sophus_twist_convention():
    # pure translation twist: t should equal v exactly
    xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
    R, t = se3.se3_exp(xi)
    np.testing.assert_allclose(np.asarray(t), [1.0, 2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
