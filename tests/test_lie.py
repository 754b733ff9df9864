import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from suo_slam_tpu.core import lie


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    return Rotation.random(n, random_state=rng).as_matrix()


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 3)) * 2.0
    R = lie.so3_exp(jnp.asarray(w))
    # Compare against scipy rotvec
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-10)
    w_back = lie.so3_log(R)
    R2 = lie.so3_exp(w_back)
    np.testing.assert_allclose(np.asarray(R2), R_ref, atol=1e-8)


def test_so3_log_matches_scipy():
    R = random_rotations(128, seed=2)
    w = np.asarray(lie.so3_log(jnp.asarray(R)))
    w_ref = Rotation.from_matrix(R).as_rotvec()
    # rotvec is unique up to 2pi wrap for |w|<pi; scipy returns |w|<=pi
    np.testing.assert_allclose(w, w_ref, atol=1e-6)


def test_so3_log_near_pi():
    # Rotations by ~pi about random axes — the hard branch
    rng = np.random.default_rng(3)
    axes = rng.normal(size=(32, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    for dtheta in [0.0, 1e-7, 1e-4, 1e-2]:
        w_ref = axes * (np.pi - dtheta)
        R = Rotation.from_rotvec(w_ref).as_matrix()
        w = np.array(lie.so3_log(jnp.asarray(R)))
        R_back = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R_back, R, atol=1e-6)


def test_so3_small_angle():
    w = jnp.asarray([[1e-12, 0, 0], [0.0, 0, 0], [1e-9, -1e-9, 1e-10]])
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.tile(np.eye(3), (3, 1, 1)), atol=2e-9)
    np.testing.assert_allclose(np.asarray(lie.so3_log(R)), np.asarray(w), atol=1e-9)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(4)
    xi = rng.normal(size=(64, 6))
    T = lie.se3_exp(jnp.asarray(xi))
    xi_back = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(xi_back, xi, atol=1e-8)
    # group property: exp(xi) exp(-xi) = I
    Tinv = lie.se3_exp(-jnp.asarray(xi))
    prod = np.asarray(T @ Tinv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (64, 1, 1)), atol=1e-8)


def test_invert_SE3():
    rng = np.random.default_rng(5)
    R = random_rotations(16, seed=6)
    t = rng.normal(size=(16, 3))
    T = np.asarray(lie.make_T(jnp.asarray(R), jnp.asarray(t)))
    Tinv = np.asarray(lie.invert_SE3(jnp.asarray(T)))
    np.testing.assert_allclose(T @ Tinv, np.tile(np.eye(4), (16, 1, 1)), atol=1e-10)
    # matches the reference formula
    for i in range(16):
        Tinv_ref = np.eye(4)
        Tinv_ref[:3, :3] = T[i, :3, :3].T
        Tinv_ref[:3, 3] = -T[i, :3, :3].T @ T[i, :3, 3]
        np.testing.assert_allclose(Tinv[i], Tinv_ref, atol=1e-12)


def test_quat_roundtrip():
    R = random_rotations(64, seed=7)
    q = lie.R_to_quat(jnp.asarray(R))
    R2 = np.asarray(lie.quat_to_R(q))
    np.testing.assert_allclose(R2, R, atol=1e-9)


def test_euler2R_matches_reference_formula():
    rng = np.random.default_rng(8)
    for _ in range(10):
        euler = rng.uniform(-180, 180, size=3)
        g, b, a = np.deg2rad(euler)
        cosa, cosb, cosg = np.cos(a), np.cos(b), np.cos(g)
        sina, sinb, sing = np.sin(a), np.sin(b), np.sin(g)
        R_ref = np.array(
            [
                [cosa * cosb, cosa * sinb * sing - sina * cosg, cosa * sinb * cosg + sina * sing],
                [sina * cosb, sina * sinb * sing + cosa * cosg, sina * sinb * cosg - cosa * sing],
                [-sinb, cosb * sing, cosb * cosg],
            ]
        )
        R = np.asarray(lie.euler2R(jnp.asarray(euler)))
        np.testing.assert_allclose(R, R_ref, atol=1e-12)


def test_jit_and_vmap():
    rng = np.random.default_rng(9)
    xi = jnp.asarray(rng.normal(size=(8, 6)), dtype=jnp.float32)
    f = jax.jit(jax.vmap(lambda x: lie.se3_log(lie.se3_exp(x))))
    out = f(xi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xi), atol=1e-4)
