"""Focused tests for the g2o compat shim's migration-surface semantics
(`suo_slam_tpu/compat/g2o.py`) beyond what the reference engine exercises:
fixed OBJECT vertices, custom Huber deltas, and the int8 kernel-config
guard. (The engine-level behavior is covered by
tests/test_reference_engine_parity.py.)"""

import numpy as np
import pytest

from suo_slam_tpu.compat import g2o


def _build_graph(obj0_fixed=False, outlier=False, huber_delta=None,
                 seed=0):
    """2 cameras x 2 objects x 12 points through the public g2o API."""
    rng = np.random.default_rng(seed)
    k4 = np.array([1.2, 1.2, 0.0, 0.0])

    opt = g2o.SparseOptimizer()
    opt.set_algorithm(g2o.OptimizationAlgorithmLevenberg(
        g2o.BlockSolverSE3(g2o.LinearSolverDenseSE3())))

    objs, obj_T_gt = [], []
    for j in range(2):
        T = np.eye(4)
        T[:3, 3] = [60.0 * j - 30.0, 0.0, 600.0]
        v = g2o.VertexSE3Expmap()
        v.set_id(j)
        v.set_estimate(g2o.SE3Quat(T[:3, :3], T[:3, 3]))
        v.set_fixed(obj0_fixed and j == 0)
        opt.add_vertex(v)
        objs.append(v)
        obj_T_gt.append(T)

    cams, cam_T_gt = [], []
    for i in range(2):
        T = np.eye(4)
        T[:3, 3] = [5.0 * i, 0.0, 0.0]
        v = g2o.VertexSE3Expmap()
        v.set_id(2 + i)
        # perturb the second camera so the solver has work to do
        T0 = T.copy()
        if i == 1:
            T0[:3, 3] += [3.0, -2.0, 4.0]
        v.set_estimate(g2o.SE3Quat(T0[:3, :3], T0[:3, 3]))
        v.set_fixed(i == 0)  # gauge
        opt.add_vertex(v)
        cams.append(v)
        cam_T_gt.append(T)

    pts = rng.uniform(-40, 40, (2, 12, 3))
    for j in range(2):
        for i in range(2):
            for p in pts[j]:
                p_g = obj_T_gt[j][:3, :3] @ p + obj_T_gt[j][:3, 3]
                p_c = cam_T_gt[i][:3, :3] @ p_g + cam_T_gt[i][:3, 3]
                uv = 1.2 * p_c[:2] / p_c[2]
                e = g2o.EdgeSE3ProjectFromObject(k4, p)
                e.set_vertex(0, objs[j])
                e.set_vertex(1, cams[i])
                e.set_measurement(uv + rng.normal(0, 1e-3, 2))
                e.set_information(np.eye(2) * 1e4)
                if huber_delta is not None:
                    e.set_robust_kernel(g2o.RobustKernelHuber(huber_delta))
                opt.add_edge(e)
    if outlier:
        # one gross outlier on the free camera / object 1. Uses a DISTINCT
        # model point: the packed backend raises on two edges sharing the
        # same (view, object, model-point) slot (see
        # test_duplicate_kp_edge_rejected) — and the reference never emits
        # one anyway (an outlier there is a wrong measurement of a keypoint,
        # not a second edge on it, `object_slam.py:813`).
        e = g2o.EdgeSE3ProjectFromObject(k4, np.array([17.0, -23.0, 11.0]))
        e.set_vertex(0, objs[1])
        e.set_vertex(1, cams[1])
        e.set_measurement(np.array([0.9, -0.9]))
        e.set_information(np.eye(2) * 1e4)
        if huber_delta is not None:
            e.set_robust_kernel(g2o.RobustKernelHuber(huber_delta))
        opt.add_edge(e)
    return opt, objs, cams, obj_T_gt, cam_T_gt


def test_fixed_object_vertex_does_not_move():
    """g2o semantics: set_fixed(True) vertices are excluded from the solve —
    not merely from the write-back. The tell-tale of the old bug (object
    moved during the solve, write-back restored it) is an INTERNALLY
    INCONSISTENT result: the written-back poses no longer explain the
    measurements, so recomputed edge chi2 stays large. With the fix every
    edge's chi2 at the final estimates is at the noise floor."""
    opt, objs, cams, obj_T_gt, cam_T_gt = _build_graph(obj0_fixed=True)
    T0_before = objs[0].estimate().matrix().copy()
    opt.initialize_optimization(0)
    opt.optimize(20)
    np.testing.assert_array_equal(objs[0].estimate().matrix(), T0_before)
    chi2s = []
    for e in opt.edges():
        e.compute_error()
        chi2s.append(e.chi2())
    # noise floor: sigma=1e-3 at info 1e4 -> E[chi2] ~ 0.02; the initial
    # camera perturbation alone puts edges at ~1.0
    assert float(np.mean(chi2s)) < 0.2, np.mean(chi2s)
    assert float(np.max(chi2s)) < 2.0, np.max(chi2s)


def test_huber_delta_is_honored():
    """A tiny custom delta must downweight a gross outlier far more than a
    huge delta (~= plain least squares): the installed RobustKernelHuber's
    delta is consumed, not silently replaced by sqrt(5.991)."""
    def run(delta):
        opt, objs, cams, _, cam_T_gt = _build_graph(
            outlier=True, huber_delta=delta, seed=1)
        opt.initialize_optimization(0)
        opt.optimize(30)
        return np.linalg.norm(cams[1].estimate().matrix()[:3, 3]
                              - cam_T_gt[1][:3, 3])

    # delta large enough that the outlier's chi2 (~1e4 * 0.8^2) stays in the
    # quadratic region -> least-squares drag; tiny delta -> robust. The
    # comparison is relative (absolute t error carries a weak-depth gauge
    # component in this fixture; the depth-insensitive drag still differs
    # by >2x between the two deltas).
    err_robust = run(0.5)
    err_ls = run(1e4)
    assert err_robust < err_ls * 0.5, (err_robust, err_ls)


def test_duplicate_kp_edge_rejected():
    """Two edges in the same (view, object) with byte-identical model points
    would silently overwrite each other's uv/info in the packed-slot
    backend (real g2o keeps both edges); the shim must refuse loudly."""
    opt, objs, cams, _, _ = _build_graph()
    k4 = np.array([1.2, 1.2, 0.0, 0.0])
    dup_p = None
    for e in opt.edges():
        dup_p = e.p_inO
        break
    e = g2o.EdgeSE3ProjectFromObject(k4, dup_p)
    e.set_vertex(0, objs[0])
    e.set_vertex(1, cams[0])
    e.set_measurement(np.array([0.1, 0.2]))
    e.set_information(np.eye(2))
    opt.add_edge(e)
    opt.initialize_optimization(0)
    with pytest.raises(ValueError, match="duplicate keypoint edge"):
        opt.optimize(5)


def test_int8_calib_frames_zero_rejected():
    """int8 without scales and with calibration disabled must fail loudly
    at build time, not KeyError on the first frame."""
    import jax.numpy as jnp

    from suo_slam_tpu.models import PkpNet
    from suo_slam_tpu.slam import kernels

    net = PkpNet(n_stack=1, n_modules=1, features=16, norm="batch")
    variables = net.init(__import__("jax").random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)))
    with pytest.raises(ValueError, match="int8_calib_frames"):
        kernels.make_frame_inference(net, variables, (64, 64), int8=True,
                                     int8_calib_frames=0)
