"""Drop-in for the reference's `g2o` pybind module (the consumed surface).

Mimics exactly the API `lib/object_slam.py:703-930` uses — SparseOptimizer,
BlockSolverSE3/LinearSolver{Dense,Cholmod}SE3, OptimizationAlgorithmLevenberg,
SE3Quat, VertexSE3Expmap, EdgeSE3ProjectFromObject,
EdgeSE3ProjectFromFixedObject, RobustKernelHuber, edge
set_level/chi2/compute_error — backed by this repo's fixed-sparsity TPU LM
solver (`solvers/ba.lm_run`) instead of the vendored g2o C++ library
(`thirdparty/g2opy`).

Semantics preserved:
  - `initialize_optimization(level)` + `optimize(n)` runs LM over edges at
    that level only (the reference's inlier/outlier switch,
    `lib/object_slam.py:834,861-892`);
  - vertices with `set_fixed(True)` do not move (gauge fixing,
    `lib/object_slam.py:774`);
  - `chi2()` is the UNWEIGHTED e^T Info e at current vertex estimates
    (g2o's chi2() excludes the robust kernel); `compute_error()` is
    consequently a no-op here because chi2 always evaluates fresh — at
    every reference call site that equals g2o's cached-_error value;
  - a RobustKernelHuber on the edges enables the Huber IRLS weighting
    inside the LM run (`set_robust_kernel(None)` disables it).

The edge residual/Jacobian model matches the reference's custom edges
(`thirdparty/g2opy/g2o/types/object_slam/types_object_slam.cpp:45-123`):
r = uv_meas - pi(cam_k, T_CW * T_WO * p_O), left-multiplicative se(3).

Graph -> BAProblem packing pads (views, objects, keypoints) to power-of-two
buckets so the jitted LM program compiles a handful of shapes per process.
"""

from __future__ import annotations

import numpy as np

from ..solvers import ba as ba_mod

# Test-only back-end swap: when set (tests/helpers/native_oracle.py builds
# it over the REAL g2o library compiled from the reference sources), each
# `optimize(n)` call runs native g2o on the same packed problem instead of
# `ba.lm_run` — so the reference engine's control flow can be driven by the
# actual g2o as a closed-loop oracle against both our solver and our engine.
_native_lm = None


def set_native_lm(fn) -> None:
    """Install (or clear, fn=None) the native-g2o LM backend hook."""
    global _native_lm
    _native_lm = fn


def _bucket(n: int, lo: int = 4) -> int:
    b = lo
    while b < n:
        b <<= 1
    return b


def _to44(T) -> np.ndarray:
    T = np.asarray(T, np.float64)
    out = np.eye(4)
    out[: T.shape[0], :4] = T[:, :4]
    return out


class SE3Quat:
    """Minimal SE3 value type: `g2o.SE3Quat(R, t)` / `.matrix()`."""

    def __init__(self, R=None, t=None):
        self._T = np.eye(4)
        if R is not None:
            self._T[:3, :3] = np.asarray(R, np.float64)
        if t is not None:
            self._T[:3, 3] = np.asarray(t, np.float64).ravel()

    @classmethod
    def _from_matrix(cls, T):
        out = cls()
        out._T = _to44(T)
        return out

    def matrix(self) -> np.ndarray:
        return self._T.copy()

    def rotation(self):
        return self._T[:3, :3].copy()

    def translation(self):
        return self._T[:3, 3].copy()

    def map(self, p):
        p = np.asarray(p, np.float64)
        return p @ self._T[:3, :3].T + self._T[:3, 3]


class VertexSE3Expmap:
    def __init__(self):
        self._id = -1
        self._fixed = False
        self._T = np.eye(4)

    def set_id(self, i):
        self._id = int(i)

    def id(self):
        return self._id

    def set_fixed(self, fixed):
        self._fixed = bool(fixed)

    def fixed(self):
        return self._fixed

    def set_estimate(self, est: SE3Quat):
        self._T = _to44(est.matrix() if isinstance(est, SE3Quat) else est)

    def estimate(self) -> SE3Quat:
        return SE3Quat._from_matrix(self._T)


class RobustKernelHuber:
    def __init__(self, delta: float):
        self.delta = float(delta)


class LinearSolverDenseSE3:
    pass


class LinearSolverCholmodSE3:
    pass


class LinearSolverEigenSE3:
    pass


class BlockSolverSE3:
    def __init__(self, linear_solver):
        self.linear_solver = linear_solver


class OptimizationAlgorithmLevenberg:
    def __init__(self, block_solver):
        self.block_solver = block_solver


class _BaseEdge:
    """Shared measurement/bookkeeping for both object-SLAM edge types."""

    def __init__(self, cam_k):
        self.cam_k = np.asarray(cam_k, np.float64).ravel()  # (fx, fy, cx, cy)
        self._vertices = {}
        self._measurement = np.zeros(2)
        self._information = np.eye(2)
        self._robust_kernel = None
        self._level = 0

    def set_vertex(self, i, v):
        self._vertices[int(i)] = v

    def vertex(self, i):
        return self._vertices[int(i)]

    def set_measurement(self, uv):
        self._measurement = np.asarray(uv, np.float64).ravel()

    def measurement(self):
        return self._measurement.copy()

    def set_information(self, info):
        self._information = np.asarray(info, np.float64)

    def information(self):
        return self._information.copy()

    def set_robust_kernel(self, kernel):
        self._robust_kernel = kernel

    def robust_kernel(self):
        return self._robust_kernel

    def set_level(self, level):
        self._level = int(level)

    def level(self):
        return self._level

    def compute_error(self):
        # chi2() always evaluates at current vertex estimates, so there is
        # no cached-error state to refresh (see module docstring).
        return None

    def _p_in_cam(self) -> np.ndarray:
        raise NotImplementedError

    def error(self) -> np.ndarray:
        p_C = self._p_in_cam()
        z = p_C[2]
        uv_est = np.array(
            [
                self.cam_k[0] * p_C[0] / z + self.cam_k[2],
                self.cam_k[1] * p_C[1] / z + self.cam_k[3],
            ]
        )
        return self._measurement - uv_est

    def chi2(self) -> float:
        e = self.error()
        return float(e @ self._information @ e)

    def is_depth_positive(self) -> bool:
        return bool(self._p_in_cam()[2] > 0.0)


class EdgeSE3ProjectFromObject(_BaseEdge):
    """Binary edge: vertex 0 = object T_OtoG, vertex 1 = camera T_GtoC
    (`types_object_slam.cpp:45-60`)."""

    def __init__(self, cam_k, p_inO):
        super().__init__(cam_k)
        self.p_inO = np.asarray(p_inO, np.float64).ravel()

    def _p_in_cam(self):
        T_wo = self._vertices[0]._T
        T_cw = self._vertices[1]._T
        p_G = T_wo[:3, :3] @ self.p_inO + T_wo[:3, 3]
        return T_cw[:3, :3] @ p_G + T_cw[:3, 3]


class EdgeSE3ProjectFromFixedObject(_BaseEdge):
    """Unary edge: vertex 0 = camera; object pose baked in as a plain
    array exactly like the reference passes it (`lib/object_slam.py:750,
    816-818`; `types_object_slam.cpp:156-169`)."""

    def __init__(self, cam_k, p_inO, obj_pose):
        super().__init__(cam_k)
        self.p_inO = np.asarray(p_inO, np.float64).ravel()
        self.obj_pose = _to44(obj_pose)
        self.p_inG = self.obj_pose[:3, :3] @ self.p_inO + self.obj_pose[:3, 3]

    def _p_in_cam(self):
        T_cw = self._vertices[0]._T
        return T_cw[:3, :3] @ self.p_inG + T_cw[:3, 3]


class SparseOptimizer:
    def __init__(self):
        self._vertices = []   # insertion order (g2o gauge = first camera added)
        self._edges = []
        self._level = 0
        self._verbose = False

    # --- graph construction -------------------------------------------------
    def set_algorithm(self, algorithm):
        self._algorithm = algorithm

    def set_verbose(self, v):
        self._verbose = bool(v)

    def add_vertex(self, v):
        self._vertices.append(v)
        return True

    def add_edge(self, e):
        self._edges.append(e)
        return True

    def vertices(self):
        return {v.id(): v for v in self._vertices}

    def edges(self):
        return list(self._edges)

    def initialize_optimization(self, level=0):
        self._level = int(level)
        return True

    # --- solve ---------------------------------------------------------------
    def optimize(self, n_iters: int):
        """One LM run over the level-selected subgraph via `ba.lm_run`."""
        import jax.numpy as jnp

        edges = [e for e in self._edges if e._level == self._level]
        if not edges:
            return 0
        unary = all(isinstance(e, EdgeSE3ProjectFromFixedObject) for e in edges)
        binary = all(isinstance(e, EdgeSE3ProjectFromObject) for e in edges)
        if not (unary or binary):
            raise NotImplementedError(
                "g2o shim: mixed unary/binary edge graphs are not used by the "
                "reference engine and are not supported"
            )

        # --- camera slots, graph insertion order ---
        cam_verts, cam_slot = [], {}
        for e in edges:
            cv = e._vertices[0] if unary else e._vertices[1]
            if id(cv) not in cam_slot:
                cam_slot[id(cv)] = len(cam_verts)
                cam_verts.append(cv)

        # --- object slots ---
        # binary: the object VertexSE3Expmap; unary: group edges by the baked
        # object pose (the reference shares one pose slice per object,
        # `lib/object_slam.py:750`).
        obj_entries, obj_slot = [], {}
        for e in edges:
            key = id(e._vertices[0]) if binary else e.obj_pose.tobytes()
            if key not in obj_slot:
                obj_slot[key] = len(obj_entries)
                obj_entries.append(e._vertices[0] if binary else e.obj_pose)

        V, O = len(cam_verts), len(obj_entries)
        Vc, Oc = _bucket(V), _bucket(O, lo=2)

        # --- keypoint slots per object: dedupe by exact model-point value
        # (views observing the same object share 3D points but may see
        # different subsets) ---
        kp_index = [dict() for _ in range(O)]  # point bytes -> k
        edge_vok = []
        for e in edges:
            if unary:
                v = cam_slot[id(e._vertices[0])]
                o = obj_slot[e.obj_pose.tobytes()]
            else:
                v = cam_slot[id(e._vertices[1])]
                o = obj_slot[id(e._vertices[0])]
            kmap = kp_index[o]
            pkey = e.p_inO.tobytes()
            if pkey not in kmap:
                kmap[pkey] = (len(kmap), e.p_inO)
            edge_vok.append((v, o, kmap[pkey][0]))
        Kmax = max(len(m) for m in kp_index)
        Kc = _bucket(Kmax, lo=8)

        # --- pack the padded problem ---
        f32 = np.float32
        cam_T = np.tile(np.eye(4, dtype=f32), (Vc, 1, 1))
        obj_T = np.tile(np.eye(4, dtype=f32), (Oc, 1, 1))
        uv = np.zeros((Vc, Oc, Kc, 2), f32)
        info = np.zeros((Vc, Oc, Kc, 2, 2), f32)
        model_kp = np.zeros((Oc, Kc, 3), f32)
        cam_k = np.zeros((Vc, Oc, 4), f32)
        cam_k[..., :2] = 1.0  # benign fx,fy for padded slots
        valid = np.zeros((Vc, Oc, Kc), bool)
        cam_active = np.zeros((Vc,), bool)
        obj_active = np.zeros((Oc,), bool)
        cam_frozen = np.zeros((Vc,), bool)

        for v, cv in enumerate(cam_verts):
            cam_T[v] = cv._T.astype(f32)
            cam_active[v] = True
            cam_frozen[v] = cv._fixed
        for o, entry in enumerate(obj_entries):
            T = entry._T if binary else entry
            obj_T[o] = _to44(T).astype(f32)
            obj_active[o] = True
            for k, p in kp_index[o].values():
                model_kp[o, k] = p
        # Duplicate (v,o,k) assignments SHOULD not occur — the reference adds
        # one edge per detected keypoint per (view, object)
        # (`object_slam.py:813`) — but keypoint slots here dedupe by exact
        # p_inO bytes, so a kp config with byte-identical duplicate model
        # points would silently collapse two real g2o edges into one. Raise
        # instead of corrupting the problem.
        for e, (v, o, k) in zip(edges, edge_vok):
            if valid[v, o, k]:
                raise ValueError(
                    f"duplicate keypoint edge for (view={v}, object={o}, "
                    f"kp_slot={k}): two edges in the same (view, object) "
                    "share byte-identical model points (duplicate keypoint "
                    "in the kp config?) — this packed-slot backend cannot "
                    "represent them as separate edges like native g2o"
                )
            uv[v, o, k] = e._measurement
            info[v, o, k] = e._information
            cam_k[v, o] = e.cam_k
            valid[v, o, k] = True

        use_huber = any(e._robust_kernel is not None for e in edges)
        obj_fixed = np.array(
            [bool(entry._fixed) if binary else False
             for entry in obj_entries], bool)
        delta = float(next((e._robust_kernel.delta for e in edges
                            if e._robust_kernel is not None),
                           ba_mod.HUBER_DELTA))
        if _native_lm is not None:
            cam_out, obj_out = _native_lm(
                cam_T[:V], obj_T[:O], cam_frozen[:V], obj_fixed,
                uv[:V, :O], info[:V, :O], model_kp[:O], cam_k[:V, :O],
                valid[:V, :O], int(n_iters), unary, use_huber, float(delta))
            for v, cv in enumerate(cam_verts):
                if not cv._fixed:
                    cv._T = np.asarray(cam_out[v], np.float64)
            if binary:
                for o, ov in enumerate(obj_entries):
                    if not ov._fixed:
                        ov._T = np.asarray(obj_out[o], np.float64)
            return int(n_iters)

        obj_frozen = np.zeros((Oc,), bool)
        obj_frozen[:O] = obj_fixed
        problem = ba_mod.BAProblem(
            cam_T=jnp.asarray(cam_T),
            obj_T=jnp.asarray(obj_T),
            uv=jnp.asarray(uv),
            info=jnp.asarray(info),
            model_kp=jnp.asarray(model_kp),
            cam_k=jnp.asarray(cam_k),
            valid=jnp.asarray(valid),
            inliers=jnp.asarray(valid),
            cam_active=jnp.asarray(cam_active),
            obj_active=jnp.asarray(obj_active),
            cam_frozen=jnp.asarray(cam_frozen),
            obj_frozen=jnp.asarray(obj_frozen),
        )
        cam_out, obj_out, _lam = ba_mod.lm_run(
            problem,
            n_iters=int(n_iters),
            use_huber=jnp.asarray(use_huber),
            tracking_only=unary,
            fix_first_cam=False,
            huber_delta=delta,
        )
        cam_out = np.asarray(cam_out, np.float64)
        obj_out = np.asarray(obj_out, np.float64)

        # --- write back to the vertices (fixed ones did not move) ---
        for v, cv in enumerate(cam_verts):
            if not cv._fixed:
                cv._T = cam_out[v]
        if binary:
            for o, ov in enumerate(obj_entries):
                if not ov._fixed:
                    ov._T = obj_out[o]
        return int(n_iters)
