"""Build-and-load helper for NATIVE C++ oracles compiled from the
read-only reference sources (VERDICT r2 #9).

The reference ships its geometry solvers as C++ (`thirdparty/lambdatwist`);
our framework re-derives them in JAX. The strongest solver-level proof
available in this sandbox is a differential test against the ORIGINAL C++
compiled as-is. Full `pnp_ransac` needs the Ceres library (absent — only
its autodiff headers are vendored), but the LambdaTwist P3P/P4P core is
dependency-free C++ and builds directly.

The C-ABI shim below is our own code; it is compiled OUT-OF-TREE (in /tmp)
against the reference headers, never copied into the repo. Loaded via
ctypes (no pybind11 — the vendored one predates Python 3.12).
"""

import ctypes
import glob
import os
import shutil
import subprocess
import sysconfig

REF_LT = "/root/reference/thirdparty/lambdatwist"
REF_G2O = "/root/reference/thirdparty/g2opy"
_BUILD_DIR = "/tmp/suo_native_oracle"

_SHIM_SRC = r"""
// C-ABI shim over the REFERENCE LambdaTwist p4p solver (p4p.h) for
// differential testing of the JAX re-derivation. Own code, compiled
// against the read-only reference sources.
#include <vector>
#include "p4p.h"

extern "C" int lt_p4p(const double* xs, const double* yns, int n,
                      double* out16) {
  if (n < 4) return 1;
  std::vector<cvl::Vector3D> xv;
  std::vector<cvl::Vector2D> yv;
  for (int i = 0; i < n; ++i) {
    xv.emplace_back(xs[3 * i], xs[3 * i + 1], xs[3 * i + 2]);
    yv.emplace_back(yns[2 * i], yns[2 * i + 1]);
  }
  cvl::PoseD pose = cvl::p4p(xv, yv, cvl::Vector4<uint>(0, 1, 2, 3));
  cvl::Matrix4x4<double> M = pose.get4x4();
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c) out16[4 * r + c] = M(r, c);
  return 0;
}
"""


def load_lambdatwist_oracle():
    """Compile (once, cached) and load the reference p4p as a ctypes lib.

    Returns None when the reference tree or a C++ toolchain is unavailable
    (callers should skip their test)."""
    if not os.path.isdir(REF_LT) or shutil.which("g++") is None:
        return None
    so = os.path.join(_BUILD_DIR, "liblt_oracle.so")
    src = os.path.join(_BUILD_DIR, "lt_shim.cpp")
    if not os.path.isfile(so):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        with open(src, "w") as f:
            f.write(_SHIM_SRC)
        cmd = [
            "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-w",
            "-I", REF_LT, src, os.path.join(REF_LT, "p4p.cpp"), "-o", so,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
            return None
    lib = ctypes.CDLL(so)
    lib.lt_p4p.restype = ctypes.c_int
    return lib


def ref_p4p(lib, xs, yns):
    """Run the reference p4p on points 0..3 of (xs [N,3], yns [N,2]);
    returns a 4x4 numpy pose (identity on degenerate input, the reference's
    documented failure contract, `p4p.h:11`)."""
    import numpy as np

    xs = np.ascontiguousarray(xs, np.float64)
    yns = np.ascontiguousarray(yns, np.float64)
    out = np.zeros(16, np.float64)
    rc = lib.lt_p4p(
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        yns.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(xs.shape[0]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    assert rc == 0, f"lt_p4p rc={rc}"
    return out.reshape(4, 4)


# --------------------------------------------------------------------------
# g2o oracle: the REFERENCE g2o LM optimizer + the SUO-SLAM custom edges
# (`thirdparty/g2opy/g2o/types/object_slam/types_object_slam.cpp`) compiled
# as-is, driven through a C-ABI shim that reproduces the reference engine's
# `optimize()` round/reclassification semantics (`lib/object_slam.py:703-930`).
# Differential oracle for `suo_slam_tpu/solvers/ba.py`.
# --------------------------------------------------------------------------

_G2O_CONFIG_H = """
#ifndef G2O_CONFIG_H
#define G2O_CONFIG_H
/* hand-generated for the out-of-tree oracle build: no OpenGL, no OpenMP,
   no cholmod/csparse (dense solver only), static lib */
#define G2O_CXX_COMPILER "g++"
#define G2O_DELETE_IMPLICITLY_OWNED_OBJECTS 1
#ifdef __cplusplus
#include <g2o/core/eigen_types.h>
#endif
#endif
"""

_G2O_SHIM_SRC = r"""// C-ABI shim over the REFERENCE g2o library + the SUO-SLAM custom edges
// (thirdparty/g2opy/g2o/types/object_slam) reproducing the reference
// engine's optimize() semantics (lib/object_slam.py:703-930): LM rounds
// with chi2-threshold edge-level reclassification, Huber kernel dropped at
// round max(1, n/2), unary fixed-object edges for tracking, binary edges
// + first-camera gauge fix for global BA. Own code, compiled out-of-tree
// against the read-only reference sources, used as a numerical oracle for
// suo_slam_tpu/solvers/ba.py.
#include <algorithm>
#include <cmath>
#include <memory>
#include <vector>

#include "g2o/core/block_solver.h"
#include "g2o/core/optimization_algorithm_levenberg.h"
#include "g2o/core/robust_kernel_impl.h"
#include "g2o/core/sparse_optimizer.h"
#include "g2o/solvers/dense/linear_solver_dense.h"
#include "g2o/types/object_slam/types_object_slam.h"
#include "g2o/types/sba/types_six_dof_expmap.h"

using g2o::SE3Quat;

static Eigen::Matrix4d read44(const double* p) {
  Eigen::Matrix4d M;
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c) M(r, c) = p[4 * r + c];
  return M;
}

static void write44(const Eigen::Matrix4d& M, double* p) {
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c) p[4 * r + c] = M(r, c);
}

extern "C" int g2o_ba_optimize(
    int n_cams, int n_objs, int n_edges,
    double* cam_T,          // [n_cams,16] T_GtoC row-major (in/out)
    double* obj_T,          // [n_objs,16] T_OtoG row-major (in/out)
    const int* edge_cam,    // [n_edges]
    const int* edge_obj,    // [n_edges]
    const double* uv,       // [n_edges,2]
    const double* info,     // [n_edges,4] row-major 2x2
    const double* model_p,  // [n_edges,3] keypoint in object frame
    const double* cam_k,    // [n_edges,4] fx fy cx cy (NDC)
    const int* its, int n_rounds,
    int curr_only,          // 1: unary fixed-object edges, no gauge fix
    int init_with_outliers, // 1: first round includes all edges
    double chi2_thresh,     // 5.991
    unsigned char* inliers  // [n_edges] in/out
) {
  g2o::SparseOptimizer optimizer;
  using BlockSolverSE3 = g2o::BlockSolver_6_3;
  auto linear = std::make_unique<
      g2o::LinearSolverDense<BlockSolverSE3::PoseMatrixType>>();
  auto block = std::make_unique<BlockSolverSE3>(std::move(linear));
  auto* algo = new g2o::OptimizationAlgorithmLevenberg(std::move(block));
  optimizer.setAlgorithm(algo);
  optimizer.setVerbose(false);

  std::vector<g2o::VertexSE3Expmap*> obj_verts(n_objs, nullptr);
  std::vector<Eigen::Matrix4d> obj_mats(n_objs);
  for (int j = 0; j < n_objs; ++j) {
    Eigen::Matrix4d M = read44(obj_T + 16 * j);
    obj_mats[j] = M;
    if (!curr_only) {
      auto* v = new g2o::VertexSE3Expmap();
      v->setId(j);
      v->setEstimate(SE3Quat(M.block<3, 3>(0, 0), M.block<3, 1>(0, 3)));
      optimizer.addVertex(v);
      obj_verts[j] = v;
    }
  }
  std::vector<g2o::VertexSE3Expmap*> cam_verts(n_cams, nullptr);
  for (int i = 0; i < n_cams; ++i) {
    Eigen::Matrix4d M = read44(cam_T + 16 * i);
    auto* v = new g2o::VertexSE3Expmap();
    v->setId((curr_only ? 0 : n_objs) + i);
    v->setEstimate(SE3Quat(M.block<3, 3>(0, 0), M.block<3, 1>(0, 3)));
    v->setFixed(!curr_only && i == 0);  // reference gauge: first cam fixed
    optimizer.addVertex(v);
    cam_verts[i] = v;
  }

  std::vector<g2o::OptimizableGraph::Edge*> edges(n_edges);
  for (int e = 0; e < n_edges; ++e) {
    Eigen::Vector4d k(cam_k[4 * e], cam_k[4 * e + 1], cam_k[4 * e + 2],
                      cam_k[4 * e + 3]);
    Eigen::Vector3d p(model_p[3 * e], model_p[3 * e + 1], model_p[3 * e + 2]);
    Eigen::Vector2d m(uv[2 * e], uv[2 * e + 1]);
    Eigen::Matrix2d I;
    I << info[4 * e], info[4 * e + 1], info[4 * e + 2], info[4 * e + 3];
    g2o::OptimizableGraph::Edge* edge;
    if (curr_only) {
      auto* ed = new g2o::EdgeSE3ProjectFromFixedObject(
          k, p, obj_mats[edge_obj[e]].block<3, 4>(0, 0));
      ed->setVertex(0, cam_verts[edge_cam[e]]);
      ed->setMeasurement(m);
      ed->setInformation(I);
      edge = ed;
    } else {
      auto* ed = new g2o::EdgeSE3ProjectFromObject(k, p);
      ed->setVertex(0, obj_verts[edge_obj[e]]);
      ed->setVertex(1, cam_verts[edge_cam[e]]);
      ed->setMeasurement(m);
      ed->setInformation(I);
      edge = ed;
    }
    auto* rk = new g2o::RobustKernelHuber();
    rk->setDelta(std::sqrt(chi2_thresh));
    edge->setRobustKernel(rk);
    edge->setLevel(0);
    edges[e] = edge;
    optimizer.addEdge(edge);
  }

  // initial classification (reference :849-866)
  int num_good = 0;
  if (init_with_outliers && curr_only) {
    num_good = n_edges;
  } else {
    for (int e = 0; e < n_edges; ++e) {
      edges[e]->computeError();
      if (edges[e]->chi2() > chi2_thresh) {
        edges[e]->setLevel(1);
        inliers[e] = 0;
      } else {
        ++num_good;
        edges[e]->setLevel(0);
        inliers[e] = 1;
      }
    }
  }

  int huber_off_round = std::max(1, n_rounds / 2);
  for (int it = 0; it < n_rounds; ++it) {
    if (n_edges < 4 || num_good < 4) break;
    optimizer.initializeOptimization(0);
    optimizer.optimize(its[it]);
    num_good = 0;
    for (int e = 0; e < n_edges; ++e) {
      if (!inliers[e]) edges[e]->computeError();
      if (edges[e]->chi2() > chi2_thresh) {
        edges[e]->setLevel(1);
        inliers[e] = 0;
      } else {
        ++num_good;
        edges[e]->setLevel(0);
        inliers[e] = 1;
      }
      if (it == huber_off_round) edges[e]->setRobustKernel(nullptr);
    }
  }

  for (int i = 0; i < n_cams; ++i)
    write44(cam_verts[i]->estimate().to_homogeneous_matrix(), cam_T + 16 * i);
  if (!curr_only)
    for (int j = 0; j < n_objs; ++j)
      write44(obj_verts[j]->estimate().to_homogeneous_matrix(),
              obj_T + 16 * j);
  return 0;
}

// ONE LM run over the given edges (no chi2 round schedule — the CALLER owns
// rounds/levels, exactly like the reference engine's Python loop around
// g2o.SparseOptimizer.optimize). Backs suo_slam_tpu.compat.g2o's
// native-oracle hook so the reference engine can run over the REAL g2o.
extern "C" int g2o_lm_once(
    int n_cams, int n_objs, int n_edges,
    double* cam_T,                   // [n_cams,16] T_GtoC (in/out)
    double* obj_T,                   // [n_objs,16] T_OtoG (in/out)
    const unsigned char* cam_fixed,  // [n_cams]
    const unsigned char* obj_fixed,  // [n_objs] (ignored when curr_only)
    const int* edge_cam, const int* edge_obj,
    const double* uv, const double* info,
    const double* model_p, const double* cam_k,
    int n_iters, int curr_only, int use_huber, double huber_delta) {
  g2o::SparseOptimizer optimizer;
  using BlockSolverSE3 = g2o::BlockSolver_6_3;
  auto linear = std::make_unique<
      g2o::LinearSolverDense<BlockSolverSE3::PoseMatrixType>>();
  auto block = std::make_unique<BlockSolverSE3>(std::move(linear));
  optimizer.setAlgorithm(
      new g2o::OptimizationAlgorithmLevenberg(std::move(block)));
  optimizer.setVerbose(false);

  std::vector<g2o::VertexSE3Expmap*> obj_verts(n_objs, nullptr);
  std::vector<Eigen::Matrix4d> obj_mats(n_objs);
  for (int j = 0; j < n_objs; ++j) {
    Eigen::Matrix4d M = read44(obj_T + 16 * j);
    obj_mats[j] = M;
    if (!curr_only) {
      auto* v = new g2o::VertexSE3Expmap();
      v->setId(j);
      v->setEstimate(SE3Quat(M.block<3, 3>(0, 0), M.block<3, 1>(0, 3)));
      v->setFixed(obj_fixed[j] != 0);
      optimizer.addVertex(v);
      obj_verts[j] = v;
    }
  }
  std::vector<g2o::VertexSE3Expmap*> cam_verts(n_cams, nullptr);
  for (int i = 0; i < n_cams; ++i) {
    Eigen::Matrix4d M = read44(cam_T + 16 * i);
    auto* v = new g2o::VertexSE3Expmap();
    v->setId((curr_only ? 0 : n_objs) + i);
    v->setEstimate(SE3Quat(M.block<3, 3>(0, 0), M.block<3, 1>(0, 3)));
    v->setFixed(cam_fixed[i] != 0);
    optimizer.addVertex(v);
    cam_verts[i] = v;
  }
  for (int e = 0; e < n_edges; ++e) {
    Eigen::Vector4d k(cam_k[4 * e], cam_k[4 * e + 1], cam_k[4 * e + 2],
                      cam_k[4 * e + 3]);
    Eigen::Vector3d p(model_p[3 * e], model_p[3 * e + 1], model_p[3 * e + 2]);
    Eigen::Vector2d m(uv[2 * e], uv[2 * e + 1]);
    Eigen::Matrix2d I;
    I << info[4 * e], info[4 * e + 1], info[4 * e + 2], info[4 * e + 3];
    g2o::OptimizableGraph::Edge* edge;
    if (curr_only) {
      auto* ed = new g2o::EdgeSE3ProjectFromFixedObject(
          k, p, obj_mats[edge_obj[e]].block<3, 4>(0, 0));
      ed->setVertex(0, cam_verts[edge_cam[e]]);
      ed->setMeasurement(m);
      ed->setInformation(I);
      edge = ed;
    } else {
      auto* ed = new g2o::EdgeSE3ProjectFromObject(k, p);
      ed->setVertex(0, obj_verts[edge_obj[e]]);
      ed->setVertex(1, cam_verts[edge_cam[e]]);
      ed->setMeasurement(m);
      ed->setInformation(I);
      edge = ed;
    }
    if (use_huber) {
      auto* rk = new g2o::RobustKernelHuber();
      rk->setDelta(huber_delta);
      edge->setRobustKernel(rk);
    }
    edge->setLevel(0);
    optimizer.addEdge(edge);
  }
  optimizer.initializeOptimization(0);
  optimizer.optimize(n_iters);
  for (int i = 0; i < n_cams; ++i)
    write44(cam_verts[i]->estimate().to_homogeneous_matrix(), cam_T + 16 * i);
  if (!curr_only)
    for (int j = 0; j < n_objs; ++j)
      write44(obj_verts[j]->estimate().to_homogeneous_matrix(),
              obj_T + 16 * j);
  return 0;
}
"""

# g2o translation units needed by the dense-solver LM path (everything the
# shim links; csparse/cholmod/opengl/apps excluded).
_G2O_CORE = [
    "batch_stats", "cache", "estimate_propagator", "factory",
    "hyper_dijkstra", "hyper_graph", "hyper_graph_action",
    "jacobian_workspace", "marginal_covariance_cholesky", "matrix_structure",
    "optimizable_graph", "optimization_algorithm",
    "optimization_algorithm_dogleg", "optimization_algorithm_factory",
    "optimization_algorithm_gauss_newton",
    "optimization_algorithm_levenberg",
    "optimization_algorithm_with_hessian", "parameter",
    "parameter_container", "robust_kernel", "robust_kernel_factory",
    "robust_kernel_impl", "solver", "sparse_optimizer",
    "sparse_optimizer_terminate_action",
]
_G2O_STUFF = ["property", "sampler", "sparse_helper", "string_tools",
              "tictoc", "timeutil"]
_G2O_TYPES = ["types/sba/types_sba", "types/sba/types_six_dof_expmap",
              "types/object_slam/types_object_slam"]


def _find_eigen():
    """Locate an Eigen3 header tree (vendored inside tensorflow's include
    dir in this image; no system Eigen)."""
    for base in ("/usr/include/eigen3", "/usr/local/include/eigen3"):
        if os.path.isfile(os.path.join(base, "Eigen", "Core")):
            return base
    site = sysconfig.get_paths()["purelib"]
    hits = glob.glob(os.path.join(site, "*", "include", "Eigen", "Core"))
    return os.path.dirname(os.path.dirname(hits[0])) if hits else None


def load_g2o_oracle():
    """Compile (once, cached in /tmp) and load the reference g2o + custom
    object-SLAM edges behind the C-ABI shim. Returns None when the
    reference tree, g++, or an Eigen header tree is unavailable."""
    eigen = _find_eigen()
    if (not os.path.isdir(REF_G2O) or shutil.which("g++") is None
            or eigen is None):
        return None
    # content-addressed build dir: editing the shim triggers a rebuild
    import hashlib

    tag = hashlib.sha256(_G2O_SHIM_SRC.encode()).hexdigest()[:10]
    bdir = os.path.join(_BUILD_DIR, f"g2o_{tag}")
    so = os.path.join(bdir, "libg2o_oracle.so")
    if not os.path.isfile(so):
        os.makedirs(os.path.join(bdir, "g2o"), exist_ok=True)
        with open(os.path.join(bdir, "g2o", "config.h"), "w") as f:
            f.write(_G2O_CONFIG_H)
        with open(os.path.join(bdir, "g2o_shim.cpp"), "w") as f:
            f.write(_G2O_SHIM_SRC)
        srcs = ([f"{REF_G2O}/g2o/core/{n}.cpp" for n in _G2O_CORE]
                + [f"{REF_G2O}/g2o/stuff/{n}.cpp" for n in _G2O_STUFF]
                + [f"{REF_G2O}/g2o/{n}.cpp" for n in _G2O_TYPES]
                + [os.path.join(bdir, "g2o_shim.cpp")])
        flags = ["-O2", "-fPIC", "-std=c++17", "-w",
                 "-I", bdir, "-I", REF_G2O, "-I", eigen]
        mk = [f"OBJS = {' '.join(os.path.join(bdir, os.path.basename(s)[:-4] + '.o') for s in srcs)}",
              f"{so}: $(OBJS)",
              f"	g++ -shared $(OBJS) -o {so}"]
        for s in srcs:
            o = os.path.join(bdir, os.path.basename(s)[:-4] + ".o")
            mk += [f"{o}: {s}", f"	g++ {' '.join(flags)} -c {s} -o {o}"]
        with open(os.path.join(bdir, "Makefile"), "w") as f:
            f.write("\n".join(mk) + "\n")
        try:
            subprocess.run(["make", "-C", bdir, "-j", str(os.cpu_count() or 4)],
                           check=True, capture_output=True, timeout=900)
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
            return None
    lib = ctypes.CDLL(so)
    lib.g2o_ba_optimize.restype = ctypes.c_int
    lib.g2o_lm_once.restype = ctypes.c_int
    return lib


def make_native_lm(lib):
    """Build the `suo_slam_tpu.compat.g2o.set_native_lm` hook over the
    native `g2o_lm_once`: runs ONE real-g2o LM pass on the shim-packed
    problem, so the reference engine's own round/level loop drives the
    ACTUAL g2o library instead of the JAX solver."""
    import numpy as np

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    def native_lm(cam_T, obj_T, cam_fixed, obj_fixed, uv, info, model_kp,
                  cam_k, valid, n_iters, unary, use_huber, huber_delta):
        vv, oo, kk = np.nonzero(valid)
        E = len(vv)
        cam_T = np.ascontiguousarray(cam_T, np.float64).copy()
        obj_T = np.ascontiguousarray(obj_T, np.float64).copy()
        cf = np.ascontiguousarray(cam_fixed, np.uint8)
        of = np.ascontiguousarray(obj_fixed, np.uint8)
        ec = np.ascontiguousarray(vv, np.int32)
        eo = np.ascontiguousarray(oo, np.int32)
        euv = np.ascontiguousarray(uv[vv, oo, kk], np.float64)
        einfo = np.ascontiguousarray(info[vv, oo, kk], np.float64).reshape(E, 4)
        emp = np.ascontiguousarray(model_kp[oo, kk], np.float64)
        eck = np.ascontiguousarray(cam_k[vv, oo], np.float64)
        rc = lib.g2o_lm_once(
            ctypes.c_int(cam_T.shape[0]), ctypes.c_int(obj_T.shape[0]),
            ctypes.c_int(E),
            ptr(cam_T, ctypes.c_double), ptr(obj_T, ctypes.c_double),
            ptr(cf, ctypes.c_uint8), ptr(of, ctypes.c_uint8),
            ptr(ec, ctypes.c_int), ptr(eo, ctypes.c_int),
            ptr(euv, ctypes.c_double), ptr(einfo, ctypes.c_double),
            ptr(emp, ctypes.c_double), ptr(eck, ctypes.c_double),
            ctypes.c_int(int(n_iters)), ctypes.c_int(int(unary)),
            ctypes.c_int(int(use_huber)), ctypes.c_double(float(huber_delta)),
        )
        assert rc == 0, f"g2o_lm_once rc={rc}"
        return cam_T, obj_T

    return native_lm


def g2o_optimize(lib, cam_T, obj_T, edges, its, *, curr_only=False,
                 init_with_outliers=False, chi2_thresh=5.991):
    """Run the reference g2o LM schedule on a flat edge list.

    edges: dict of arrays {cam[E], obj[E], uv[E,2], info[E,2,2],
    model_p[E,3], cam_k[E,4], inliers[E] (in/out seed)}.
    Returns (cam_T, obj_T, inliers) — refined copies."""
    import numpy as np

    cam_T = np.ascontiguousarray(cam_T, np.float64).copy()
    obj_T = np.ascontiguousarray(obj_T, np.float64).copy()
    E = len(edges["cam"])
    ecam = np.ascontiguousarray(edges["cam"], np.int32)
    eobj = np.ascontiguousarray(edges["obj"], np.int32)
    uv = np.ascontiguousarray(edges["uv"], np.float64)
    info = np.ascontiguousarray(edges["info"], np.float64).reshape(E, 4)
    mp = np.ascontiguousarray(edges["model_p"], np.float64)
    ck = np.ascontiguousarray(edges["cam_k"], np.float64)
    inl = np.ascontiguousarray(
        edges.get("inliers", np.ones(E)), np.uint8).copy()
    its = np.ascontiguousarray(its, np.int32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.g2o_ba_optimize(
        ctypes.c_int(cam_T.shape[0]), ctypes.c_int(obj_T.shape[0]),
        ctypes.c_int(E),
        ptr(cam_T, ctypes.c_double), ptr(obj_T, ctypes.c_double),
        ptr(ecam, ctypes.c_int), ptr(eobj, ctypes.c_int),
        ptr(uv, ctypes.c_double), ptr(info, ctypes.c_double),
        ptr(mp, ctypes.c_double), ptr(ck, ctypes.c_double),
        ptr(its, ctypes.c_int), ctypes.c_int(len(its)),
        ctypes.c_int(int(curr_only)), ctypes.c_int(int(init_with_outliers)),
        ctypes.c_double(chi2_thresh), ptr(inl, ctypes.c_uint8),
    )
    assert rc == 0, f"g2o_ba_optimize rc={rc}"
    return cam_T, obj_T, inl.astype(bool)
