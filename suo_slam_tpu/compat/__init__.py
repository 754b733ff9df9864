"""Drop-in API shims for the reference's native dependencies.

`suo_slam_tpu.compat.lambdatwist` and `suo_slam_tpu.compat.g2o` expose the
exact Python surfaces the reference engine consumes (`lib/object_slam.py`:
`lambdatwist.pnp` at :25-41 and the g2o SparseOptimizer/SE3Quat/
VertexSE3Expmap/Edge* classes at :706-930), backed by this repo's JAX
solvers (`solvers/pnp.py`, `solvers/ba.py`) instead of the reference's
C++/pybind builds.

Two uses:
  - migration: code written against the reference's `import g2o` /
    `import lambdatwist` can run unmodified on the TPU-native solvers
    (``sys.modules["g2o"] = suo_slam_tpu.compat.g2o``);
  - closed-loop parity testing: the ACTUAL reference `ObjectSLAM` runs
    end-to-end on our solver stack and is compared head-to-head against
    `slam/engine.py` (tests/test_reference_engine_parity.py).
"""

from . import g2o, lambdatwist  # noqa: F401
