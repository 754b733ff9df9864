"""suo-slam-tpu: TPU-native symmetry- and uncertainty-aware object SLAM.

A from-scratch JAX/XLA/Flax/Pallas (+ C++ data runtime) framework with the
capabilities of rpng/suo_slam (CVPR 2022). See README.md for the layout and
PARITY.md for the component map against the reference.
"""

__version__ = "0.1.0"

__all__ = [
    "core",
    "data",
    "eval",
    "kp",
    "models",
    "ops",
    "parallel",
    "slam",
    "solvers",
    "tools",
    "train",
    "utils",
]
