"""Import the read-only reference repo as a numerical test oracle.

The reference (`/root/reference`, rpng/suo_slam, 2022-era) does not import
cleanly under this sandbox's 2026 stack: it uses the `np.int`/`np.bool`
aliases numpy removed in 1.24, and depends on `pytz`, `png` (pypng) and
`torchvision`, none of which are installed. This helper installs minimal
compatibility shims and exposes `load("lib.utils.utils")` etc. so parity
tests can compare our implementations against the actual reference code on
identical inputs. The reference is used strictly as a data oracle — nothing
is copied from it, and the shims only have to satisfy module import, not the
code paths the tests exercise.
"""

import importlib
import sys
import types
import warnings

import numpy as np

_REFERENCE_ROOT = "/root/reference"
_BOP_TOOLKIT_ROOT = "/root/reference/thirdparty/bop_toolkit"
_installed = False


class _ImageFolderStub:
    """Stands in for torchvision.datasets.ImageFolder (VOC backgrounds).

    The reference only reads `.imgs` (list of (path, class) tuples,
    `lib/datasets/bop.py:151-156`); tests that exercise background
    compositing construct it over a flat directory of images.
    """

    def __init__(self, root, *args, **kwargs):
        import os

        self.root = root
        self.imgs = []
        for dirpath, _, names in sorted(os.walk(root)):
            for name in sorted(names):
                if name.lower().endswith((".jpg", ".jpeg", ".png")):
                    self.imgs.append((os.path.join(dirpath, name), 0))


def _install_shims():
    global _installed
    if _installed:
        return

    # numpy<1.24 aliases used at reference module scope / call sites.
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", FutureWarning)
        for name, builtin in (("int", int), ("float", float), ("bool", bool),
                              ("object", object), ("str", str)):
            if not hasattr(np, name):
                setattr(np, name, builtin)
    if not hasattr(np, "math"):  # np.math removed in numpy>=2
        import math

        np.math = math

    # pandas must be imported BEFORE the pytz stub so its optional-dependency
    # probe sees the real environment (no pytz) instead of a stub without the
    # attributes it checks.
    try:
        import pandas  # noqa: F401
    except ImportError:
        pass

    if "pytz" not in sys.modules:
        pytz = types.ModuleType("pytz")
        pytz.__version__ = "2025.1"

        class _Utc:
            @staticmethod
            def localize(dt):
                return dt

        pytz.utc = _Utc()
        pytz.timezone = lambda *_a, **_k: _Utc()
        sys.modules["pytz"] = pytz

    if "png" not in sys.modules:
        sys.modules["png"] = types.ModuleType("png")

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")

        def _no_roi_align(*_a, **_k):  # tests never drive the torch ROI path
            raise NotImplementedError("torchvision stub: roi_align unavailable")

        tv_ops.roi_align = _no_roi_align
        tv_datasets = types.ModuleType("torchvision.datasets")
        tv_datasets.ImageFolder = _ImageFolderStub
        tv.ops = tv_ops
        tv.datasets = tv_datasets
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
        sys.modules["torchvision.datasets"] = tv_datasets

    for path in (_BOP_TOOLKIT_ROOT, _REFERENCE_ROOT):
        if path not in sys.path:
            sys.path.insert(0, path)

    _installed = True


def load(module_name: str):
    """Import a reference module (e.g. "lib.utils.utils") with shims active."""
    _install_shims()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        return importlib.import_module(module_name)


def load_object_slam():
    """Import the ACTUAL reference engine (`lib.object_slam`) end-to-end.

    The engine's native dependencies are satisfied by this repo's drop-in
    shims (`suo_slam_tpu.compat.g2o` / `.lambdatwist`, backed by the JAX
    solvers) — that is the point: the reference's control flow runs
    unmodified as a closed-loop behavioral oracle against `slam/engine.py`.
    The unused GL renderer import (`lib/object_slam.py:18`; the engine sets
    `self.renderer = None` at `:123`) is stubbed since glumpy is absent.
    """
    _install_shims()

    from suo_slam_tpu.compat import g2o as g2o_shim
    from suo_slam_tpu.compat import lambdatwist as lt_shim

    sys.modules.setdefault("g2o", g2o_shim)
    sys.modules.setdefault("lambdatwist", lt_shim)

    rp_name = "thirdparty.bop_toolkit.bop_toolkit_lib.renderer_py"
    if rp_name not in sys.modules:
        rp = types.ModuleType(rp_name)

        class RendererPython:  # never instantiated by the engine under test
            def __init__(self, *a, **k):
                raise NotImplementedError("renderer_py stub (no glumpy)")

        rp.RendererPython = RendererPython
        # materialize the namespace-package parents so the leaf binds
        for parent in ("thirdparty", "thirdparty.bop_toolkit",
                       "thirdparty.bop_toolkit.bop_toolkit_lib"):
            if parent not in sys.modules:
                importlib.import_module(parent)
        sys.modules[rp_name] = rp
        setattr(sys.modules["thirdparty.bop_toolkit.bop_toolkit_lib"],
                "renderer_py", rp)

    return load("lib.object_slam")
