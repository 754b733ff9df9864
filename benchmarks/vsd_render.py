#!/usr/bin/env python
"""VSD depth-renderer throughput at T-LESS scale (VERDICT r4 item 4).

Renders a ~32k-triangle closed mesh (T-LESS CAD models are 10-80k tris) at
720x540 with test_primesense-like intrinsics and object distance, and prints
renders/s plus the implied render budget for a full T-LESS SISO sweep
(~50k estimates x 2 renders each: the estimated and the GT pose,
`thirdparty/bop_toolkit/scripts/eval_siso.py` -> `pose_error.vsd`).

Host-only (numpy rasterizer, `suo_slam_tpu/eval/render.py`); no TPU needed.
Run: python benchmarks/vsd_render.py   Env: SUO_VR_ITERS (default 20).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = int(os.environ.get("SUO_VR_ITERS", "20"))
SWEEP_RENDERS = 50_000 * 2  # full T-LESS test_primesense SISO budget


def make_mesh(n_lat=90):
    """Dense UV-sphere, 60 mm diameter: ~32k triangles."""
    la = np.linspace(0, np.pi, n_lat)
    lo = np.linspace(0, 2 * np.pi, n_lat * 2, endpoint=False)
    LA, LO = np.meshgrid(la, lo, indexing="ij")
    r = 30.0
    V = np.stack([
        r * np.sin(LA) * np.cos(LO),
        r * np.sin(LA) * np.sin(LO),
        r * np.cos(LA),
    ], -1).reshape(-1, 3)
    W = n_lat * 2
    F = []
    for i in range(n_lat - 1):
        for j in range(W):
            a = i * W + j
            b = i * W + (j + 1) % W
            c = (i + 1) * W + j
            d = (i + 1) * W + (j + 1) % W
            F.append([a, b, c])
            F.append([b, d, c])
    return V.astype(np.float64), np.asarray(F, np.int64)


def main():
    from suo_slam_tpu.eval import render

    V, F = make_mesh()
    K = np.array([[1075.65, 0, 360.0], [0, 1073.90, 270.0], [0, 0, 1.0]])
    T = np.eye(4)
    T[:3, 3] = [0.0, 10.0, 650.0]  # typical T-LESS object distance (mm)
    hw = (540, 720)

    d = render.render_depth(V, F, K, T, hw)  # warm caches
    assert (d > 0).sum() > 1000, "fixture renders nothing"
    t0 = time.perf_counter()
    for _ in range(ITERS):
        render.render_depth(V, F, K, T, hw)
    per = (time.perf_counter() - t0) / ITERS

    budget_min = SWEEP_RENDERS * per / 60.0
    print(
        f"{len(F)} tris @ {hw[1]}x{hw[0]}: {1e3 * per:.1f} ms/render = "
        f"{1.0 / per:.1f} renders/s | full T-LESS SISO render budget "
        f"(~{SWEEP_RENDERS} renders): {budget_min:.1f} min",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "vsd_depth_renders_per_s",
        "value": round(1.0 / per, 1),
        "unit": "renders/s (32k tris, 720x540, host numpy)",
        "ms_per_render": round(1e3 * per, 2),
        "tless_sweep_budget_min": round(budget_min, 1),
    }))


if __name__ == "__main__":
    main()
