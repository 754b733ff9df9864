#!/usr/bin/env python
"""Long-sequence soak with memory telemetry (VERDICT r4 #7).

Runs 1,200 views through the full engine with the `max_active_views`
sliding window and records:

  - host RSS at checkpoints -> MB growth per 1k views (the host-side
    `detections`/`view_slot` bookkeeping and the view-capacity doublings
    are unbounded BY DESIGN, `slam/engine.py:216`; this measures the
    actual rate so eval-day capacity planning has a number),
  - device memory stats at the same checkpoints when the backend exposes
    them (TPU does; virtual-CPU runs report RSS only),
  - per-frame latency stability (steady tracking median early vs late).

The reference's factor graph also grows without bound and is never
measured (`lib/object_slam.py:737-743`); this gives our equivalent a
recorded growth rate instead of a shrug.

Run: python benchmarks/soak_memory.py          (device: whatever jax picks)
Env: SUO_SM_VIEWS (default 1200), SUO_SM_WINDOW (default 20),
     SUO_SM_CPU=1 (force CPU), SUO_SM_TINY=1 (CI smoke: 60 views).
Prints progress to stderr and ONE JSON line to stdout.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

TINY = bool(int(os.environ.get("SUO_SM_TINY", "0")))
N_VIEWS = 60 if TINY else int(os.environ.get("SUO_SM_VIEWS", "1200"))
WINDOW = int(os.environ.get("SUO_SM_WINDOW", "20"))
if os.environ.get("SUO_SM_CPU"):
    # The sandbox sitecustomize pre-imports jax on the axon platform, so the
    # env var alone is too late — force the platform through jax.config.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def device_mb():
    """bytes_in_use on device 0, MB; None when the backend has no stats."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / 1e6
    except Exception:
        pass
    return None


def long_cams(n):
    from suo_slam_tpu.data.bop import _euler2R_np

    cams = []
    for i in range(n):
        ang = 0.25 * np.sin(0.045 * i)
        T = np.eye(4)
        T[:3, :3] = _euler2R_np(np.rad2deg([0.1 * np.sin(0.03 * i), ang, 0.0]))
        T[:3, 3] = [
            -40.0 * np.sin(0.05 * i),
            30.0 * np.sin(0.021 * i),
            60.0 * np.sin(0.013 * i) ** 2,
        ]
        cams.append(T)
    return cams


def main():
    from suo_slam_tpu.slam.engine import ObjectSlam, SlamConfig
    from suo_slam_tpu.utils.jit_cache import enable_jit_cache
    from tests.helpers.synthetic_scene import (StubMeshDb, make_scene,
                                               project_frame)

    enable_jit_cache()
    cfg = SlamConfig(
        debug_gt_kp=True, manual_kp_std=0.01, gt_kp_noise_std=0.005,
        max_active_views=WINDOW, view_capacity=64, obj_capacity=8,
    )
    engine = ObjectSlam(cfg, mesh_db=StubMeshDb(8))
    K, hw, kp, T_obj, _ = make_scene(n_obj=4, n_views=1, seed=11)
    cams = long_cams(N_VIEWS)
    img = np.zeros((240, 320, 3), np.float32)

    marks = sorted({N_VIEWS // 8, N_VIEWS // 4, N_VIEWS // 2,
                    3 * N_VIEWS // 4, N_VIEWS - 1})
    rss_at, dev_at = {}, {}
    frame_t = np.zeros((N_VIEWS,))
    t_start = time.perf_counter()
    for i, T_GtoC in enumerate(cams):
        obj_ids, bboxes, mks, mms, kms, uvs = project_frame(
            K, hw, kp, T_obj, T_GtoC)
        t0 = time.perf_counter()
        engine.process_view(i, img, K, obj_ids, bboxes, mks, mms, kms,
                            uv_gt=uvs)
        frame_t[i] = time.perf_counter() - t0
        if i in marks:
            rss_at[i] = rss_mb()
            d = device_mb()
            if d is not None:
                dev_at[i] = round(d, 1)
            log(f"view {i}: RSS {rss_at[i]:.0f} MB"
                + (f", device {d:.0f} MB" if d is not None else "")
                + f", V={engine.V}, median frame "
                f"{1e3 * np.median(frame_t[max(0, i - 50):i + 1]):.1f} ms")

    first, last = marks[0], marks[-1]
    span_kviews = (last - first) / 1e3
    rss_rate = (rss_at[last] - rss_at[first]) / span_kviews
    dev_rate = ((dev_at[last] - dev_at[first]) / span_kviews
                if first in dev_at and last in dev_at else None)
    early = float(np.median(frame_t[N_VIEWS // 8: N_VIEWS // 4]))
    late = float(np.median(frame_t[-N_VIEWS // 8:]))
    out = {
        "metric": "soak_memory",
        "unit": "MB/1k-views",
        "value": round(rss_rate, 1),
        "views": N_VIEWS,
        "window": WINDOW,
        "rss_mb": {str(k): round(v, 1) for k, v in rss_at.items()},
        "device_mb": {str(k): v for k, v in dev_at.items()} or None,
        "device_mb_per_kview": None if dev_rate is None else round(dev_rate, 1),
        "final_view_capacity": engine.V,
        "median_frame_ms_early": round(1e3 * early, 1),
        "median_frame_ms_late": round(1e3 * late, 1),
        "total_wall_s": round(time.perf_counter() - t_start, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
