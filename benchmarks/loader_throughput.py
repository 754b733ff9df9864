#!/usr/bin/env python
"""Host data-loader tier throughput (frames/s) on a synthetic BOP fixture.

Three tiers (BENCHMARKS.md "Data-loader tiers"):
  1. plain `BopDataset.__getitem__` — PNG decode + NDC projection + masks;
  2. the threaded-prefetch `ConcatLoader` train.py uses by default;
  3. the C++ mmap cache (`native/fastload.cpp`, `--use_cache` tier):
     pack once, then gathers are mmap+memcpy on worker threads.

Usage: python benchmarks/loader_throughput.py [--views 24] [--scenes 2]
"""

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from helpers.synthetic_bop import write_synthetic_bop
    from suo_slam_tpu.data.bop import BopDataset

    tmp = tempfile.mkdtemp(prefix="suo_loader_bench_")
    root = write_synthetic_bop(os.path.join(tmp, "bop"),
                               n_scenes=args.scenes, n_views=args.views)
    ds = BopDataset(root, "train_synt", bop_dset="ycbv",
                    kp_config_root=os.path.join(root, "kp_configs"), seed=0)
    n = len(ds)
    print(f"dataset: {n} frames ({args.scenes} scenes x {args.views} views)")

    t0 = time.perf_counter()
    for i in range(n):
        ds[i]
    print(f"plain __getitem__: {n / (time.perf_counter() - t0):.1f} frames/s")

    from suo_slam_tpu.data import loader as train_mod

    loader = train_mod.ConcatLoader([ds], batch_size=4, truncate_obj=16,
                                    workers=args.workers, prefetch=4, seed=0)
    for _ in loader.epoch():
        pass  # warm (thread pool, jit-free)
    t0 = time.perf_counter()
    cnt = 0
    for _ in loader.epoch():
        cnt += 4
    print(f"threaded prefetch loader ({args.workers} workers): "
          f"{cnt / (time.perf_counter() - t0):.1f} frames/s")

    from suo_slam_tpu.data import fastload

    cache = os.path.join(tmp, "cache.bin")
    fastload.pack_cache(ds, cache)
    rd = fastload.CacheReader(cache)
    idx = np.arange(n)
    rd.gather(idx)  # warm
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        rd.gather(idx)
    print(f"C++ mmap cache gather: "
          f"{reps * n / (time.perf_counter() - t0):.1f} frames/s")


if __name__ == "__main__":
    main()
