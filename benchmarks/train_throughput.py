#!/usr/bin/env python
"""Training-step throughput: full flagship train step on the real device.

Times `make_train_step` end-to-end — on-device ROI crop + prior-heatmap
render + PkpNet forward (nStack=2, nFeats=256, 256x256 crops, 41 channels)
+ MLE/BCE losses + backward + Adam — the TPU-native equivalent of the
reference's per-iteration `step_epoch` body (`train.py:27-164`, which prints
sec/it as ITS training-throughput meter, `train.py:88-100`).

Prints ONE JSON line: crops/sec (B*O object ROIs per step) and ms/step.
Env knobs: SUO_TB_BATCH (frames/step, default 8), SUO_TB_OBJ (object slots
per frame, default 8), SUO_TB_STEPS (timed steps, default 20).

Reuses bench.py's outage-proofing (subprocess probe + bounded retry) since
the TPU tunnel can hang rather than error.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (probe/retry + lock protocol)

B = int(os.environ.get("SUO_TB_BATCH", "8"))
O = int(os.environ.get("SUO_TB_OBJ", "8"))
STEPS = int(os.environ.get("SUO_TB_STEPS", "20"))


def run():
    import jax
    import jax.numpy as jnp

    from suo_slam_tpu.models import PkpNet
    from suo_slam_tpu.train import harness
    from suo_slam_tpu.utils.jit_cache import enable_jit_cache

    enable_jit_cache()
    bench.force_cpu_if_allowed()
    if os.environ.get("SUO_TB_TINY"):  # CI smoke of the script logic only
        net = PkpNet(dtype=jnp.bfloat16, n_stack=1, n_modules=1, features=16)
    else:
        net = PkpNet(dtype=jnp.bfloat16)
    opt = harness.make_optimizer()
    state = harness.init_state(net, jax.random.PRNGKey(0), opt)
    step = jax.jit(harness.make_train_step(net, opt), donate_argnums=(0,))

    rng = jax.random.PRNGKey(1)
    h, w = 480, 640  # full-frame input; ROI crop runs on device
    batch = harness.Batch(
        images=jax.random.uniform(rng, (B, h, w, 3), jnp.float32),
        boxes=jnp.tile(jnp.asarray([40.0, 40.0, 296.0, 296.0]), (B, O, 1)),
        obj_mask=jnp.ones((B, O), bool),
        prior_uv=jnp.zeros((B, O, 41, 2), jnp.float32),
        prior_mask=jnp.zeros((B, O, 41), bool),
        uv_gt=jnp.zeros((B, O, 41, 2), jnp.float32),
        kp_mask=jnp.ones((B, O, 41), bool),
    )
    epoch = jnp.asarray(20, jnp.int32)  # post-annealing weights

    state, _ = step(state, batch, epoch)  # compile + warmup
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch, epoch)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / STEPS

    print(json.dumps({
        "metric": "train_step_throughput",
        "value": round(B * O / dt, 1),
        "unit": "crops/sec/chip",
        "ms_per_step": round(1e3 * dt, 2),
        "frames_per_sec": round(B / dt, 1),
        "batch": B, "obj_slots": O,
    }))


def main():
    bench.guarded_run(run, "train_step_throughput")


if __name__ == "__main__":
    main()
