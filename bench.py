#!/usr/bin/env python
"""Headline benchmark: PkpNet keypoint-inference throughput (object crops/sec).

Runs the flagship full-size network (nStack=2, nFeats=256, 256x256 input,
41 keypoint channels, soft-argmax + covariance readout — the per-frame hot
loop of the SLAM engine, reference `lib/object_slam.py:1077-1167`) on the
real device and prints ONE JSON line.

Default path: int8-RESIDENT inference (`models/int8_forward.py`) — int8
activations in HBM, int8 convs on the MXU, per-tensor/per-channel calibrated
scales. Accuracy at trained weights is validated by
`benchmarks/int8_accuracy.py` (uv MAE / validity / PnP pose parity vs bf16);
set SUO_BENCH_PATH=bf16 for the full-precision baseline. Batch 1024 is the
serving batch (throughput, not latency, is the metric; the SLAM engine's
per-frame latency path is measured in benchmarks/slam_latency.py).

Baseline for `vs_baseline`: the driver north star of 5000 crops/sec/chip
(BASELINE.json "north_star"; the reference repo publishes no numbers).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_CROPS_PER_SEC = 5000.0
BATCH = 1024
WARMUP = 3
ITERS = 10


def main():
    from suo_slam_tpu.models import PkpNet

    path = os.environ.get("SUO_BENCH_PATH", "int8")
    net = PkpNet(dtype=jnp.bfloat16)
    n, h, w = BATCH, 256, 256
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (n, h, w, 3), jnp.float32)
    ph, pw = net.prior_hw((h, w))
    prior = jnp.zeros((n, ph, pw, 41), jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(1), x[:1])

    if path == "int8":
        from suo_slam_tpu.models import int8_forward as i8

        scales = i8.calibrate(net, variables, [x[:8]], [prior[:8]])
        apply_i8 = i8.make_int8_apply(net)

        @jax.jit
        def forward(variables, x, prior):
            out = apply_i8(variables, scales, x, prior)
            return jnp.sum(out.uv) + jnp.sum(out.cov) + jnp.sum(out.kp_mask)
    else:

        @jax.jit
        def forward(variables, x, prior):
            out = net.apply(variables, x, prior)
            return jnp.sum(out.uv) + jnp.sum(out.cov) + jnp.sum(out.kp_mask)

    for _ in range(WARMUP):
        float(forward(variables, x, prior))
    # Throughput protocol: dispatch all iterations back-to-back and fetch
    # once — a per-iteration host sync would add the full host<->device
    # round-trip (~30 ms through the remote-TPU tunnel) to every batch,
    # which no serving deployment pays.
    t0 = time.perf_counter()
    acc = []
    for _ in range(ITERS):
        acc.append(forward(variables, x, prior))
    jax.block_until_ready(acc)
    float(acc[-1])
    dt = (time.perf_counter() - t0) / ITERS
    crops_per_sec = n / dt

    print(json.dumps({
        "metric": "pkpnet_inference_throughput",
        "value": round(crops_per_sec, 1),
        "unit": "crops/sec/chip",
        "vs_baseline": round(crops_per_sec / BASELINE_CROPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
