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
set SUO_BENCH_PATH=bf16 for the full-precision baseline.

Protocol: `lax.scan` over CHUNKS of 128 distinct crop batches inside one
jitted program — batch 128 is the measured device sweet spot (7% faster
per crop than 256, which beats 512/1024 by another 4-6%: the {3,0,2,1}
batch-in-sublanes int8 layout tiles best small), and in-program chaining
removes per-dispatch host overhead that no serving deployment pays (each
chunk's results still force uv/cov/mask computation). Images feed as bf16 —
the uint8-sourced pixels lose nothing and XLA runs the stem in bf16
regardless. The SLAM engine's per-frame latency path is measured separately
in benchmarks/slam_latency.py.

Baseline for `vs_baseline`: the driver north star of 5000 crops/sec/chip
(BASELINE.json "north_star"; the reference repo publishes no numbers).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_CROPS_PER_SEC = 5000.0
# SUO_BENCH_CHUNK overrides the batch per scan step (layout sweeps)
CHUNK = int(os.environ.get("SUO_BENCH_CHUNK", "128"))
N_CHUNKS = max(1, 4096 // CHUNK)
WARMUP = 1
REPEATS = 3


def main():
    from suo_slam_tpu.models import PkpNet

    path = os.environ.get("SUO_BENCH_PATH", "int8")
    net = PkpNet(dtype=jnp.bfloat16)
    h, w = 256, 256
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (N_CHUNKS, CHUNK, h, w, 3), jnp.bfloat16)
    ph, pw = net.prior_hw((h, w))
    prior = jnp.zeros((CHUNK, ph, pw, 41), jnp.float32)
    x0f = jnp.asarray(x[0, :8], jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(1), x0f[:1])

    if path == "int8":
        from suo_slam_tpu.models import int8_forward as i8

        scales = i8.calibrate(net, variables, [x0f])  # worst-case ones prior
        variables = i8.quantize_weights(net, variables)  # s8 kernels for the int8 path
        apply_fn = lambda v, xi, p: i8.make_int8_apply(net)(v, scales, xi, p)
    else:
        apply_fn = lambda v, xi, p: net.apply(v, xi, p)

    @jax.jit
    def forward(variables, xs, prior):
        def body(carry, xi):
            out = apply_fn(variables, xi, prior)
            return carry + jnp.sum(out.uv) + jnp.sum(out.cov) + jnp.sum(out.kp_mask), 0
        r, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return r

    for _ in range(WARMUP):
        float(forward(variables, x, prior))
    t0 = time.perf_counter()
    acc = [forward(variables, x, prior) for _ in range(REPEATS)]
    jax.block_until_ready(acc)
    dt = (time.perf_counter() - t0) / (REPEATS * N_CHUNKS)
    crops_per_sec = CHUNK / dt

    print(json.dumps({
        "metric": "pkpnet_inference_throughput",
        "value": round(crops_per_sec, 1),
        "unit": "crops/sec/chip",
        "vs_baseline": round(crops_per_sec / BASELINE_CROPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
