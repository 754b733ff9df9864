#!/usr/bin/env python
"""Per-frame SLAM solver latency on the real device (north-star: PnP + BA
< 2 ms/frame on TPU v5e, BASELINE.md).

Methodology: the sandbox TPU sits behind a tunnel with ~30 ms host<->device
round-trip, so single-call timing measures the network, not the chip. Each
kernel is therefore chained K times WITH data dependencies inside one jitted
program (so calls cannot overlap) and the per-call latency is
(total - round_trip) / K — the number a locally-attached host would see.

Run: python benchmarks/slam_latency.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

CHAIN = 16       # heavy programs (BA buckets, the network)
CHAIN_TINY = 256  # sub-ms kernels: long chains shrink the tunnel-noise
                  # floor (~0.3 ms rtt jitter / CHAIN per-call error)


def measure_rtt():
    @jax.jit
    def f(x):
        return x + 1.0

    x = jnp.zeros(())
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(10):
        float(f(x))
    return (time.perf_counter() - t0) / 10


def timeit_chained(tag, make_chain, rtt, iters=5, chain=CHAIN):
    """make_chain: () -> jitted fn returning a scalar after `chain` dependent
    applications of the kernel."""
    fn = make_chain()
    float(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn())
    per_call = ((time.perf_counter() - t0) / iters - rtt) / chain
    print(f"{tag}: {1e3 * per_call:.3f} ms/call (on-device)")
    return per_call


def main():
    from suo_slam_tpu.solvers import ba
    from suo_slam_tpu.slam import kernels

    rtt = measure_rtt()
    print(f"tunnel round-trip: {1e3 * rtt:.1f} ms (subtracted)")
    rng = np.random.default_rng(0)
    O, K = 8, 41

    x = jnp.asarray(rng.uniform(-50, 50, (O, K, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(-0.8, 0.8, (O, K, 2)), jnp.float32)
    mask = jnp.ones((O, K), bool)
    cam_k4 = jnp.tile(jnp.asarray([1.2, 1.2, 0.0, 0.0], jnp.float32), (O, 1))
    diam = jnp.full((O,), 1e-3, jnp.float32)
    key = jax.random.PRNGKey(0)

    def chain_pnp():
        @jax.jit
        def fn():
            def body(i, carry):
                yy, acc = carry
                T, ok = kernels.pnp_frame(x, yy, mask, cam_k4, diam, key)
                # data dependency: feed a hash of T into the next y
                acc = acc + jnp.sum(T)
                return yy + 1e-12 * acc, acc

            _, acc = jax.lax.fori_loop(0, CHAIN_TINY, body, (y, jnp.float32(0)))
            return acc

        return fn

    t_pnp = timeit_chained("pnp_frame (8 objs x 41 kp, 64 hyps)", chain_pnp, rtt,
                           chain=CHAIN_TINY)

    T_id = jnp.tile(jnp.eye(4, dtype=jnp.float32), (O, 1, 1))
    ok = jnp.ones((O,), bool)
    info = jnp.tile(jnp.eye(2, dtype=jnp.float32) * 1e4, (O, K, 1, 1))

    def chain_cam():
        @jax.jit
        def fn():
            def body(i, carry):
                yy, acc = carry
                T, cnt, good = kernels.camera_pose_ransac(
                    T_id, ok, T_id, ok, x, yy, info, mask, cam_k4
                )
                acc = acc + jnp.sum(T) + cnt
                return yy + 1e-12 * acc, acc

            _, acc = jax.lax.fori_loop(0, CHAIN_TINY, body, (y, jnp.float32(0)))
            return acc

        return fn

    t_cam = timeit_chained("camera_pose_ransac (8x8x41)", chain_cam, rtt,
                           chain=CHAIN_TINY)

    results = {}
    for tag, V, rounds, tracking in [
        # the engine slices tracking problems to V=1 (O(1) in view capacity)
        ("BA tracking (V=1 slice)", 1, (10, 10, 10, 10), True),
        ("BA global (V=64, O=8)", 64, (10, 10, 40, 40), False),
        # Schur-complement scaling check: cameras are eliminated blockwise,
        # so cost should stay ~linear in V (sliding-window headroom)
        ("BA global (V=256, O=8)", 256, (10, 10, 40, 40), False),
        ("BA global (V=512, O=8)", 512, (10, 10, 40, 40), False),
    ]:
        # CONSISTENT measurements (projected model points + sigma-scale
        # noise): with random uv nearly every edge fails the chi2 gate and
        # the optimizer no-ops (`ba.optimize` skips rounds below 4 inliers),
        # which would time the gate, not the solve.
        obj_T = jnp.tile(jnp.eye(4, dtype=jnp.float32), (O, 1, 1)).at[:, 2, 3].set(600.0)
        p_c = x + jnp.asarray([0.0, 0.0, 600.0], jnp.float32)  # [O,K,3]
        uv_proj = 1.2 * p_c[..., :2] / p_c[..., 2:3]
        uv_meas = jnp.tile(uv_proj[None], (V, 1, 1, 1)) + jnp.asarray(
            rng.normal(0, 0.01, (V, O, K, 2)), jnp.float32)
        prob = ba.BAProblem(
            cam_T=jnp.tile(jnp.eye(4, dtype=jnp.float32), (V, 1, 1)),
            obj_T=obj_T,
            uv=uv_meas,
            info=jnp.tile(jnp.eye(2, dtype=jnp.float32) * 1e4, (V, O, K, 1, 1)),
            model_kp=x,
            cam_k=jnp.tile(cam_k4[None], (V, 1, 1)),
            valid=jnp.ones((V, O, K), bool),
            inliers=jnp.ones((V, O, K), bool),
            cam_active=jnp.ones((V,), bool),
            obj_active=jnp.ones((O,), bool),
        )

        n_chain = CHAIN_TINY if tracking else CHAIN

        def chain_ba(prob=prob, rounds=rounds, tracking=tracking,
                     n_chain=n_chain):
            @jax.jit
            def fn():
                def body(i, carry):
                    p, acc = carry
                    res = ba.optimize(p, iters_per_round=rounds, tracking_only=tracking)
                    p = p._replace(cam_T=res.cam_T, obj_T=res.obj_T)
                    return p, acc + res.total_chi2

                _, acc = jax.lax.fori_loop(0, n_chain, body, (prob, jnp.float32(0)))
                return acc

            return fn

        results[tag] = timeit_chained(tag, chain_ba, rtt, chain=n_chain)
        if tracking:
            t_track_ba = results[tag]

    total = t_pnp + t_cam + t_track_ba
    print(f"per-frame tracking solve (PnP + camRANSAC + tracking BA): "
          f"{1e3 * total:.3f} ms on-device  (north star < 2 ms)")

    # full per-frame SLAM step: keypoint network (int8-resident, 8 crops) +
    # the solver chain above — the single-chip tracking-rate headline
    from suo_slam_tpu.models import PkpNet
    from suo_slam_tpu.models import int8_forward as i8

    net = PkpNet(dtype=jnp.bfloat16)
    crops = jnp.asarray(rng.uniform(0, 1, (O, 256, 256, 3)), jnp.float32)
    ph, pw = net.prior_hw((256, 256))
    prior = jnp.zeros((O, ph, pw, 41), jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(1), crops[:1])
    scales = i8.calibrate(net, variables, [crops], [prior])
    variables = i8.quantize_weights(net, variables)  # as the engine does
    apply_i8 = i8.make_int8_apply(net)

    def chain_net():
        @jax.jit
        def fn():
            def body(i, carry):
                c, acc = carry
                out = apply_i8(variables, scales, c, prior)
                acc = acc + jnp.sum(out.uv) + jnp.sum(out.kp_mask)
                return c + 1e-12 * acc, acc

            _, acc = jax.lax.fori_loop(0, CHAIN, body, (crops, jnp.float32(0)))
            return acc

        return fn

    t_net = timeit_chained("PkpNet int8 forward (8 crops, latency mode)", chain_net, rtt)
    print(f"FULL per-frame SLAM step (net + solvers): "
          f"{1e3 * (total + t_net):.2f} ms on-device = "
          f"{1.0 / (total + t_net):.0f} tracked frames/sec/chip")


if __name__ == "__main__":
    main()
