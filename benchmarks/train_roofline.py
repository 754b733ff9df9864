#!/usr/bin/env python
"""Training-step roofline: a floor argument for the flagship train step.

VERDICT r4 #2: the inference executor has a trace-audited floor declaration;
the train step only had a wall number (15-26 ms/it) plus the admission that
`jax.profiler` misreports the ROI bilinear-gather fusions ~10x under trace.
This benchmark builds the floor argument WITHOUT the profiler, three ways:

  1. subtraction timings — the full step vs a step whose ROI gather +
     prior render are excised (pre-cropped inputs), and vs forward-only:
     isolates the gather cost and the backward cost as untraced wall deltas;
  2. compiled cost analysis — XLA's flops count (validated: CPU-XLA and the
     TPU executable agree at 27.6 GFLOP/crop forward, ~3x that for
     fwd+bwd+Adam) divided by the chip's peak bf16 MXU rate gives the
     compute floor per step. XLA's `bytes accessed` is reported only as a
     diagnostic: it counts PRE-fusion per-op traffic (every fusion's
     internals), so it is an upper bound on HBM bytes, not a floor;
  3. a batch/shape sweep — (B frames x O object slots) configs up to the
     inference executor's batch-128 lesson, reporting crops/s at each.

All walls are FETCH-terminated (bench.fetch_timed): a device->host scalar
fetch ends every timed window, because block_until_ready has been observed
acking before compute finishes under tunnel degradation (2026-08-20), which
produced physics-violating walls (33 ms for a 53 ms-floor program). Rows
whose wall still beats the compute floor are marked `suspect_timing` and
must not be published (bench.physics_check).

The reference's training meter is sec/it + GPU mem (`train.py:88-100`).

Run: python benchmarks/train_roofline.py
Env: SUO_TR_STEPS (timed steps/config, default 10), SUO_TR_TINY=1 (CI smoke).
Prints a table to stderr and ONE JSON line to stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (probe/retry + lock + outage shield)

STEPS = int(os.environ.get("SUO_TR_STEPS", "10"))
TINY = bool(int(os.environ.get("SUO_TR_TINY", "0")))

# v5e single-chip peak (public spec): 197 TFLOP/s bf16. The HBM peak
# (819 GB/s) is deliberately NOT used for a floor here — XLA's
# bytes-accessed is pre-fusion traffic (upper bound), and the analytic
# activation-traffic estimate lands at the same ~50 ms as the compute floor
# for this net (BENCHMARKS.md "Training step"), so the compute floor is the
# binding, defensible one.
PEAK_FLOPS = 197e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _cost(compiled):
    """(flops, bytes accessed) from XLA's cost analysis; zeros if absent."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _time_steps(step, state, batch, epoch, rtt, n=STEPS):
    """Steady-state ms/step: chained donated steps, one terminal FETCH.

    Completion is proven by fetching the final state's step counter (a tiny
    scalar) device->host — see bench.fetch_timed for why block_until_ready
    is not trusted here. One measured fetch RTT is subtracted.
    """
    state, _ = step(state, batch, epoch)  # warmup (compile already done)
    float(state.step)  # fetch: forces the warmup to really finish
    t0 = time.perf_counter()
    for _ in range(n):
        state, _ = step(state, batch, epoch)
    float(state.step)
    return 1e3 * max(time.perf_counter() - t0 - rtt, 0.0) / n


def run():
    import jax
    import jax.numpy as jnp
    import optax

    from suo_slam_tpu.models import PkpNet
    from suo_slam_tpu.ops import heatmap as hm
    from suo_slam_tpu.train import harness, losses
    from suo_slam_tpu.utils.jit_cache import enable_jit_cache

    enable_jit_cache()
    bench.force_cpu_if_allowed()
    if TINY:
        net = PkpNet(dtype=jnp.bfloat16, n_stack=1, n_modules=1, features=16)
        configs = [(2, 2), (2, 4)]
        main_cfg = (2, 4)
    else:
        net = PkpNet(dtype=jnp.bfloat16)
        # (B frames, O slots): reference default, r4 default, and two
        # 128-crop layouts (the inference executor's batch-128 lesson).
        configs = [(2, 16), (8, 8), (8, 16), (16, 8)]
        main_cfg = (8, 16)
    opt = harness.make_optimizer()
    hw = (256, 256)
    epoch = jnp.asarray(20, jnp.int32)

    def make_batch(b, o):
        rng = jax.random.PRNGKey(1)
        return harness.Batch(
            images=jax.random.uniform(rng, (b, 480, 640, 3), jnp.float32),
            boxes=jnp.tile(jnp.asarray([40.0, 40.0, 296.0, 296.0]), (b, o, 1)),
            obj_mask=jnp.ones((b, o), bool),
            prior_uv=jnp.zeros((b, o, 41, 2), jnp.float32),
            prior_mask=jnp.zeros((b, o, 41), bool),
            uv_gt=jnp.zeros((b, o, 41, 2), jnp.float32),
            kp_mask=jnp.ones((b, o, 41), bool),
        )

    rtt = bench.measure_rtt()
    log(f"fetch RTT: {1e3 * rtt:.1f} ms")

    # ---- 3. batch sweep of the FULL step (gather + prior + fwd + bwd + Adam)
    sweep = []
    full_rows = {}
    for b, o in configs:
        state = harness.init_state(net, jax.random.PRNGKey(0), opt, input_hw=hw)
        step = jax.jit(harness.make_train_step(net, opt, input_hw=hw),
                       donate_argnums=(0,))
        batch = make_batch(b, o)
        lowered = step.lower(state, batch, epoch)
        compiled = lowered.compile()
        flops, bts = _cost(compiled)
        ms = _time_steps(step, state, batch, epoch, rtt)
        row = dict(B=b, O=o, crops=b * o, ms=round(ms, 2),
                   crops_per_s=round(b * o / (ms / 1e3), 0),
                   gflops=round(flops / 1e9, 1),
                   # pre-fusion per-op traffic: an UPPER bound on HBM bytes
                   # (fusion internals included), diagnostic only
                   gbytes_prefusion=round(bts / 1e9, 3),
                   floor_compute_ms=round(1e3 * flops / PEAK_FLOPS, 2))
        row["mxu_util_pct"] = round(100 * row["floor_compute_ms"] / ms, 1)
        row["suspect_timing"] = not bench.physics_check(
            ms, row["floor_compute_ms"], label=f"full step B={b} O={o}")
        sweep.append(row)
        full_rows[(b, o)] = row
        log(f"full step B={b} O={o}: {ms:.2f} ms, {row['crops_per_s']:.0f} "
            f"crops/s, XLA flops {row['gflops']} G -> compute floor "
            f"{row['floor_compute_ms']} ms, MXU util {row['mxu_util_pct']}%"
            + (" [SUSPECT]" if row["suspect_timing"] else ""))

    # ---- 1a. gather excised: same net/losses on PRE-CROPPED inputs
    b, o = main_cfg
    n = b * o
    phw = net.prior_hw(hw)

    def nogather_step(state, crops, prior, uv_gt, kp_mask, epoch):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(p):
            out, updated = net.apply(
                harness.model_variables(p, state.batch_stats), crops, prior,
                train=True, row_mask=jnp.ones((n,), bool),
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
            loss, aux = losses.total_loss(
                out.uv, out.cov, out.prob, out.kp_mask_logits, uv_gt, kp_mask,
                epoch)
            return loss, (aux, updated.get("batch_stats", state.batch_stats))

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return harness.TrainState(params, new_stats, opt_state,
                                  state.step + 1, rng), dict(aux, loss=loss)

    state = harness.init_state(net, jax.random.PRNGKey(0), opt, input_hw=hw)
    crops = jax.random.uniform(jax.random.PRNGKey(2), (n, hw[0], hw[1], 3))
    prior = jnp.zeros((n, phw[0], phw[1], 41), jnp.float32)
    uv_gt = jnp.zeros((n, 41, 2), jnp.float32)
    kp_mask = jnp.ones((n, 41), bool)
    ng_step = jax.jit(nogather_step, donate_argnums=(0,))
    ng_compiled = ng_step.lower(state, crops, prior, uv_gt, kp_mask, epoch).compile()
    ng_flops, ng_bytes = _cost(ng_compiled)

    def ng_timed(s, _batch, e):
        return ng_step(s, crops, prior, uv_gt, kp_mask, e)

    ng_ms = _time_steps(ng_timed, state, None, epoch, rtt)
    ng_floor = 1e3 * ng_flops / PEAK_FLOPS
    ng_ok = bench.physics_check(ng_ms, ng_floor, label="nogather step")
    log(f"gather+prior excised (pre-cropped, B*O={n}): {ng_ms:.2f} ms, "
        f"XLA flops {ng_flops/1e9:.1f} G"
        + ("" if ng_ok else " [SUSPECT]"))

    # ---- 1b. forward-only at the same shapes (with gather): backward cost.
    # The eval step's raw outputs are large [N,41,...] tensors; summing them
    # to one scalar inside the jit keeps every op live (no DCE) while letting
    # the fetch-terminated protocol end on a tiny device->host read.
    ev = harness.make_eval_step(net, input_hw=hw)
    batch = make_batch(b, o)
    st0 = harness.init_state(net, jax.random.PRNGKey(0), opt, input_hw=hw)

    @jax.jit
    def ev_scalar(bt, e):
        out = ev(st0.params, st0.batch_stats, bt, e)
        return sum(jnp.sum(jnp.asarray(leaf, jnp.float32))
                   for leaf in jax.tree.leaves(out))

    ev_compiled = ev_scalar.lower(batch, epoch).compile()
    ev_flops, _ = _cost(ev_compiled)
    float(ev_scalar(batch, epoch))  # warmup + fetch
    t0 = time.perf_counter()
    out = None
    for _ in range(STEPS):
        out = ev_scalar(batch, epoch)
    float(out)
    ev_ms = 1e3 * max(time.perf_counter() - t0 - rtt, 0.0) / STEPS
    ev_floor = 1e3 * ev_flops / PEAK_FLOPS
    ev_ok = bench.physics_check(ev_ms, ev_floor, label="forward-only")
    log(f"forward-only (incl. gather, B*O={n}): {ev_ms:.2f} ms, "
        f"XLA flops {ev_flops/1e9:.1f} G, compute floor {ev_floor:.2f} ms"
        + ("" if ev_ok else " [SUSPECT]"))

    main = full_rows[main_cfg]
    result = {
        "metric": "train_step_roofline",
        "unit": "ms/step",
        "value": main["ms"],
        "config": {"B": b, "O": o, "crops": n},
        "timing": "fetch-terminated, rtt-subtracted",
        "rtt_ms": round(1e3 * rtt, 2),
        "full_ms": main["ms"],
        "nogather_ms": round(ng_ms, 2),
        "gather_ms_by_subtraction": round(main["ms"] - ng_ms, 2),
        "fwd_only_ms": round(ev_ms, 2),
        "bwd_opt_ms_by_subtraction": round(main["ms"] - ev_ms, 2),
        "xla_gflops_full": main["gflops"],
        "floor_compute_ms": main["floor_compute_ms"],
        "fwd_floor_compute_ms": round(ev_floor, 2),
        "mxu_util_pct": main["mxu_util_pct"],
        "suspect_timing": bool(main["suspect_timing"] or not ng_ok
                               or not ev_ok),
        "sweep": sweep,
    }
    print(json.dumps(result))


def main():
    bench.guarded_run(run, "train_step_roofline", unit="ms/step")


if __name__ == "__main__":
    main()
