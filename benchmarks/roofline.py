#!/usr/bin/env python
"""Device-trace roofline audit for the int8 PkpNet executor.

Captures a `jax.profiler` trace of the shipped inference program at a given
chunk size, parses the xplane proto (via tensorflow's bundled
`xplane_pb2` — no tensorboard needed), and reports:

  - steady-state device BUSY time per chunk (union of TPU op intervals),
  - the busy/span gap (a gap == dispatch stalls; zero gap == the device is
    the bottleneck, not the host or the tunnel),
  - the top fusions by total device time, with per-op occupancy shares.

This is the measurement behind BENCHMARKS.md's "floor reached" statement
(VERDICT r3 item 8): if busy ~= span and the big fusions sit at the HBM
bandwidth ceiling, the remaining wall-vs-busy delta is tunnel dispatch and
no graph-level change can help — only a different architecture could.

Usage: python benchmarks/roofline.py [--chunk 128] [--iters 4]
Writes a readable table to stderr and one JSON line to stdout.
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def parse_xspace(logdir):
    """Aggregate TPU op events from the xplane dump under logdir.

    Returns (per_op_total_us, busy_us, span_us) for the LAST (steady-state)
    traced module execution region on the device plane.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    # The device plane is the one named like '/device:TPU:0' (the host
    # python/runtime planes also appear; skip them). Measure a SINGLE core
    # plane — mixing timelines from several planes would let summed busy
    # exceed the single wall span and corrupt the gap.
    dev_planes = [p for p in space.planes if "TPU" in p.name and "device" in p.name.lower()]
    if not dev_planes:
        dev_planes = [p for p in space.planes if "TPU" in p.name]
    if not dev_planes:
        raise RuntimeError(f"no TPU plane; planes = {[p.name for p in space.planes]}")
    if len(dev_planes) > 1:
        log(f"note: {len(dev_planes)} TPU planes; measuring {dev_planes[0].name}")
    plane = dev_planes[0]

    per_op = {}
    intervals = []
    ev_names = dict(plane.event_metadata)
    for line in plane.lines:
        lname = line.name.lower()
        # XLA op lines carry the per-fusion events; step/module lines
        # duplicate the same wall span at coarser granularity.
        if "step" in lname:
            continue
        for ev in line.events:
            md = ev_names.get(ev.metadata_id)
            name = md.name if md else str(ev.metadata_id)
            dur_us = ev.duration_ps / 1e6
            t0_us = (line.timestamp_ns * 1e3 + ev.offset_ps) / 1e6
            if "module" in lname:
                intervals.append((t0_us, t0_us + dur_us, name))
            else:
                per_op[name] = per_op.get(name, 0.0) + dur_us
    if not intervals:
        raise RuntimeError("no module-level events found on the device plane")
    # busy = the UNION of module intervals (overlaps merged), so nested or
    # back-to-back module events can never inflate busy past span.
    intervals.sort()
    busy_us = 0.0
    cur_s, cur_e = intervals[0][0], intervals[0][1]
    for s, e, _ in intervals[1:]:
        if s > cur_e:
            busy_us += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    busy_us += cur_e - cur_s
    span_us = max(e for _, e, _ in intervals) - intervals[0][0]
    return per_op, busy_us, span_us, len(intervals)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--iters", type=int, default=4, help="scan chunks per program")
    ap.add_argument("--prior", default="post_stem", choices=["post_stem", "concat"])
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from suo_slam_tpu.models import PkpNet
    from suo_slam_tpu.models import int8_forward as i8
    from suo_slam_tpu.utils.jit_cache import enable_jit_cache

    enable_jit_cache()
    net = PkpNet(dtype=jnp.bfloat16, prior_mode=args.prior)
    h, w = 256, 256
    x = jax.random.uniform(jax.random.PRNGKey(0), (args.iters, args.chunk, h, w, 3), jnp.bfloat16)
    ph, pw = net.prior_hw((h, w))
    prior = jnp.zeros((args.chunk, ph, pw, 41), jnp.float32)
    x0f = jnp.asarray(x[0, :8], jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(1), x0f[:1])
    scales = i8.calibrate(net, variables, [x0f])
    variables = i8.quantize_weights(net, variables)
    apply_fn = i8.make_int8_apply(net)

    @jax.jit
    def forward(variables, xs, prior):
        def body(carry, xi):
            out = apply_fn(variables, scales, xi, prior)
            return carry + jnp.sum(out.uv) + jnp.sum(out.cov) + jnp.sum(out.kp_mask), 0
        r, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return r

    log(f"compiling (chunk={args.chunk}, prior={args.prior}) ...")
    float(forward(variables, x, prior))  # compile + warm
    t0 = time.perf_counter()
    float(forward(variables, x, prior))
    wall_per_chunk_ms = (time.perf_counter() - t0) / args.iters * 1e3

    logdir = tempfile.mkdtemp(prefix="suo_roofline_")
    with jax.profiler.trace(logdir):
        float(forward(variables, x, prior))
    per_op, busy_us, span_us, n_mod = parse_xspace(logdir)

    busy_per_chunk_ms = busy_us / 1e3 / args.iters
    span_per_chunk_ms = span_us / 1e3 / args.iters
    gap_pct = 100.0 * (span_us - busy_us) / span_us if span_us else 0.0

    total_op_us = sum(per_op.values())
    log(f"\nwall/chunk     : {wall_per_chunk_ms:8.2f} ms  (crops/s = {args.chunk / wall_per_chunk_ms * 1e3:,.0f})")
    log(f"device busy    : {busy_per_chunk_ms:8.2f} ms/chunk  ({n_mod} module executions)")
    log(f"device span    : {span_per_chunk_ms:8.2f} ms/chunk  (gap {gap_pct:.1f}% — dispatch stalls)")
    log(f"host overhead  : {wall_per_chunk_ms - span_per_chunk_ms:8.2f} ms/chunk (tunnel dispatch)")
    log(f"\ntop {args.top} ops by device time (of {total_op_us/1e3/args.iters:.2f} ms/chunk op total):")
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
        log(f"  {us/1e3/args.iters:8.3f} ms/chunk  {100*us/total_op_us:5.1f}%  {name[:90]}")

    print(json.dumps({
        "metric": "device_busy_per_chunk",
        "chunk": args.chunk,
        "wall_ms": round(wall_per_chunk_ms, 2),
        "busy_ms": round(busy_per_chunk_ms, 2),
        "span_ms": round(span_per_chunk_ms, 2),
        "gap_pct": round(gap_pct, 2),
        "unit": "ms",
    }))


if __name__ == "__main__":
    main()
