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
SUO_BENCH_PRIOR=concat benches the reference-faithful prior-concat
architecture (what converted reference checkpoints use,
`lib/models/pkpnet.py:95-101`) instead of the default post_stem injection.

Protocol: `lax.scan` over CHUNKS of 128 distinct crop batches inside one
jitted program — batch 128 is the measured device sweet spot (7% faster
per crop than 256, which beats 512/1024 by another 4-6%: the {3,0,2,1}
batch-in-sublanes int8 layout tiles best small), and in-program chaining
removes per-dispatch host overhead that no serving deployment pays (each
chunk's results still force uv/cov/mask computation). Images feed as bf16 —
the uint8-sourced pixels lose nothing and XLA runs the stem in bf16
regardless. The SLAM engine's per-frame latency path is measured separately
in benchmarks/slam_latency.py.

Outage resilience: the TPU here is reached over a tunnel that can be down
for minutes-to-hours and `jax.devices()` then HANGS rather than erroring.
Before touching JAX in-process we probe the backend in a subprocess under a
timeout, retrying with backoff for a bounded window (SUO_BENCH_RETRY_S,
default 600 s). If the backend never comes up we print a structured
`{"error": "tpu_unavailable", ...}` JSON line (exit 0) so the driver can
distinguish "tunnel down" from "code broken" (which still tracebacks, rc=1).

Baseline for `vs_baseline`: the driver north star of 5000 crops/sec/chip
(BASELINE.json "north_star"; the reference repo publishes no numbers).
"""

import json
import os
import subprocess
import sys
import time

BASELINE_CROPS_PER_SEC = 5000.0
# SUO_BENCH_CHUNK overrides the batch per scan step (layout sweeps)
CHUNK = int(os.environ.get("SUO_BENCH_CHUNK", "128"))
N_CHUNKS = max(1, 4096 // CHUNK)
WARMUP = 1
REPEATS = 3

PROBE_TIMEOUT_S = int(os.environ.get("SUO_BENCH_PROBE_TIMEOUT_S", "90"))
RETRY_WINDOW_S = float(os.environ.get("SUO_BENCH_RETRY_S", "600"))
LOCK_PATH = "/tmp/suo_tpu_lock"

_PROBE_SRC = (
    "import jax, json, sys;"
    "ds = jax.devices();"
    "print(json.dumps({'platform': ds[0].platform, 'n': len(ds)}))"
)


def probe_backend():
    """Probe the JAX backend in a subprocess under a hard timeout.

    jax.devices() can hang forever when the TPU tunnel is down, so the probe
    must be out-of-process. Returns (status, detail) where status is one of
    'up', 'down', 'hang'.
    """
    env = dict(os.environ)
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT_S, env=env,
        )
    except subprocess.TimeoutExpired:
        return "hang", f"probe exceeded {PROBE_TIMEOUT_S}s (tunnel hang)"
    if r.returncode == 0:
        try:
            info = json.loads(r.stdout.strip().splitlines()[-1])
        except (ValueError, IndexError):
            return "down", f"unparseable probe stdout: {r.stdout[-200:]}"
        if info.get("platform") == "cpu" and not os.environ.get("SUO_BENCH_ALLOW_CPU"):
            # A silent CPU fallback would report a garbage number as the
            # round's headline; refuse unless explicitly allowed.
            return "down", f"only cpu backend available: {info}"
        return "up", info
    tail = (r.stderr or "")[-400:]
    return "down", tail


def wait_for_backend():
    """Retry the probe with backoff inside RETRY_WINDOW_S.

    Returns the final ('up', info) on success or ('down'/'hang', detail,
    n_probes, waited_s) shaped tuple on exhaustion.
    """
    t0 = time.monotonic()
    backoff = 20.0
    n = 0
    while True:
        n += 1
        status, detail = probe_backend()
        waited = time.monotonic() - t0
        if status == "up":
            return status, detail, n, waited
        remaining = RETRY_WINDOW_S - (time.monotonic() - t0)
        if remaining <= 0:
            return status, detail, n, waited
        time.sleep(min(backoff, max(1.0, remaining)))
        backoff = min(backoff * 2, 180.0)


def emit_unavailable(status, detail, n_probes, waited_s,
                     metric="pkpnet_inference_throughput",
                     unit="crops/sec/chip"):
    print(json.dumps({
        "error": "tpu_unavailable",
        "metric": metric,
        "value": None,
        "unit": unit,
        "vs_baseline": None,
        "probe_status": status,  # 'down' = init error, 'hang' = tunnel hang
        "probes": n_probes,
        "waited_s": round(waited_s, 1),
        "detail": str(detail)[-300:],
    }))


def acquire_lock(wait_s=None):
    """Cooperative TPU lock: O_EXCL-create LOCK_PATH, waiting out a live
    holder (bounded), stealing a stale one. Two concurrent TPU processes
    corrupt each other's timings, so every bench in this repo acquires this
    before touching the device. Best-effort: returns False (and the caller
    proceeds with a stderr warning) if a live holder outlasts the wait.
    """
    deadline = time.monotonic() + (RETRY_WINDOW_S if wait_s is None else wait_s)
    while True:
        try:
            fd = os.open(LOCK_PATH, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            return True
        except FileExistsError:
            try:
                with open(LOCK_PATH) as f:
                    pid = int(f.read().strip() or "0")
            except (OSError, ValueError):
                pid = 0
            alive = False
            if pid > 0 and pid != os.getpid():
                try:
                    os.kill(pid, 0)
                    alive = True
                except OSError:
                    alive = False
            if not alive:  # stale lock (crashed holder): steal it
                try:
                    os.remove(LOCK_PATH)
                except OSError:
                    pass
                continue
            if time.monotonic() >= deadline:
                return False
            time.sleep(5.0)
        except OSError:
            return True  # /tmp unwritable: skip locking entirely


def release_lock():
    try:
        os.remove(LOCK_PATH)
    except OSError:
        pass


def guarded_run(run_fn, metric, unit="crops/sec/chip"):
    """Probe-gate, lock, and outage-shield a benchmark body.

    Shared by every TPU benchmark script: bounded backend probe/retry before
    touching JAX, the cooperative TPU lock around the run, and a
    catch/retry/emit_unavailable path for a tunnel drop that happens BETWEEN
    the probe and (or during) the run — so an outage always yields the
    structured `tpu_unavailable` line (rc=0) instead of a traceback.
    """
    if os.environ.get("SUO_BENCH_ALLOW_CPU"):
        # CPU smoke mode: no tunnel, no lock, probing would only hang.
        run_fn()
        return
    status, detail, n, waited = wait_for_backend()
    if status != "up":
        emit_unavailable(status, detail, n, waited, metric=metric, unit=unit)
        return
    if not acquire_lock():
        print("warning: TPU lock held past the wait window; proceeding "
              "(timings may be contended)", file=sys.stderr)
    try:
        run_fn()
    except RuntimeError as e:
        # Backend dropped between probe and run (tunnel flake): one more
        # bounded wait, one retry, then the structured marker.
        if "nable to initialize backend" not in str(e):
            raise
        status, detail, n, waited = wait_for_backend()
        if status != "up":
            emit_unavailable(status, f"mid-run drop; {detail}", n, waited,
                             metric=metric, unit=unit)
            return
        try:
            run_fn()
        except RuntimeError as e2:
            if "nable to initialize backend" not in str(e2):
                raise
            emit_unavailable("down", f"retry also dropped: {e2}", n + 1,
                             waited, metric=metric, unit=unit)
    finally:
        release_lock()


def measure_rtt(n=10):
    """Per-call host<->device round trip: tiny jitted add, FETCH-timed."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))  # compile + first round trip
    t0 = time.perf_counter()
    for _ in range(n):
        float(f(x))
    return (time.perf_counter() - t0) / n


def fetch_timed(dispatch, n, fetch, rtt=None):
    """Steady-state seconds/dispatch, completion forced by a real FETCH.

    `dispatch(prev) -> out` enqueues one program (chain state through `prev`
    when the program supports it; independent dispatches are fine too — the
    TPU runtime executes enqueued programs in order). After n dispatches,
    `fetch(out)` must move a small value device->host (e.g. float(out.loss));
    programs execute atomically and in order, so the fetch returning proves
    every dispatched program ran to completion.

    Why not jax.block_until_ready: during tunnel degradation (observed
    2026-08-20) block_until_ready has ACKED BEFORE COMPUTE FINISHED —
    chained 8192^3 matmuls "completed" at 475 PFLOP/s on a 197 TFLOP/s chip
    while the actual result fetch took 128 s. A device->host fetch cannot
    lie the same way: the bytes either arrive or they don't. One fetch RTT
    (measured, not assumed) is subtracted from the window.
    """
    if rtt is None:
        rtt = measure_rtt()
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = dispatch(out)
    fetch(out)
    dt = time.perf_counter() - t0 - rtt
    return max(dt, 0.0) / n


def physics_check(measured_ms, floor_ms, label=""):
    """Flag walls that beat the hardware floor (a timing artifact, not a win).

    Returns True when the measurement is credible. A measured wall below the
    analytic compute floor means the timing harness was lied to (see
    fetch_timed) — callers should mark the row suspect rather than publish it.
    """
    if floor_ms > 0 and measured_ms < 0.98 * floor_ms:
        print(
            f"warning: {label} measured {measured_ms:.2f} ms beats the "
            f"{floor_ms:.2f} ms hardware floor — timing suspect (tunnel "
            "ack-degradation?); row marked suspect_timing",
            file=sys.stderr,
        )
        return False
    return True


def force_cpu_if_allowed():
    """Under SUO_BENCH_ALLOW_CPU, actually force the CPU platform.

    The sandbox pre-imports jax on the axon (TPU tunnel) platform via
    sitecustomize, so the JAX_PLATFORMS env var alone is too late — without
    this, a 'CPU' smoke run would still try to init the tunnel backend.
    """
    if os.environ.get("SUO_BENCH_ALLOW_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")


def run_bench():
    import jax
    import jax.numpy as jnp

    from suo_slam_tpu.models import PkpNet
    from suo_slam_tpu.utils.jit_cache import enable_jit_cache

    force_cpu_if_allowed()

    # Warm-start compiles from the persistent cache (the timed region is
    # post-compile either way; this shrinks the tunnel-exposure window).
    enable_jit_cache()

    path = os.environ.get("SUO_BENCH_PATH", "int8")
    prior_mode = os.environ.get("SUO_BENCH_PRIOR", "post_stem")
    net = PkpNet(dtype=jnp.bfloat16, prior_mode=prior_mode)
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
    # Fetch-terminated timing (see fetch_timed): the final scalar fetch
    # proves the in-order program queue drained; block_until_ready alone has
    # been observed acking early under tunnel degradation.
    rtt = measure_rtt()
    t0 = time.perf_counter()
    acc = [forward(variables, x, prior) for _ in range(REPEATS)]
    float(acc[-1])
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / (REPEATS * N_CHUNKS)
    crops_per_sec = CHUNK / dt

    print(json.dumps({
        "metric": "pkpnet_inference_throughput",
        "value": round(crops_per_sec, 1),
        "unit": "crops/sec/chip",
        "vs_baseline": round(crops_per_sec / BASELINE_CROPS_PER_SEC, 3),
    }))


def main():
    guarded_run(run_bench, "pkpnet_inference_throughput")


if __name__ == "__main__":
    main()
