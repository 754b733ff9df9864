"""On-TPU exactness + latency check for the Pallas int8 residual kernel.

Compares `ops/int8_residual.fused_residual_int8` (Mosaic-compiled) against
its pure-JAX twin for bit-exactness, then times it against the unfused XLA
int8 block sequence with the data-dependent chaining protocol (output feeds
the next input; one scalar fetch at the end — per-dispatch timing through
the sandbox tunnel is unreliable: the terminal dedups identical dispatches
and `block_until_ready` does not actually block).

Run from the repo root: python -c "import runpy;
runpy.run_path('benchmarks/int8_kernel_bench.py', run_name='__main__')"
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from suo_slam_tpu.models.int8_forward import QT, _Int8Engine
from suo_slam_tpu.ops.int8_residual import fused_residual_int8, residual_int8_ref

N, H, W, C, M = 256, 64, 64, 256, 128
K = 60


def main():
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.integers(-127, 128, (N, H, W, C)), jnp.int8)
    f = lambda *s: jnp.asarray(rng.uniform(-0.02, 0.02, s), jnp.float32)
    fv = lambda k: jnp.abs(f(1, k)) + 0.01
    vecs = (fv(C), f(1, C),
            jnp.asarray(rng.integers(-127, 128, (C, M)), jnp.int8),
            fv(M), f(1, M) * 20,
            jnp.asarray(rng.integers(-127, 128, (3, 3, M, M)), jnp.int8),
            fv(M), f(1, M) * 20,
            jnp.asarray(rng.integers(-127, 128, (M, C)), jnp.int8),
            fv(C), fv(C) * 0.1, f(1, C) * 10)
    jax.block_until_ready(q0)

    fused = jax.jit(lambda q: fused_residual_int8(q, *vecs))
    exact = bool(jnp.all(fused(q0) == residual_int8_ref(q0, *vecs)))
    print(f"kernel vs JAX twin bit-exact: {exact}")
    assert exact

    # unfused XLA block with engine semantics (same topology, bf16 epilogues)
    params = {
        "Conv_0": {"kernel": f(1, 1, C, M), "bias": f(M)},
        "Conv_1": {"kernel": f(3, 3, M, M), "bias": f(M)},
        "Conv_2": {"kernel": f(1, 1, M, C), "bias": f(C)},
    }
    affines = [(jnp.abs(f(k)) + 0.9, f(k)) for k in (C, M, M)]
    scales = tuple(jnp.asarray(np.abs(rng.normal(30, 5, s)), jnp.float32)
                   for s in [(), (), (), (C,)])
    s_in = jnp.asarray(np.abs(rng.normal(0.2, 0.02, (C,))), jnp.float32)

    @jax.jit
    def unfused(q):
        eng = _Int8Engine(scales)
        act = QT(q, s_in)
        (a0, b0), (a1, b1), (a2, b2) = affines
        act1 = eng.nrq(act, a0, b0)
        act2 = eng.conv_nrq(act1, params["Conv_0"], a1, b1)
        act3 = eng.conv_nrq(act2, params["Conv_1"], a2, b2,
                            padding=[(1, 1), (1, 1)])
        y = eng.conv_raw(act3, params["Conv_2"])
        return eng.quant(eng.dequant(act) + y, pc=True).q

    def chain_time(fn):
        q = fn(q0)
        float(jnp.sum(q.astype(jnp.int32)))
        t0 = time.perf_counter()
        q = q0
        for _ in range(K):
            q = fn(q)
        float(jnp.sum(q.astype(jnp.int32)))
        return (time.perf_counter() - t0) / K * 1e3

    print(f"fused kernel : {chain_time(fused):.2f} ms/batch{N} (chained)")
    print(f"unfused XLA  : {chain_time(unfused):.2f} ms/batch{N} (chained)")


if __name__ == "__main__":
    main()
