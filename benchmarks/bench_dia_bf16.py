"""DIA SpMV+SpMV-T pair throughput at m=8M: f32 stripes vs bf16 stripes.

The bandwidth-bound regime (m=8M, 88M nnz): stripe traffic dominates
(NDIAG*m*esz per product), so bf16 storage (f32 accumulate) should
approach a ~1.7x pair speedup if the kernel is bandwidth-limited.

Run alone (one relay client at a time) on the real chip:
    nohup python benchmarks/bench_dia_bf16.py > /tmp/bench_bf16.log 2>&1 &

Starts with the relay-health reference chain (BENCHMARKS.md methodology);
discard results if REF < ~300 GB/s.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

M = 8_000_000
NDIAG = 11
OFFSETS = tuple(range(-(NDIAG // 2), NDIAG // 2 + 1))
ITERS = 30


def health():
    x = jax.random.normal(jax.random.PRNGKey(9), (32 * 1024 * 1024,), jnp.float32)

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, 10, lambda i, x: x * 0.999 + 0.001, x)

    float(jnp.sum(chain(x)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(x)))
    gbs = 2 * x.nbytes * 10 / (time.perf_counter() - t0) / 1e9
    print(f"REF elementwise: {gbs:.0f} GB/s "
          f"({'OK' if gbs > 300 else 'DEGRADED'})", flush=True)
    return gbs


def bench(storage_dtype):
    from lsqr_tpu.ops.structured import dia_operator_device

    @jax.jit
    def run(key):
        data = jax.random.normal(key, (NDIAG, M), jnp.float32)
        A = dia_operator_device(M, M, OFFSETS, data,
                                storage_dtype=storage_dtype)

        def body(i, x):
            y = A.matvec(x)
            return A.rmatvec(y) * 1e-9

        x = jax.lax.fori_loop(0, ITERS, body, jnp.ones((M,), jnp.float32))
        return jnp.sum(x)

    float(run(jax.random.PRNGKey(0)))  # compile + warm
    t0 = time.perf_counter()
    float(run(jax.random.PRNGKey(0)))
    dt = (time.perf_counter() - t0) / ITERS
    gnnz = 2 * NDIAG * M / dt / 1e9
    name = storage_dtype or "float32"
    print(f"{name}: {dt*1e3:.2f} ms/pair  {gnnz:.1f} Gnnz/s pair", flush=True)
    return gnnz


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    health()
    g32 = bench(None)
    gbf = bench("bfloat16")
    print(f"bf16/f32 speedup: {gbf / g32:.2f}x", flush=True)
