"""TPU measurements for the fused product-pair kernels (run when the axon
tunnel is up; one phase per invocation to keep jit-signature count low):

  python benchmarks/bench_pair.py kernels   # dia_pair vs matvec+rmatvec, m=8M
  python benchmarks/bench_pair.py solve     # solve ms/iter: pair vs fused vs plain
  python benchmarks/bench_pair.py shared    # shared-stripe pair + product A/B
  python benchmarks/bench_pair.py bf16      # bf16-stripe pair vs f32 pair

Methodology (BENCHMARKS.md): data generated on device; timing chains K
data-dependent steps inside ONE jit and closes with a scalar host fetch;
a bandwidth reference chain runs first — discard results if REF < ~300
GB/s (relay degraded)."""

from __future__ import annotations

import sys
import time

M = 8_000_000
NDIAG = 11
OFFSETS = tuple(range(-(NDIAG // 2), NDIAG // 2 + 1))
ITERS = 30


def ref_bandwidth():
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(9), (32 * 1024 * 1024,),
                          jnp.float32)

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, 10, lambda i, x: x * 0.999 + 0.001, x)

    float(jnp.sum(chain(x)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(x)))
    dt = (time.perf_counter() - t0) / 10
    gbs = 2 * x.size * 4 / dt / 1e9
    print(f"REF elementwise: {gbs:.0f} GB/s "
          f"({'OK' if gbs > 300 else 'DEGRADED'})", flush=True)
    return gbs


def phase_kernels():
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.pallas_spmv import dia_pair
    from lsqr_tpu.ops.structured import dia_operator_device

    nnz = NDIAG * M
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run_sep(key):
        data = jax.random.normal(key, (NDIAG, M), jnp.float32)
        A = dia_operator_device(M, M, OFFSETS, data)

        def body(i, x):
            y = A.matvec(x)
            z = A.rmatvec(y)
            return z * 1e-9

        return jnp.sum(jax.lax.fori_loop(
            0, ITERS, body, jnp.ones((M,), jnp.float32)))

    @jax.jit
    def run_pair(key):
        data = jax.random.normal(key, (NDIAG, M), jnp.float32)

        def body(i, v):
            u, z = dia_pair(data, v, v, 1.0, 0.0,
                            offsets=OFFSETS, m=M, n=M)
            return z * 1e-9

        return jnp.sum(jax.lax.fori_loop(
            0, ITERS, body, jnp.ones((M,), jnp.float32)))

    for name, fn in [("separate", run_sep), ("pair", run_pair)]:
        print(f"compiling {name}...", flush=True)
        float(fn(key))
        t0 = time.perf_counter()
        float(fn(key))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name}: {dt*1e3:.2f} ms/pair = {2*nnz/dt/1e9:.1f} Gnnz/s",
              flush=True)


def phase_solve():
    import jax
    import jax.numpy as jnp

    import lsqr_tpu as lt
    from lsqr_tpu.ops.structured import dia_operator_device

    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (NDIAG, M), jnp.float32)
    data = data.at[NDIAG // 2].add(6.0)
    A = dia_operator_device(M, M, OFFSETS, data)
    b = jax.random.normal(jax.random.PRNGKey(1), (M,), jnp.float32)
    ITN = 192
    for name, kw in [
        ("plain   (fused=False, pair=False)", dict(fused=False, pair=False)),
        ("fused   (round-1 default)", dict(fused=True, pair=False)),
        ("pair    (one stripe pass/iter)", dict(pair=True)),
    ]:
        t0 = time.perf_counter()
        res = lt.lsqr(A, b, 0.01, atol=0.0, btol=0.0, conlim=0.0,
                      itnlim=ITN, loop="bounded", loop_segment=ITN, **kw)
        float(res.rnorm)  # force through the relay
        compile_and_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = lt.lsqr(A, b, 0.01, atol=0.0, btol=0.0, conlim=0.0,
                      itnlim=ITN, loop="bounded", loop_segment=ITN, **kw)
        float(res.rnorm)
        dt = (time.perf_counter() - t0) / ITN
        print(f"{name}: {dt*1e3:.3f} ms/iter (itn {int(res.itn)}; "
              f"first call incl. compile {compile_and_run:.0f}s)", flush=True)


def phase_shared():
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.pallas_spmv import (
        dia_pair_shared, dia_product_shared,
    )
    from lsqr_tpu.ops.structured import dia_shared_operator

    key = jax.random.PRNGKey(0)
    nnz = NDIAG * M
    data = jax.random.normal(key, (NDIAG, M), jnp.float32)
    op = dia_shared_operator(M, M, OFFSETS, data)
    dp = op.dp

    @jax.jit
    def run_products(dp, v0):
        def body(i, v):
            y = dia_product_shared(dp, v, offsets=OFFSETS, m=M, n=M,
                                   adjoint=False)
            z = dia_product_shared(dp, y, offsets=OFFSETS, m=M, n=M,
                                   adjoint=True)
            return z * 1e-9

        return jnp.sum(jax.lax.fori_loop(
            0, ITERS, body, v0))

    @jax.jit
    def run_pair(dp, v0):
        def body(i, v):
            u, z = dia_pair_shared(dp, v, v, 1.0, 0.0,
                                   offsets=OFFSETS, m=M, n=M)
            return z * 1e-9

        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, v0))

    v0 = jnp.ones((M,), jnp.float32)
    for name, fn in [("shared products", run_products),
                     ("shared pair", run_pair)]:
        print(f"compiling {name}...", flush=True)
        float(fn(dp, v0))
        t0 = time.perf_counter()
        float(fn(dp, v0))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name}: {dt*1e3:.2f} ms/pair = {2*nnz/dt/1e9:.1f} Gnnz/s",
              flush=True)


def phase_bf16():
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.pallas_spmv import dia_pair

    key = jax.random.PRNGKey(0)
    nnz = NDIAG * M

    def make_run(dtype):
        @jax.jit
        def run(key):
            data = jax.random.normal(key, (NDIAG, M), jnp.float32).astype(dtype)

            def body(i, v):
                u, z = dia_pair(data, v, v, 1.0, 0.0,
                                offsets=OFFSETS, m=M, n=M)
                return z * 1e-9

            return jnp.sum(jax.lax.fori_loop(
                0, ITERS, body, jnp.ones((M,), jnp.float32)))
        return run

    for name, dtype in [("pair f32", jnp.float32),
                        ("pair bf16 stripes", jnp.bfloat16)]:
        fn = make_run(dtype)
        print(f"compiling {name}...", flush=True)
        float(fn(key))
        t0 = time.perf_counter()
        float(fn(key))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name}: {dt*1e3:.2f} ms/pair = {2*nnz/dt/1e9:.1f} Gnnz/s",
              flush=True)


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "kernels"
    ref_bandwidth()
    {"kernels": phase_kernels, "solve": phase_solve,
     "shared": phase_shared, "bf16": phase_bf16}[phase]()
