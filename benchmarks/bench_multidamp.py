"""Multi-damp sweep vs sequential solves at scale (TPU).

Measures the claim in lsqr_tpu/multidamp.py: a k-damp sweep shares the two
operator products per iteration, so its per-iteration cost approaches
(products + k * O(n) updates) instead of k * (products + O(n) updates).

Methodology per BENCHMARKS.md: data generated on device, timing by chaining
data-dependent iterations inside one jit and fetching a scalar, elementwise
bandwidth reference printed first (discard if < ~300 GB/s).

Run ON THE TPU (relay must be up):   python benchmarks/bench_multidamp.py
"""

import time

import jax
import jax.numpy as jnp

M = 4_000_000
NDIAG = 11
OFFSETS = tuple(range(-(NDIAG // 2), NDIAG // 2 + 1))
K = 8           # damp grid size
ITERS = 40      # fixed iteration count (itnlim-bound) for a clean A/B


def ref_bandwidth():
    x = jax.random.normal(jax.random.PRNGKey(9), (32 * 1024 * 1024,), jnp.float32)

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, 10, lambda i, x: x * 0.999 + 0.001, x)

    float(jnp.sum(chain(x)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(x)))
    dt = (time.perf_counter() - t0) / 10
    print(f"REF elementwise: {2 * x.size * 4 / dt / 1e9:.0f} GB/s", flush=True)


def main():
    from lsqr_tpu.multidamp import _md_segment
    from lsqr_tpu.ops.structured import dia_operator_device
    from lsqr_tpu.solver import _segment_fori

    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (NDIAG, M), jnp.float32)
    A = dia_operator_device(M, M, OFFSETS, data)
    b = jax.random.normal(jax.random.PRNGKey(1), (M,), jnp.float32)
    damps = jnp.logspace(-6, 0, K).astype(jnp.float32)
    z = jnp.zeros((), jnp.float32)
    kw = dict(itnlim=ITERS + 1, safe_norms=True, pair=True,
              scalar_dtype=None)

    ref_bandwidth()

    # --- multidamp: K damps, ITERS iterations, one jit ------------------
    def run_md():
        c = _md_segment(A, b, damps, z, z, z, None, seg_len=ITERS,
                        wantse=False, nconv=1, **kw)
        return float(jnp.sum(c.x))

    run_md()  # compile + warm
    t0 = time.perf_counter()
    run_md()
    dt_md = (time.perf_counter() - t0) / ITERS
    print(f"multidamp k={K}: {dt_md * 1e3:.3f} ms/iter "
          f"({dt_md * 1e3 / K:.3f} ms/iter/damp)", flush=True)

    # --- single solve, same segment runner -------------------------------
    def run_single(damp):
        c = _segment_fori(A, b, damp, z, z, z, None, seg_len=ITERS,
                          wantse=False, nconv=1, record_trace=False,
                          debug_log=False, fused=True, **kw)
        return float(jnp.sum(c.x))

    d0 = jnp.asarray(1e-3, jnp.float32)
    run_single(d0)
    t0 = time.perf_counter()
    run_single(d0)
    dt_1 = (time.perf_counter() - t0) / ITERS
    print(f"single solve:   {dt_1 * 1e3:.3f} ms/iter", flush=True)
    print(f"sweep speedup vs {K} sequential solves: "
          f"{K * dt_1 / dt_md:.2f}x", flush=True)


if __name__ == "__main__":
    main()
