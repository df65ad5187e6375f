"""Headline benchmark: SpMV + SpMV-T throughput of the LSQR hot kernels on
one TPU chip, versus a serial-CPU CSR implementation of the same products
(the stand-in for the reference's serial Fortran COO loops,
/root/reference/src/lsqr.f90:168-172, 188-192 — the reference publishes no
throughput numbers of its own, SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Gnnz/s", "vs_baseline": N}

Matrix: banded, ~11M nnz (the BASELINE.json "large synthetic banded" config),
f32, DIA storage on TPU vs scipy CSR on the host CPU.

Methodology note: timing uses K data-dependent product pairs chained inside
one jit plus a host fetch — plain block_until_ready does not synchronize
through the axon relay and per-call dispatch would otherwise pollute the
numbers.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _build_problem(m=1_000_000, ndiag=11, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    offsets = tuple(range(-(ndiag // 2), ndiag // 2 + 1))
    data = rng.standard_normal((ndiag, m)).astype(dtype)
    return m, offsets, data


def bench_tpu(m, offsets, data, iters=50):
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.structured import dia_operator

    n = m
    A = dia_operator(m, n, offsets, data)
    nnz = A.data.shape[0] * m

    @jax.jit
    def run(x):
        def body(i, x):
            y = A.matvec(x)
            z = A.rmatvec(y)
            return z / jnp.max(jnp.abs(z))
        return jax.lax.fori_loop(0, iters, body, x)

    x0 = jnp.ones((n,), data.dtype)
    out = run(x0)
    float(jnp.sum(out))  # warm-up + sync
    t0 = time.perf_counter()
    out = run(x0)
    float(jnp.sum(out))  # host fetch forces completion through the relay
    dt_pair = (time.perf_counter() - t0) / iters
    return nnz, dt_pair


def bench_cpu_serial(m, offsets, data, iters=8):
    """scipy CSR products on the host CPU — the serial compiled-code
    baseline standing in for the Fortran reference's aprod loops."""
    import scipy.sparse

    S = scipy.sparse.dia_matrix((data, list(offsets)), shape=(m, m)).tocsr()
    St = S.T.tocsr()
    nnz = S.nnz
    x = np.ones(m, data.dtype)
    y = S @ x  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        y = S @ x
        z = St @ y
        x = z / np.abs(z).max()
    dt_pair = (time.perf_counter() - t0) / iters
    return nnz, dt_pair


def main():
    m, offsets, data = _build_problem()
    nnz_t, dt_t = bench_tpu(m, offsets, data)
    gnnz_tpu = 2 * nnz_t / dt_t / 1e9

    nnz_c, dt_c = bench_cpu_serial(m, offsets, data)
    gnnz_cpu = 2 * nnz_c / dt_c / 1e9

    print(
        json.dumps(
            {
                "metric": "spmv_pair_throughput_banded_11Mnnz_f32",
                "value": round(gnnz_tpu, 2),
                "unit": "Gnnz/s",
                "vs_baseline": round(gnnz_tpu / gnnz_cpu, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
