"""Headline benchmark: SpMV + SpMV-T throughput of the LSQR hot kernels on
one TPU chip, versus a serial-CPU CSR implementation of the same products
(the stand-in for the reference's serial Fortran COO loops,
/root/reference/src/lsqr.f90:168-172, 188-192 — the reference publishes no
throughput numbers of its own, SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Gnnz/s", "vs_baseline": N}

Matrix: banded (11 diagonals), m = n = 8M => 88M nnz, f32, DIA storage on
TPU (Pallas double-buffered streaming kernel) vs scipy CSR on the host CPU.

Methodology notes (see BENCHMARKS.md):
- data is generated ON DEVICE (host->device bulk transfer is slow through
  the axon relay);
- timing chains K data-dependent product pairs inside one jit and fetches a
  scalar (block_until_ready does not synchronize through the relay).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

M = 8_000_000
NDIAG = 11
OFFSETS = tuple(range(-(NDIAG // 2), NDIAG // 2 + 1))


def relay_present(wait_s=900.0, poll_s=30.0):
    """The axon tunnel is an orchestrator-spawned child listening on
    127.0.0.1:8082-8117; when it is ABSENT every jax call (even
    jax.devices()) hangs forever — so gate on the PORT, not on jax
    (measured 2026-08-18: hours-long 'wedge' was simply no listener).
    Polls up to ``wait_s`` for the tunnel to appear."""
    import socket

    deadline = time.monotonic() + wait_s
    while True:
        for port in (8082, 8092, 8102, 8112):
            try:
                with socket.create_connection(("127.0.0.1", port), timeout=2):
                    return True
            except OSError:
                pass
        if time.monotonic() > deadline:
            return False
        print("relay_present: no tunnel listener yet; waiting",
              file=sys.stderr, flush=True)
        time.sleep(poll_s)


def relay_health(iters=10, wait_healthy_s=300.0, poll_s=60.0):
    """Chained 128MB elementwise bandwidth — the relay/chip occasionally
    enters a degraded state (~70 GB/s vs ~380-400 healthy; BENCHMARKS.md
    methodology). A degraded reading says nothing about the kernels, so
    poll (up to ``wait_healthy_s``) for recovery before measuring; if it
    never recovers, proceed anyway and report the health reading in the
    JSON so the headline number is attributable. (Measured 2026-08-17:
    the degraded state hits this jit elementwise chain ~5x but the Pallas
    DIA streaming kernels only ~10-15% — so a degraded reading mostly
    flags attribution, not an unusable measurement; the poll is kept
    short accordingly.)"""
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(9), (32 * 1024 * 1024,), jnp.float32)

    @jax.jit
    def chain(x):
        def body(i, x):
            return x * 0.999 + 0.001
        return jax.lax.fori_loop(0, iters, body, x)

    float(jnp.sum(chain(x)))  # compile + warm

    def measure():
        t0 = time.perf_counter()
        float(jnp.sum(chain(x)))
        dt = (time.perf_counter() - t0) / iters
        return 2 * x.size * 4 / dt / 1e9

    deadline = time.monotonic() + wait_healthy_s
    while True:
        gbs = measure()
        healthy = gbs > 300
        print(f"relay_health: elementwise {gbs:.0f} GB/s "
              f"({'OK' if healthy else 'DEGRADED — numbers not representative'})",
              file=sys.stderr, flush=True)
        if healthy or time.monotonic() > deadline:
            return gbs
        time.sleep(poll_s)


def bench_tpu(iters=30):
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.structured import dia_operator_device

    nnz = NDIAG * M
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(key):
        data = jax.random.normal(key, (NDIAG, M), jnp.float32)
        A = dia_operator_device(M, M, OFFSETS, data)

        def body(i, x):
            y = A.matvec(x)
            z = A.rmatvec(y)
            return z * 1e-9

        x = jax.lax.fori_loop(0, iters, body, jnp.ones((M,), jnp.float32))
        return jnp.sum(x)

    float(run(key))  # compile + warm
    t0 = time.perf_counter()
    float(run(key))  # host fetch forces completion through the relay
    return nnz, (time.perf_counter() - t0) / iters


def bench_tpu_pair(iters=30):
    """The fused product-pair kernel (ops/pallas_spmv.dia_pair): the same
    matvec+rmatvec pair per step, computed in ONE pass over the stripes —
    stripe HBM traffic is half of the separate-kernels path."""
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.pallas_spmv import dia_pair

    nnz = NDIAG * M
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(key):
        data = jax.random.normal(key, (NDIAG, M), jnp.float32)

        def body(i, v):
            u, z = dia_pair(data, v, v, 1.0, 0.0, offsets=OFFSETS, m=M, n=M)
            return z * 1e-9

        v = jax.lax.fori_loop(0, iters, body, jnp.ones((M,), jnp.float32))
        return jnp.sum(v)

    float(run(key))  # compile + warm
    t0 = time.perf_counter()
    float(run(key))
    return nnz, (time.perf_counter() - t0) / iters


def bench_cpu_serial(iters=4):
    """scipy CSR products on the host CPU — the serial compiled-code
    baseline standing in for the Fortran reference's aprod loops."""
    import scipy.sparse

    rng = np.random.default_rng(0)
    data = rng.standard_normal((NDIAG, M)).astype(np.float32)
    S = scipy.sparse.dia_matrix((data, list(OFFSETS)), shape=(M, M)).tocsr()
    St = S.T.tocsr()
    nnz = S.nnz
    x = np.ones(M, np.float32)
    y = S @ x  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        y = S @ x
        x = (St @ y) * np.float32(1e-9)
    dt_pair = (time.perf_counter() - t0) / iters
    return nnz, dt_pair


def main():
    # Watchdog: a wedged relay compile helper hangs remote compiles
    # INDEFINITELY (observed 2026-08-17: one failed compile wedged every
    # subsequent compile for hours). A hang here would record nothing for
    # the round — bound the whole TPU section and report honestly instead.
    import signal

    class _Timeout(Exception):
        pass

    def _alarm(signum, frame):
        raise _Timeout()

    signal.signal(signal.SIGALRM, _alarm)
    error = None
    relay_gbs = 0.0
    gnnz_sep = 0.0
    gnnz_pair = 0.0
    try:
        if not relay_present():
            raise RuntimeError("axon tunnel absent (no listener on 8082+)")
        signal.alarm(40 * 60)
        relay_gbs = relay_health()
        nnz_t, dt_t = bench_tpu()
        gnnz_sep = 2 * nnz_t / dt_t / 1e9
        nnz_p, dt_p = bench_tpu_pair()
        gnnz_pair = 2 * nnz_p / dt_p / 1e9
    except _Timeout:
        error = "tpu bench timed out (relay compile path wedged)"
    except Exception as e:  # report, don't hang the driver
        error = f"tpu bench failed: {type(e).__name__}: {e}"[:200]
    finally:
        signal.alarm(0)

    nnz_c, dt_c = bench_cpu_serial()
    gnnz_cpu = 2 * nnz_c / dt_c / 1e9

    gnnz_tpu = max(gnnz_sep, gnnz_pair)
    record = {
        "metric": "spmv_pair_throughput_banded_88Mnnz_f32",
        "value": round(gnnz_tpu, 2),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz_tpu / gnnz_cpu, 2),
        "relay_health_gbs": round(relay_gbs),
        # breakdown: the pair per step computed by separate matvec+rmatvec
        # kernels vs the fused dia_pair single stripe pass
        "separate_kernels_gnnz": round(gnnz_sep, 2),
        "pair_kernel_gnnz": round(gnnz_pair, 2),
    }
    if error is not None:
        record["error"] = error
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
