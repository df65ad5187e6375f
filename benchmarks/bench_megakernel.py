"""LSQR solve wall-clock: iteration megakernel vs the regular bounded-loop
solver, banded DIA at m = n = 500_000 (the dispatch-floor regime — the
~570 us/iteration fixed cost is the dominant term for the regular path at
this size; the megakernel amortizes it over K=32 iterations/dispatch).

Run alone on the real chip:
    nohup python benchmarks/bench_megakernel.py > /tmp/bench_mega.log 2>&1 &
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

M = 500_000
NDIAG = 11
OFFSETS = tuple(range(-(NDIAG // 2), NDIAG // 2 + 1))
ITNLIM = 192  # fixed work: atol=btol=0 -> runs to itnlim


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


def main():
    import lsqr_tpu as lt
    from lsqr_tpu.ops.megakernel import lsqr_megakernel, megakernel_supported
    from lsqr_tpu.ops.structured import dia_operator_device

    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (NDIAG, M), jnp.float32) + 4.0
    A = dia_operator_device(M, M, OFFSETS, data)
    b = jax.random.normal(jax.random.PRNGKey(1), (M,), jnp.float32)
    assert megakernel_supported(A), "megakernel must support this size"

    # regular path (bounded loop; fixed itnlim so both run identical work;
    # megakernel=False — lsqr() otherwise auto-routes to the megakernel here)
    res = lt.lsqr(A, b, atol=0.0, btol=0.0, conlim=0.0, itnlim=ITNLIM,
                  megakernel=False)
    float(res.rnorm)  # warm/compile
    t0 = time.perf_counter()
    res = lt.lsqr(A, b, atol=0.0, btol=0.0, conlim=0.0, itnlim=ITNLIM,
                  megakernel=False)
    r_reg = float(res.rnorm)
    dt_reg = time.perf_counter() - t0
    print(f"regular: {dt_reg*1e3:.1f} ms total, "
          f"{dt_reg/int(res.itn)*1e3:.3f} ms/iter (itn={int(res.itn)}, "
          f"rnorm={r_reg:.6e})", flush=True)

    resm = lsqr_megakernel(A, b, atol=0.0, btol=0.0, conlim=0.0,
                           itnlim=ITNLIM)
    float(resm.rnorm)
    t0 = time.perf_counter()
    resm = lsqr_megakernel(A, b, atol=0.0, btol=0.0, conlim=0.0,
                           itnlim=ITNLIM)
    r_meg = float(resm.rnorm)
    dt_meg = time.perf_counter() - t0
    print(f"megakernel: {dt_meg*1e3:.1f} ms total, "
          f"{dt_meg/int(resm.itn)*1e3:.3f} ms/iter (itn={int(resm.itn)}, "
          f"rnorm={r_meg:.6e})", flush=True)
    print(f"speedup: {dt_reg/dt_meg:.2f}x  "
          f"(rnorm rel diff {abs(r_reg-r_meg)/abs(r_reg):.2e})", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    health()
    main()
