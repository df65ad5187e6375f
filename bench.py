"""Headline benchmark: SpMV + SpMV-T throughput of the LSQR hot kernels on
one TPU chip, versus a serial-CPU CSR implementation of the same products
(the stand-in for the reference's serial Fortran COO loops,
/root/reference/src/lsqr.f90:168-172, 188-192 — the reference publishes no
throughput numbers of its own, SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Gnnz/s", "vs_baseline": N}

Matrix: banded (11 diagonals), m = n = 2^23 = 8,388,608 => 92.3M nnz, f32.
Stages (in child run order; each banked independently the moment it exists):
  health       chained 128MB elementwise XLA bandwidth (relay-state probe)
  roofline     in-place Pallas stream-copy ceiling, GB/s (round-5 item 2:
               makes rounds comparable across relay states and turns the
               flagship number into a fraction of the machine)
  shared_pair  Pallas fused pair on SHARED stripes (one flat stripe array
               serves forward+adjoint; 99.29 Gnnz/s round 4)
  pair         Pallas fused pair on packed stripes (92.1 Gnnz/s round 4)
  zipf         WCOO general-sparsity fused pair, 10.5M-nnz Zipf(1.1)
  zipf_wide    RWCOO hot/cold routed pair at n=65,536 (round-5 item 3:
               the wide-n unstructured path; 1.17 Gnnz/s vs the ~0.1
               COO floor, measured round 5)
  zdia         complex-banded ZDIA plane-split fused pair (round-5 item 4)
  separate     Pallas matvec + rmatvec kernels (two stripe passes)
  xla          blocked-XLA fused pair (the compile-helper-free fallback)
  xla_bf16     blocked-XLA with bf16 stripe storage (informational)
  solve        END-TO-END damped LSQR ms/iteration (round-5 item 1: runs
               AFTER the reliable stages, walks a (variant, m) ladder —
               pallas@2^23 first, xla and smaller sizes as fallbacks — so
               one wedged compile can never zero the record again)
  solve_bf16   bf16-storage solve ms/iter (informational)

Size note (round 4): m = 8,388,608 (2^23, tile-aligned) replaces round 3's
m = 8,000,000 — the RAGGED-tile Mosaic program at 8e6 is what wedges the
relay's remote-compile helper (reproduced 2/2 at 8e6; 2^23 compiles in
6.6 s and 2^22/2^21/2^18 all compile in <5 s). Aligned sizes also match
how a user would shape a TPU problem.

Robustness (round-3/4 lessons: BENCH_r03 recorded 0.0 for the flagship
kernels, BENCH_r04 recorded 0.0 for solve + 4 stages behind it):
- the TPU section runs in a CHILD process; the parent kills the child's
  process group on budget expiry and prints the JSON from whatever stages
  completed (round-2 lesson: the driver's own timeout must never eat the
  JSON line);
- the child emits '@begin {stage,m}' BEFORE each compile and '@stage ...'
  after each measurement, so the parent knows exactly which (stage, size)
  wedged and passes it to the next attempt as POISONED;
- every expensive stage walks DOWN a ladder (sizes for the kernels,
  (variant, size) rungs for the solve), skipping poisoned rungs — a wedged
  compile at one rung costs one attempt, not the stage;
- NEW round 5: the child knows its own deadline and HANDS OFF cleanly
  (exit 0) when the remaining budget cannot fit the next stage's estimated
  cost — the parent relaunches and the child resumes after the banked
  stages, so attempt kills (which poison a possibly-fine rung) only happen
  on genuine wedges;
- NEW round 5: the child enables the JAX persistent compilation cache
  (/tmp dir), so a stage that compiled in one attempt costs nothing to
  re-reach in the next.

Methodology notes (see BENCHMARKS.md):
- data is generated ON DEVICE (host->device bulk transfer is slow through
  the axon relay);
- block_until_ready does not synchronize through the relay — timings chain
  K data-dependent steps and fetch a scalar;
- Pallas stages time eager chained dispatches of ONE compiled step (async
  dispatch pipelines them on-device); XLA stages chain inside a fori_loop;
- the roofline stage chains INSIDE one dispatch (fori-of-pallas with
  input/output aliasing): eager dispatch through the relay costs ~4.3 ms
  each, which would swamp a 4.7 ms memory pass — measured round 5;
- complex64 arrays cannot cross the relay's host<->device transfer layer
  (UNIMPLEMENTED, measured round 5) — the zdia stage keeps all complex
  values jit-internal and chains on (real, imag) f32 pairs;
- the CPU baseline is min-of-3 (the round-3/4 denominator halved from
  host-load noise — VERDICT r4 weak #4; min-of-k pins it).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

M = 8_388_608  # 2^23: tile-aligned headline size (see size note above)
NDIAG = 11
OFFSETS = tuple(range(-(NDIAG // 2), NDIAG // 2 + 1))
NNZ = NDIAG * M

# Pallas walk-down ladder: largest first; all rungs compile-verified round 4.
SIZE_LADDER = (M, 4_194_304, 2_097_152, 262_144)

# solve (variant, m) ladder: the auto Pallas path at full size is the
# number that matters (2.22 ms/iter measured round 5, ~20 s compile); XLA
# and smaller sizes are fallbacks so SOME solve number always lands.
SOLVE_LADDER = (("pallas", M), ("xla", M), ("pallas", 2_097_152),
                ("xla", 2_097_152))

# Hard wall-clock budgets (round-2 lesson: the driver killed a ~460s run;
# keep worst case — budget + kill grace + sleeps + startup — under ~6 min).
TPU_TOTAL_BUDGET_S = int(os.environ.get("LSQR_BENCH_TPU_BUDGET_S", "330"))
TPU_ATTEMPT_BUDGET_S = int(os.environ.get("LSQR_BENCH_TPU_ATTEMPT_S", "140"))
TPU_MAX_ATTEMPTS = 4

PALLAS_STAGES = ("shared_pair", "pair", "separate")
ALL_STAGES = ("health", "roofline", "shared_pair", "pair", "zipf",
              "zdia", "separate", "xla", "xla_bf16", "solve",
              "solve_bf16", "zipf_wide")

# Conservative per-stage cost estimates (seconds, cold relay) for the
# clean-handoff decision: child stops BEFORE a stage it cannot finish.
STAGE_COST_S = {"health": 10, "roofline": 30, "shared_pair": 25, "pair": 25,
                "zipf": 45, "zipf_wide": 75, "zdia": 30, "separate": 30,
                "xla": 40, "xla_bf16": 40, "solve": 55, "solve_bf16": 40}

# WCOO general-sparsity stage shape: Zipf(1.1) columns, uniform rows
ZIPF_M = 1 << 21
ZIPF_N = 2048
ZIPF_NNZ = 10 * (1 << 20)

# RWCOO wide-n stage: same mass, n = 65,536 (the round-5 verdict target)
ZIPF_WIDE_N = 65536

# zdia stage shape: complex banded, 5 diagonals at m=2^21 (10.5M complex
# nnz); mirrors the round-4 in-session measurement (8.11 Gnnz/s).
ZDIA_M = 1 << 21
ZDIA_ND = 5
ZDIA_OFFS = tuple(range(-(ZDIA_ND // 2), ZDIA_ND // 2 + 1))

# roofline stage shape: 1 GB f32, 4 MB blocks (best of the round-5 sweep:
# 449-457 GB/s in-place vs ~819 GB/s v5e HBM peak paper number)
ROOF_ROWS, ROOF_COLS = 1024, 1 << 18
ROOF_BR, ROOF_BC = 16, 1 << 16
ROOF_K = 20


# --------------------------------------------------------------------------
# TPU child stages. '@begin' marks a compile about to start (the parent
# treats begun-but-unfinished (stage, m) pairs as poisoned); '@stage' banks
# a number as soon as it exists, so a later wedge never erases it;
# '@handoff' means the child stopped CLEANLY for lack of budget (nothing
# poisoned) and the parent should relaunch.
# --------------------------------------------------------------------------

def _emit(stage, **kv):
    print("@stage " + json.dumps({"stage": stage, **kv}), flush=True)


def _begin(stage, m):
    print("@begin " + json.dumps({"stage": stage, "m": m}), flush=True)


def relay_present(wait_s=45.0):
    """The axon tunnel is an orchestrator-spawned child listening on
    127.0.0.1:8082-8117; when it is ABSENT every jax call (even
    jax.devices()) hangs forever — gate on the PORT, not on jax."""
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
        time.sleep(5)


def relay_health(iters=10):
    """Single-shot chained 128MB elementwise bandwidth reading (no recovery
    polling — the budget belongs to the kernel measurements)."""
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(9), (32 * 1024 * 1024,), jnp.float32)

    @jax.jit
    def chain(x):
        def body(i, x):
            return x * 0.999 + 0.001
        return jax.lax.fori_loop(0, iters, body, x)

    float(jnp.sum(chain(x)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(chain(x)))
    dt = (time.perf_counter() - t0) / iters
    return 2 * x.size * 4 / dt / 1e9


def bench_roofline():
    """Measured streaming ceiling: an in-place Pallas stream-copy (read +
    write 1 GB) chained ROOF_K times inside ONE dispatch. input/output
    aliasing keeps XLA from inserting extra carry copies; fori-of-pallas
    costs one remote Mosaic compile (~10 s) but removes the ~4.3 ms/dispatch
    relay latency that caps eager chaining at ~460 GB/s equivalents. The
    flagship pair's byte model (stripes once + 4 vectors) divided by this
    number is `pair_pct_roofline` in the JSON. Round-5 measured: 449-457
    GB/s (~55% of the 819 GB/s v5e paper peak; the rest is the in-place
    read+write turnaround, not kernel inefficiency)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def _copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0000001

    def stream_copy(x):
        return pl.pallas_call(
            _copy_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(ROOF_ROWS // ROOF_BR, ROOF_COLS // ROOF_BC),
            in_specs=[pl.BlockSpec((ROOF_BR, ROOF_BC), lambda i, j: (i, j))],
            out_specs=pl.BlockSpec((ROOF_BR, ROOF_BC), lambda i, j: (i, j)),
            input_output_aliases={0: 0},
        )(x)

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, ROOF_K, lambda i, v: stream_copy(v), x)

    x = jax.random.normal(
        jax.random.PRNGKey(0), (ROOF_ROWS, ROOF_COLS), jnp.float32)
    float(jnp.sum(chain(x)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(chain(x)))
    dt = (time.perf_counter() - t0) / ROOF_K
    return 2 * ROOF_ROWS * ROOF_COLS * 4 / dt / 1e9


def _time_chained(step, v0, iters):
    """Time ``iters`` data-dependent eager dispatches of a jitted step
    (fori-of-pallas inflates the remote Mosaic compile; eager chaining
    pipelines on-device and slightly UNDERestimates kernel throughput)."""
    import time as _t

    import jax.numpy as jnp

    v = step(v0)
    float(jnp.sum(v))  # warm + sync
    t0 = _t.perf_counter()
    v = v0
    for _ in range(iters):
        v = step(v)
    float(jnp.sum(v))  # host fetch forces completion through the relay
    return (_t.perf_counter() - t0) / iters


def _stripe_data(m, dtype=None):
    import jax
    import jax.numpy as jnp

    d = jax.random.normal(jax.random.PRNGKey(0), (NDIAG, m), jnp.float32)
    return d if dtype is None else d.astype(dtype)


def bench_pair(m, iters=30):
    """Pallas fused product-pair kernel (ops/pallas_spmv.dia_pair): both
    bidiagonalization products (lsqr.f90:681-694) in ONE pass over the
    packed stripes. Stripes are a jit ARGUMENT, never a closure constant
    (a closed-over 350MB array embeds in the remote-compile request:
    HTTP 413 / wedge)."""
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.pallas_spmv import dia_pair

    offs = OFFSETS
    data = _stripe_data(m)

    @jax.jit
    def step(data, v):
        u, z = dia_pair(data, v, v, 1.0, 0.0, offsets=offs, m=m, n=m)
        return z * 1e-9

    return _time_chained(lambda v: step(data, v),
                         jnp.ones((m,), jnp.float32), iters)


def bench_shared_pair(m, iters=30):
    """Pallas fused pair on the SHARED-stripe layout (DIASharedOperator):
    one flat padded stripe array serves forward AND adjoint — half the
    operator HBM of the packed layout and the best measured throughput
    (99.29 vs 92.1 Gnnz/s packed, round 4)."""
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.structured import dia_shared_operator

    A = dia_shared_operator(m, m, OFFSETS, _stripe_data(m))
    y0 = jnp.zeros((m,), jnp.float32)

    @jax.jit
    def step(A, y0, v):
        u, z = A.fused_pair(y=y0, win=v, c1=1.0, c2=0.0)
        return z * 1e-9

    return _time_chained(lambda v: step(A, y0, v),
                         jnp.ones((m,), jnp.float32), iters)


def bench_separate(m, iters=30):
    """Separate Pallas matvec + rmatvec kernels (two stripe passes)."""
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.structured import dia_operator_device

    A = dia_operator_device(m, m, OFFSETS, _stripe_data(m))

    @jax.jit
    def step(A, x):
        return A.rmatvec(A.matvec(x)) * 1e-9

    return _time_chained(lambda x: step(A, x),
                         jnp.ones((m,), jnp.float32), iters)


def bench_zipf(iters=30):
    """WCOO fused pair on a 10.5M-nnz Zipf(1.1) general-sparsity matrix
    (round 4): the crossbar/MXU scatter-free kernels for unstructured
    patterns with small n (ops/pallas_wcoo.py). The COO segment-sum this
    replaces measures ~0.06-0.1 Gnnz/s on TPU. Throughput is on REAL
    nnz (pack padding ~1%)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.wcoo import wcoo_operator

    rng = np.random.default_rng(0)
    cz = rng.zipf(1.1, size=3 * ZIPF_NNZ) - 1
    cz = cz[cz < ZIPF_N][:ZIPF_NNZ].astype(np.int64)
    rows = np.sort(rng.integers(0, ZIPF_M, ZIPF_NNZ).astype(np.int64))
    vals = rng.standard_normal(ZIPF_NNZ).astype(np.float32)
    A = wcoo_operator(ZIPF_M, ZIPF_N, vals, rows, cz)
    y0 = jnp.zeros((ZIPF_M,), jnp.float32)

    @jax.jit
    def step(A_, y_, v):
        u, z = A_.fused_pair(y=y_, win=v, c1=1.0, c2=0.0)
        return z * 1e-9

    return _time_chained(lambda v: step(A, y0, v),
                         jnp.ones((ZIPF_N,), jnp.float32), iters)


def bench_zipf_wide(iters=16):
    """RWCOO hot/cold routed fused pair at n=65,536 on the same 10.5M-nnz
    Zipf(1.1) mass (round-5 item 3): the top-4096 columns by count stream
    through the compacted WCOO kernels (~86% of entries at this skew),
    the sparse remainder through the WWCOO wide-n kernels. The COO
    segment-sum floor this replaces is ~0.06-0.15 Gnnz/s."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.rwcoo import rwcoo_operator

    rng = np.random.default_rng(0)
    cz = rng.zipf(1.1, size=3 * ZIPF_NNZ) - 1
    cz = cz[cz < ZIPF_WIDE_N][:ZIPF_NNZ].astype(np.int64)
    rows = np.sort(rng.integers(0, ZIPF_M, ZIPF_NNZ).astype(np.int64))
    vals = rng.standard_normal(ZIPF_NNZ).astype(np.float32)
    A = rwcoo_operator(ZIPF_M, ZIPF_WIDE_N, vals, rows, cz)
    y0 = jnp.zeros((ZIPF_M,), jnp.float32)

    @jax.jit
    def step(A_, y_, v):
        u, z = A_.fused_pair(y=y_, win=v, c1=1.0, c2=0.0)
        return z * 1e-9

    return _time_chained(lambda v: step(A, y0, v),
                         jnp.ones((ZIPF_WIDE_N,), jnp.float32), iters)


def bench_zdia(iters=30):
    """Complex-banded fused pair: the plane-split ZDIA Pallas kernel
    (ops/zdia.py, ops/pallas_spmv.zdia_pair) — all four real stripe-plane
    products of one complex bidiagonalization step in a single pass.
    Complex64 cannot cross the relay transfer layer (UNIMPLEMENTED,
    round 5), so the operator is BUILT inside jit from two real planes and
    the chain carries (re, im) f32 vectors; every host fetch is real.
    Throughput counts complex nnz (one complex entry = one stored value
    pair), matching how BENCHMARKS.md reports the 8.11 Gnnz/s round-4
    in-session number."""
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.zdia import zdia_operator_device

    m = ZDIA_M
    dr = jax.random.normal(jax.random.PRNGKey(0), (ZDIA_ND, m), jnp.float32)
    di = jax.random.normal(jax.random.PRNGKey(1), (ZDIA_ND, m), jnp.float32)
    A = jax.jit(lambda dr, di: zdia_operator_device(
        m, m, ZDIA_OFFS, jax.lax.complex(dr, di)))(dr, di)

    @jax.jit
    def step(A, vr, vi):
        v = jax.lax.complex(vr, vi)
        y0 = jnp.zeros((m,), jnp.complex64)
        u, z = A.fused_pair(y=y0, win=v, c1=1.0, c2=0.0)
        return jnp.real(z) * 1e-9, jnp.imag(z) * 1e-9

    vr = jnp.ones((m,), jnp.float32)
    vi = jnp.full((m,), 0.5, jnp.float32)
    r, i = step(A, vr, vi)
    float(jnp.sum(r))  # compile + warm
    t0 = time.perf_counter()
    r, i = vr, vi
    for _ in range(iters):
        r, i = step(A, r, i)
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / iters


def bench_xla(m, iters=30, storage_dtype=None):
    """Blocked-XLA DIA path: never touches the Mosaic compile helper.
    f32 uses the blocked XLA PAIR; bf16 storage uses the separate blocked
    products (measured better than the bf16 pair — BENCHMARKS.md r3)."""
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.structured import dia_operator_device, dia_pair_xla

    key = jax.random.PRNGKey(0)
    offs = OFFSETS

    if storage_dtype is None:
        @jax.jit
        def run(key):
            data = jax.random.normal(key, (NDIAG, m), jnp.float32)

            def body(i, v):
                u, z = dia_pair_xla(data, v, v, 1.0, 0.0,
                                    offsets=offs, m=m, n=m)
                return z * 1e-9

            v = jax.lax.fori_loop(0, iters, body, jnp.ones((m,), jnp.float32))
            return jnp.sum(v)
    else:
        @jax.jit
        def run(key):
            data = jax.random.normal(key, (NDIAG, m), jnp.float32)
            A = dia_operator_device(m, m, offs, data, use_pallas=False,
                                    storage_dtype=storage_dtype)

            def body(i, x):
                return A.rmatvec(A.matvec(x)) * 1e-9

            x = jax.lax.fori_loop(0, iters, body, jnp.ones((m,), jnp.float32))
            return jnp.sum(x)

    float(run(key))
    t0 = time.perf_counter()
    float(run(key))
    return (time.perf_counter() - t0) / iters


def bench_solve(m, variant, itn=64, storage_dtype=None):
    """End-to-end damped LSQR solve, ms/iteration, through the real user
    path (lsqr() on the auto-routed banded operator) — catches
    solver-loop regressions the kernel-pair stages cannot see. variant
    'pallas' is the auto TPU route: the SHARED-stripe layout (the f32
    auto_operator default since round 5) with the carry pair inside the
    while-loop — 1.38 ms/iter measured at 2^23 (the packed layout runs
    1.59-1.63). 'xla' forces the compile-helper-free packed path
    (compile ~9 s, 8.4 ms/iter). This times the loop the reference runs
    at lsqr.f90:673-852."""
    import jax.numpy as jnp

    import lsqr_tpu as lt
    from lsqr_tpu.ops.structured import (dia_operator_device,
                                         dia_shared_operator)

    if variant == "pallas" and storage_dtype is None:
        A = dia_shared_operator(m, m, OFFSETS, _stripe_data(m))
    else:
        use_pallas = None if variant == "pallas" else False
        A = dia_operator_device(m, m, OFFSETS, _stripe_data(m),
                                use_pallas=use_pallas,
                                storage_dtype=storage_dtype)
    b = jnp.ones((m,), jnp.float32)
    kw = dict(itnlim=itn, atol=0.0, btol=0.0, conlim=0.0)
    res = lt.lsqr(A, b, 0.01, **kw)  # compile + warm
    float(jnp.sum(res.x))
    t0 = time.perf_counter()
    res = lt.lsqr(A, b, 0.01, **kw)
    float(jnp.sum(res.x))
    return (time.perf_counter() - t0) / int(res.itn)


def child_main(args):
    """Runs on the TPU; parent enforces the wall-clock budget. ``args``
    carries the poison set: "stage@m" strings a previous attempt began but
    never finished (wedged compiles), plus "stage@done" once a stage is
    banked. The child also watches its own deadline (budget passed via
    env) and exits CLEANLY before starting a stage it cannot finish."""
    deadline = time.monotonic() + float(
        os.environ.get("LSQR_BENCH_CHILD_BUDGET_S", "1e9"))
    poisoned = set(args)

    if not relay_present(wait_s=30.0):
        _emit("error", error="axon tunnel absent (no listener on 8082+)")
        return 0

    def skip(stage, m="done"):
        return f"{stage}@{m}" in poisoned

    def fits(stage):
        if time.monotonic() + STAGE_COST_S[stage] <= deadline:
            return True
        print(f"@handoff {stage}", flush=True)
        return False

    if not skip("health") and not skip("health", 0):
        if not fits("health"):
            return 0
        try:
            _begin("health", 0)
            gbs = relay_health()
            _emit("health", gbs=round(gbs))
        except Exception as e:
            _emit("error", error=f"health: {type(e).__name__}: {e}"[:200])
            return 0

    if not skip("roofline") and not skip("roofline", ROOF_ROWS * ROOF_COLS):
        if not fits("roofline"):
            return 0
        try:
            _begin("roofline", ROOF_ROWS * ROOF_COLS)
            gbs = bench_roofline()
            _emit("roofline", gbs=round(gbs), m=ROOF_ROWS * ROOF_COLS)
        except Exception as e:
            _emit("error", error=f"roofline: {type(e).__name__}: {e}"[:200])

    pallas_fns = {"shared_pair": bench_shared_pair, "pair": bench_pair,
                  "separate": bench_separate}
    for stage in ("shared_pair", "pair"):
        if skip(stage):
            continue
        if not fits(stage):
            return 0
        for m in SIZE_LADDER:
            if skip(stage, m):
                continue
            try:
                _begin(stage, m)
                dt = pallas_fns[stage](m)
                _emit(stage, gnnz=round(2 * NDIAG * m / dt / 1e9, 2), m=m)
            except Exception as e:
                _emit("error", error=f"{stage}@{m}: {type(e).__name__}: {e}"[:200])
                continue
            break

    # General-sparsity WCOO pair (round 4; fixed shape, no ladder).
    if not skip("zipf") and not skip("zipf", ZIPF_M):
        if not fits("zipf"):
            return 0
        try:
            _begin("zipf", ZIPF_M)
            dt = bench_zipf()
            _emit("zipf", gnnz=round(2 * ZIPF_NNZ / dt / 1e9, 2), m=ZIPF_M)
        except Exception as e:
            _emit("error", error=f"zipf: {type(e).__name__}: {e}"[:200])

    # Complex-banded ZDIA pair (round-5 item 4; fixed shape).
    if not skip("zdia") and not skip("zdia", ZDIA_M):
        if not fits("zdia"):
            return 0
        try:
            _begin("zdia", ZDIA_M)
            dt = bench_zdia()
            _emit("zdia", gnnz=round(2 * ZDIA_ND * ZDIA_M / dt / 1e9, 2),
                  m=ZDIA_M)
        except Exception as e:
            _emit("error", error=f"zdia: {type(e).__name__}: {e}"[:200])

    if not skip("separate"):
        if not fits("separate"):
            return 0
        for m in SIZE_LADDER:
            if skip("separate", m):
                continue
            try:
                _begin("separate", m)
                dt = bench_separate(m)
                _emit("separate", gnnz=round(2 * NDIAG * m / dt / 1e9, 2), m=m)
            except Exception as e:
                _emit("error", error=f"separate@{m}: {type(e).__name__}: {e}"[:200])
                continue
            break

    # XLA stages: reliable, informational; before the solve ladder so a
    # solve wedge can never zero them (round-4 verdict item 1).
    if not skip("xla"):
        if not fits("xla"):
            return 0
        for m in (M, 2_097_152):
            if skip("xla", m):
                continue
            try:
                _begin("xla", m)
                dt = bench_xla(m)
                _emit("xla", gnnz=round(2 * NDIAG * m / dt / 1e9, 2), m=m)
            except Exception as e:
                _emit("error", error=f"xla@{m}: {type(e).__name__}: {e}"[:200])
                continue
            break
    if not skip("xla_bf16"):
        if not fits("xla_bf16"):
            return 0
        for m in (M, 2_097_152):
            if skip("xla_bf16", m):
                continue
            try:
                _begin("xla_bf16", m)
                dt = bench_xla(m, storage_dtype="bfloat16")
                _emit("xla_bf16", gnnz=round(2 * NDIAG * m / dt / 1e9, 2), m=m)
            except Exception as e:
                _emit("error",
                      error=f"xla_bf16@{m}: {type(e).__name__}: {e}"[:200])
                continue
            break

    # End-to-end solve: (variant, m) ladder, LAST among the f32 stages so
    # a wedged compile only ever costs the solve itself (round-5 item 1).
    if not skip("solve"):
        for variant, m in SOLVE_LADDER:
            tag = f"{variant}-{m}"
            if skip("solve", tag):
                continue
            if not fits("solve"):
                return 0
            try:
                _begin("solve", tag)
                dt = bench_solve(m, variant)
                # m echoes the @begin key (the rung tag) so the parent's
                # begun-marker bookkeeping clears on success
                _emit("solve", ms_iter=round(dt * 1e3, 2), path=variant,
                      solve_m=m, m=tag)
            except Exception as e:
                _emit("error",
                      error=f"solve@{tag}: {type(e).__name__}: {e}"[:200])
                continue
            break

    # bf16-STORAGE solve ms/iter (informational: per-iter wins ~1.5x but
    # itn inflates 2.4x+ end-to-end — docs/precision.md round-4 table)
    if not skip("solve_bf16"):
        if not fits("solve_bf16"):
            return 0
        for m in (M, 2_097_152):
            if skip("solve_bf16", m):
                continue
            try:
                _begin("solve_bf16", m)
                dt = bench_solve(m, "xla", storage_dtype="bfloat16")
                _emit("solve_bf16", ms_iter=round(dt * 1e3, 2), m=m)
            except Exception as e:
                _emit("error",
                      error=f"solve_bf16@{m}: {type(e).__name__}: {e}"[:200])
                continue
            break

    # Wide-n RWCOO pair (round-5 item 3; fixed shape).
    if not skip("zipf_wide") and not skip("zipf_wide", ZIPF_WIDE_N):
        if not fits("zipf_wide"):
            return 0
        try:
            _begin("zipf_wide", ZIPF_WIDE_N)
            dt = bench_zipf_wide()
            _emit("zipf_wide", gnnz=round(2 * ZIPF_NNZ / dt / 1e9, 2),
                  m=ZIPF_WIDE_N)
        except Exception as e:
            _emit("error", error=f"zipf_wide: {type(e).__name__}: {e}"[:200])
    return 0


# --------------------------------------------------------------------------
# Parent: CPU baseline + child supervision + the single JSON line.
# --------------------------------------------------------------------------

def bench_cpu_serial(iters=4, reps=3):
    """scipy CSR products on the host CPU — the serial compiled-code
    baseline standing in for the Fortran reference's aprod loops.
    min-of-``reps`` timing: the raw denominator halved between rounds 3
    and 4 from host load (VERDICT r4 weak #4); best-of-k is the standard
    pin against competing load."""
    import numpy as np
    import scipy.sparse

    rng = np.random.default_rng(0)
    data = rng.standard_normal((NDIAG, M)).astype(np.float32)
    S = scipy.sparse.dia_matrix((data, list(OFFSETS)), shape=(M, M)).tocsr()
    St = S.T.tocsr()
    nnz = S.nnz
    x = np.ones(M, np.float32)
    y = S @ x  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = S @ x
            x = (St @ y) * np.float32(1e-9)
        best = min(best, (time.perf_counter() - t0) / iters)
    return 2 * nnz / best / 1e9


def _ingest(out, stages, errors, begun):
    handoff = False
    for line in out.decode(errors="replace").splitlines():
        if line.startswith("@begin "):
            rec = json.loads(line[len("@begin "):])
            begun.add(f"{rec['stage']}@{rec['m']}")
        elif line.startswith("@handoff"):
            handoff = True
        elif line.startswith("@stage "):
            rec = json.loads(line[len("@stage "):])
            if rec["stage"] == "error":
                errors.append(rec["error"])
            else:
                stages[rec["stage"]] = rec
                begun.discard(f"{rec['stage']}@{rec.get('m', 0)}")
    return handoff


def _run_attempt(poisoned, budget_s, stages, errors):
    env = dict(os.environ)
    orig = env.pop("_LSQR_BENCH_ORIG_PLATFORMS", "")
    env.pop("_LSQR_BENCH_REEXEC", None)
    if orig:
        env["JAX_PLATFORMS"] = orig
    else:
        env.pop("JAX_PLATFORMS", None)
    pool = env.pop("_LSQR_BENCH_ORIG_POOL_IPS", "")
    if pool:
        env["PALLAS_AXON_POOL_IPS"] = pool
    else:
        env.pop("PALLAS_AXON_POOL_IPS", None)
    # Persistent compile cache: a stage compiled in attempt k is free in
    # attempt k+1 (cache errors are warnings, never fatal).
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lsqr_bench_jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    # Child deadline for the clean handoff (leave margin for startup).
    env["LSQR_BENCH_CHILD_BUDGET_S"] = str(max(20.0, budget_s - 8.0))
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--tpu-child"]
        + sorted(poisoned),
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # killable as a group even mid-compile
        cwd=os.path.dirname(os.path.abspath(__file__)),
        env=env,
    )
    begun = set()
    try:
        out, _ = child.communicate(timeout=budget_s)
        handoff = _ingest(out, stages, errors, begun)
        # clean exit: anything begun-but-unbanked DID wedge (the stage
        # loop moved on after an in-child failure) — poison it; a handoff
        # line just means "relaunch me", nothing extra poisoned.
        return True, begun, handoff
    except subprocess.TimeoutExpired:
        # TERM first (lets the relay session close cleanly), then KILL.
        for sig, grace in ((signal.SIGTERM, 5), (signal.SIGKILL, 5)):
            try:
                os.killpg(child.pid, sig)
            except OSError:
                pass
            try:
                out, _ = child.communicate(timeout=grace)
                break
            except subprocess.TimeoutExpired:
                out = b""
        _ingest(out, stages, errors, begun)
        errors.append(f"attempt exceeded {budget_s}s (killed)")
        return False, begun, False


def parent_main():
    # The session presets JAX_PLATFORMS=axon and a sitecustomize imports jax
    # at interpreter startup — so THIS parent process may already hold a
    # tunnel session, and "a second concurrent TPU process can block on the
    # tunnel" (verify skill). Re-exec once with JAX_PLATFORMS=cpu so only
    # the child ever talks to the TPU; pass the original platform through.
    if os.environ.get("_LSQR_BENCH_REEXEC") != "1":
        env = dict(os.environ)
        env["_LSQR_BENCH_ORIG_PLATFORMS"] = env.get("JAX_PLATFORMS", "")
        env["JAX_PLATFORMS"] = "cpu"
        # sitecustomize registers the axon PJRT plugin whenever
        # PALLAS_AXON_POOL_IPS is set (and forces the axon platform even
        # over JAX_PLATFORMS=cpu — measured); blank it so the parent never
        # dials the tunnel, and stash it for the child.
        env["_LSQR_BENCH_ORIG_POOL_IPS"] = env.get("PALLAS_AXON_POOL_IPS", "")
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["_LSQR_BENCH_REEXEC"] = "1"
        os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)

    stages = {}
    errors = []
    poisoned = set()
    deadline = time.monotonic() + TPU_TOTAL_BUDGET_S
    cpu_done = False
    gnnz_cpu = 0.0
    for attempt in range(TPU_MAX_ATTEMPTS):
        done = {f"{s}@done" for s in stages}
        if len(stages) >= len(ALL_STAGES):
            break
        budget = min(TPU_ATTEMPT_BUDGET_S, deadline - time.monotonic())
        if budget < 30:
            break
        t0 = time.monotonic()
        import threading

        result = {}
        th = threading.Thread(
            target=lambda: result.update(
                zip(("ok", "begun", "handoff"),
                    _run_attempt(poisoned | done, budget, stages, errors)))
        )
        th.start()
        if not cpu_done:
            # CPU baseline overlaps the first child's compile time.
            gnnz_cpu = bench_cpu_serial()
            cpu_done = True
        th.join()
        n_before = len(done)
        poisoned |= result.get("begun", set())  # wedged (stage, m) rungs
        print(
            f"attempt {attempt + 1}: banked={sorted(stages)} "
            f"poisoned={sorted(poisoned)} "
            f"handoff={bool(result.get('handoff'))} "
            f"({time.monotonic() - t0:.0f}s)",
            file=sys.stderr,
            flush=True,
        )
        if (result.get("ok") and not result.get("handoff")
                and not result.get("begun") and len(stages) == n_before):
            break  # clean exit, no progress, no handoff request: stop
        if not result.get("ok") and attempt + 1 < TPU_MAX_ATTEMPTS:
            time.sleep(15)  # give the tunnel a moment to drop the dead session
    if not cpu_done:
        gnnz_cpu = bench_cpu_serial()

    def g(stage, field="gnnz"):
        return stages.get(stage, {}).get(field, 0.0)

    def at_full(stage):
        return stages.get(stage, {}).get("m", 0) == M

    # Headline: best FULL-SIZE pair-class number (any path). If nothing ran
    # at full size, fall back to the largest-size Pallas number and name
    # the metric for the size actually measured (never report a small-m
    # reading under the 92M-nnz label).
    full = [g(s) for s in ("shared_pair", "pair", "separate", "xla")
            if at_full(s)]
    if full:
        gnnz_tpu, m_head = max(full), M
    else:
        cands = [(g(s), stages.get(s, {}).get("m", 0))
                 for s in ("shared_pair", "pair", "separate", "xla")
                 if s in stages]
        gnnz_tpu, m_head = max(cands) if cands else (0.0, M)
    metric = f"spmv_pair_throughput_banded_{NDIAG * m_head // 10**6}Mnnz_f32"

    # Roofline fraction of the flagship pair: byte model = stripes read
    # once (NDIAG*m*4) + v,y read + u,z written (4 vectors * m * 4) per
    # fused pair; the denominators are both measured THIS round, so the
    # fraction is comparable across relay states (round-5 item 2).
    roofline_gbs = stages.get("roofline", {}).get("gbs", 0)
    pair_pct = 0.0
    if roofline_gbs and gnnz_tpu:
        pair_gbs = gnnz_tpu * 1e9 / (2 * NDIAG) * (NDIAG + 4) * 4 / 1e9
        pair_pct = round(100 * pair_gbs / roofline_gbs, 1)
    record = {
        "metric": metric,
        "value": round(gnnz_tpu, 2),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz_tpu / gnnz_cpu, 2) if gnnz_cpu else 0.0,
        "relay_health_gbs": stages.get("health", {}).get("gbs", 0),
        "roofline_gbs": roofline_gbs,
        "pair_pct_roofline": pair_pct,
        "shared_pair_gnnz": g("shared_pair"),
        "pair_kernel_gnnz": g("pair"),
        "separate_kernels_gnnz": g("separate"),
        "xla_fallback_gnnz": g("xla"),
        "xla_bf16_storage_gnnz": g("xla_bf16"),
        "zipf_wcoo_pair_gnnz": g("zipf"),
        "zipf_wide_rwcoo_pair_gnnz": g("zipf_wide"),
        "zdia_pair_gnnz": g("zdia"),
        "solve_ms_iter": g("solve", "ms_iter"),
        "solve_m": stages.get("solve", {}).get("solve_m", 0),
        "solve_bf16_ms_iter": g("solve_bf16", "ms_iter"),
        "solve_path": stages.get("solve", {}).get("path", ""),
        "cpu_baseline_gnnz": round(gnnz_cpu, 2),
    }
    for s in PALLAS_STAGES:  # record walk-down sizes when not at full m
        if s in stages and not at_full(s):
            record[f"{s}_m"] = stages[s]["m"]
    if errors:
        record["error"] = "; ".join(errors)[:300]
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    if "--tpu-child" in sys.argv:
        i = sys.argv.index("--tpu-child")
        sys.exit(child_main(set(sys.argv[i + 1:])))
    sys.exit(parent_main())
