"""Headline benchmark: SpMV + SpMV-T throughput of the LSQR hot kernels on
one TPU chip, versus a serial-CPU CSR implementation of the same products
(the stand-in for the reference's serial Fortran COO loops,
/root/reference/src/lsqr.f90:168-172, 188-192 — the reference publishes no
throughput numbers of its own, SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Gnnz/s", "vs_baseline": N}

Matrix: banded (11 diagonals), m = n = 2^23 = 8,388,608 => 92.3M nnz, f32.
TPU paths measured (fastest first, each banked independently):
  shared_pair  Pallas fused pair on SHARED stripes (one flat stripe array
               serves forward+adjoint; measured 97.1 Gnnz/s round 4)
  pair         Pallas fused pair on packed stripes (90.6 Gnnz/s round 4)
  separate     Pallas matvec + rmatvec kernels (75.8 Gnnz/s round 4)
  xla          blocked-XLA fused pair (the compile-helper-free fallback)
  xla_bf16     blocked-XLA with bf16 stripe storage (informational)
  solve        END-TO-END damped LSQR ms/iteration through the auto path

Size note (round 4): m = 8,388,608 (2^23, tile-aligned) replaces round 3's
m = 8,000,000 — the RAGGED-tile Mosaic program at 8e6 is what wedges the
relay's remote-compile helper (reproduced 2/2 at 8e6; 2^23 compiles in
6.6 s and 2^22/2^21/2^18 all compile in <5 s). Aligned sizes also match
how a user would shape a TPU problem.

Robustness (round-3 lesson: BENCH_r03 recorded 0.0 for the flagship Pallas
kernels after two attempts died compiling the ragged 8M program):
- the TPU section runs in a CHILD process; the parent kills the child's
  process group on budget expiry and prints the JSON from whatever stages
  completed (round-2 lesson: the driver's own timeout must never eat the
  JSON line);
- the child emits '@begin {stage,m}' BEFORE each compile and '@stage ...'
  after each measurement, so the parent knows exactly which (stage, size)
  wedged and passes it to the next attempt as POISONED;
- every Pallas stage walks DOWN a size ladder (2^23, 2^22, 2^21, 2^18),
  skipping poisoned rungs — a wedged compile at one size costs one attempt,
  not the stage; a number is banked at the largest size that compiles;
- Pallas stages run BEFORE the informational XLA stages (round-3 verdict:
  the fallback must never starve the flagship path of budget).

Methodology notes (see BENCHMARKS.md):
- data is generated ON DEVICE (host->device bulk transfer is slow through
  the axon relay);
- block_until_ready does not synchronize through the relay — timings chain
  K data-dependent steps and fetch a scalar;
- Pallas stages time eager chained dispatches of ONE compiled step (async
  dispatch pipelines them on-device); XLA stages chain inside a fori_loop.
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

# Hard wall-clock budgets (round-2 lesson: the driver killed a ~460s run;
# keep worst case — budget + kill grace + sleeps + startup — under ~6 min).
TPU_TOTAL_BUDGET_S = int(os.environ.get("LSQR_BENCH_TPU_BUDGET_S", "330"))
TPU_ATTEMPT_BUDGET_S = int(os.environ.get("LSQR_BENCH_TPU_ATTEMPT_S", "140"))
TPU_MAX_ATTEMPTS = 3

PALLAS_STAGES = ("shared_pair", "pair", "separate")
ALL_STAGES = ("health", "shared_pair", "pair", "zipf", "solve", "separate",
              "xla", "xla_bf16", "solve_bf16")

# WCOO general-sparsity stage shape: Zipf(1.1) columns, uniform rows
ZIPF_M = 1 << 21
ZIPF_N = 2048
ZIPF_NNZ = 10 * (1 << 20)


# --------------------------------------------------------------------------
# TPU child stages. '@begin' marks a compile about to start (the parent
# treats begun-but-unfinished (stage, m) pairs as poisoned); '@stage' banks
# a number as soon as it exists, so a later wedge never erases it.
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
    (97.1 vs 90.6 Gnnz/s packed, round 4)."""
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
    path (lsqr() on a DIA operator) — catches solver-loop regressions the
    kernel-pair stages cannot see. variant 'pallas' is the auto TPU route
    (Pallas pair, while-loop); 'xla' forces the compile-helper-free path."""
    import jax.numpy as jnp

    import lsqr_tpu as lt
    from lsqr_tpu.ops.structured import dia_operator_device

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


def child_main(poisoned):
    """Runs on the TPU; parent enforces the wall-clock budget. ``poisoned``
    is the set of "stage@m" strings a previous attempt began but never
    finished (wedged compiles) — plus "stage@done" once a stage is banked."""
    if not relay_present(wait_s=30.0):
        _emit("error", error="axon tunnel absent (no listener on 8082+)")
        return 0

    def skip(stage, m="done"):
        return f"{stage}@{m}" in poisoned

    if not skip("health"):
        try:
            _begin("health", 0)
            gbs = relay_health()
            _emit("health", gbs=round(gbs))
        except Exception as e:
            _emit("error", error=f"health: {type(e).__name__}: {e}"[:200])
            return 0

    pallas_fns = {"shared_pair": bench_shared_pair, "pair": bench_pair,
                  "separate": bench_separate}
    for stage in ("shared_pair", "pair"):
        if skip(stage):
            continue
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
    if not skip("zipf"):
        try:
            _begin("zipf", ZIPF_M)
            dt = bench_zipf()
            _emit("zipf", gnnz=round(2 * ZIPF_NNZ / dt / 1e9, 2), m=ZIPF_M)
        except Exception as e:
            _emit("error", error=f"zipf: {type(e).__name__}: {e}"[:200])

    # End-to-end solve: auto (Pallas while-loop) first, XLA fallback.
    if not skip("solve"):
        for variant in ("pallas", "xla"):
            if skip("solve", variant):
                continue
            try:
                _begin("solve", variant)
                dt = bench_solve(M, variant)
                # m echoes the @begin key (the variant) so the parent's
                # begun-marker bookkeeping clears on success
                _emit("solve", ms_iter=round(dt * 1e3, 2), path=variant,
                      m=variant)
            except Exception as e:
                _emit("error", error=f"solve@{variant}: {type(e).__name__}: {e}"[:200])
                continue
            break

    if not skip("separate"):
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

    # XLA stages: reliable, informational; run LAST so they can never
    # starve the flagship Pallas stages (round-3 verdict item 1).
    if not skip("xla"):
        try:
            _begin("xla", M)
            dt = bench_xla(M)
            _emit("xla", gnnz=round(2 * NNZ / dt / 1e9, 2), m=M)
        except Exception as e:
            _emit("error", error=f"xla: {type(e).__name__}: {e}"[:200])
    if not skip("xla_bf16"):
        try:
            _begin("xla_bf16", M)
            dt = bench_xla(M, storage_dtype="bfloat16")
            _emit("xla_bf16", gnnz=round(2 * NNZ / dt / 1e9, 2), m=M)
        except Exception as e:
            _emit("error", error=f"xla_bf16: {type(e).__name__}: {e}"[:200])
    # bf16-STORAGE solve ms/iter (informational: per-iter wins ~1.5x but
    # itn inflates 2.4x+ end-to-end — docs/precision.md round-4 table)
    if not skip("solve_bf16"):
        try:
            _begin("solve_bf16", M)
            dt = bench_solve(M, "xla", storage_dtype="bfloat16")
            _emit("solve_bf16", ms_iter=round(dt * 1e3, 2), m=M)
        except Exception as e:
            _emit("error", error=f"solve_bf16: {type(e).__name__}: {e}"[:200])
    return 0


# --------------------------------------------------------------------------
# Parent: CPU baseline + child supervision + the single JSON line.
# --------------------------------------------------------------------------

def bench_cpu_serial(iters=4):
    """scipy CSR products on the host CPU — the serial compiled-code
    baseline standing in for the Fortran reference's aprod loops."""
    import numpy as np
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
    return 2 * nnz / dt_pair / 1e9


def _ingest(out, stages, errors, begun):
    for line in out.decode(errors="replace").splitlines():
        if line.startswith("@begin "):
            rec = json.loads(line[len("@begin "):])
            begun.add(f"{rec['stage']}@{rec['m']}")
        elif line.startswith("@stage "):
            rec = json.loads(line[len("@stage "):])
            if rec["stage"] == "error":
                errors.append(rec["error"])
            else:
                stages[rec["stage"]] = rec
                begun.discard(f"{rec['stage']}@{rec.get('m', 0)}")


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
        _ingest(out, stages, errors, begun)
        return True, begun
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
        return False, begun


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
                zip(("ok", "begun"),
                    _run_attempt(poisoned | done, budget, stages, errors)))
        )
        th.start()
        if not cpu_done:
            # CPU baseline overlaps the first child's compile time.
            gnnz_cpu = bench_cpu_serial()
            cpu_done = True
        th.join()
        poisoned |= result.get("begun", set())  # wedged (stage, m) rungs
        print(
            f"attempt {attempt + 1}: banked={sorted(stages)} "
            f"poisoned={sorted(poisoned)} ({time.monotonic() - t0:.0f}s)",
            file=sys.stderr,
            flush=True,
        )
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
    record = {
        "metric": metric,
        "value": round(gnnz_tpu, 2),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz_tpu / gnnz_cpu, 2) if gnnz_cpu else 0.0,
        "relay_health_gbs": stages.get("health", {}).get("gbs", 0),
        "shared_pair_gnnz": g("shared_pair"),
        "pair_kernel_gnnz": g("pair"),
        "separate_kernels_gnnz": g("separate"),
        "xla_fallback_gnnz": g("xla"),
        "xla_bf16_storage_gnnz": g("xla_bf16"),
        "zipf_wcoo_pair_gnnz": g("zipf"),
        "solve_ms_iter": g("solve", "ms_iter"),
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
