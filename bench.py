"""Headline benchmark: SpMV + SpMV-T throughput of the LSQR hot kernels on
one TPU chip, versus a serial-CPU CSR implementation of the same products
(the stand-in for the reference's serial Fortran COO loops,
/root/reference/src/lsqr.f90:168-172, 188-192 — the reference publishes no
throughput numbers of its own, SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Gnnz/s", "vs_baseline": N}

Matrix: banded (11 diagonals), m = n = 8M => 88M nnz, f32, DIA storage on
TPU (Pallas fused product-pair kernel / double-buffered streaming kernels)
vs scipy CSR on the host CPU.

Robustness (learned round 2, where the run was killed by the driver's
timeout before the JSON line printed, BENCH_r02.json rc=124): the entire
TPU section runs in a CHILD process with a hard wall-clock budget; the
parent kills the child's process group on expiry and prints the JSON line
from whatever stages completed. A wedged relay compile path or a degraded
link can therefore cost at most TPU_BUDGET_S seconds, never the round's
benchmark record.

Methodology notes (see BENCHMARKS.md):
- data is generated ON DEVICE (host->device bulk transfer is slow through
  the axon relay);
- timing chains K data-dependent product pairs inside one jit and fetches a
  scalar (block_until_ready does not synchronize through the relay);
- a degraded relay state (~70-90 GB/s elementwise vs ~380-400 healthy) hits
  jit elementwise chains ~5x but the Pallas DIA streaming kernels only
  ~10-15%, so a degraded reading mostly flags attribution; the health GB/s
  is reported in the JSON either way.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

M = 8_000_000
NDIAG = 11
OFFSETS = tuple(range(-(NDIAG // 2), NDIAG // 2 + 1))
NNZ = NDIAG * M

# Hard wall-clock budgets. The driver's own timeout killed round 2's run;
# stay comfortably inside plausible driver limits. The relay wedges
# INTERMITTENTLY (measured 2026-08-19: the identical first device op
# completes in 5s or hangs >300s, alternating unpredictably), so the parent
# makes several shorter attempts rather than one long one — a retry usually
# lands in a working window.
# Round 2's run was killed by the driver somewhere in the 400-460s range;
# keep the WORST case (budget + attempt kill grace + inter-attempt sleeps +
# startup) under ~6.5 minutes so the JSON line always prints first.
TPU_TOTAL_BUDGET_S = int(os.environ.get("LSQR_BENCH_TPU_BUDGET_S", "330"))
TPU_ATTEMPT_BUDGET_S = int(os.environ.get("LSQR_BENCH_TPU_ATTEMPT_S", "140"))
TPU_MAX_ATTEMPTS = 3


# --------------------------------------------------------------------------
# TPU child stages. Each prints one '@stage {json}' line as soon as it has a
# number, so the parent keeps partial results even if a later stage wedges.
# --------------------------------------------------------------------------

def _emit(stage, **kv):
    print("@stage " + json.dumps({"stage": stage, **kv}), flush=True)


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
    """Time ``iters`` data-dependent calls of a jitted single step.

    Measured 2026-08-19: wrapping Pallas kernels in a lax.fori_loop inflates
    the remote (Mosaic) compile ~8x (66s vs 8s at m=262k) and at m >= 1M the
    compile helper gets OOM-SIGKILLed — so the Pallas stages compile ONE
    step and time eager chained dispatches instead (async dispatch pipelines
    them on-device; the relay's per-dispatch cost makes this a slight
    UNDERestimate of kernel throughput)."""
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


def bench_tpu_pair(iters=30):
    """The fused product-pair kernel (ops/pallas_spmv.dia_pair): the
    matvec+rmatvec pair per step computed in ONE pass over the stripes —
    stripe HBM traffic is half of the separate-kernels path.

    The stripes are a jit ARGUMENT, never a closure constant: a closed-over
    352MB array gets EMBEDDED in the remote-compile request and the relay
    rejects it (HTTP 413 'length limit exceeded') or wedges buffering it —
    the root cause behind most of the 2026-08-19 compile hangs."""
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.pallas_spmv import dia_pair

    data = jax.random.normal(jax.random.PRNGKey(0), (NDIAG, M), jnp.float32)

    @jax.jit
    def step(data, v):
        u, z = dia_pair(data, v, v, 1.0, 0.0, offsets=OFFSETS, m=M, n=M)
        return z * 1e-9

    return _time_chained(lambda v: step(data, v),
                         jnp.ones((M,), jnp.float32), iters)


def bench_tpu_separate(iters=30):
    """Separate Pallas matvec + rmatvec kernels (two stripe passes).
    The operator is a jit argument (pytree), not a closure constant —
    see bench_tpu_pair."""
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.structured import dia_operator_device

    data = jax.random.normal(jax.random.PRNGKey(0), (NDIAG, M), jnp.float32)
    A = dia_operator_device(M, M, OFFSETS, data)

    @jax.jit
    def step(A, x):
        return A.rmatvec(A.matvec(x)) * 1e-9

    return _time_chained(lambda x: step(A, x),
                         jnp.ones((M,), jnp.float32), iters)


def bench_tpu_xla(iters=30, storage_dtype=None):
    """Blocked-XLA DIA path: the reliable path that never touches the
    (fragile) Mosaic compile helper. f32 uses the blocked XLA PAIR (one
    pass over each stripe block for both products — 21.4 Gnnz/s at the
    degraded-relay ceiling, BENCHMARKS.md round 3); bf16 storage uses the
    separate blocked products (measured better than the bf16 pair:
    31.1 vs 28.5)."""
    import jax
    import jax.numpy as jnp

    from lsqr_tpu.ops.structured import dia_operator_device, dia_pair_xla

    key = jax.random.PRNGKey(0)

    if storage_dtype is None:
        @jax.jit
        def run(key):
            data = jax.random.normal(key, (NDIAG, M), jnp.float32)

            def body(i, v):
                u, z = dia_pair_xla(data, v, v, 1.0, 0.0,
                                    offsets=OFFSETS, m=M, n=M)
                return z * 1e-9

            v = jax.lax.fori_loop(0, iters, body, jnp.ones((M,), jnp.float32))
            return jnp.sum(v)
    else:
        @jax.jit
        def run(key):
            data = jax.random.normal(key, (NDIAG, M), jnp.float32)
            A = dia_operator_device(M, M, OFFSETS, data, use_pallas=False,
                                    storage_dtype=storage_dtype)

            def body(i, x):
                return A.rmatvec(A.matvec(x)) * 1e-9

            x = jax.lax.fori_loop(0, iters, body, jnp.ones((M,), jnp.float32))
            return jnp.sum(x)

    float(run(key))
    t0 = time.perf_counter()
    float(run(key))
    return (time.perf_counter() - t0) / iters


def child_main(done):
    """Runs on the TPU; parent enforces the wall-clock budget. ``done`` is
    the set of stage names already measured by a previous attempt."""
    if not relay_present(wait_s=30.0):
        _emit("error", error="axon tunnel absent (no listener on 8082+)")
        return 0
    if "health" not in done:
        try:
            gbs = relay_health()
            _emit("health", gbs=round(gbs))
        except Exception as e:
            _emit("error", error=f"health: {type(e).__name__}: {e}"[:200])
            return 0
    # XLA fallback first: it avoids the (fragile) Mosaic remote-compile
    # helper entirely, so SOME real kernel number is banked before the
    # Pallas stages risk a wedge.
    if "xla" not in done:
        try:
            dt = bench_tpu_xla()
            _emit("xla", gnnz=round(2 * NNZ / dt / 1e9, 2))
        except Exception as e:
            _emit("error", error=f"xla: {type(e).__name__}: {e}"[:200])
    if "xla_bf16" not in done:
        # informational (bf16 matrix storage is a different precision mode,
        # so it does NOT feed the f32 headline value)
        try:
            dt = bench_tpu_xla(storage_dtype="bfloat16")
            _emit("xla_bf16", gnnz=round(2 * NNZ / dt / 1e9, 2))
        except Exception as e:
            _emit("error", error=f"xla_bf16: {type(e).__name__}: {e}"[:200])
    if "pair" not in done:
        try:
            dt = bench_tpu_pair()
            _emit("pair", gnnz=round(2 * NNZ / dt / 1e9, 2))
        except Exception as e:
            _emit("error", error=f"pair: {type(e).__name__}: {e}"[:200])
    if "separate" not in done:
        try:
            dt = bench_tpu_separate()
            _emit("separate", gnnz=round(2 * NNZ / dt / 1e9, 2))
        except Exception as e:
            _emit("error", error=f"separate: {type(e).__name__}: {e}"[:200])
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


def _ingest(out, stages, errors):
    for line in out.decode(errors="replace").splitlines():
        if not line.startswith("@stage "):
            continue
        rec = json.loads(line[len("@stage "):])
        if rec["stage"] == "error":
            errors.append(rec["error"])
        else:
            stages[rec["stage"]] = rec


def _run_attempt(done, budget_s, stages, errors):
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
        [sys.executable, os.path.abspath(__file__), "--tpu-child"] + sorted(done),
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # killable as a group even mid-compile
        cwd=os.path.dirname(os.path.abspath(__file__)),
        env=env,
    )
    try:
        out, _ = child.communicate(timeout=budget_s)
        _ingest(out, stages, errors)
        return True
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
        _ingest(out, stages, errors)
        errors.append(f"attempt exceeded {budget_s}s (killed)")
        return False


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
    deadline = time.monotonic() + TPU_TOTAL_BUDGET_S
    cpu_done = False
    gnnz_cpu = 0.0
    for attempt in range(TPU_MAX_ATTEMPTS):
        done = set(stages)
        if {"health", "xla", "xla_bf16", "pair", "separate"} <= done:
            break
        budget = min(TPU_ATTEMPT_BUDGET_S, deadline - time.monotonic())
        if budget < 30:
            break
        t0 = time.monotonic()
        import threading

        result = {}
        th = threading.Thread(
            target=lambda: result.update(
                ok=_run_attempt(done, budget, stages, errors)
            )
        )
        th.start()
        if not cpu_done:
            # CPU baseline overlaps the first child's compile time.
            gnnz_cpu = bench_cpu_serial()
            cpu_done = True
        th.join()
        print(
            f"attempt {attempt + 1}: stages={sorted(set(stages) - done)} "
            f"({time.monotonic() - t0:.0f}s)",
            file=sys.stderr,
            flush=True,
        )
        if not result.get("ok") and attempt + 1 < TPU_MAX_ATTEMPTS:
            time.sleep(15)  # give the tunnel a moment to drop the dead session
    if not cpu_done:
        gnnz_cpu = bench_cpu_serial()

    gnnz_pair = stages.get("pair", {}).get("gnnz", 0.0)
    gnnz_sep = stages.get("separate", {}).get("gnnz", 0.0)
    gnnz_xla = stages.get("xla", {}).get("gnnz", 0.0)
    gnnz_xla_bf16 = stages.get("xla_bf16", {}).get("gnnz", 0.0)
    gnnz_tpu = max(gnnz_pair, gnnz_sep, gnnz_xla)
    record = {
        "metric": "spmv_pair_throughput_banded_88Mnnz_f32",
        "value": round(gnnz_tpu, 2),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz_tpu / gnnz_cpu, 2),
        "relay_health_gbs": stages.get("health", {}).get("gbs", 0),
        "separate_kernels_gnnz": gnnz_sep,
        "pair_kernel_gnnz": gnnz_pair,
        "xla_fallback_gnnz": gnnz_xla,
        "xla_bf16_storage_gnnz": gnnz_xla_bf16,
        "cpu_baseline_gnnz": round(gnnz_cpu, 2),
    }
    if errors:
        record["error"] = "; ".join(errors)[:300]
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    if "--tpu-child" in sys.argv:
        i = sys.argv.index("--tpu-child")
        sys.exit(child_main(set(sys.argv[i + 1:])))
    sys.exit(parent_main())
