"""Multi-PROCESS distributed test: two OS processes, each owning one CPU
device, joined by jax.distributed into a 2-device global mesh driving
lsqr_multihost (VERDICT.md round-1 item 6 — turns parallel/distributed.py
from wiring into a tested component).

The single-host 8-virtual-device tests (test_sharding.py) validate the
sharding math; this validates the multi-process path itself: coordinator
bring-up, cross-process collectives, host-local -> global array conversion
(sharding._globalize), and replicated results on every process.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_solve_matches_single(tmp_path):
    port = _free_port()
    coordinator = f"localhost:{port}"
    outs = [str(tmp_path / f"out{i}.npz") for i in range(2)]
    env = dict(os.environ)
    # one CPU device per process; drop the parent's multi-device forcing
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # the workers import lsqr_tpu from the repo root (not installed)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i), outs[i]],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("distributed CPU runtime timed out in this environment")
        logs.append(out.decode(errors="replace"))
    if any(p.returncode != 0 for p in procs):
        joined = "\n---\n".join(logs)
        if "DISTRIBUTED" in joined.upper() or "coordinator" in joined:
            pytest.skip(f"jax.distributed unsupported here:\n{joined[-2000:]}")
        raise AssertionError(f"worker failed:\n{joined[-4000:]}")

    # single-process reference (same seed/protocol as the worker)
    import jax

    import lsqr_tpu as lt

    rng = np.random.default_rng(42)
    m, n, nnz = 110, 70, 700
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    b = rng.standard_normal(m)
    A = lt.coo_operator(m, n, vals, rows, cols)
    ref = lt.lsqr(A, b, 0.1, atol=0.0, btol=0.0, conlim=0.0, itnlim=20)

    r0 = np.load(outs[0])
    r1 = np.load(outs[1])
    assert int(r0["nprocs"]) == 2 and int(r0["ndev"]) == 2
    # both processes hold the identical replicated result
    np.testing.assert_array_equal(r0["x"], r1["x"])
    assert int(r0["itn"]) == int(r1["itn"]) == int(ref.itn)
    assert int(r0["istop"]) == int(ref.istop)
    np.testing.assert_allclose(r0["x"], np.asarray(ref.x), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(float(r0["rnorm"]), float(ref.rnorm), rtol=1e-10)
