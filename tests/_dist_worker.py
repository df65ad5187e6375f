"""Worker for the 2-process distributed test (tests/test_distributed.py).

Run as: python _dist_worker.py <coordinator> <num_procs> <proc_id> <outfile>

Each process: 1 CPU device, jax.distributed over the coordinator, solve the
SAME problem via lsqr_multihost (2-device global mesh spanning both
processes), write itn/istop/x to outfile for the parent to compare against
the single-process reference.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    coordinator, num_procs, proc_id, outfile = sys.argv[1:5]
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_procs),
        process_id=int(proc_id),
    )
    assert jax.process_count() == int(num_procs)

    import numpy as np

    import lsqr_tpu as lt
    from lsqr_tpu.parallel.distributed import lsqr_multihost

    rng = np.random.default_rng(42)
    m, n, nnz = 110, 70, 700  # ragged over 2 devices
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    b = rng.standard_normal(m)
    A = lt.coo_operator(m, n, vals, rows, cols)

    res = lsqr_multihost(A, b, 0.1, atol=0.0, btol=0.0, conlim=0.0, itnlim=20)
    np.savez(
        outfile,
        x=np.asarray(res.x),
        itn=int(res.itn),
        istop=int(res.istop),
        rnorm=float(res.rnorm),
        nprocs=jax.process_count(),
        ndev=len(jax.devices()),
    )
    print(f"proc {proc_id} done", flush=True)


if __name__ == "__main__":
    main()
