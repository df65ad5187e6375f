"""Fully unstructured sparsity at scale: the WCOO format (round 4).

The reference runs arbitrary COO triples through a serial scatter loop
(lsqr.f90:156-194); XLA's TPU lowering of the equivalent gather/scatter
runs ~0.1 Gnnz/s. When the pattern has NO structure to exploit (no band,
no bounded jitter, no blocks) but n <= 4096 — the tall-skinny
least-squares regime, e.g. a regression with millions of observations
and a few thousand features — `wcoo_operator` re-lays the entries so
both products run scatter-free on the TPU's crossbar and MXU
(ops/pallas_wcoo.py): measured 2.5 Gnnz/s fused pair on a 10.5M-nnz
Zipf(1.1) matrix, ~25x the COO path, with a 7.3 ms/iter end-to-end
solve at m=2^21.

auto_operator picks WCOO on its own for real f32 patterns with
n <= 4096 and m >= 16384 (falling back to COO when the packer refuses
a pathological row distribution); the distributed form is
`parallel.lsqr_sharded_wcoo` (each device's row block packs its own
WCOO shard; one psum per iteration).
"""

import numpy as np

import lsqr_tpu as lt

rng = np.random.default_rng(0)
m, n = 1 << 18, 2048            # 262k observations, 2048 features
nnz = 2 * (1 << 20)

# power-law column popularity (Zipf 1.1), uniform rows — no structure
cols = rng.zipf(1.1, size=4 * nnz) - 1
cols = cols[cols < n][:nnz]
rows = rng.integers(0, m, nnz)
vals = rng.standard_normal(nnz).astype(np.float32)

A = lt.auto_operator(m, n, vals, rows, cols)
print("auto_operator picked:", type(A).__name__)   # WCOOOperator

x_true = rng.standard_normal(n).astype(np.float32)
b = np.asarray(A.matvec(x_true))

res = lt.lsqr(A, b, damp=0.01, atol=1e-6, btol=1e-6)
print(f"istop={int(res.istop)} itn={int(res.itn)} "
      f"rnorm={float(res.rnorm):.3e}")
err = np.abs(np.asarray(res.x) - x_true).max()
print(f"max |x - x_true| = {err:.2e}")
