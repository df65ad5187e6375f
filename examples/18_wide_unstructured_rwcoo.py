"""Wide-n unstructured sparsity: hot/cold column routing (round 5).

Example 17 covers unstructured patterns with n <= 4096 (WCOO). Real
recommendation / text / graph least-squares problems are WIDER — tens of
thousands of columns with power-law popularity. For
4096 < n <= 262,144, `rwcoo_operator` routes the entries at pack time:
the top-4096 columns by count (~86% of the mass at Zipf(1.1)) stream
through the compacted WCOO kernels, and the sparse tail through the
WWCOO wide-n kernels (per-chunk column compaction decouples the O(n)
range walk from the per-entry gathers — ops/pallas_wwcoo.py). Measured
on a v5e: 1.17 Gnnz/s fused pair at m=2^21, n=65,536 on 10.5M-nnz
Zipf(1.1), ~10x the COO segment-sum floor, 17.8 ms/iter end-to-end.

auto_operator picks RWCOO on its own for f32 patterns in that range
with real column concentration; near-uniform wide patterns are refused
by the packer (a measured structural crossbar wall, PARITY.md gap 4)
and fall back to ELL/HYB/COO. The distributed forms are
`parallel.lsqr_sharded_rwcoo` (+ LSMR/CRAIG/CGLS siblings): row blocks
per device, one global hot column set, one psum per iteration.

Run on TPU for the quoted throughputs; shapes here are scaled for a
quick run anywhere.
"""

import numpy as np

import lsqr_tpu as lt

rng = np.random.default_rng(0)
m, n = 1 << 20, 1 << 16         # 1M observations, 65,536 features
nnz = 2 * (1 << 20)             # ~2 entries/row: the tall-sparse regime
# (denser-than-~6-entries/row patterns exceed the per-chunk VMEM budget
# of the hot panel kernels; the packers refuse and auto_operator falls
# back rather than letting the kernel compile OOM — ops/wcoo._vmem_guard)

# power-law column popularity (Zipf 1.1), uniform rows — no structure
cols = rng.zipf(1.1, size=6 * nnz) - 1
cols = cols[cols < n][:nnz]
rows = rng.integers(0, m, nnz)
vals = rng.standard_normal(nnz).astype(np.float32)

A = lt.auto_operator(m, n, vals, rows, cols)
print("auto_operator picked:", type(A).__name__)   # RWCOOOperator
print(f"hot panel: {A.hotmap.shape[0]} columns; "
      f"cold stream live: {A.cold is not None}")

x_true = rng.standard_normal(n).astype(np.float32)
b = np.asarray(A.matvec(x_true))

# heavily damped: wide Zipf systems are rank-deficient in the tail
res = lt.lsqr(A, b, damp=0.1, atol=1e-5, btol=1e-5)
print(f"istop={int(res.istop)} itn={int(res.itn)} "
      f"rnorm={float(res.rnorm):.3e}")
