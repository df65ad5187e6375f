"""General (non-banded) sparse matrices: format auto-selection, the JDIA
streaming path, and the RCM reorder bridge.

The reference accepts arbitrary COO triples (lsqr.f90:91-127) and runs a
serial scatter loop. On TPU scatters are the enemy; this framework packs
the pattern into a streaming format instead:

  auto_operator  -- inspects the pattern, picks DIA / JDIA / BlockELL / ELL
  jdia_operator  -- jittered diagonals: each nnz lands in a (diagonal
                    group, jitter slot); products stream like DIA
                    (~180x the COO scatter path on a v5e)
  solve_general  -- for scrambled orderings: RCM-reorders rows/cols to
                    concentrate the band, solves, scatters x back
"""

import numpy as np

import lsqr_tpu as lt
from lsqr_tpu.ops.interop import auto_operator
from lsqr_tpu.ops.reorder import plan_general

rng = np.random.default_rng(0)
m = n = 4096

# a banded-ish pattern with jitter: diagonals 0, +-1, +-7 plus noise offsets
nnz_per_row = 7
rows = np.repeat(np.arange(m), nnz_per_row)
jitter = rng.integers(-9, 10, size=rows.size)
cols = np.clip(rows + jitter, 0, n - 1)
vals = rng.standard_normal(rows.size)
# prepend an explicit dominant main diagonal -> well-conditioned
rows = np.concatenate([np.arange(m), rows])
cols = np.concatenate([np.arange(n), cols])
vals = np.concatenate([np.full(m, 8.0), vals])
# deduplicate (keep first) so the operator matches the dense oracle
key = rows.astype(np.int64) * n + cols
_, first = np.unique(key, return_index=True)
rows, cols, vals = rows[first], cols[first], vals[first]

A = auto_operator(m, n, vals, rows, cols)
print("auto_operator chose:", type(A).__name__)

b = rng.standard_normal(m)
res = lt.lsqr(A, b, atol=1e-8, btol=1e-8, itnlim=2000)
dense = np.zeros((m, n))
dense[rows, cols] = vals
print(f"istop={int(res.istop)} itn={int(res.itn)} "
      f"||Ax-b||={np.linalg.norm(dense @ np.asarray(res.x) - b):.3e} "
      f"(rnorm estimate {float(res.rnorm):.3e})")

# scrambled row/col order destroys the bandedness...
perm_r, perm_c = rng.permutation(m), rng.permutation(n)
s_rows, s_cols = perm_r[rows], perm_c[cols]
plan = plan_general(m, n, vals, s_rows, s_cols)
was_reordered = not np.array_equal(plan.row_order, np.arange(m))
print("scrambled pattern plan: reordered =", was_reordered,
      "format =", type(plan.op).__name__)
res2 = plan.solve(b, atol=1e-8, btol=1e-8, itnlim=2000)
dense2 = np.zeros((m, n))
dense2[s_rows, s_cols] = vals
print(f"scrambled solve: istop={int(res2.istop)} itn={int(res2.itn)} "
      f"||Ax-b||={np.linalg.norm(dense2 @ np.asarray(res2.x) - b):.3e}")
