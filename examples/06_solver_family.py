"""The four solvers on one operator: LSQR, LSMR, CRAIG, CGLS.

All cost the same two hot products per iteration (lsqr.f90:681-699) on the
same LinearOperator; they differ in what they minimize / how:

  lsqr  -- min ||Ax - b||          (the reference algorithm; also damped)
  lsmr  -- same, but ||A'r|| decreases monotonically -> safer early stop
  craig -- min ||x|| s.t. Ax = b   (consistent systems only, cheapest/iter)
  cgls  -- min ||Ax - b|| via CG on the normal equations (the classic
           alternative the LSQR paper benchmarks against)
"""

import numpy as np

import lsqr_tpu as lt

rng = np.random.default_rng(0)
m, n = 120, 300  # under-determined => consistent, min-norm is interesting
dense = rng.standard_normal((m, n))
r, c = np.nonzero(dense)
A = lt.coo_operator(m, n, dense[r, c], r, c)
b = dense @ rng.standard_normal(n)

res_lsqr = lt.lsqr(A, b, atol=1e-10, btol=1e-10, itnlim=500)
res_lsmr = lt.lsmr(A, b, atol=1e-10, btol=1e-10, itnlim=500)
res_craig = lt.craig(A, b, atol=1e-10, btol=1e-10, itnlim=500)
res_cgls = lt.cgls(A, b, atol=1e-10, btol=1e-10, itnlim=500)

for name, res in [("lsqr", res_lsqr), ("lsmr", res_lsmr),
                  ("craig", res_craig), ("cgls", res_cgls)]:
    x = np.asarray(res.x)
    print(
        f"{name:5s}: istop={int(res.istop)} itn={int(res.itn):3d} "
        f"||x||={np.linalg.norm(x):.6f} "
        f"||Ax-b||={np.linalg.norm(dense @ x - b):.2e}"
    )

# on a consistent system all four land on the same minimum-norm solution
x_mn = np.linalg.pinv(dense) @ b
for name, res in [("lsqr", res_lsqr), ("lsmr", res_lsmr),
                  ("craig", res_craig), ("cgls", res_cgls)]:
    err = np.abs(np.asarray(res.x) - x_mn).max()
    print(f"{name:5s}: max deviation from pinv minimum-norm solution {err:.2e}")
