"""Damped least squares with standard errors and posterior verification:
solve min ||[A; damp I] x - [b; 0]|| on a sparse random system, then run
acheck/xcheck (the library self-tests, lsqr.f90:908-1154)."""

import numpy as np

import lsqr_tpu as lt

rng = np.random.default_rng(0)
m, n, nnz = 2000, 800, 20_000
A = lt.coo_operator(
    m, n,
    rng.standard_normal(nnz),
    rng.integers(0, m, nnz),
    rng.integers(0, n, nnz),
)
b = rng.standard_normal(m)

assert int(lt.acheck(A).inform) == 0, "operator adjoint inconsistency"

res = lt.lsqr(A, b, damp=0.1, atol=1e-8, btol=1e-8, wantse=True)
print("istop  =", int(res.istop), "->", res.istop_message)
print("itn    =", int(res.itn))
print("rnorm  =", float(res.rnorm), " acond =", float(res.acond))
print("se[:5] =", np.asarray(res.se[:5]))

check = lt.xcheck(A, b=b, x=res.x, damp=0.1, anorm=res.anorm)
print("xcheck inform =", int(check.inform), "(3 = damped LS solution)")
