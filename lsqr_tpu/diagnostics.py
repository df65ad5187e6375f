"""Built-in self-verification: the adjoint dot-product test and the posterior
solution classifier.

Ports of the reference's ``acheck`` (/root/reference/src/lsqr.f90:908-994)
and ``xcheck`` (lsqr.f90:1015-1154) as pure, jittable library functions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import default_dtype, eps_for
from .ops.blas import nrm2
from .ops.linop import LinearOperator, as_operator

__all__ = ["acheck", "xcheck", "ACheckResult", "XCheckResult"]


class ACheckResult(NamedTuple):
    inform: jax.Array   #: 0 = aprod modes consistent, 1 = inconsistent
    error: jax.Array    #: relative error |y'w - x'v| / (1 + |y'w| + |x'v|)
    tol: float


class XCheckResult(NamedTuple):
    inform: jax.Array   #: 0: b=0 & x=0; 1/2/3: solves system 1/2/3; 4: none
    test1: jax.Array    #: ||r|| / (||b|| + ||A|| ||x||)      — Ax = b
    test2: jax.Array    #: ||A'r|| / (||A|| ||r||)            — least squares
    test3: jax.Array    #: ||A'r - damp^2 x|| / (||A|| rho2)  — damped LS
    rnorm: jax.Array    #: ||b - A x||
    tol: float


def acheck(A, *, m=None, n=None, eps=None, power: float = 0.5) -> ACheckResult:
    """Verify matvec/rmatvec describe the same matrix via the dot-product
    test y'(y + Ax) = x'(x + A'y) on deterministic "unlikely" unit vectors
    (lsqr.f90:946-992). ``power`` is the tolerance exponent: tol = eps**power
    (lsqr.f90:927-934)."""
    A = as_operator(A, m=m, n=n)
    m, n = A.shape
    dtype = getattr(A, "dtype", None) or default_dtype()
    eps = eps if eps is not None else eps_for(dtype)
    tol = float(eps) ** power

    # x(j) = sqrt(j+2), y(i) = 1/sqrt(i+2) for 0-based j,i (lsqr.f90:946-956),
    # normalized to unit length.
    jidx = jnp.arange(2, n + 2, dtype=dtype)
    iidx = jnp.arange(2, m + 2, dtype=dtype)
    x = jnp.sqrt(jidx)
    y = 1.0 / jnp.sqrt(iidx)
    x = x / nrm2(x)
    y = y / nrm2(y)

    w = y + A.matvec(x)
    v = x + A.rmatvec(y)
    alfa = jnp.vdot(y, w)
    # over C the identity is <y, y+Ax> = <v, x> with v = x + A^H y (both
    # sides share the cross term y^H A x); vdot conjugates its first
    # argument, and for real operators vdot(v, x) == vdot(x, v) exactly,
    # so the reference's real test (lsqr.f90:969-992) is unchanged.
    beta = jnp.vdot(v, x)
    test1 = jnp.abs(alfa - beta)
    test2 = 1.0 + jnp.abs(alfa) + jnp.abs(beta)
    error = test1 / test2
    inform = jnp.where(error <= tol, 0, 1).astype(jnp.int32)
    return ACheckResult(inform=inform, error=error, tol=tol)


def xcheck(
    A,
    *,
    b,
    x,
    damp=0.0,
    anorm,
    m=None,
    n=None,
    eps=None,
    power: float = 0.5,
) -> XCheckResult:
    """Classify which of the three problems x solves (lsqr.f90:1015-1154):
    1. Ax = b,  2. min ||Ax - b||,  3. damped least squares.

    ``anorm`` is the norm estimate from the solve (LSQRResult.anorm)."""
    A = as_operator(A, m=m, n=n)
    b = jnp.asarray(b)
    x = jnp.asarray(x)
    dtype = b.dtype
    rdtype = jnp.zeros((), dtype).real.dtype  # norms/tests are always real
    eps = eps if eps is not None else eps_for(rdtype)
    tol = float(eps) ** power
    damp = jnp.asarray(damp, rdtype)
    dampsq = damp * damp

    u = b - A.matvec(x)              # r  (lsqr.f90:1073-1076)
    v = A.rmatvec(u)                 # A'r (lsqr.f90:1080-1083)
    w = v - dampsq * x               # A'r - damp^2 x (lsqr.f90:1089-1094)

    bnorm = nrm2(b)
    xnorm = nrm2(x)
    rho1 = nrm2(u)
    sigma1 = nrm2(v)

    damped = damp != 0
    rho2 = jnp.where(damped, jnp.sqrt(rho1**2 + dampsq * xnorm**2), rho1)
    sigma2 = jnp.where(damped, nrm2(w), sigma1)

    trivial = jnp.logical_and(bnorm == 0, xnorm == 0)
    safe_den1 = bnorm + anorm * xnorm
    test1 = jnp.where(
        safe_den1 > 0, rho1 / jnp.where(safe_den1 > 0, safe_den1, 1.0), 0.0
    )
    test2 = jnp.where(rho1 > 0, sigma1 / jnp.where(rho1 > 0, anorm * rho1, 1.0), 0.0)
    test3 = jnp.where(rho2 > 0, sigma2 / jnp.where(rho2 > 0, anorm * rho2, 1.0), test2)

    inform = jnp.full((), 4, jnp.int32)
    inform = jnp.where(test3 <= tol, 3, inform)
    inform = jnp.where(test2 <= tol, 2, inform)
    inform = jnp.where(test1 <= tol, 1, inform)
    inform = jnp.where(trivial, 0, inform)
    z = jnp.zeros((), rdtype)
    return XCheckResult(
        inform=inform,
        test1=jnp.where(trivial, z, test1),
        test2=jnp.where(trivial, z, test2),
        test3=jnp.where(trivial, z, test3),
        rnorm=rho1,
        tol=tol,
    )
