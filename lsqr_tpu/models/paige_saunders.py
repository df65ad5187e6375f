"""Paige–Saunders least-squares test-problem family.

TPU-native re-design of the reference's matrix-free test generator
(/root/reference/test/lsqrtest_module.f90): the implicit operator

    A = HY · D · HZ

where HY/HZ are Householder reflections and D is the m x n diagonal of
singular values with analytically known condition number. The matrix is
never materialized; mat-vec products are two rank-1 reflections + one
diagonal scale — pure VPU work that XLA fuses into a handful of kernels.

Reference anchors:
  * hprod (Householder apply y = (I - 2 hz hz')x): lsqrtest_module.f90:385-403
  * aprod1/aprod2 (A x and A' y): lsqrtest_module.f90:319-377
  * lstp (problem construction incl. b = r + A x_true with known residual
    norm and exact acond): lsqrtest_module.f90:422-505
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import default_dtype
from ..ops.blas import nrm2
from ..ops.linop import LinearOperator

__all__ = ["PaigeSaundersOperator", "lstp", "LSTPProblem", "hprod", "suite_configs"]


def hprod(h: jax.Array, x: jax.Array) -> jax.Array:
    """Householder apply y = (I - 2 h h') x (lsqrtest_module.f90:385-403)."""
    return x - (2.0 * jnp.vdot(h, x)) * h


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PaigeSaundersOperator(LinearOperator):
    """Implicit A = HY * D * HZ (m x n).

    Fields hy (m,), hz (n,) are unit Householder vectors; d (min(m,n),) holds
    the singular values.
    """

    hy: jax.Array
    hz: jax.Array
    d: jax.Array

    @property
    def m(self) -> int:  # type: ignore[override]
        return self.hy.shape[0]

    @property
    def n(self) -> int:  # type: ignore[override]
        return self.hz.shape[0]

    @property
    def dtype(self):
        return self.d.dtype

    def matvec(self, x: jax.Array) -> jax.Array:
        # aprod1 (lsqrtest_module.f90:319-343): w = HZ x; w_d = D w
        # (truncate/zero-pad to m); y = HY w_d.
        m, n = self.m, self.n
        minmn = min(m, n)
        w = hprod(self.hz, x)
        wm = jnp.zeros((m,), self.dtype).at[:minmn].set(self.d * w[:minmn])
        return hprod(self.hy, wm)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        # aprod2 (lsqrtest_module.f90:353-377), transposed pipeline.
        m, n = self.m, self.n
        minmn = min(m, n)
        w = hprod(self.hy, y)
        wn = jnp.zeros((n,), self.dtype).at[:minmn].set(self.d * w[:minmn])
        return hprod(self.hz, wn)


class LSTPProblem(NamedTuple):
    A: PaigeSaundersOperator
    b: jax.Array        #: right-hand side b = r + A x_true
    x_true: jax.Array   #: true solution (projected for under-determined m<n)
    acond: jax.Array    #: exact condition number of Abar
    rnorm: jax.Array    #: exact residual norm ||r||


def lstp(
    m: int,
    n: int,
    nduplc: int,
    npower: int,
    damp: float,
    x_true=None,
    *,
    dtype=None,
) -> LSTPProblem:
    """Generate problem P(m, n, nduplc, npower, damp)
    (lstp, lsqrtest_module.f90:422-505).

    Singular values come in ``nduplc``-sized duplicated steps,
    d_i = (ceil((i+1)/nduplc) * nduplc / min(m,n))**npower (0-based i;
    reference loop at :460-465); the exact condition number is
    sqrt((d_max^2 + damp^2) / (d_min^2 + damp^2)) (:467-468).

    If ``x_true`` is None, uses the suite's default x_true[j] = 0.1*(j+1)
    (lsqrtest_module.f90:151-154, 1-based j).
    """
    dtype = dtype or default_dtype()
    minmn = min(m, n)
    damp = jnp.asarray(damp, dtype)
    dampsq = damp * damp

    # Householder vectors (lsqrtest_module.f90:443-455). The reference
    # normalizes then negates; the sign cancels in (I - 2 h h') so only the
    # normalization matters.
    fourpi = 4.0 * jnp.pi
    i_m = jnp.arange(1, m + 1, dtype=dtype)
    i_n = jnp.arange(1, n + 1, dtype=dtype)
    hy = jnp.sin(i_m * (fourpi / m))
    hz = jnp.cos(i_n * (fourpi / n))
    hy = -hy / nrm2(hy)
    hz = -hz / nrm2(hz)

    # Singular values in duplicated steps (:460-465).
    i0 = jnp.arange(minmn)
    j = i0 // nduplc + 1
    t = (j * nduplc).astype(dtype) / minmn
    d = t ** npower

    acond = jnp.sqrt((d[minmn - 1] ** 2 + dampsq) / (d[0] ** 2 + dampsq))

    A = PaigeSaundersOperator(hy=hy, hz=hz, d=d)

    # True solution: must have the form x = Z (w; 0) (:474-481). For m >= n
    # this leaves x unchanged; for m < n it projects out the trailing
    # null-space components.
    if x_true is None:
        x_true = 0.1 * jnp.arange(1, n + 1, dtype=dtype)
    else:
        x_true = jnp.asarray(x_true, dtype)
    w = hprod(hz, x_true)
    if m < n:
        w = w.at[m:].set(0.0)
    x_true = hprod(hz, w)

    # Residual construction (:484-497): solve D r1bar = dampsq x1bar,
    # r2bar = 1 (rows beyond minmn, present only if m > n), r = HY rbar.
    r = jnp.zeros((m,), dtype)
    r = r.at[:minmn].set(dampsq * w[:minmn] / d)
    if m > minmn:
        r = r.at[minmn:].set(1.0)
    r = hprod(hy, r)

    rnorm = nrm2(r)
    b = r + A.matvec(x_true)    # b = r + A x (:499-503)
    return LSTPProblem(A=A, b=b, x_true=x_true, acond=acond, rnorm=rnorm)


def suite_configs():
    """The 18 reference suite configurations (lsqrtest_module.f90:55-94):
    (m, n) in {(2000,1000), (1000,1000), (1000,2000)} x ndamp in 2..7 with
    nduplc=40, npower=ndamp, damp=10**(-ndamp-6).

    Yields (m, n, nduplc, npower, damp) tuples in reference order.
    """
    nbar, nduplc = 1000, 40
    for m, n in ((2 * nbar, nbar), (nbar, nbar), (nbar, 2 * nbar)):
        for ndamp in range(2, 8):
            yield (m, n, nduplc, ndamp, 10.0 ** (-ndamp - 6))
