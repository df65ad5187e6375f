"""Preconditioning and scaling helpers.

The reference documents (but does not implement) two convergence aids
(/root/reference/src/lsqr.f90:283-291, 322-328):

* column scaling — "the nonzero columns of A should be scaled so that they
  all have the same Euclidean norm";
* right preconditioning — solve ``A M^-1 z = b`` for a convenient M, then
  recover ``x = M^-1 z``.

Here both are first-class: operator composition is free in a functional
operator algebra, and column norms are computed analytically per storage
format (no products needed).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .coo import COOOperator
from .linop import DenseOperator, LinearOperator
from .structured import DIAOperator, DIASharedOperator, ELLOperator

__all__ = [
    "ComposedOperator",
    "ColumnScaledOperator",
    "right_preconditioned",
    "column_norms",
    "column_scaled",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ComposedOperator(LinearOperator):
    """B = outer @ inner (matvec applies inner first)."""

    outer: LinearOperator
    inner: LinearOperator

    @property
    def m(self) -> int:  # type: ignore[override]
        return self.outer.m

    @property
    def n(self) -> int:  # type: ignore[override]
        return self.inner.n

    @property
    def dtype(self):
        return self.outer.dtype

    def matvec(self, x):
        return self.outer.matvec(self.inner.matvec(x))

    def rmatvec(self, y):
        return self.inner.rmatvec(self.outer.rmatvec(y))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ColumnScaledOperator(LinearOperator):
    """A @ diag(scale): cheap special case of composition."""

    op: LinearOperator
    scale: jax.Array  # (n,)

    @property
    def m(self) -> int:  # type: ignore[override]
        return self.op.m

    @property
    def n(self) -> int:  # type: ignore[override]
        return self.op.n

    @property
    def dtype(self):
        return self.op.dtype

    def matvec(self, x):
        return self.op.matvec(self.scale * x)

    def rmatvec(self, y):
        return self.scale * self.op.rmatvec(y)


def right_preconditioned(
    A: LinearOperator, M_inv: LinearOperator
) -> ComposedOperator:
    """Build ``B = A @ M_inv`` for the right-preconditioning recipe
    (lsqr.f90:322-328): solve ``B z = b`` with LSQR, then the answer to the
    original problem is ``x = M_inv.matvec(z)``."""
    if M_inv.m != A.n:
        raise ValueError(
            f"M_inv must map n={A.n} -> n; got shape {M_inv.shape}"
        )
    return ComposedOperator(outer=A, inner=M_inv)


def column_norms(A: LinearOperator) -> jax.Array:
    """Euclidean norms of the columns of A, computed from the storage
    (no operator products).

    COO/ELL storage must hold unique coordinates (sum duplicates first,
    e.g. with lsqr_tpu.native.coo_dedup) — squared values do not distribute
    over duplicate entries."""
    if isinstance(A, DenseOperator):
        return jnp.linalg.norm(A.a, axis=0)
    if isinstance(A, COOOperator):
        return jnp.sqrt(
            jax.ops.segment_sum(A.vals**2, A.cols, num_segments=A.n)
        )
    if isinstance(A, ELLOperator):
        return jnp.sqrt(jnp.sum(A.tvals**2, axis=1))
    if isinstance(A, DIAOperator):
        return jnp.sqrt(jnp.sum(A.tdata**2, axis=0))
    if isinstance(A, DIASharedOperator):
        # column j holds dp[d, H + j - k_d]; the zero halo makes
        # out-of-matrix positions contribute exactly 0
        dp2 = A.dp.reshape(len(A.offsets), A.Lp).astype(jnp.float32)
        acc = jnp.zeros((A.n,), jnp.float32)
        for d, k in enumerate(A.offsets):
            seg = jax.lax.slice(dp2[d], (A.H - k,), (A.H - k + A.n,))
            acc = acc + seg * seg
        return jnp.sqrt(acc)
    # generic operators: e_j probes via vmapped rmatvec-free path would need
    # n matvecs; refuse rather than silently run an O(n) product sweep
    raise TypeError(
        f"column_norms has no analytic rule for {type(A).__name__}; "
        "compute your own scale and use ColumnScaledOperator"
    )


def column_scaled(A: LinearOperator, eps: float = 0.0) -> Tuple[ColumnScaledOperator, jax.Array]:
    """Scale columns to unit norm (the reference's scaling advice,
    lsqr.f90:288-291). Returns (scaled_operator, scale) with
    ``scale[j] = 1 / max(||a_j||, eps)`` (zero columns keep scale 1).

    Solve with the scaled operator, then recover ``x = scale * z``."""
    norms = column_norms(A)
    safe = jnp.where(norms > eps, norms, jnp.ones_like(norms))
    scale = jnp.where(norms > eps, 1.0 / safe, jnp.ones_like(norms))
    return ColumnScaledOperator(op=A, scale=scale), scale
