"""Operator algebra — composition conveniences over the aprod protocol.

The reference's only built-in composition is the damped augmentation
``[A; damp*I]``, special-cased inside the LSQR recurrence
(/root/reference/src/lsqr.f90:264-273). Real regularized problems often
need the GENERAL form

    min ||A x - b||^2 + ||L x||^2        (L != identity, e.g. a gradient)

which the reference leaves to the user's aprod. Here it is first-class:
stack operators vertically and solve, or call :func:`tikhonov` directly.
All composites implement the LinearOperator protocol, so every solver
(lsqr/lsmr/cgls/craig), batching, checkpointing, and diagnostics
(acheck/xcheck) work on them unchanged — including custom-aprod members.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from .linop import LinearOperator, as_operator

__all__ = [
    "VStackOperator",
    "HStackOperator",
    "ScaledOperator",
    "DiagonalOperator",
    "SumOperator",
    "vstack_operators",
    "hstack_operators",
    "scale_operator",
    "diagonal_operator",
    "add_operators",
    "tikhonov",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VStackOperator(LinearOperator):
    """Vertical stack [A_1; A_2; ...]: all blocks share n columns.

    matvec concatenates the block products; rmatvec sums the block
    adjoints — both pure XLA, each block free to use its own fast path
    (DIA/JDIA/Block kernels)."""

    ops: tuple  # of LinearOperator (pytree children)
    m: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.ops[0].dtype

    @property
    def nnz(self):
        return sum(int(getattr(op, "nnz", op.m * op.n)) for op in self.ops)

    def matvec(self, x: jax.Array) -> jax.Array:
        return jnp.concatenate([op.matvec(x) for op in self.ops])

    def rmatvec(self, y: jax.Array) -> jax.Array:
        out = None
        start = 0
        for op in self.ops:
            seg = jax.lax.slice(y, (start,), (start + op.m,))
            z = op.rmatvec(seg)
            out = z if out is None else out + z
            start += op.m
        return out

    def todense(self) -> jax.Array:
        return jnp.concatenate([op.todense() for op in self.ops], axis=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HStackOperator(LinearOperator):
    """Horizontal stack [A_1, A_2, ...]: all blocks share m rows."""

    ops: tuple
    m: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.ops[0].dtype

    @property
    def nnz(self):
        return sum(int(getattr(op, "nnz", op.m * op.n)) for op in self.ops)

    def matvec(self, x: jax.Array) -> jax.Array:
        out = None
        start = 0
        for op in self.ops:
            seg = jax.lax.slice(x, (start,), (start + op.n,))
            y = op.matvec(seg)
            out = y if out is None else out + y
            start += op.n
        return out

    def rmatvec(self, y: jax.Array) -> jax.Array:
        return jnp.concatenate([op.rmatvec(y) for op in self.ops])

    def todense(self) -> jax.Array:
        return jnp.concatenate([op.todense() for op in self.ops], axis=1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScaledOperator(LinearOperator):
    """alpha * A (alpha a scalar, may be traced)."""

    op: LinearOperator
    alpha: jax.Array
    m: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.op.dtype

    def matvec(self, x: jax.Array) -> jax.Array:
        return self.alpha * self.op.matvec(x)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        # adjoint of alpha*A is conj(alpha)*A^H (conj is identity for real)
        alpha = (
            jnp.conj(self.alpha)
            if jnp.issubdtype(jnp.asarray(self.alpha).dtype, jnp.complexfloating)
            else self.alpha
        )
        return alpha * self.op.rmatvec(y)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiagonalOperator(LinearOperator):
    """diag(d) as an operator (square n x n)."""

    d: jax.Array
    m: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.d.dtype

    @property
    def nnz(self):
        return self.n

    def matvec(self, x: jax.Array) -> jax.Array:
        return self.d * x

    def rmatvec(self, y: jax.Array) -> jax.Array:
        # adjoint of diag(d) is diag(conj(d)) (conj is identity for real)
        d = (
            jnp.conj(self.d)
            if jnp.issubdtype(self.d.dtype, jnp.complexfloating)
            else self.d
        )
        return d * y

    def todense(self) -> jax.Array:
        return jnp.diag(self.d)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SumOperator(LinearOperator):
    """A_1 + A_2 + ... (all blocks share the full (m, n) shape).

    The storage-format composition primitive: a matrix split by ENTRY
    (not by row/column block) into parts that each keep their own fast
    product path — e.g. the HYB format (bounded-width ELL + COO spill,
    :func:`lsqr_tpu.ops.structured.hyb_operator`), or a banded core plus a
    few dense rows. Products are the sums of the part products; the adjoint
    is the sum of the part adjoints (conj handled by each part)."""

    ops: tuple  # of LinearOperator (pytree children)
    m: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.ops[0].dtype

    @property
    def nnz(self):
        return sum(int(getattr(op, "nnz", op.m * op.n)) for op in self.ops)

    def matvec(self, x: jax.Array) -> jax.Array:
        out = self.ops[0].matvec(x)
        for op in self.ops[1:]:
            out = out + op.matvec(x)
        return out

    def rmatvec(self, y: jax.Array) -> jax.Array:
        out = self.ops[0].rmatvec(y)
        for op in self.ops[1:]:
            out = out + op.rmatvec(y)
        return out

    def todense(self) -> jax.Array:
        out = self.ops[0].todense()
        for op in self.ops[1:]:
            out = out + op.todense()
        return out


def add_operators(ops: Sequence) -> SumOperator:
    """A_1 + A_2 + ... — all blocks must share the same (m, n) shape."""
    ops = tuple(as_operator(op) for op in ops)
    if not ops:
        raise ValueError("need at least one operator")
    m, n = ops[0].m, ops[0].n
    for op in ops:
        if (op.m, op.n) != (m, n):
            raise ValueError(
                f"summed operators must share (m, n): got "
                f"{[(o.m, o.n) for o in ops]}"
            )
    return SumOperator(ops=ops, m=m, n=n)


def vstack_operators(ops: Sequence) -> VStackOperator:
    """[A_1; A_2; ...] — all blocks must share the column count."""
    ops = tuple(as_operator(op) for op in ops)
    if not ops:
        raise ValueError("need at least one operator")
    n = ops[0].n
    for op in ops:
        if op.n != n:
            raise ValueError(
                f"vstack blocks must share n: got {[o.n for o in ops]}"
            )
    return VStackOperator(ops=ops, m=sum(op.m for op in ops), n=n)


def hstack_operators(ops: Sequence) -> HStackOperator:
    """[A_1, A_2, ...] — all blocks must share the row count."""
    ops = tuple(as_operator(op) for op in ops)
    if not ops:
        raise ValueError("need at least one operator")
    m = ops[0].m
    for op in ops:
        if op.m != m:
            raise ValueError(
                f"hstack blocks must share m: got {[o.m for o in ops]}"
            )
    return HStackOperator(ops=ops, m=m, n=sum(op.n for op in ops))


def scale_operator(op, alpha) -> ScaledOperator:
    op = as_operator(op)
    return ScaledOperator(op=op, alpha=jnp.asarray(alpha), m=op.m, n=op.n)


def diagonal_operator(d) -> DiagonalOperator:
    d = jnp.asarray(d)
    if d.ndim != 1:
        raise ValueError(f"d must be a vector, got shape {d.shape}")
    return DiagonalOperator(d=d, m=d.shape[0], n=d.shape[0])


def tikhonov(A, b, L, lam: float = 1.0, *, solver: str = "lsqr", **kwargs):
    """General-form Tikhonov regularization:

        min ||A x - b||^2 + lam^2 ||L x||^2

    solved as the stacked least-squares problem
    ``min || [A; lam*L] x - [b; 0] ||`` — the generalization of the
    reference's built-in ``damp`` (which is the special case L = I,
    lsqr.f90:264-273). ``L`` may be any LinearOperator / array / (matvec,
    rmatvec) pair with L.n == A.n (e.g. a first-difference DIA operator).

    ``solver``: 'lsqr' (default), 'lsmr' or 'cgls'; extra kwargs are
    forwarded. Returns the solver's result on the stacked system (note
    rnorm is the AUGMENTED residual norm, like the reference's damped
    rnorm, lsqr.f90:551-556)."""
    A = as_operator(A)
    L = as_operator(L)
    if L.n != A.n:
        raise ValueError(f"L.n ({L.n}) must equal A.n ({A.n})")
    Ls = scale_operator(L, jnp.asarray(lam, A.dtype)) if lam != 1.0 else L
    stacked = vstack_operators([A, Ls])
    b = jnp.asarray(b)
    bz = jnp.concatenate([b, jnp.zeros((L.m,), b.dtype)])
    if solver == "lsqr":
        from ..solver import lsqr as _solve
    elif solver == "lsmr":
        from ..lsmr import lsmr as _solve
    elif solver == "cgls":
        from ..cgls import cgls as _solve
    else:
        raise ValueError(f"unknown solver {solver!r}")
    return _solve(stacked, bz, **kwargs)
