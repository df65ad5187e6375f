"""Differentiable least squares — jax.grad THROUGH the solver.

A capability with no reference analogue (the reference is Fortran,
/root/reference/src/lsqr.f90): the solution of

    x*(A, b) = argmin_x ||A x - b||^2 + damp^2 ||x||^2

is an implicit function of the operator's arrays and b, so gradients can
flow through a solve without differentiating the iteration. Optimality:

    F(theta, b, x) = A'(A x - b) + damp^2 x = 0.

By the implicit function theorem, the VJP of x* w.r.t. any input, given a
cotangent g, needs ONE extra linear solve with the same (SPD) normal
operator,

    (A'A + damp^2 I) s = g,

after which
    d/db   <- A s                       (dF/db' s, sign folded)
    d/dA   <- -vjp_theta[ A'(theta) (A(theta) x* - b) ](s)

The extra solve runs as conjugate gradients on the normal operator using
the SAME matvec/rmatvec products (so every structured/Pallas fast path is
reused). Cost of a backward pass ~= cost of the forward solve.

Use :func:`lsqr_grad` as a differentiable drop-in for ``lsqr(...).x``:

    def loss(b):
        x = lsqr_grad(A, b, damp=0.1, atol=1e-10, btol=1e-10)
        return jnp.sum((x - target) ** 2)

    jax.grad(loss)(b)          # exact gradient, two solves total

Gradients flow to ``b``, ``damp`` and every ARRAY leaf of the operator
(stripes, COO values, dense entries, ...) — the operator travels through
custom_vjp as a pytree.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .ops.linop import as_operator

__all__ = ["lsqr_grad", "normal_cg"]


def _normal_matvec(A, damp, s):
    return A.rmatvec(A.matvec(s)) + (damp * damp) * s


def normal_cg(A, damp, g, *, tol: float = 1e-10, maxiter: int = None):
    """Solve the (SPD) regularized normal equations
        (A'A + damp^2 I) s = g
    for an ARBITRARY right-hand side g by conjugate gradients, using only
    the operator's matvec/rmatvec (every fast product path is reused).
    This is the adjoint solve of the implicit-function VJP; unlike
    :func:`lsqr_tpu.cgls` the rhs is not restricted to A'b."""
    n = g.shape[0]
    if maxiter is None:
        maxiter = 4 * n
    dt = g.dtype
    zero = jnp.zeros((), dt)
    gn2 = jnp.sum(g * g)

    def cond(c):
        it, s, r, p, rs = c
        return jnp.logical_and(it < maxiter, rs > tol * tol * gn2)

    def body(c):
        it, s, r, p, rs = c
        q = _normal_matvec(A, damp, p)
        pq = jnp.sum(p * q)
        safe = jnp.where(pq > zero, pq, jnp.ones((), dt))
        alpha = jnp.where(pq > zero, rs / safe, zero)
        s = s + alpha * p
        r = r - alpha * q
        rs_new = jnp.sum(r * r)
        beta = jnp.where(rs > zero, rs_new / rs, zero)
        p = r + beta * p
        return (it + 1, s, r, p, rs_new)

    init = (jnp.zeros((), jnp.int32), jnp.zeros_like(g), g, g, gn2)
    _, s, _, _, _ = jax.lax.while_loop(cond, body, init)
    return s


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _lsqr_grad(A, b, damp, opts):
    from .solver import lsqr

    return lsqr(A, b, damp, **dict(opts)).x


def _fwd(A, b, damp, opts):
    x = _lsqr_grad(A, b, damp, opts)
    return x, (A, b, damp, x)


def _bwd(opts, resid, g):
    A, b, damp, x = resid
    tol = dict(opts).get("atol", 1e-10) or 1e-10
    s = normal_cg(A, damp, g, tol=min(float(tol), 1e-8))
    # d/db: + A s
    db = A.matvec(s)
    # d/dA (all array leaves): -vjp over theta of
    #   theta -> A'(theta) (A(theta) x - b), with x, b held fixed
    def F_of_A(A_):
        return A_.rmatvec(A_.matvec(x) - b)

    _, vjp_A = jax.vjp(F_of_A, A)
    (dA,) = vjp_A(s)
    dA = jax.tree.map(
        lambda t: t if t.dtype == jax.dtypes.float0 else -t, dA
    )
    # d/ddamp: F depends on damp via + damp^2 x  ->  s' (2 damp x)
    ddamp = -2.0 * damp * jnp.sum(s * x)
    return (dA, db, ddamp.astype(jnp.asarray(damp).dtype))


_lsqr_grad.defvjp(_fwd, _bwd)


def lsqr_grad(A, b, damp=0.0, *, m=None, n=None, **options):
    """Differentiable ``lsqr(A, b, damp).x``: gradients w.r.t. b, damp and
    the operator's array leaves via the implicit function theorem (one
    extra CG solve on the normal operator per backward pass).

    ``options`` are LSQROptions overrides for the FORWARD solve (use tight
    atol/btol — the gradient is exact only at the true minimizer). The
    forward runs the ordinary while-loop form (loop='bounded' is
    host-stepped and not traceable)."""
    A = as_operator(A, m=m, n=n)
    b = jnp.asarray(b)
    options.setdefault("atol", 1e-10)
    if jnp.issubdtype(jnp.asarray(b).dtype, jnp.complexfloating):
        raise TypeError(
            "lsqr_grad is real-only; the complex-capable surface is the core "
            "solver family (lsqr/lsmr/cgls/craig — see docs/api.md §Complex)"
            
        )
    options.setdefault("btol", 1e-10)
    options["loop"] = "while"  # bounded form is host-stepped (untraceable)
    opts = tuple(sorted(options.items()))
    damp = jnp.asarray(damp, b.dtype)
    return _lsqr_grad(A, b, damp, opts)
