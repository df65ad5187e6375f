"""Operator algebra (ops/compose.py): vstack/hstack/scale/diagonal
composites and general-form Tikhonov — the generalization of the
reference's built-in damp (L = I special case, lsqr.f90:264-273)."""

import jax.numpy as jnp
import numpy as np
import pytest

import lsqr_tpu as lt
from lsqr_tpu.diagnostics import acheck


def _rand_dense_op(rng, m, n):
    M = rng.standard_normal((m, n))
    return lt.as_operator(jnp.asarray(M)), M


def test_vstack_matches_dense(rng):
    A, Ad = _rand_dense_op(rng, 30, 20)
    B, Bd = _rand_dense_op(rng, 10, 20)
    S = lt.vstack_operators([A, B])
    assert S.shape == (40, 20)
    dense = np.vstack([Ad, Bd])
    x = rng.standard_normal(20)
    y = rng.standard_normal(40)
    np.testing.assert_allclose(np.asarray(S.matvec(x)), dense @ x, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(S.rmatvec(y)), dense.T @ y, rtol=1e-12
    )
    assert acheck(S).inform == 0


def test_hstack_matches_dense(rng):
    A, Ad = _rand_dense_op(rng, 25, 15)
    B, Bd = _rand_dense_op(rng, 25, 7)
    S = lt.hstack_operators([A, B])
    assert S.shape == (25, 22)
    dense = np.hstack([Ad, Bd])
    x = rng.standard_normal(22)
    y = rng.standard_normal(25)
    np.testing.assert_allclose(np.asarray(S.matvec(x)), dense @ x, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(S.rmatvec(y)), dense.T @ y, rtol=1e-12
    )
    assert acheck(S).inform == 0


def test_stack_validation(rng):
    A, _ = _rand_dense_op(rng, 5, 4)
    B, _ = _rand_dense_op(rng, 5, 3)
    with pytest.raises(ValueError, match="share n"):
        lt.vstack_operators([A, B])
    C, _ = _rand_dense_op(rng, 4, 4)
    with pytest.raises(ValueError, match="share m"):
        lt.hstack_operators([A, C])


def test_scaled_and_diagonal(rng):
    A, Ad = _rand_dense_op(rng, 12, 9)
    S = lt.scale_operator(A, 2.5)
    x = rng.standard_normal(9)
    np.testing.assert_allclose(
        np.asarray(S.matvec(x)), 2.5 * (Ad @ x), rtol=1e-12
    )
    d = rng.standard_normal(9)
    D = lt.diagonal_operator(d)
    np.testing.assert_allclose(np.asarray(D.matvec(x)), d * x, rtol=1e-12)
    assert acheck(D).inform == 0


def test_tikhonov_identity_matches_damp(rng):
    """With L = I, tikhonov(lam) must agree with the built-in damp=lam
    (the reference's special case)."""
    m, n = 40, 25
    A, _ = _rand_dense_op(rng, m, n)
    b = rng.standard_normal(m)
    lam = 0.3
    ref = lt.lsqr(A, b, lam, atol=1e-12, btol=1e-12)
    L = lt.diagonal_operator(jnp.ones(n))
    res = lt.tikhonov(A, b, L, lam, atol=1e-12, btol=1e-12)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), rtol=1e-8, atol=1e-10
    )


def test_tikhonov_general_form_oracle(rng):
    """General L (first differences): compare against the dense
    normal-equations solution (A'A + lam^2 L'L) x = A'b."""
    m, n = 50, 30
    A, Ad = _rand_dense_op(rng, m, n)
    b = rng.standard_normal(m)
    lam = 0.7
    Ld = np.zeros((n - 1, n))
    Ld[np.arange(n - 1), np.arange(n - 1)] = -1.0
    Ld[np.arange(n - 1), np.arange(1, n)] = 1.0
    L = lt.as_operator(jnp.asarray(Ld))
    x_oracle = np.linalg.solve(
        Ad.T @ Ad + lam * lam * (Ld.T @ Ld), Ad.T @ b
    )
    for solver in ("lsqr", "lsmr", "cgls"):
        res = lt.tikhonov(A, b, L, lam, solver=solver,
                          atol=1e-12, btol=1e-12)
        np.testing.assert_allclose(
            np.asarray(res.x), x_oracle, rtol=1e-6, atol=1e-7
        )


def test_stacked_structured_blocks(rng):
    """Stacks compose with the structured fast-path operators: a DIA block
    over a diagonal regularizer solves like the dense equivalent."""
    from lsqr_tpu.ops.structured import dia_operator

    m = n = 200
    data = rng.standard_normal((3, m))
    data[1] += 4.0
    A = dia_operator(m, n, (-1, 0, 1), data, use_pallas=False)
    L = lt.diagonal_operator(jnp.full((n,), 0.5, A.dtype))
    S = lt.vstack_operators([A, L])
    dense = np.vstack([np.asarray(A.todense()), 0.5 * np.eye(n)])
    b = rng.standard_normal(m + n)
    ref = np.linalg.lstsq(dense, b, rcond=None)[0]
    res = lt.lsqr(S, b, atol=1e-12, btol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), ref, rtol=1e-6, atol=1e-8)
