"""LSRN randomized preconditioning (lsqr_tpu.randomized)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsqr_tpu import coo_operator, lsqr
from lsqr_tpu.ops.linop import DenseOperator
from lsqr_tpu.randomized import (lsrn, lsrn_preconditioner, sketch_left,
                                 sketch_right)


def _ill_conditioned(rng, m, n, cond=1e8):
    U, _ = np.linalg.qr(rng.standard_normal((m, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = 10.0 ** np.linspace(0, -np.log10(cond), n)
    A = U @ np.diag(s) @ V.T
    b = rng.standard_normal(m)
    return A, b


def test_sketch_left_matches_dense(rng):
    """The generic (chunked rmatvec) sketch equals the dense matmul sketch
    bit-for-bit on the same operator values + seed."""
    m, n = 60, 25
    Ad = rng.standard_normal((m, n))
    r, c = np.nonzero(np.ones((m, n)))
    A_coo = coo_operator(m, n, Ad[r, c], r, c)
    S_dense = np.asarray(sketch_left(DenseOperator(jnp.asarray(Ad)), 50, seed=3))
    S_coo = np.asarray(sketch_left(A_coo, 50, seed=3, chunk=16))
    np.testing.assert_allclose(S_coo, S_dense, rtol=1e-12, atol=1e-13)


def test_sketch_right_shape_and_value(rng):
    m, n = 20, 45
    Ad = rng.standard_normal((m, n))
    S = np.asarray(sketch_right(DenseOperator(jnp.asarray(Ad)), 30, seed=1))
    assert S.shape == (m, 30)


def test_preconditioner_flattens_spectrum(rng):
    """cond(A N) must be tiny regardless of cond(A) ~ 1e8."""
    A, _ = _ill_conditioned(rng, 300, 40)
    N, r, bound = lsrn_preconditioner(DenseOperator(jnp.asarray(A)), gamma=4.0)
    assert r == 40
    AN = A @ np.asarray(N)
    sv = np.linalg.svd(AN, compute_uv=False)
    assert sv[0] / sv[-1] < bound  # w.h.p. bound holds
    assert bound < 4.0


def test_lsrn_overdetermined_beats_plain(rng):
    """Ill-conditioned (1e8) LS problem: LSRN reaches the lstsq solution in
    a few dozen iterations; plain LSQR with the same budget cannot."""
    A, b = _ill_conditioned(rng, 400, 60)
    x_star = np.linalg.lstsq(A, b, rcond=None)[0]
    res = lsrn(DenseOperator(jnp.asarray(A)), b, atol=1e-12, btol=1e-12,
               itnlim=100)
    err = np.linalg.norm(np.asarray(res.x) - x_star) / np.linalg.norm(x_star)
    assert err < 1e-8
    assert int(res.result.itn) < 60          # conditioning-independent
    # acond is LSQR's Frobenius-based running estimate: ~sqrt(n) * spectral
    # cond for the flat preconditioned spectrum, vs ~1e8 unpreconditioned
    assert float(res.result.acond) < res.cond_bound * np.sqrt(60) * 2
    plain = lsqr(DenseOperator(jnp.asarray(A)), b, atol=1e-12, btol=1e-12,
                 conlim=0.0, itnlim=int(res.result.itn))
    err_plain = np.linalg.norm(np.asarray(plain.x) - x_star) / np.linalg.norm(x_star)
    assert err_plain > 100 * err


def test_lsrn_damped_matches_closed_form(rng):
    A, b = _ill_conditioned(rng, 120, 30, cond=1e4)
    damp = 0.05
    x_star = np.linalg.solve(A.T @ A + damp**2 * np.eye(30), A.T @ b)
    res = lsrn(DenseOperator(jnp.asarray(A)), b, damp, atol=1e-13, btol=1e-13)
    np.testing.assert_allclose(np.asarray(res.x), x_star, rtol=1e-8, atol=1e-10)


def test_lsrn_underdetermined_min_norm(rng):
    """m < n consistent system: LSRN-left returns the minimum-norm
    solution (pinv oracle)."""
    m, n = 30, 90
    A = rng.standard_normal((m, n)) * 10.0 ** np.linspace(0, -6, m)[:, None]
    b = rng.standard_normal(m)
    x_star = np.linalg.pinv(A) @ b
    res = lsrn(DenseOperator(jnp.asarray(A)), b, atol=1e-13, btol=1e-13,
               itnlim=200)
    assert res.P is not None and res.N is None
    np.testing.assert_allclose(np.asarray(res.x), x_star, rtol=1e-7, atol=1e-9)


def test_lsrn_rank_deficient(rng):
    """Exactly rank-deficient A: the sketch SVD truncates the rank and the
    solve returns the pinv (min-norm LS) solution — where plain LSQR has
    no rank oracle at all."""
    m, n, r_true = 100, 40, 25
    B1 = rng.standard_normal((m, r_true))
    B2 = rng.standard_normal((r_true, n))
    A = B1 @ B2
    b = rng.standard_normal(m)
    x_star = np.linalg.pinv(A) @ b
    res = lsrn(DenseOperator(jnp.asarray(A)), b, rcond=1e-10,
               atol=1e-13, btol=1e-13)
    assert res.rank == r_true
    np.testing.assert_allclose(np.asarray(res.x), x_star, rtol=1e-7, atol=1e-9)


def test_lsrn_sparse_operator(rng):
    """The chunked-rmatvec sketch path end-to-end on a COO operator."""
    m, n, nnz = 150, 40, 1200
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz)
    A = coo_operator(m, n, v, r, c)
    Ad = np.zeros((m, n))
    np.add.at(Ad, (r, c), v)
    b = rng.standard_normal(m)
    x_star = np.linalg.lstsq(Ad, b, rcond=None)[0]
    res = lsrn(A, b, atol=1e-12, btol=1e-12, chunk=32)
    np.testing.assert_allclose(np.asarray(res.x), x_star, rtol=1e-7, atol=1e-9)


def test_lsrn_solver_variants(rng):
    A, b = _ill_conditioned(rng, 100, 20, cond=1e5)
    x_star = np.linalg.lstsq(A, b, rcond=None)[0]
    for solver in ("lsmr", "cgls"):
        res = lsrn(DenseOperator(jnp.asarray(A)), b, solver=solver,
                   atol=1e-12, btol=1e-12)
        np.testing.assert_allclose(np.asarray(res.x), x_star,
                                   rtol=1e-6, atol=1e-8)
    with pytest.raises(ValueError, match="unknown solver"):
        lsrn(DenseOperator(jnp.asarray(A)), b, solver="gmres")


def test_lsrn_deterministic(rng):
    A, b = _ill_conditioned(rng, 80, 15, cond=1e3)
    r1 = lsrn(DenseOperator(jnp.asarray(A)), b, seed=7)
    r2 = lsrn(DenseOperator(jnp.asarray(A)), b, seed=7)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))
