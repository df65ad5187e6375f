"""scipy interop and auto-format selection tests."""

import numpy as np
import pytest
import scipy.sparse

import lsqr_tpu as lt
from lsqr_tpu.ops.interop import auto_operator, csr_operator, from_scipy
from lsqr_tpu.ops.structured import BlockELLOperator, DIAOperator, ELLOperator


def _check_matches(op, S, rng, atol=1e-10):
    x = rng.standard_normal(S.shape[1])
    y = rng.standard_normal(S.shape[0])
    np.testing.assert_allclose(np.asarray(op.matvec(x)), S @ x, atol=atol)
    np.testing.assert_allclose(np.asarray(op.rmatvec(y)), S.T @ y, atol=atol)


def test_from_scipy_formats(rng):
    S = scipy.sparse.random(120, 80, density=0.05, random_state=7)
    for fmt in (None, "ell", "coo"):
        op = from_scipy(S, format=fmt)
        _check_matches(op, S, rng)


def test_from_scipy_dia(rng):
    m = n = 200
    S = scipy.sparse.diags(
        [rng.standard_normal(m - 2), rng.standard_normal(m),
         rng.standard_normal(m - 3)],
        offsets=[-2, 0, 3],
        shape=(m, n),
    ).tocsr()
    op = from_scipy(S, format="dia")
    assert isinstance(op, DIAOperator)
    _check_matches(op, S, rng)
    # auto-detect should also choose DIA for a banded pattern
    op2 = from_scipy(S)
    assert isinstance(op2, DIAOperator)
    _check_matches(op2, S, rng)


def test_from_scipy_rectangular_dia(rng):
    S = scipy.sparse.diags(
        [np.ones(100), 2 * np.ones(100)], offsets=[0, 40], shape=(100, 140)
    ).tocsr()
    op = from_scipy(S, format="dia")
    _check_matches(op, S, rng)


def test_auto_operator_fallback_ell(rng):
    # uniform random pattern: not banded, not blocky -> ELL
    m, n, nnz = 3000, 2000, 4000
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    op = auto_operator(m, n, vals, rows, cols)
    assert isinstance(op, ELLOperator)
    S = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    _check_matches(op, S, rng)


def test_csr_operator(rng):
    S = scipy.sparse.random(90, 70, density=0.08, random_state=3).tocsr()
    op = csr_operator(90, 70, S.indptr, S.indices, S.data)
    _check_matches(op, S, rng)


def test_solve_via_scipy_matrix(rng):
    S = scipy.sparse.random(150, 60, density=0.1, random_state=11).tocsr()
    b = rng.standard_normal(150)
    op = from_scipy(S)
    res = lt.lsqr(op, b, 0.0, atol=1e-10, btol=1e-10, itnlim=400)
    ref = scipy.sparse.linalg.lsqr(S, b, atol=1e-10, btol=1e-10, iter_lim=400)
    np.testing.assert_allclose(np.asarray(res.x), ref[0], atol=1e-6)
