"""LSMR cross-checks against scipy.sparse.linalg.lsmr.

The LSMR module shares the operator layer and loop scaffolding with the
LSQR core; these tests pin its recurrences to the published implementation
(scipy's) to the same standard test_ez.py uses for LSQR: identical istop,
identical iteration count, and x to f64 rounding.
"""

import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg

import lsqr_tpu as lt
from lsqr_tpu.models.paige_saunders import PaigeSaundersOperator, lstp


def _random_problem(m, n, nnz, seed, damp=0.0):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    if m == n:
        # keep the square case well-conditioned: a bare random sparse square
        # matrix is near-singular and x comparisons only measure rounding
        d = np.arange(n)
        rows = np.concatenate([rows, d])
        cols = np.concatenate([cols, d])
        vals = np.concatenate([vals, np.full(n, 4.0)])
    key = rows.astype(np.int64) * n + cols
    _, first = np.unique(key, return_index=True)
    rows, cols, vals = rows[first], cols[first], vals[first]
    b = rng.standard_normal(m)
    A = lt.coo_operator(m, n, vals, rows, cols)
    S = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(m, n))
    return A, S, b


@pytest.mark.parametrize(
    "m,n,damp",
    [(300, 120, 0.0), (200, 200, 0.0), (120, 300, 0.0), (300, 120, 0.1)],
)
def test_lsmr_matches_scipy(m, n, damp):
    A, S, b = _random_problem(m, n, 4 * max(m, n), seed=m + n)
    res = lt.lsmr(A, b, damp, atol=1e-10, btol=1e-10)
    ref = scipy.sparse.linalg.lsmr(S, b, damp=damp, atol=1e-10, btol=1e-10)
    x_ref, istop_ref, itn_ref = ref[0], ref[1], ref[2]
    assert int(res.istop) == istop_ref
    assert int(res.itn) == itn_ref
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-9)
    # the estimate quartet scipy also returns: normr, normar, norma, conda
    np.testing.assert_allclose(float(res.normr), ref[3], rtol=1e-6, atol=1e-12)
    # norma/conda accumulate late-iteration alpha/beta values whose rounding
    # diverges across implementations (Lanczos sensitivity) — scipy, this
    # build, and a hand-rolled numpy recurrence all disagree at ~0.1-1%
    np.testing.assert_allclose(float(res.normar), ref[4], rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(float(res.norma), ref[5], rtol=1e-2)
    np.testing.assert_allclose(float(res.conda), ref[6], rtol=0.5)
    np.testing.assert_allclose(float(res.normx), ref[7], rtol=1e-7)


def test_lsmr_default_tolerances_match_scipy():
    A, S, b = _random_problem(250, 100, 1000, seed=7)
    res = lt.lsmr(A, b)
    ref = scipy.sparse.linalg.lsmr(S, b)
    assert int(res.istop) == ref[1]
    assert int(res.itn) == ref[2]
    # at the loose default tolerances x is only ~1e-6-converged; path
    # rounding differences show up at that scale
    np.testing.assert_allclose(np.asarray(res.x), ref[0], atol=1e-5)


def test_lsmr_zero_rhs():
    A, _, _ = _random_problem(50, 30, 200, seed=3)
    res = lt.lsmr(A, np.zeros(50))
    assert int(res.istop) == 0
    assert int(res.itn) == 0
    np.testing.assert_array_equal(np.asarray(res.x), np.zeros(30))


def test_lsmr_x0_warm_start():
    A, S, b = _random_problem(200, 80, 800, seed=11)
    ref = scipy.sparse.linalg.lsmr(S, b, atol=1e-12, btol=1e-12)
    # warm-start from a perturbed solution: converges in far fewer iterations
    x0 = ref[0] + 1e-6 * np.sin(np.arange(80))
    res = lt.lsmr(A, b, x0=x0, atol=1e-12, btol=1e-12)
    cold = lt.lsmr(A, b, atol=1e-12, btol=1e-12)
    assert int(res.itn) < int(cold.itn)
    np.testing.assert_allclose(np.asarray(res.x), ref[0], atol=1e-8)
    # damped warm start (beyond the reference's recipe): lands on the same
    # damped solution via the stacked undamped form
    refd = lt.lsmr(A, b, 0.5, atol=1e-12, btol=1e-12)
    resd = lt.lsmr(A, b, 0.5, x0=np.asarray(refd.x), atol=1e-10, btol=1e-10)
    np.testing.assert_allclose(np.asarray(resd.x), np.asarray(refd.x),
                               atol=1e-8)
    assert int(resd.itn) <= 3


def test_lsmr_itnlim():
    A, S, b = _random_problem(400, 200, 2000, seed=5)
    res = lt.lsmr(A, b, atol=0.0, btol=0.0, conlim=0.0, itnlim=5)
    ref = scipy.sparse.linalg.lsmr(
        S, b, atol=0.0, btol=0.0, conlim=0.0, maxiter=5
    )
    assert int(res.istop) == 7 == ref[1]
    assert int(res.itn) == 5
    np.testing.assert_allclose(np.asarray(res.x), ref[0], atol=1e-10)


def test_lsmr_bounded_loop_matches_while():
    A, S, b = _random_problem(300, 150, 1500, seed=9, damp=0.0)
    w = lt.lsmr(A, b, 0.05, atol=1e-10, btol=1e-10)
    bnd = lt.lsmr(A, b, 0.05, atol=1e-10, btol=1e-10, loop="bounded",
                  loop_segment=16)
    assert int(w.istop) == int(bnd.istop)
    assert int(w.itn) == int(bnd.itn)
    np.testing.assert_allclose(np.asarray(w.x), np.asarray(bnd.x), rtol=0, atol=0)


def test_lsmr_record_trace():
    A, S, b = _random_problem(150, 60, 600, seed=13)
    res = lt.lsmr(A, b, atol=1e-9, btol=1e-9, record_trace=True)
    itn = int(res.itn)
    tr = np.asarray(res.trace)
    assert tr[itn, 0] == itn
    # trailing rows (past convergence) stay zero
    assert np.all(tr[itn + 1:] == 0)
    # normr column decreases monotonically (strictly the point of LSMR is
    # monotone normar; normr is also monotone for LSMR)
    normar = tr[1:itn + 1, 3]
    assert np.all(np.diff(normar) <= 1e-9 * normar[:-1] + 1e-12)


def test_lsmr_on_paige_saunders_operator():
    # the implicit HY*D*HZ operator exercises CallbackOperator-style matvecs
    prob = lstp(400, 200, nduplc=40, npower=3, damp=0.0)
    op, b, x_true = prob.A, prob.b, prob.x_true
    res = lt.lsmr(op, b, atol=1e-12, btol=1e-12, itnlim=800)
    err = np.linalg.norm(np.asarray(res.x) - np.asarray(x_true)) / (
        1.0 + np.linalg.norm(np.asarray(x_true))
    )
    assert err < 1e-3
    assert int(res.istop) in (1, 2)


def test_lsmr_dia_operator_path():
    # structured operator (DIA) through the same lsmr entry
    m = n = 256
    offsets = (-2, 0, 3)
    rng = np.random.default_rng(21)
    data = rng.standard_normal((len(offsets), n))
    data[1] += 4.0  # diagonally dominant: keep the comparison well-posed
    A = lt.dia_operator(m, n, offsets, data)
    dense = np.asarray(A.todense())
    b = rng.standard_normal(m)
    res = lt.lsmr(A, b, atol=1e-12, btol=1e-12)
    ref = scipy.sparse.linalg.lsmr(dense, b, atol=1e-12, btol=1e-12)
    assert int(res.istop) == ref[1]
    np.testing.assert_allclose(np.asarray(res.x), ref[0], atol=1e-8)
