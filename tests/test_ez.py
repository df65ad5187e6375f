"""EZ acceptance tests — ports of the reference's hard-assertion tests
(/root/reference/test/lsqrtest_ez.f90) plus live scipy cross-checks.

test_readme_3x3: the README 3x3 dense-as-COO system; requires
  |Ax - b| <= 1e-12 (lsqrtest_ez.f90:50) and the documented solution
  (README.md:55-58).
test_underdetermined_3x4: 3x4 system whose minimum-norm solution the
  reference records from scipy.sparse.linalg.lsqr (lsqrtest_ez.f90:58-68).
"""

import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg

import lsqr_tpu as lt

# README 3x3 system (lsqrtest_ez.f90:23-26), 0-based indices.
A3_VALS = [1.0, 4.0, 7.0, 2.0, 5.0, 88.0, 3.0, 66.0, 9.0]
A3_ROWS = [0, 1, 2, 0, 1, 2, 0, 1, 2]
A3_COLS = [0, 0, 0, 1, 1, 1, 2, 2, 2]
B3 = [1.0, 2.0, 3.0]

# 3x4 system (lsqrtest_ez.f90:73-78).
A34_VALS = [4.1, 1.1, 11.1, 5.1, -3.1, 3.1, 66.1, 8.1, -87.1, 0.1, -9.1, 2.1]
A34_ROWS = [0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2]
A34_COLS = [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3]


def _dense(m, n, vals, rows, cols):
    a = np.zeros((m, n))
    a[rows, cols] = vals
    return a


def test_readme_3x3():
    solver = lt.LSQRSolver(m=3, n=3, a=A3_VALS, irow=A3_ROWS, icol=A3_COLS)
    res = solver.solve(B3, damp=0.0)
    assert int(res.istop) == 1
    a = _dense(3, 3, A3_VALS, A3_ROWS, A3_COLS)
    resid = a @ np.asarray(res.x) - np.asarray(B3)
    # hard assertion from lsqrtest_ez.f90:50
    assert np.abs(resid).max() <= 1e-12
    # documented solution, README.md:57
    np.testing.assert_allclose(
        np.asarray(res.x), [1.242424, -6.060606e-2, -4.040404e-2], rtol=1e-5
    )


def test_underdetermined_3x4():
    solver = lt.LSQRSolver(m=3, n=4, a=A34_VALS, irow=A34_ROWS, icol=A34_COLS)
    res = solver.solve(B3, damp=0.0)
    assert int(res.istop) == 1
    a = _dense(3, 4, A34_VALS, A34_ROWS, A34_COLS)
    resid = a @ np.asarray(res.x) - np.asarray(B3)
    assert np.abs(resid).max() <= 1e-12
    # scipy record from lsqrtest_ez.f90:66 is for the INTEGER-valued matrix in
    # the comment; the actual Fortran data adds 0.1 to each entry, so instead
    # cross-check directly against live scipy on the same matrix.
    ref_x, ref_istop, ref_itn = scipy.sparse.linalg.lsqr(a, np.asarray(B3))[:3]
    assert ref_istop == 1
    np.testing.assert_allclose(np.asarray(res.x), ref_x, atol=1e-8)
    assert abs(int(res.itn) - ref_itn) <= 1


def test_scipy_parity_readme_matrix():
    """The recorded scipy output in the reference (lsqrtest_ez.f90:58-68) is
    for the integer 3x4 matrix; reproduce that record exactly."""
    a = np.array(
        [[4.0, 5.0, 66.0, 0.1], [1.0, -3.0, 8.0, -9.0], [11.0, 3.0, -87.0, 2.0]]
    )
    sp = scipy.sparse.coo_matrix(a)
    # scipy defaults atol = btol = 1e-8; zero would mean machine-precision
    # guards here (one extra iteration).
    res = lt.lsqr(
        lt.coo_operator(3, 4, sp.data, sp.row, sp.col),
        np.array([1.0, 2.0, 3.0]),
        0.0,
        itnlim=100,
        atol=1e-8,
        btol=1e-8,
    )
    assert int(res.istop) == 1
    # recorded scipy solution (lsqrtest_ez.f90:66)
    np.testing.assert_allclose(
        np.asarray(res.x),
        [0.26437473, 0.04901579, -0.00426183, -0.21297414],
        atol=1e-7,
    )
    assert int(res.itn) == 3
    # scipy tuple order is (x, istop, itn, r1norm, r2norm, anorm, acond, ...):
    # the recorded 110.702... is anorm, 15.3161... is acond
    # (lsqrtest_ez.f90:66).
    np.testing.assert_allclose(float(res.anorm), 110.70234866523838, rtol=1e-6)
    np.testing.assert_allclose(float(res.acond), 15.316189089999897, rtol=1e-6)


def test_ez_validation_errors():
    """Constructor validation parity (lsqr.f90:109-111)."""
    with pytest.raises(ValueError):
        lt.LSQRSolver(m=3, n=3, a=[1.0, 2.0], irow=[0, 1, 2], icol=[0, 1, 2])
    with pytest.raises(ValueError):
        lt.LSQRSolver(m=2, n=3, a=[1.0], irow=[2], icol=[0])
    with pytest.raises(ValueError):
        lt.LSQRSolver(m=3, n=2, a=[1.0], irow=[0], icol=[2])


def test_zero_rhs_returns_zero():
    """arnorm == 0 at setup => istop = 0, x = 0, no iterations
    (lsqr.f90:646-648)."""
    solver = lt.LSQRSolver(m=3, n=3, a=A3_VALS, irow=A3_ROWS, icol=A3_COLS)
    res = solver.solve([0.0, 0.0, 0.0], damp=0.0)
    assert int(res.istop) == 0
    assert int(res.itn) == 0
    np.testing.assert_array_equal(np.asarray(res.x), 0.0)
