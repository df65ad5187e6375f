"""WCOO — general-sparsity crossbar/MXU kernels (ops/wcoo.py,
ops/pallas_wcoo.py).

Runs on the CPU test mesh in Pallas interpret mode (use_pallas=True off
TPU selects interpret), cross-checked against scipy and the COO oracle.
Reference anchor: the general COO kernels, lsqr.f90:156-194."""

import numpy as np
import pytest
import scipy.sparse

import lsqr_tpu as lt
from lsqr_tpu.ops.wcoo import WCOOOperator, WCOOPackError, wcoo_operator


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _random_coo(rng, m, n, nnz, zipf=None):
    if zipf:
        cols = rng.zipf(zipf, size=4 * nnz) - 1
        cols = cols[cols < n][:nnz].astype(np.int64)
    else:
        cols = rng.integers(0, n, nnz).astype(np.int64)
    rows = rng.integers(0, m, nnz).astype(np.int64)
    vals = rng.standard_normal(nnz).astype(np.float32)
    return vals, rows, cols


@pytest.mark.parametrize("m,n,nnz", [(20000, 300, 60000), (16384, 1024, 50000)])
@pytest.mark.slow
def test_wcoo_products_vs_scipy(rng, m, n, nnz):
    vals, rows, cols = _random_coo(rng, m, n, nnz)
    A = wcoo_operator(m, n, vals, rows, cols, use_pallas=True)
    S = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    x = rng.standard_normal(n).astype(np.float32)
    y = rng.standard_normal(m).astype(np.float32)
    u = np.asarray(A.matvec(x))
    np.testing.assert_allclose(u, S @ x, atol=2e-4 * np.abs(S @ x).max())
    z = np.asarray(A.rmatvec(y))
    np.testing.assert_allclose(z, S.T @ y, atol=2e-4 * np.abs(S.T @ y).max())


@pytest.mark.slow
def test_wcoo_fused_pair(rng):
    m, n, nnz = 20000, 512, 80000
    vals, rows, cols = _random_coo(rng, m, n, nnz, zipf=1.1)
    A = wcoo_operator(m, n, vals, rows, cols, use_pallas=True)
    S = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    x = rng.standard_normal(n).astype(np.float32)
    y = rng.standard_normal(m).astype(np.float32)
    u, z = A.fused_pair(y=y, win=x, c1=0.7, c2=0.3)
    uref = 0.7 * (S @ x) - 0.3 * y
    zref = S.T @ uref
    np.testing.assert_allclose(np.asarray(u), uref,
                               atol=2e-4 * np.abs(uref).max())
    np.testing.assert_allclose(np.asarray(z), zref,
                               atol=2e-4 * np.abs(zref).max())


@pytest.mark.slow
def test_wcoo_empty_rows_and_heavy_cols(rng):
    # rows 0..99 dense-ish, an empty band (within the 1024-row window
    # tolerance), then a sparse tail; one column receiving ~half the
    # entries
    m, n = 16384, 256
    rows = np.concatenate([
        rng.integers(0, 100, 800),
        rng.integers(800, m, 40000),
    ])
    cols = np.concatenate([
        np.zeros(800, np.int64),
        rng.integers(0, n, 40000),
    ])
    vals = rng.standard_normal(40800).astype(np.float32)
    A = wcoo_operator(m, n, vals, rows, cols, use_pallas=True)
    S = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    x = rng.standard_normal(n).astype(np.float32)
    np.testing.assert_allclose(np.asarray(A.matvec(x)), S @ x,
                               atol=1e-4 * np.abs(S @ x).max())
    y = rng.standard_normal(m).astype(np.float32)
    np.testing.assert_allclose(np.asarray(A.rmatvec(y)), S.T @ y,
                               atol=1e-4 * np.abs(S.T @ y).max())


def test_wcoo_pack_refusals(rng):
    with pytest.raises(WCOOPackError, match="n <= 4096"):
        wcoo_operator(20000, 8192, [1.0], [0], [0])
    # mostly-empty rows: 128 consecutive entries span > 1024 rows
    m, nnz = 1 << 20, 2000
    rows = np.sort(rng.choice(m, nnz, replace=False))
    cols = rng.integers(0, 100, nnz)
    with pytest.raises(WCOOPackError, match="row span"):
        wcoo_operator(m, 100, np.ones(nnz, np.float32), rows, cols)
    # f64 keeps the exact COO path
    with pytest.raises(WCOOPackError, match="f32"):
        wcoo_operator(20000, 100, [1.0], [0], [0], dtype=np.float64)


def test_wcoo_auto_routing(rng):
    m, n, nnz = 32768, 1000, 150000
    vals, rows, cols = _random_coo(rng, m, n, nnz, zipf=1.1)
    A = lt.auto_operator(m, n, vals, rows, cols)
    assert isinstance(A, WCOOOperator)
    # pathological pattern falls through to another format
    m2 = 1 << 20
    rows2 = np.sort(rng.choice(m2, 2000, replace=False))
    cols2 = rng.integers(0, 100, 2000)
    B = lt.auto_operator(m2, 100, np.ones(2000, np.float32), rows2, cols2)
    assert not isinstance(B, WCOOOperator)
    # n > 4096 never routes to WCOO
    vals3, rows3, cols3 = _random_coo(rng, 32768, 8192, 100000)
    C = lt.auto_operator(32768, 8192, vals3, rows3, cols3)
    assert not isinstance(C, WCOOOperator)


@pytest.mark.slow
def test_wcoo_lsqr_solve(rng):
    # end-to-end: WCOO operator through the full solver with the fused
    # pair path forced (interpret mode on CPU)
    m, n, nnz = 16384, 200, 60000
    vals, rows, cols = _random_coo(rng, m, n, nnz)
    A = wcoo_operator(m, n, vals, rows, cols, use_pallas=True)
    S = scipy.sparse.coo_matrix(
        (vals, (rows, cols)), shape=(m, n)).tocsr()
    x_true = rng.standard_normal(n).astype(np.float32)
    b = S @ x_true
    res = lt.lsqr(A, b, atol=1e-6, btol=1e-6,
                  options=lt.LSQROptions(pair=True))
    ref = scipy.sparse.linalg.lsqr(S, b, atol=1e-6, btol=1e-6)
    assert int(res.istop) in (1, 2)
    np.testing.assert_allclose(np.asarray(res.x), ref[0], atol=5e-3)


@pytest.mark.slow
def test_wcoo_oracle_consistency(rng):
    # Pallas (interpret) vs the internal COO fallback on the same operator
    m, n, nnz = 16384, 640, 50000
    vals, rows, cols = _random_coo(rng, m, n, nnz, zipf=1.3)
    Ap = wcoo_operator(m, n, vals, rows, cols, use_pallas=True)
    Ac = wcoo_operator(m, n, vals, rows, cols, use_pallas=False)
    x = rng.standard_normal(n).astype(np.float32)
    np.testing.assert_allclose(np.asarray(Ap.matvec(x)),
                               np.asarray(Ac.matvec(x)), atol=1e-3)
    y = rng.standard_normal(m).astype(np.float32)
    np.testing.assert_allclose(np.asarray(Ap.rmatvec(y)),
                               np.asarray(Ac.rmatvec(y)), atol=1e-3)


@pytest.mark.slow
def test_wcoo_pack_random_sweep(rng):
    """Robustness sweep: random shapes/densities/skews either pack and
    produce correct products (vs scipy) or refuse cleanly — never wrong
    answers. (New-format safety net; interpret-mode kernels.)"""
    packed = refused = 0
    for seed in range(6):
        r = np.random.default_rng(seed)
        m = 16384 + int(r.integers(0, 2000))
        n = int(r.choice([64, 200, 512, 1024, 2048]))
        density = float(r.uniform(0.3, 8.0))
        nnz = max(16, int(m * density))
        if r.random() < 0.5:
            cols = r.zipf(1.1 + r.random(), size=4 * nnz) - 1
            cols = cols[cols < n][:nnz]
            nnz = cols.size
        else:
            cols = r.integers(0, n, nnz)
        rows = r.integers(0, m, nnz)
        vals = r.standard_normal(nnz).astype(np.float32)
        try:
            A = wcoo_operator(m, n, vals, rows, cols, use_pallas=True)
        except WCOOPackError:
            refused += 1
            continue
        packed += 1
        S = scipy.sparse.coo_matrix((vals, (rows, cols)),
                                    shape=(m, n)).tocsr()
        x = r.standard_normal(n).astype(np.float32)
        y = r.standard_normal(m).astype(np.float32)
        ref = S @ x
        np.testing.assert_allclose(
            np.asarray(A.matvec(x)), ref,
            atol=2e-4 * max(1.0, np.abs(ref).max()), err_msg=f"seed {seed}")
        refz = S.T @ y
        np.testing.assert_allclose(
            np.asarray(A.rmatvec(y)), refz,
            atol=2e-4 * max(1.0, np.abs(refz).max()), err_msg=f"seed {seed}")
    # refusal coverage lives in test_wcoo_pack_refusals; here every
    # packed case must have produced correct products
    assert packed + refused == 6 and packed >= 4, (packed, refused)
