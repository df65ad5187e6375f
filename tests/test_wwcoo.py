"""WWCOO / RWCOO — wide-n general-sparsity kernels (ops/wwcoo.py,
ops/pallas_wwcoo.py, ops/rwcoo.py).

Runs on the CPU test mesh in Pallas interpret mode (use_pallas=True off
TPU selects interpret), cross-checked against scipy and the COO oracle.
Reference anchor: the general COO kernels, lsqr.f90:156-194; the wide-n
regime is round-5 VERDICT missing #2."""

import numpy as np
import pytest
import scipy.sparse

import lsqr_tpu as lt
from lsqr_tpu.ops.rwcoo import RWCOOOperator, rwcoo_operator
from lsqr_tpu.ops.wwcoo import (WWCOOOperator, WWCOOPackError,
                                wwcoo_operator)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _random_coo(rng, m, n, nnz, zipf=None):
    if zipf:
        cols = rng.zipf(zipf, size=6 * nnz) - 1
        cols = cols[cols < n][:nnz].astype(np.int64)
    else:
        cols = rng.integers(0, n, nnz).astype(np.int64)
    rows = rng.integers(0, m, nnz).astype(np.int64)
    vals = rng.standard_normal(nnz).astype(np.float32)
    return vals, rows, cols


@pytest.mark.slow
def test_wwcoo_products_vs_scipy(rng):
    # uniform wide pattern: per-chunk compaction sees D ~ 16k distinct
    m, n, nnz = 20000, 20000, 60000
    vals, rows, cols = _random_coo(rng, m, n, nnz)
    A = wwcoo_operator(m, n, vals, rows, cols, use_pallas=True)
    S = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    x = rng.standard_normal(n).astype(np.float32)
    y = rng.standard_normal(m).astype(np.float32)
    u = np.asarray(A.matvec(x))
    np.testing.assert_allclose(u, S @ x, atol=2e-4 * np.abs(S @ x).max())
    z = np.asarray(A.rmatvec(y))
    np.testing.assert_allclose(z, S.T @ y, atol=2e-4 * np.abs(S.T @ y).max())


@pytest.mark.slow
def test_wwcoo_fused_pair_and_edges(rng):
    # zipf columns; m NOT a chunk multiple, n NOT a 1024 multiple, and
    # duplicate entries (COO semantics: summed)
    m, n, nnz = 20001, 12345, 50000
    vals, rows, cols = _random_coo(rng, m, n, nnz, zipf=1.2)
    rows[-100:] = rows[:100]
    cols[-100:] = cols[:100]   # duplicates
    A = wwcoo_operator(m, n, vals, rows, cols, use_pallas=True)
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


def test_wwcoo_pack_refusals():
    with pytest.raises(WWCOOPackError):
        wwcoo_operator(100, 300_000, np.ones(1, np.float32), [0], [0])
    with pytest.raises(WWCOOPackError):
        wwcoo_operator(100, 8192, np.array([], np.float32), [], [])
    with pytest.raises(WWCOOPackError):
        wwcoo_operator(100, 8192, np.ones(2, np.complex64), [0, 1], [0, 1])


@pytest.mark.slow
def test_rwcoo_products_and_pair(rng):
    # hot/cold routing on a wide zipf pattern: top-4096 columns stream
    # through the compacted WCOO panel, the rest through WWCOO
    m, n, nnz = 40000, 30000, 120000
    vals, rows, cols = _random_coo(rng, m, n, nnz, zipf=1.1)
    A = rwcoo_operator(m, n, vals, rows, cols, use_pallas=True)
    assert A.cold is not None  # the tail really exercises the cold path
    S = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    x = rng.standard_normal(n).astype(np.float32)
    y = rng.standard_normal(m).astype(np.float32)
    u = np.asarray(A.matvec(x))
    np.testing.assert_allclose(u, S @ x, atol=2e-4 * np.abs(S @ x).max())
    z = np.asarray(A.rmatvec(y))
    np.testing.assert_allclose(z, S.T @ y, atol=2e-4 * np.abs(S.T @ y).max())
    u2, z2 = A.fused_pair(y=y, win=x, c1=1.3, c2=0.7)
    uref = 1.3 * (S @ x) - 0.7 * y
    zref = S.T @ uref
    np.testing.assert_allclose(np.asarray(u2), uref,
                               atol=2e-4 * np.abs(uref).max())
    np.testing.assert_allclose(np.asarray(z2), zref,
                               atol=2e-4 * np.abs(zref).max())


def test_rwcoo_auto_routing(rng):
    # column-concentrated wide pattern -> RWCOO
    m, n, nnz = 32768, 30000, 120000
    vals, rows, cols = _random_coo(rng, m, n, nnz, zipf=1.1)
    A = lt.auto_operator(m, n, vals, rows, cols)
    assert isinstance(A, RWCOOOperator)
    # near-uniform wide pattern: cold work lists blow the caps -> refused
    # (the measured structural wall; falls through to ELL/HYB/COO)
    vals2, rows2, cols2 = _random_coo(rng, 32768, 65536, 100000)
    B = lt.auto_operator(32768, 65536, vals2, rows2, cols2)
    assert not isinstance(B, (RWCOOOperator, WWCOOOperator))
    # f64 keeps the exact COO-class path
    C = lt.auto_operator(m, n, vals.astype(np.float64), rows, cols,
                         dtype="float64")
    assert not isinstance(C, (RWCOOOperator, WWCOOOperator))


@pytest.mark.slow
def test_rwcoo_lsqr_solve(rng):
    # end-to-end: RWCOO through the full solver with the fused pair path
    # (interpret mode on CPU), cross-checked against scipy at matched
    # iteration count. The zipf wide system has many empty columns
    # (rank-deficient LS), so the comparison is a DAMPED solve — well
    # conditioned, where 60 f32 iterations track f64 scipy closely —
    # rather than a convergence race the f32 kernels cannot win.
    m, n, nnz = 20000, 8192, 80000
    vals, rows, cols = _random_coo(rng, m, n, nnz, zipf=1.1)
    A = rwcoo_operator(m, n, vals, rows, cols, use_pallas=True)
    S = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    x_true = rng.standard_normal(n).astype(np.float32)
    b = S @ x_true
    res = lt.lsqr(A, b, 0.5, atol=0.0, btol=0.0, conlim=0.0, itnlim=60,
                  options=lt.LSQROptions(pair=True))
    ref = scipy.sparse.linalg.lsqr(S, b, damp=0.5, atol=0.0, btol=0.0,
                                   conlim=0.0, iter_lim=60)
    assert int(res.itn) == 60 and ref[2] == 60
    # f32 and f64 trajectories drift in the small-singular-value
    # directions over 60 iterations, so compare the damped OBJECTIVE the
    # solver minimizes, not the iterates: ours must be as good as
    # scipy's to f32 rounding
    def phi(x):
        r = S @ x - np.asarray(b, np.float64)
        return float(r @ r + 0.25 * x @ x)

    assert phi(np.asarray(res.x, np.float64)) <= phi(ref[0]) * 1.001


@pytest.mark.slow
def test_wwcoo_oracle_consistency(rng):
    # Pallas (interpret) vs the internal COO fallback on the same operator
    m, n, nnz = 16384, 9000, 50000
    vals, rows, cols = _random_coo(rng, m, n, nnz, zipf=1.3)
    Ap = wwcoo_operator(m, n, vals, rows, cols, use_pallas=True)
    Ac = wwcoo_operator(m, n, vals, rows, cols, use_pallas=False)
    x = rng.standard_normal(n).astype(np.float32)
    np.testing.assert_allclose(np.asarray(Ap.matvec(x)),
                               np.asarray(Ac.matvec(x)), atol=1e-3)
    y = rng.standard_normal(m).astype(np.float32)
    np.testing.assert_allclose(np.asarray(Ap.rmatvec(y)),
                               np.asarray(Ac.rmatvec(y)), atol=1e-3)


@pytest.mark.slow
def test_rwcoo_pack_random_sweep(rng):
    """Robustness sweep for the wide-n router: random shapes/densities/
    skews either pack and produce correct products (vs scipy) or refuse
    cleanly — never wrong answers. (Mirrors test_wcoo_pack_random_sweep;
    interpret-mode kernels, so shapes stay small.)"""
    from lsqr_tpu.ops.wcoo import WCOOPackError

    packed = refused = 0
    for seed in range(5):
        r = np.random.default_rng(100 + seed)
        m = 16384 + int(r.integers(0, 2000))
        n = int(r.choice([5000, 8192, 20000, 40000]))
        density = float(r.uniform(0.3, 4.0))
        nnz = max(64, int(m * density))
        if r.random() < 0.7:
            cols = r.zipf(1.05 + r.random(), size=6 * nnz) - 1
            cols = cols[cols < n][:nnz]
            nnz = cols.size
        else:
            cols = r.integers(0, n, nnz)
        rows = r.integers(0, m, nnz)
        vals = r.standard_normal(nnz).astype(np.float32)
        try:
            A = rwcoo_operator(m, n, vals, rows, cols, use_pallas=True)
        except (WWCOOPackError, WCOOPackError):
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
    # every packed case must have produced correct products; at least
    # a couple of the skewed draws must actually pack
    assert packed + refused == 5 and packed >= 2, (packed, refused)
