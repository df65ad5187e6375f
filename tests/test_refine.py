"""Mixed-precision iterative refinement (lsqr_tpu.refine) and the host
export layer it rides on (lsqr_tpu.ops.host).

Oracles: numpy lstsq / pinv / closed-form normal equations in f64, always
of the f32-STORED matrix (the refined answer is the LS solution of what
the device actually applies). Reference anchor: the warm-start recipe
this generalizes, lsqr.f90:303-320, and the precision note at
lsqr.f90:429-430."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import lsqr_tpu as lt
from lsqr_tpu.ops.host import host_coo, host_products, to_scipy
from lsqr_tpu.ops.jdia import jdia_operator
from lsqr_tpu.refine import lsqr_refined


def _ill_conditioned(m, n, cond, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    U, _ = np.linalg.qr(rng.standard_normal((m, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.logspace(0, -np.log10(cond), n)
    return ((U * s) @ V.T).astype(dtype)


def _sparse_coo(m, n, nnz, seed=0):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz).astype(np.float32)
    return rows, cols, vals


# ---------------------------------------------------------------------------
# host export layer
# ---------------------------------------------------------------------------


def _assert_matches_dense(A, oracle, rtol=0.0):
    got = to_scipy(A).toarray()
    np.testing.assert_allclose(got, oracle, atol=0, rtol=rtol)


def test_to_scipy_coo_dense_ell():
    m, n = 23, 17
    rows, cols, vals = _sparse_coo(m, n, 120)
    dense = np.zeros((m, n), np.float64)
    np.add.at(dense, (rows, cols), vals.astype(np.float64))

    _assert_matches_dense(lt.coo_operator(m, n, vals, rows, cols), dense)
    _assert_matches_dense(lt.DenseOperator(jnp.asarray(dense, jnp.float32)),
                          dense.astype(np.float32).astype(np.float64))
    _assert_matches_dense(lt.ell_operator(m, n, vals, rows, cols), dense)


def test_to_scipy_dia_shared_blockell_jdia():
    m = n = 96
    offsets = (-3, -1, 0, 2, 5)
    rng = np.random.default_rng(1)
    data = rng.standard_normal((len(offsets), m)).astype(np.float32)
    A = lt.dia_operator(m, n, offsets, data)
    _assert_matches_dense(A, np.asarray(A.todense(), np.float64))

    Ash = lt.dia_shared_operator(m, n, offsets, data)
    _assert_matches_dense(Ash, np.asarray(Ash.todense(), np.float64))

    rows, cols, vals = _sparse_coo(m, n, 400, seed=2)
    Ab = lt.block_ell_operator(m, n, vals, rows, cols, block=(8, 8))
    # BlockELL/JDIA todense accumulate duplicate positions in f32; the
    # host export sums them in f64, so compare at f32 rounding
    _assert_matches_dense(Ab, np.asarray(Ab.todense(), np.float64),
                          rtol=1e-6)

    Aj = jdia_operator(m, n, vals, rows, cols)
    _assert_matches_dense(Aj, np.asarray(Aj.todense(), np.float64),
                          rtol=1e-6)


def test_to_scipy_composites():
    m, n = 14, 10
    rng = np.random.default_rng(3)
    a1 = rng.standard_normal((m, n)).astype(np.float32)
    a2 = rng.standard_normal((6, n)).astype(np.float32)
    A1, A2 = lt.DenseOperator(jnp.asarray(a1)), lt.DenseOperator(jnp.asarray(a2))
    d = rng.standard_normal(n).astype(np.float32)
    a1_64, d64 = a1.astype(np.float64), d.astype(np.float64)

    V = lt.vstack_operators([A1, A2])
    _assert_matches_dense(V, np.vstack([a1, a2]).astype(np.float64))

    H = lt.hstack_operators([A1, lt.DenseOperator(jnp.asarray(a1))])
    _assert_matches_dense(H, np.hstack([a1_64, a1_64]))

    D = lt.diagonal_operator(jnp.asarray(d))
    _assert_matches_dense(D, np.diag(d64))

    # host export promotes STORED f32 values exactly, then scales in f64
    S = lt.scale_operator(A1, 2.5)
    _assert_matches_dense(S, 2.5 * a1_64)

    from lsqr_tpu.ops.precondition import ColumnScaledOperator, ComposedOperator

    CS = ColumnScaledOperator(op=A1, scale=jnp.asarray(d))
    _assert_matches_dense(CS, a1_64 * d64)

    P = ComposedOperator(outer=A1, inner=lt.diagonal_operator(jnp.asarray(d)))
    _assert_matches_dense(P, a1_64 @ np.diag(d64), rtol=1e-14)


def test_host_coo_roundtrips_from_scipy():
    m, n = 31, 19
    rows, cols, vals = _sparse_coo(m, n, 150, seed=4)
    mat = sp.csr_matrix(sp.coo_matrix((vals, (rows, cols)), shape=(m, n)))
    A = lt.from_scipy(mat)
    back = to_scipy(A)
    assert (abs(back - mat.astype(np.float64))).max() == 0.0


def test_host_products_match_f64_oracle():
    m, n = 40, 28
    rows, cols, vals = _sparse_coo(m, n, 200, seed=5)
    A = lt.coo_operator(m, n, vals, rows, cols)
    dense = to_scipy(A).toarray()
    mv, rmv = host_products(A)
    x = np.random.default_rng(6).standard_normal(n)
    y = np.random.default_rng(7).standard_normal(m)
    np.testing.assert_allclose(mv(x), dense @ x, rtol=1e-13)
    np.testing.assert_allclose(rmv(y), dense.T @ y, rtol=1e-13)


def test_host_coo_dense_limit_guard():
    A = lt.CallbackOperator(10, 8,
                            lambda x: jnp.zeros((10,), jnp.float32),
                            lambda y: jnp.zeros((8,), jnp.float32))
    with pytest.raises(NotImplementedError):
        host_coo(A, dense_limit=4)


# ---------------------------------------------------------------------------
# refinement
# ---------------------------------------------------------------------------


def test_refined_reaches_f64_accuracy_where_f32_stalls():
    # INCOMPATIBLE system: the naive x-only correction scheme floors at
    # eps32 * ||r_LS|| / sigma_min here; the augmented (x, r) scheme must
    # go to ~f64
    m, n, cond = 300, 80, 1e2
    a32 = _ill_conditioned(m, n, cond)
    rng = np.random.default_rng(8)
    b = rng.standard_normal(m)
    a64 = a32.astype(np.float64)
    x_star, *_ = np.linalg.lstsq(a64, b, rcond=None)

    A = lt.DenseOperator(jnp.asarray(a32))
    plain = lt.lsqr(A, jnp.asarray(b, jnp.float32))
    err_plain = np.linalg.norm(np.asarray(plain.x, np.float64) - x_star)

    ref = lsqr_refined(A, b, cycles=10)
    err_ref = np.linalg.norm(ref.x - x_star)

    assert err_ref < 1e-12 * np.linalg.norm(x_star)
    assert err_ref < 1e-6 * max(err_plain, 1e-30)
    assert ref.converged
    assert not ref.preconditioned  # mild cond: plain f32 inner contraction


def test_refined_auto_lsrn_extends_cond_range():
    # at cond 1e6 the unpreconditioned contraction factor eps32 * cond is
    # ~0.06-1: 'auto' must engage the LSRN inner preconditioner and still
    # reach near-f64
    m, n, cond = 300, 80, 1e6
    a32 = _ill_conditioned(m, n, cond, seed=20)
    b = np.random.default_rng(21).standard_normal(m)
    x_star, *_ = np.linalg.lstsq(a32.astype(np.float64), b, rcond=None)

    ref = lsqr_refined(lt.DenseOperator(jnp.asarray(a32)), b, cycles=14)
    err = np.linalg.norm(ref.x - x_star) / np.linalg.norm(x_star)
    assert ref.preconditioned
    assert err < 1e-9

    off = lsqr_refined(lt.DenseOperator(jnp.asarray(a32)), b, cycles=14,
                       precondition=None)
    err_off = np.linalg.norm(off.x - x_star) / np.linalg.norm(x_star)
    assert err < 1e-3 * max(err_off, 1e-30)


def test_refined_damped_matches_closed_form():
    m, n, cond, damp = 200, 60, 1e6, 0.03
    a32 = _ill_conditioned(m, n, cond, seed=9)
    rng = np.random.default_rng(10)
    b = rng.standard_normal(m)
    a64 = a32.astype(np.float64)
    x_star = np.linalg.solve(a64.T @ a64 + damp**2 * np.eye(n), a64.T @ b)

    ref = lsqr_refined(lt.DenseOperator(jnp.asarray(a32)), b, damp, cycles=8)
    assert np.linalg.norm(ref.x - x_star) < 1e-10 * np.linalg.norm(x_star)


def test_refined_minnorm_underdetermined():
    # compatible under-determined: the CRAIG-mode (x = A'z) branch keeps x
    # in range(A') exactly, so the limit is the pinv (min-norm) answer
    m, n = 40, 90
    rng = np.random.default_rng(11)
    a32 = rng.standard_normal((m, n)).astype(np.float32)
    b = rng.standard_normal(m)
    x_star = np.linalg.pinv(a32.astype(np.float64)) @ b

    ref = lsqr_refined(lt.DenseOperator(jnp.asarray(a32)), b, cycles=8)
    assert np.linalg.norm(ref.x - x_star) < 1e-12 * np.linalg.norm(x_star)


@pytest.mark.parametrize("solver,rtol", [("lsmr", 1e-9), ("cgls", 1e-6)])
def test_refined_inner_solver_siblings(solver, rtol):
    # CGLS gets a looser bound: its inner solves stop at a higher noise
    # floor than the rotation-based LSQR/LSMR (documented trade-off)
    m, n = 150, 50
    a32 = _ill_conditioned(m, n, 1e3, seed=12)
    b = np.random.default_rng(13).standard_normal(m)
    x_star, *_ = np.linalg.lstsq(a32.astype(np.float64), b, rcond=None)
    ref = lsqr_refined(lt.DenseOperator(jnp.asarray(a32)), b,
                       cycles=12, solver=solver)
    assert np.linalg.norm(ref.x - x_star) < rtol * np.linalg.norm(x_star)


def test_refined_sparse_operator_host_residual():
    # DIA operator: the host residual rides to_scipy of the stripe packing
    m = n = 120
    offsets = (-2, 0, 1, 4)
    rng = np.random.default_rng(14)
    data = rng.standard_normal((len(offsets), m)).astype(np.float32)
    data[1] += 4.0  # comfortably nonsingular
    A = lt.dia_operator(m, n, offsets, data)
    b = rng.standard_normal(m)
    a64 = to_scipy(A).toarray()
    x_star = np.linalg.solve(a64, b)

    ref = lsqr_refined(A, b, cycles=8)
    assert np.linalg.norm(ref.x - x_star) < 1e-12 * np.linalg.norm(x_star)
    assert ref.converged
    # residual estimate tracks the true residual
    np.testing.assert_allclose(ref.r, b - a64 @ ref.x, atol=1e-10)


def test_refined_warm_start_and_validation():
    m, n = 60, 20
    a32 = _ill_conditioned(m, n, 10.0, seed=15)
    b = np.random.default_rng(16).standard_normal(m)
    x_star, *_ = np.linalg.lstsq(a32.astype(np.float64), b, rcond=None)
    ref0 = lsqr_refined(lt.DenseOperator(jnp.asarray(a32)), b, cycles=6)
    # warm-starting AT the solution converges immediately (tiny dx)
    ref1 = lsqr_refined(lt.DenseOperator(jnp.asarray(a32)), b, cycles=6,
                        x0=ref0.x)
    assert ref1.cycles <= 3
    assert np.linalg.norm(ref1.x - x_star) < 1e-12 * np.linalg.norm(x_star)

    with pytest.raises(ValueError):
        lsqr_refined(lt.DenseOperator(jnp.asarray(a32)), b[:-1])
    with pytest.raises(ValueError):
        lsqr_refined(lt.DenseOperator(jnp.asarray(a32)), b, solver="qr")
    with pytest.raises(ValueError):
        # explicit lsrn preconditioning rejects m < n
        lsqr_refined(lt.DenseOperator(jnp.asarray(a32).T), b[:n],
                     precondition="lsrn")


def test_refined_graceful_beyond_f32_range():
    # cond 1e10 is beyond what f32 inner products can contract even with
    # LSRN (composition noise ~ eps32 * cond): must flag non-convergence
    # and return the best-residual iterate, never silently diverge
    m, n = 200, 50
    a32 = _ill_conditioned(m, n, 1e10, seed=17)
    b = np.random.default_rng(18).standard_normal(m)
    ref = lsqr_refined(lt.DenseOperator(jnp.asarray(a32)), b, cycles=6)
    assert not ref.converged
    a64 = a32.astype(np.float64)
    # the returned iterate's residual is the best one seen (guard worked):
    # no worse than the trivial x = 0 residual
    assert ref.rnorms[-1] <= np.linalg.norm(b) * (1 + 1e-12)
    np.testing.assert_allclose(
        np.linalg.norm(b - a64 @ ref.x), ref.rnorms[-1], rtol=1e-10)


def test_refined_callable_inner_solver():
    # a custom inner solver (e.g. a sharded or wrapped one) plugs in as a
    # callable with the (A, b, damp, **kwargs) -> result-with-.x contract
    calls = []

    def my_solver(A, b, damp, **kw):
        calls.append(A.shape)
        return lt.lsqr(A, b, damp, **kw)

    m, n = 80, 30
    a32 = _ill_conditioned(m, n, 50.0, seed=19)
    b = np.random.default_rng(20).standard_normal(m)
    x_star, *_ = np.linalg.lstsq(a32.astype(np.float64), b, rcond=None)
    ref = lsqr_refined(lt.DenseOperator(jnp.asarray(a32)), b,
                       cycles=6, solver=my_solver)
    assert calls  # the callable actually ran
    assert np.linalg.norm(ref.x - x_star) < 1e-12 * np.linalg.norm(x_star)


def test_to_scipy_transposed_operator():
    m, n = 25, 14
    rows, cols, vals = _sparse_coo(m, n, 90, seed=22)
    A = lt.coo_operator(m, n, vals, rows, cols)
    # sparse export of A.T must NOT fall to the dense path
    back = host_coo(A.T, dense_limit=1)
    dense_t = to_scipy(A).toarray().T
    got = np.zeros((n, m))
    np.add.at(got, (back[0], back[1]), back[2])
    np.testing.assert_allclose(got, dense_t)


def test_refined_damped_underdetermined_with_lsrn():
    # damp > 0 makes the stacked operator tall: explicit lsrn
    # preconditioning must be accepted even for m < n
    m, n, damp = 40, 90, 0.5
    rng = np.random.default_rng(23)
    a32 = rng.standard_normal((m, n)).astype(np.float32)
    b = rng.standard_normal(m)
    a64 = a32.astype(np.float64)
    x_star = np.linalg.solve(a64.T @ a64 + damp**2 * np.eye(n), a64.T @ b)
    ref = lsqr_refined(lt.DenseOperator(jnp.asarray(a32)), b, damp,
                       cycles=8, precondition="lsrn")
    assert ref.preconditioned
    assert np.linalg.norm(ref.x - x_star) < 1e-11 * np.linalg.norm(x_star)


def test_refined_callback_operator_stays_f32():
    # CallbackOperator has dtype=None: the working precision must default
    # to f32 (np.dtype(None) would silently be f64)
    m, n = 50, 20
    a32 = _ill_conditioned(m, n, 10.0, seed=24)
    aj = jnp.asarray(a32)
    b = np.random.default_rng(25).standard_normal(m)
    x_star, *_ = np.linalg.lstsq(a32.astype(np.float64), b, rcond=None)
    a64 = a32.astype(np.float64)
    ref = lsqr_refined(
        (lambda x: aj @ x, lambda y: aj.T @ y), b, m=m, n=n,
        host_matvec=lambda x: a64 @ x, host_rmatvec=lambda y: a64.T @ y,
        cycles=6,
    )
    assert ref.results[0].x.dtype == jnp.float32
    assert np.linalg.norm(ref.x - x_star) < 1e-12 * np.linalg.norm(x_star)


def test_refined_f64_truth_beyond_f32_representation():
    # user-provided f64 host closures define the TRUTH: the device only
    # ever sees the f32 rounding, yet refinement converges to the f64
    # problem's solution — at cond 1e6 the f32-rounded matrix's own LS
    # solution differs from the f64 one at ~1e-2 relative, so this
    # capability is not reachable by any pure-f32 computation
    m, n, cond = 300, 80, 1e6
    a64 = _ill_conditioned(m, n, cond, seed=26, dtype=np.float64)
    a32 = a64.astype(np.float32)
    b = np.random.default_rng(27).standard_normal(m)
    x64, *_ = np.linalg.lstsq(a64, b, rcond=None)
    x32, *_ = np.linalg.lstsq(a32.astype(np.float64), b, rcond=None)
    gap = np.linalg.norm(x32 - x64) / np.linalg.norm(x64)
    assert gap > 1e-4  # representation error is material at this cond

    ref = lsqr_refined(lt.DenseOperator(jnp.asarray(a32)), b, cycles=14,
                       host_matvec=lambda x: a64 @ x,
                       host_rmatvec=lambda y: a64.T @ y)
    err = np.linalg.norm(ref.x - x64) / np.linalg.norm(x64)
    assert err < 1e-9
    assert err < 1e-4 * gap


def test_refined_with_sharded_inner_solver():
    # distributed refinement: the callable inner solver routes every
    # correction through the row-partitioned mesh solve (8 CPU devices),
    # and the f64 host loop is oblivious to the sharding
    from lsqr_tpu.ops.linop import _TransposedOperator
    from lsqr_tpu.parallel import lsqr_sharded

    m, n, nnz = 96, 40, 600
    rows, cols, vals = _sparse_coo(m, n, nnz, seed=30)
    A = lt.coo_operator(m, n, vals, rows, cols)
    b = np.random.default_rng(31).standard_normal(m)
    dense = to_scipy(A).toarray()
    x_star, *_ = np.linalg.lstsq(dense, b, rcond=None)

    def sharded_inner(S, rhs, damp_, **kw):
        if isinstance(S, _TransposedOperator):
            op = S.op
            S = lt.coo_operator(op.n, op.m, op.vals, op.cols, op.rows)
        return lsqr_sharded(S, rhs, damp_, **kw)

    ref = lsqr_refined(A, b, cycles=8, solver=sharded_inner,
                       precondition=None)
    assert np.linalg.norm(ref.x - x_star) < 1e-11 * np.linalg.norm(x_star)


def test_refine_no_wall_at_high_cond():
    """Round-4 ceiling analysis (docs/precision.md): with f64 host
    closures there is no algorithmic wall at cond ~1e8 — the error
    follows ~eps64*cond out to 1e10 and the loop reports stagnated
    (attainable floor), not converged."""
    import numpy as np
    import jax.numpy as jnp

    from lsqr_tpu.ops.linop import DenseOperator
    from lsqr_tpu.refine import lsqr_refined

    rng = np.random.default_rng(0)
    m, n = 300, 150
    U, _ = np.linalg.qr(rng.standard_normal((m, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    for logc, bound in ((9, 5e-7), (10, 5e-6)):
        s = np.logspace(0, -logc, n)
        A64 = (U * s) @ V.T
        x_true = rng.standard_normal(n)
        b = A64 @ x_true
        res = lsqr_refined(
            DenseOperator(a=jnp.asarray(A64.astype(np.float32))),
            jnp.asarray(b),
            host_matvec=lambda x: A64 @ x,
            host_rmatvec=lambda y: A64.T @ y,
            cycles=12,
        )
        err = np.linalg.norm(np.asarray(res.x, np.float64) - x_true)
        err /= np.linalg.norm(x_true)
        # far below the f32-stored matrix's own ~eps32*cond gap (>0.2
        # at these condition numbers), and below ~10x eps64*cond
        assert err < bound, (logc, err)
        assert res.stagnated or res.converged
