"""Complex-operator support across the solver family.

The reference is real-only (compile-time real32/64/128 selection,
/root/reference/src/lsqr_kinds.F90:16-24). Over C the Paige–Saunders
bidiagonalization applies verbatim with A' read as the CONJUGATE transpose:
the bidiagonal entries alpha/beta (and hence every rotation scalar and norm
estimate) stay real, the vectors u/v/w/x are complex. scipy's lsqr/lsmr
support complex the same way, giving a live cross-check oracle.
"""

import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg as sla

import lsqr_tpu as lt


def _cproblem(rng, m=60, n=35, damp=0.1):
    A = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    return A, b, damp


def _ccoo(rng, m=70, n=40, nnz=400):
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz) + 1j * rng.standard_normal(nnz)
    dense = np.zeros((m, n), complex)
    np.add.at(dense, (rows, cols), vals)
    return rows, cols, vals, dense


# ---------------------------------------------------------------------------
# operator layer
# ---------------------------------------------------------------------------

def test_complex_operator_products(rng):
    rows, cols, vals, dense = _ccoo(rng)
    A = lt.coo_operator(dense.shape[0], dense.shape[1], vals, rows, cols)
    x = rng.standard_normal(dense.shape[1]) + 1j * rng.standard_normal(dense.shape[1])
    y = rng.standard_normal(dense.shape[0]) + 1j * rng.standard_normal(dense.shape[0])
    np.testing.assert_allclose(np.asarray(A.matvec(x)), dense @ x, rtol=1e-12)
    # rmatvec is the CONJUGATE transpose product
    np.testing.assert_allclose(
        np.asarray(A.rmatvec(y)), dense.conj().T @ y, rtol=1e-12
    )
    D = lt.as_operator(dense)
    np.testing.assert_allclose(np.asarray(D.rmatvec(y)), dense.conj().T @ y, rtol=1e-12)
    # .T is the adjoint (Hermitian transpose for complex)
    np.testing.assert_allclose(np.asarray(A.T.matvec(y)), dense.conj().T @ y, rtol=1e-12)


def test_acheck_complex_and_catches_missing_conj(rng):
    A, _, _ = _cproblem(rng)
    assert int(lt.acheck(lt.as_operator(A)).inform) == 0
    # plain transpose (no conj) must FAIL the adjoint test
    bad = lt.CallbackOperator(
        m=A.shape[0], n=A.shape[1],
        _matvec=lambda x: A @ x, _rmatvec=lambda y: A.T @ y,
    )
    assert int(lt.acheck(bad).inform) == 1


# ---------------------------------------------------------------------------
# solver family vs scipy / closed-form oracles
# ---------------------------------------------------------------------------

def test_lsqr_complex_matches_scipy_dense(rng):
    A, b, damp = _cproblem(rng)
    res = lt.lsqr(A, b, damp, atol=1e-12, btol=1e-12)
    ref = sla.lsqr(scipy.sparse.csr_matrix(A), b, damp=damp, atol=1e-12, btol=1e-12)
    assert int(res.itn) == ref[2]
    assert int(res.istop) == 3  # damped LS (scipy reports 2; no 2->3 reclass)
    np.testing.assert_allclose(np.asarray(res.x), ref[0], atol=1e-10)
    # closed form of the damped problem
    n = A.shape[1]
    xd = np.linalg.solve(A.conj().T @ A + damp**2 * np.eye(n), A.conj().T @ b)
    np.testing.assert_allclose(np.asarray(res.x), xd, atol=1e-10)


def test_lsqr_complex_coo_and_xcheck(rng):
    rows, cols, vals, dense = _ccoo(rng)
    m, n = dense.shape
    A = lt.coo_operator(m, n, vals, rows, cols)
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    res = lt.lsqr(A, b, 0.05, atol=1e-12, btol=1e-12)
    ref = sla.lsqr(scipy.sparse.csr_matrix(dense), b, damp=0.05,
                   atol=1e-12, btol=1e-12)
    assert abs(int(res.itn) - ref[2]) <= 1  # reduction-order rounding
    np.testing.assert_allclose(np.asarray(res.x), ref[0], atol=1e-9)
    xc = lt.xcheck(A, b=b, x=res.x, damp=0.05, anorm=res.anorm)
    assert int(xc.inform) == 3


def test_lsqr_complex_wantse_trace_warmstart(rng):
    A, b, damp = _cproblem(rng, m=50, n=20)
    res = lt.lsqr(A, b, damp, wantse=True, record_trace=True, itnlim=40)
    assert res.se.shape == (20,)
    assert not np.iscomplexobj(np.asarray(res.se))
    assert not np.iscomplexobj(np.asarray(res.trace))
    # warm start from a perturbed solution converges in fewer iterations
    x0 = np.asarray(res.x) + 1e-6 * (rng.standard_normal(20)
                                     + 1j * rng.standard_normal(20))
    res2 = lt.lsqr(A, b, damp, x0=x0, atol=1e-12, btol=1e-12)
    ref = lt.lsqr(A, b, damp, atol=1e-12, btol=1e-12)
    assert int(res2.itn) < int(ref.itn)
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(ref.x), atol=1e-9)


def test_lsmr_complex_matches_scipy(rng):
    A, b, damp = _cproblem(rng, m=70, n=40)
    res = lt.lsmr(A, b, damp, atol=1e-10, btol=1e-10)
    ref = sla.lsmr(scipy.sparse.csr_matrix(A), b, damp=damp,
                   atol=1e-10, btol=1e-10)
    assert int(res.itn) == ref[2]
    np.testing.assert_allclose(np.asarray(res.x), ref[0], atol=1e-8)


def test_cgls_complex_closed_form(rng):
    A, b, damp = _cproblem(rng)
    n = A.shape[1]
    res = lt.cgls(A, b, damp, atol=1e-12, btol=1e-12)
    xd = np.linalg.solve(A.conj().T @ A + damp**2 * np.eye(n), A.conj().T @ b)
    np.testing.assert_allclose(np.asarray(res.x), xd, atol=1e-10)


def test_craig_complex_minimum_norm(rng):
    m, n = 30, 50
    A = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    b = A @ (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    res = lt.craig(A, b, atol=1e-13, btol=1e-13, itnlim=200)
    xmn = np.linalg.pinv(A) @ b
    assert int(res.istop) in (1, 2)
    np.testing.assert_allclose(np.asarray(res.x), xmn, atol=1e-9)


def test_lsqr_complex_underdetermined_min_norm(rng):
    m, n = 25, 45
    A = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    res = lt.lsqr(A, b, 0.0, atol=1e-13, btol=1e-13)
    xmn = np.linalg.pinv(A) @ b
    assert int(res.istop) == 1
    np.testing.assert_allclose(np.asarray(res.x), xmn, atol=1e-9)


def test_complex64_single_precision(rng):
    A, b, damp = _cproblem(rng, m=40, n=20)
    res = lt.lsqr(A.astype(np.complex64), b.astype(np.complex64), damp,
                  atol=1e-5, btol=1e-5)
    n = A.shape[1]
    xd = np.linalg.solve(A.conj().T @ A + damp**2 * np.eye(n), A.conj().T @ b)
    assert np.asarray(res.x).dtype == np.complex64
    np.testing.assert_allclose(np.asarray(res.x), xd, atol=1e-3)


# ---------------------------------------------------------------------------
# composites & interop
# ---------------------------------------------------------------------------

def test_complex_composites_adjoint(rng):
    A, _, _ = _cproblem(rng, m=30, n=20)
    from lsqr_tpu.ops.compose import (
        diagonal_operator, scale_operator, vstack_operators,
    )

    d = rng.standard_normal(20) + 1j * rng.standard_normal(20)
    alpha = 0.7 - 0.3j
    op = vstack_operators([lt.as_operator(A),
                           scale_operator(diagonal_operator(d), alpha)])
    assert int(lt.acheck(op).inform) == 0
    dense = np.vstack([A, alpha * np.diag(d)])
    y = rng.standard_normal(50) + 1j * rng.standard_normal(50)
    np.testing.assert_allclose(
        np.asarray(op.rmatvec(y)), dense.conj().T @ y, rtol=1e-11
    )


def test_complex_interop_routing(rng):
    rows, cols, vals, dense = _ccoo(rng, m=40, n=30, nnz=200)
    sp = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(40, 30))
    A = lt.from_scipy(sp)
    from lsqr_tpu.ops.zdia import ZJDIAOperator

    # non-banded complex with slot-friendly pattern -> plane-split JDIA
    # (round 4; was the COO scatter path); products stay conj-correct
    # either way — asserted below
    assert isinstance(A, ZJDIAOperator)
    with pytest.raises(ValueError, match="real-only"):
        lt.from_scipy(sp, format="ell")
    # forced DIA builds the plane-split complex streaming format (round 4)
    from lsqr_tpu.ops.zdia import ZDIAOperator

    Ad = lt.from_scipy(sp, format="dia")
    assert isinstance(Ad, ZDIAOperator)
    xz = rng.standard_normal(30) + 1j * rng.standard_normal(30)
    np.testing.assert_allclose(np.asarray(Ad.matvec(xz)), dense @ xz,
                               rtol=1e-11)
    x = rng.standard_normal(30) + 1j * rng.standard_normal(30)
    np.testing.assert_allclose(np.asarray(A.matvec(x)), dense @ x, rtol=1e-11)


def test_complex_sharded_solve_matches_unsharded(rng):
    """Row-partitioned complex solve over the 8-virtual-device mesh: the
    conjugated local rmatvec partials + psum must reproduce the unsharded
    answer (the collectives are dtype-generic)."""
    from lsqr_tpu.parallel.sharding import lsqr_sharded, make_mesh

    m, n, nnz = 96, 40, 500
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz) + 1j * rng.standard_normal(nnz)
    A = lt.coo_operator(m, n, vals, rows, cols)
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    ref = lt.lsqr(A, b, 0.1, itnlim=25, atol=0.0, btol=0.0, conlim=0.0)
    res = lsqr_sharded(A, b, 0.1, mesh=make_mesh(4), itnlim=25,
                       atol=0.0, btol=0.0, conlim=0.0)
    assert int(res.itn) == int(ref.itn)
    # the psum'd rmatvec partials reorder the reduction vs the unsharded
    # segment-sum; f64 agreement to ~1e-9 is the expected envelope
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), rtol=1e-7, atol=1e-9
    )


def test_multidamp_complex_bitwise_matches_standalone(rng):
    """Complex multi-damp sweeps: the shared bidiagonalization is
    damp-independent over C too, so each damp's iterates are IDENTICAL to a
    standalone solve with that damp (same fp operation order)."""
    A, b, _ = _cproblem(rng)
    damps = [0.0, 0.05, 0.5]
    res = lt.lsqr_multidamp(A, b, damps, atol=1e-12, btol=1e-12)
    resm = lt.lsmr_multidamp(A, b, damps, atol=1e-12, btol=1e-12)
    for i, d in enumerate(damps):
        ref = lt.lsqr(A, b, d, atol=1e-12, btol=1e-12)
        assert int(res.itn[i]) == int(ref.itn)
        np.testing.assert_array_equal(np.asarray(res.x[i]), np.asarray(ref.x))
        refm = lt.lsmr(A, b, d, atol=1e-12, btol=1e-12)
        assert int(resm.itn[i]) == int(refm.itn)
        np.testing.assert_array_equal(np.asarray(resm.x[i]), np.asarray(refm.x))


def test_batch_complex_matches_sequential(rng):
    from lsqr_tpu.batch import cgls_batch, lsmr_batch, lsqr_batch

    m, n, nnz, k = 50, 30, 300, 3
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz) + 1j * rng.standard_normal(nnz)
    A = lt.coo_operator(m, n, v, r, c)
    B = rng.standard_normal((k, m)) + 1j * rng.standard_normal((k, m))
    res = lsqr_batch(A, B, 0.05, atol=1e-12, btol=1e-12)
    resm = lsmr_batch(A, B, 0.05, atol=1e-10, btol=1e-10)
    resc = cgls_batch(A, B, 0.05, atol=1e-10, btol=1e-10)
    for i in range(k):
        ref = lt.lsqr(A, B[i], 0.05, atol=1e-12, btol=1e-12)
        assert int(res.itn[i]) == int(ref.itn)
        np.testing.assert_allclose(
            np.asarray(res.x[i]), np.asarray(ref.x), atol=1e-12
        )
        refm = lt.lsmr(A, B[i], 0.05, atol=1e-10, btol=1e-10)
        np.testing.assert_allclose(
            np.asarray(resm.x[i]), np.asarray(refm.x), atol=1e-10
        )
        refc = lt.cgls(A, B[i], 0.05, atol=1e-10, btol=1e-10)
        np.testing.assert_allclose(
            np.asarray(resc.x[i]), np.asarray(refc.x), atol=1e-8
        )


def test_real_only_modules_raise_clear_errors(rng):
    """lsqr_grad is the one remaining real-only entry point (complex
    gradients are non-holomorphic; the IFT backward pass would need the
    CR-calculus convention) — it must reject complex inputs with a pointer
    instead of silently discarding imaginary parts."""
    A, b, _ = _cproblem(rng, m=30, n=20)
    with pytest.raises(TypeError, match="real-only"):
        lt.lsqr_grad(A, b)


def test_checkpoint_resume_complex(rng, tmp_path):
    """Segmented checkpoint/resume carries complex state bit-identically."""
    from lsqr_tpu.utils.checkpoint import lsqr_checkpointed

    A, b, damp = _cproblem(rng)
    ref = lt.lsqr(A, b, damp, atol=1e-12, btol=1e-12)
    path = str(tmp_path / "carry.npz")
    res = lsqr_checkpointed(A, b, damp, segment_iters=7,
                            checkpoint_path=path,
                            atol=1e-12, btol=1e-12)
    assert int(res.itn) == int(ref.itn)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))
    # resume from the persisted carry reproduces the same final state
    res2 = lsqr_checkpointed(A, b, damp, segment_iters=7, resume_from=path,
                             atol=1e-12, btol=1e-12)
    np.testing.assert_array_equal(np.asarray(res2.x), np.asarray(ref.x))


def test_complex_sharded_2d_matches_unsharded(rng):
    """2-D (rows x cols) block-partitioned complex solve: the conjugated
    local transpose products + the three per-iteration psums reproduce the
    unsharded answer with x/v/w sharded over 'cols'."""
    from lsqr_tpu.parallel.sharding import lsqr_sharded_2d, make_mesh_2d

    m, n, nnz = 96, 64, 600
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz) + 1j * rng.standard_normal(nnz)
    A = lt.coo_operator(m, n, v, r, c)
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    ref = lt.lsqr(A, b, 0.1, itnlim=25, atol=0.0, btol=0.0, conlim=0.0)
    res = lsqr_sharded_2d(A, b, 0.1, mesh=make_mesh_2d((2, 4)), itnlim=25,
                          atol=0.0, btol=0.0, conlim=0.0, wantse=True)
    assert int(res.itn) == int(ref.itn)
    assert not np.iscomplexobj(np.asarray(res.se))
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), rtol=1e-7, atol=1e-9
    )


# ---------------------------------------------------------------------------
# mixed-precision refinement over C
# ---------------------------------------------------------------------------

def _ill_conditioned_complex(rng, m, n, cond):
    U, _ = np.linalg.qr(rng.standard_normal((m, n))
                        + 1j * rng.standard_normal((m, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n))
                        + 1j * rng.standard_normal((n, n)))
    sig = np.logspace(0, -np.log10(cond), n)
    return (U * sig) @ V.conj().T


def test_refine_complex_recovers_c128_solution(rng):
    """Complex refinement: complex64 device solves + complex128 host
    residuals converge to the c128 LS solution of the stored matrix
    (the augmented system over C: r + A x = b, A^H r = damp^2 x)."""
    m, n = 120, 60
    A64 = _ill_conditioned_complex(rng, m, n, 1e2)
    A32 = A64.astype(np.complex64)
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    xtrue = np.linalg.lstsq(A32.astype(np.complex128), b, rcond=None)[0]
    res = lt.lsqr_refined(lt.as_operator(A32), b)
    assert res.converged
    assert res.x.dtype == np.complex128
    rel = np.abs(res.x - xtrue).max() / np.abs(xtrue).max()
    assert rel < 1e-12


def test_refine_complex_preconditioned_high_cond(rng):
    """cond 1e4: the auto-LSRN path (complex Gaussian sketch, conjugated
    preconditioner mapping) must keep contracting where the plain scheme
    stalls at eps_f32 * cond."""
    m, n = 120, 60
    A32 = _ill_conditioned_complex(rng, m, n, 1e4).astype(np.complex64)
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    xtrue = np.linalg.lstsq(A32.astype(np.complex128), b, rcond=None)[0]
    res = lt.lsqr_refined(lt.as_operator(A32), b)
    assert res.preconditioned
    rel = np.abs(res.x - xtrue).max() / np.abs(xtrue).max()
    assert rel < 1e-9


def test_refine_complex_damped_and_min_norm(rng):
    mu, nu = 40, 80
    Au = (rng.standard_normal((mu, nu))
          + 1j * rng.standard_normal((mu, nu))).astype(np.complex64)
    bu = rng.standard_normal(mu) + 1j * rng.standard_normal(mu)
    Ad = Au.astype(np.complex128)
    # damped
    resd = lt.lsqr_refined(lt.as_operator(Au), bu, 0.1)
    xd = Ad.conj().T @ np.linalg.solve(
        Ad @ Ad.conj().T + 0.01 * np.eye(mu), bu
    )
    np.testing.assert_allclose(resd.x, xd, atol=1e-12)
    # undamped min-norm (CRAIG-mode x = A^H z branch keeps x in range(A^H))
    resm = lt.lsqr_refined(lt.as_operator(Au), bu, 0.0)
    xmn = np.linalg.pinv(Ad) @ bu
    np.testing.assert_allclose(resm.x, xmn, atol=1e-12)


def test_ez_api_complex(rng):
    """The EZ class (reference lsqr_solver_ez analogue) accepts a complex
    COO triple directly."""
    m, n, nnz = 40, 25, 200
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz) + 1j * rng.standard_normal(nnz)
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    solver = lt.LSQRSolver(m, n, v, r, c, atol=1e-12, btol=1e-12, itnlim=200)
    res = solver.solve(b, damp=0.1)
    dense = np.zeros((m, n), complex)
    np.add.at(dense, (r, c), v)
    xd = np.linalg.solve(dense.conj().T @ dense + 0.01 * np.eye(n),
                         dense.conj().T @ b)
    np.testing.assert_allclose(np.asarray(res.x), xd, atol=1e-9)


# ---------------------------------------------------------------------------
# hybrid regularization over C
# ---------------------------------------------------------------------------

def test_golub_kahan_complex_factorization(rng):
    """Complex Golub–Kahan: conj-orthonormal V, REAL bidiagonal B, and the
    exact projected-norm identity ||A (y V) - b|| == ||B y - beta0 e1||
    (the complex Krylov basis absorbs the phases, so the projected
    Tikhonov problem — and all the GCV analysis — stays real)."""
    from lsqr_tpu.hybrid import projected_tikhonov

    m, n = 40, 20
    A = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    basis = lt.golub_kahan(A, b, n)
    V = np.asarray(basis.V)
    assert not np.iscomplexobj(np.asarray(basis.alpha))
    np.testing.assert_allclose(V.conj() @ V.T, np.eye(n), atol=1e-12)
    B = basis.bidiagonal()
    beta0 = float(basis.beta[0])
    y = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    e1 = np.zeros(n + 1)
    e1[0] = beta0
    np.testing.assert_allclose(
        np.linalg.norm(A @ (y @ V) - b), np.linalg.norm(B @ y - e1),
        rtol=1e-12,
    )
    # full-k projected Tikhonov == the global damped closed form
    lam = 0.3
    x = projected_tikhonov(B, beta0, lam) @ V
    xd = np.linalg.solve(A.conj().T @ A + lam**2 * np.eye(n),
                         A.conj().T @ b)
    np.testing.assert_allclose(x, xd, atol=1e-12)


def test_hybrid_lsqr_complex_runs_gcv(rng):
    m, n = 60, 30
    A = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    res = lt.hybrid_lsqr(A, b, k=20)
    assert np.iscomplexobj(np.asarray(res.x))
    assert np.isfinite(np.asarray(res.x)).all()
    assert 1 <= res.k <= 20


# ---------------------------------------------------------------------------
# LSRN randomized preconditioning over C
# ---------------------------------------------------------------------------

def test_lsrn_complex_conditioning_independent(rng):
    """Complex LSRN: complex-Gaussian sketch (conj-corrected row builds),
    conjugated preconditioner mappings — iteration count stays at the
    cond(AN) <~ 3 level for a cond-1e6 complex matrix."""
    m, n = 150, 60
    A = _ill_conditioned_complex(rng, m, n, 1e6)
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    res = lt.lsrn(A, b, atol=1e-12, btol=1e-12)
    xt = np.linalg.lstsq(A, b, rcond=None)[0]
    rel = np.abs(np.asarray(res.x) - xt).max() / np.abs(xt).max()
    assert rel < 1e-8
    assert int(res.result.itn) < 60  # conditioning-independent


def test_lsrn_complex_underdetermined_and_damped(rng):
    mu, nu = 50, 120
    Au = rng.standard_normal((mu, nu)) + 1j * rng.standard_normal((mu, nu))
    bu = rng.standard_normal(mu) + 1j * rng.standard_normal(mu)
    resu = lt.lsrn(Au, bu, atol=1e-12, btol=1e-12)
    np.testing.assert_allclose(
        np.asarray(resu.x), np.linalg.pinv(Au) @ bu, atol=1e-10
    )
    m, n = 80, 40
    A = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    resd = lt.lsrn(A, b, damp=0.1, atol=1e-12, btol=1e-12)
    xd = np.linalg.solve(A.conj().T @ A + 0.01 * np.eye(n), A.conj().T @ b)
    np.testing.assert_allclose(np.asarray(resd.x), xd, atol=1e-9)


def test_regpath_complex(rng):
    """Regularization-path helpers over C: real residual/solution norms
    (damps stay real; the exit-estimate identity and the exact-residual
    recomputation both use |.|^2), Morozov and L-curve selection run."""
    m, n = 60, 30
    A = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    xt = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    b = A @ xt + 0.01 * (rng.standard_normal(m)
                         + 1j * rng.standard_normal(m))
    for exact in (False, True):
        path = lt.reg_sweep(A, b, num=8, exact_residual=exact)
        assert not np.iscomplexobj(np.asarray(path.residual_norm))
        assert not np.iscomplexobj(np.asarray(path.solution_norm))
        for j in (0, 4, 7):
            rn = np.linalg.norm(b - A @ np.asarray(path.x[j]))
            np.testing.assert_allclose(
                float(path.residual_norm[j]), rn, rtol=1e-8
            )
    d, xd, path = lt.discrepancy_damp(A, b, noise_norm=0.01 * np.sqrt(2 * m))
    assert float(path.residual_norm[np.argmin(np.abs(
        np.asarray(path.damps) - float(d)))]) <= 0.011 * np.sqrt(2 * m) * 1.5
    lam, xl, curv = lt.lcurve_corner(path)
    assert np.isfinite(float(lam))
