"""Hybrid LSQR (golub_kahan + projected Tikhonov + GCV stopping)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsqr_tpu import lsqr
from lsqr_tpu.hybrid import (GKBasis, gcv_lambda, golub_kahan, hybrid_lsqr,
                             projected_tikhonov)
from lsqr_tpu.ops.linop import DenseOperator


def _ill_posed(rng, m=100, n=60, noise=1e-2, decay=-5):
    U, _ = np.linalg.qr(rng.standard_normal((m, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = 10.0 ** np.linspace(0, decay, n)
    A = U @ np.diag(s) @ V.T
    x_true = V @ (rng.standard_normal(n) / (1 + np.arange(n)))
    e = rng.standard_normal(m)
    e *= noise / np.linalg.norm(e)
    b = A @ x_true + e
    return DenseOperator(jnp.asarray(A)), jnp.asarray(b), x_true


def test_golub_kahan_factorization(rng):
    """A V' = U B exactness via the residual identity ||A v_i - recurrence||,
    checked through B: columns satisfy A V_k' = U_{k+1} B_k, i.e.
    ||A V_k' e_i||^2 = alpha_i^2 + beta_{i+1}^2 (orthonormal U)."""
    A, b, _ = _ill_posed(rng, decay=-2)
    k = 12
    basis = golub_kahan(A, b, k)
    V = np.asarray(basis.V)
    # V orthonormal (reorth on)
    np.testing.assert_allclose(V @ V.T, np.eye(k), atol=1e-12)
    a = np.asarray(basis.alpha)
    beta = np.asarray(basis.beta)
    Ad = np.asarray(A.a)
    for i in range(k):
        av = Ad @ V[i]
        np.testing.assert_allclose(
            float(np.linalg.norm(av)),
            float(np.hypot(a[i], beta[i + 1])),
            rtol=1e-10,
        )


def test_reorth_keeps_orthogonality(rng):
    """Without reorthogonalization the basis loses orthogonality on an
    ill-posed problem; with it V stays orthonormal to near eps."""
    A, b, _ = _ill_posed(rng, decay=-6)
    k = 40
    plain = golub_kahan(A, b, k, reorth=False)
    ortho = golub_kahan(A, b, k, reorth=True)
    g_plain = np.abs(np.asarray(plain.V) @ np.asarray(plain.V).T - np.eye(k)).max()
    g_ortho = np.abs(np.asarray(ortho.V) @ np.asarray(ortho.V).T - np.eye(k)).max()
    assert g_ortho < 1e-10
    assert g_plain > 1e3 * g_ortho  # demonstrates the loss reorth prevents


def test_projected_equals_lsqr_at_lam0(rng):
    """With lam = 0 the projected solution at step k IS the LSQR iterate."""
    A, b, _ = _ill_posed(rng, decay=-2)
    k = 10
    basis = golub_kahan(A, b, k)
    y = projected_tikhonov(basis.bidiagonal(), float(basis.beta[0]), 0.0)
    x_proj = y @ np.asarray(basis.V)
    ref = lsqr(A, b, atol=0.0, btol=0.0, conlim=0.0, itnlim=k)
    np.testing.assert_allclose(x_proj, np.asarray(ref.x), rtol=1e-9, atol=1e-11)


def test_projected_tikhonov_oracle(rng):
    """At k = n the projected damped solution equals the full damped
    normal-equations solution."""
    A, b, _ = _ill_posed(rng, m=40, n=20, decay=-2)
    lam = 0.1
    basis = golub_kahan(A, b, 20)
    y = projected_tikhonov(basis.bidiagonal(), float(basis.beta[0]), lam)
    x_proj = y @ np.asarray(basis.V)
    Ad = np.asarray(A.a)
    x_exact = np.linalg.solve(Ad.T @ Ad + lam**2 * np.eye(20),
                              Ad.T @ np.asarray(b))
    np.testing.assert_allclose(x_proj, x_exact, rtol=1e-8, atol=1e-10)


def test_hybrid_beats_semiconvergence(rng):
    """On a noisy ill-posed problem, hybrid-GCV must beat plain LSQR run
    past its semiconvergence point, and come close to the oracle-best
    plain iterate."""
    A, b, x_true = _ill_posed(rng, noise=1e-2)
    res = hybrid_lsqr(A, b, k=40)
    err = lambda x: np.linalg.norm(np.asarray(x) - x_true)
    # plain LSQR run 'too long' (semiconvergence)
    over = lsqr(A, b, atol=0.0, btol=0.0, conlim=0.0, itnlim=40)
    # oracle: best plain iterate over k
    best_plain = min(
        err(lsqr(A, b, atol=0.0, btol=0.0, conlim=0.0, itnlim=kk).x)
        for kk in range(1, 41, 3)
    )
    assert err(res.x) < 0.5 * err(over.x)
    assert err(res.x) < 1.5 * best_plain  # measured: 1.06x the oracle
    assert res.k <= res.k_run <= 40
    assert res.lam > 0


def test_hybrid_early_stop(rng):
    A, b, _ = _ill_posed(rng, noise=1e-1, decay=-8)
    res = hybrid_lsqr(A, b, k=50, stop_window=3)
    assert res.k_run < 50  # GCV plateaued -> stopped early
    assert res.gcv.shape == (res.k_run,)
    # a tighter tolerance runs longer (or equally long)
    res2 = hybrid_lsqr(A, b, k=50, stop_window=3, stop_tol=1e-6)
    assert res2.k_run >= res.k_run


def test_hybrid_fixed_lambda(rng):
    """Fixed-lambda hybrid at full k reproduces lsqr with damp=lam."""
    A, b, _ = _ill_posed(rng, m=50, n=25, decay=-2)
    lam = 0.05
    res = hybrid_lsqr(A, b, k=25, lam=lam, stop_window=100)
    ref = lsqr(A, b, damp=lam, atol=1e-13, btol=1e-13)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-6, atol=1e-9)


def test_gcv_lambda_tracks_noise(rng):
    """The GCV-chosen lambda grows with the noise level."""
    lams = []
    for noise in (1e-4, 1e-1):
        A, b, _ = _ill_posed(rng, noise=noise)
        basis = golub_kahan(A, b, 30)
        lam, _ = gcv_lambda(basis.bidiagonal(), float(basis.beta[0]))
        lams.append(lam)
    assert lams[1] > 10 * lams[0]


def test_basis_validation(rng):
    A, b, _ = _ill_posed(rng, m=30, n=20)
    with pytest.raises(ValueError, match="k must be"):
        golub_kahan(A, b, 0)
    with pytest.raises(ValueError, match="exceeds"):
        golub_kahan(A, b, 21)
