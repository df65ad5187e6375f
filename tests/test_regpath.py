"""Regularization-path helpers (reg_sweep / discrepancy_damp / lcurve_corner)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsqr_tpu import lsqr
from lsqr_tpu.ops.linop import DenseOperator
from lsqr_tpu.regpath import discrepancy_damp, lcurve_corner, reg_sweep


def _ill_posed_problem(rng, m=80, n=40, noise=1e-2):
    """Smooth ill-conditioned A (decaying spectrum), noisy b."""
    U, _ = np.linalg.qr(rng.standard_normal((m, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = 10.0 ** np.linspace(0, -6, n)
    A = U @ np.diag(s) @ V.T
    x_true = V @ (rng.standard_normal(n) / (1 + np.arange(n)))
    e = rng.standard_normal(m)
    e *= noise / np.linalg.norm(e)
    b = A @ x_true + e
    return DenseOperator(jnp.asarray(A)), jnp.asarray(b), x_true, noise


def test_reg_sweep_residual_identity(rng):
    """Estimate-based residual norms match the directly-computed ones."""
    A, b, *_ = _ill_posed_problem(rng)
    damps = jnp.logspace(-5, 0, 8)
    est = reg_sweep(A, b, damps, atol=1e-12, btol=1e-12)
    exact = reg_sweep(A, b, damps, exact_residual=True, atol=1e-12, btol=1e-12)
    np.testing.assert_allclose(
        est.residual_norm, exact.residual_norm, rtol=1e-6, atol=1e-10
    )
    np.testing.assert_allclose(
        est.solution_norm, exact.solution_norm, rtol=1e-6
    )
    # path is monotone: residual grows, solution norm shrinks with damp
    assert np.all(np.diff(np.asarray(exact.residual_norm)) >= -1e-10)
    assert np.all(np.diff(np.asarray(exact.solution_norm)) <= 1e-10)


def test_reg_sweep_default_grid(rng):
    A, b, *_ = _ill_posed_problem(rng)
    path = reg_sweep(A, b, num=6, atol=1e-10, btol=1e-10)
    assert path.damps.shape == (6,)
    assert path.x.shape == (6, A.n)
    assert float(path.damps.min()) > 0


def test_discrepancy_principle_matches_noise(rng):
    A, b, x_true, noise = _ill_posed_problem(rng, noise=1e-2)
    damp, x, path = discrepancy_damp(
        A, b, noise, tau=1.05, damps=jnp.logspace(-6, 0, 20),
        atol=1e-12, btol=1e-12,
    )
    # chosen damp is acceptable and the NEXT bigger grid damp is not
    r = float(jnp.linalg.norm(b - A.matvec(x)))
    assert r <= 1.05 * noise * (1 + 1e-6)
    d = np.asarray(path.damps)
    bigger = d[d > float(damp)]
    if bigger.size:
        j = int(np.argmin(np.abs(d - bigger.min())))
        assert float(path.residual_norm[j]) > 1.05 * noise
    # regularized solution should beat the unregularized one against x_true
    err_reg = np.linalg.norm(np.asarray(x) - x_true)
    err_min = np.linalg.norm(np.asarray(path.x[0]) - x_true)
    assert err_reg <= err_min


def test_discrepancy_no_acceptable_point(rng):
    A, b, *_ = _ill_posed_problem(rng)
    # impossible target -> falls back to the smallest-residual grid point
    damp, x, path = discrepancy_damp(
        A, b, 1e-30, damps=jnp.asarray([1e-3, 1e-1]), atol=1e-12, btol=1e-12
    )
    j = int(np.argmin(np.asarray(path.residual_norm)))
    assert float(damp) == float(path.damps[j])


def test_lcurve_corner_near_noise_damp(rng):
    A, b, x_true, noise = _ill_posed_problem(rng, noise=1e-3)
    path = reg_sweep(
        A, b, jnp.logspace(-8, 0, 25), atol=1e-12, btol=1e-12
    )
    damp, x, kappa = lcurve_corner(path)
    assert kappa.shape == path.damps.shape
    # the corner solution should recover x_true far better than the
    # unregularized end of the path
    err_corner = np.linalg.norm(np.asarray(x) - x_true)
    err_ends = min(
        np.linalg.norm(np.asarray(path.x[0]) - x_true),
        np.linalg.norm(np.asarray(path.x[-1]) - x_true),
    )
    assert err_corner < err_ends


def test_lcurve_corner_needs_grid(rng):
    A, b, *_ = _ill_posed_problem(rng)
    path = reg_sweep(A, b, jnp.asarray([1e-3, 1e-2]), atol=1e-10, btol=1e-10)
    with pytest.raises(ValueError, match="at least 3"):
        lcurve_corner(path)


def test_gcv_damp_regularizes(rng):
    from lsqr_tpu.regpath import gcv_damp

    A, b, x_true, noise = _ill_posed_problem(rng, m=120, n=50, noise=1e-2)
    damp, x, path, gcv = gcv_damp(
        A, b, damps=jnp.logspace(-6, 0, 15), probes=2,
        atol=1e-12, btol=1e-12,
    )
    assert gcv.shape == path.damps.shape
    assert float(damp) == float(path.damps[int(np.argmin(np.asarray(gcv)))])
    err = lambda xx: np.linalg.norm(np.asarray(xx) - x_true)
    # GCV must land within 10x of the oracle-best grid point and far
    # below the unregularized end
    errs = np.asarray([err(path.x[j]) for j in range(path.x.shape[0])])
    assert err(x) <= 10 * errs.min()
    assert err(x) < 0.2 * err(path.x[0])
