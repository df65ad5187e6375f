"""CRAIG (minimum-norm, consistent systems) — oracle checks vs numpy pinv.

The reference library names Craig's method alongside LSQR (the Paige &
Saunders 1982 paper it implements, §7.4); there is no scipy port, so the
oracle is the analytic minimum-norm solution pinv(A) @ b on consistent
systems.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import lsqr_tpu as lt
from lsqr_tpu.craig import CRAIG_ISTOP_MESSAGES


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _coo_from_dense(dense):
    r, c = np.nonzero(dense)
    return dense[r, c], r, c


def test_craig_square(rng):
    n = 40
    dense = rng.standard_normal((n, n)) + 5 * np.eye(n)
    vals, r, c = _coo_from_dense(dense)
    A = lt.coo_operator(n, n, vals, r, c)
    x_true = rng.standard_normal(n)
    b = dense @ x_true
    res = lt.craig(A, b, atol=1e-12, btol=1e-12, itnlim=300)
    assert int(res.istop) in (1, 2)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-8, atol=1e-9)
    # rnorm recurrence |beta_{k+1} y_k| matches the true residual
    true_r = np.linalg.norm(b - dense @ np.asarray(res.x))
    np.testing.assert_allclose(float(res.rnorm), true_r, atol=1e-8)


def test_craig_underdetermined_min_norm(rng):
    m, n = 30, 80
    dense = rng.standard_normal((m, n))
    vals, r, c = _coo_from_dense(dense)
    A = lt.coo_operator(m, n, vals, r, c)
    b = dense @ rng.standard_normal(n)  # consistent by construction
    res = lt.craig(A, b, atol=1e-13, btol=1e-13, itnlim=300)
    assert int(res.istop) in (1, 2)
    x_mn = np.linalg.pinv(dense) @ b  # THE minimum-norm solution
    np.testing.assert_allclose(np.asarray(res.x), x_mn, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(
        float(res.xnorm), np.linalg.norm(x_mn), rtol=1e-9
    )


def test_craig_b_zero(rng):
    A = lt.coo_operator(4, 4, np.ones(4), np.arange(4), np.arange(4))
    res = lt.craig(A, np.zeros(4))
    assert int(res.istop) == 0 and int(res.itn) == 0
    assert np.all(np.asarray(res.x) == 0)
    assert "x = 0" in res.istop_message


def test_craig_incompatible_does_not_claim_convergence(rng):
    # over-determined inconsistent system: CRAIG must NOT report istop 1/2
    # with a small residual; it either hits the iteration limit or breaks
    # down (istop 4).
    m, n = 60, 20
    dense = rng.standard_normal((m, n))
    vals, r, c = _coo_from_dense(dense)
    A = lt.coo_operator(m, n, vals, r, c)
    b = rng.standard_normal(m)  # generic b is not in range(A)
    res = lt.craig(A, b, atol=1e-10, btol=1e-10, itnlim=100)
    assert int(res.istop) in (4, 5)


def test_craig_x0_warm_start(rng):
    n = 32
    dense = rng.standard_normal((n, n)) + 4 * np.eye(n)
    vals, r, c = _coo_from_dense(dense)
    A = lt.coo_operator(n, n, vals, r, c)
    x_true = rng.standard_normal(n)
    b = dense @ x_true
    x0 = x_true + 0.01 * rng.standard_normal(n)
    res = lt.craig(A, b, atol=1e-12, btol=1e-12, x0=x0, itnlim=300)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-8, atol=1e-9)
    # warm start from a good x0 takes fewer iterations than cold
    cold = lt.craig(A, b, atol=1e-12, btol=1e-12, itnlim=300)
    assert int(res.itn) <= int(cold.itn)


def test_craig_bounded_loop_matches_while(rng):
    n = 48
    dense = rng.standard_normal((n, n)) + 5 * np.eye(n)
    vals, r, c = _coo_from_dense(dense)
    A = lt.coo_operator(n, n, vals, r, c)
    b = dense @ rng.standard_normal(n)
    res_w = lt.craig(A, b, atol=1e-10, btol=1e-10, loop="while")
    res_b = lt.craig(A, b, atol=1e-10, btol=1e-10, loop="bounded",
                     loop_segment=7)
    assert int(res_w.istop) == int(res_b.istop)
    assert int(res_w.itn) == int(res_b.itn)
    np.testing.assert_allclose(
        np.asarray(res_w.x), np.asarray(res_b.x), rtol=0, atol=0
    )


def test_craig_dia_operator(rng):
    n = 64
    offs = (-1, 0, 2)
    stripes = rng.standard_normal((3, n))
    stripes[1] += 5.0
    A = lt.dia_operator(n, n, offs, stripes)
    dense = np.asarray(A.todense())
    x_true = rng.standard_normal(n)
    b = dense @ x_true
    res = lt.craig(A, b, atol=1e-12, btol=1e-12, itnlim=300)
    assert int(res.istop) in (1, 2)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-8, atol=1e-9)


def test_craig_istop_messages_cover():
    for k in (0, 1, 2, 4, 5):
        assert k in CRAIG_ISTOP_MESSAGES
