"""Batched multi-RHS solves and preconditioning/scaling helpers."""

import jax.numpy as jnp
import numpy as np
import pytest

import lsqr_tpu as lt
from lsqr_tpu.batch import lsqr_batch
from lsqr_tpu.ops.precondition import (
    column_norms,
    column_scaled,
    right_preconditioned,
)
from lsqr_tpu.ops.structured import dia_operator, ell_operator


def _problem(rng, m=80, n=50, nnz=400):
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    return lt.coo_operator(m, n, vals, rows, cols)


def test_batch_matches_loop(rng):
    A = _problem(rng)
    B = rng.standard_normal((5, A.m))
    res = lsqr_batch(A, B, 0.1, atol=1e-10, btol=1e-10, itnlim=200)
    assert res.x.shape == (5, A.n)
    assert res.istop.shape == (5,)
    for i in range(5):
        ref = lt.lsqr(A, B[i], 0.1, atol=1e-10, btol=1e-10, itnlim=200)
        assert int(res.istop[i]) == int(ref.istop)
        assert int(res.itn[i]) == int(ref.itn)
        np.testing.assert_allclose(
            np.asarray(res.x[i]), np.asarray(ref.x), atol=1e-10
        )


def test_batch_per_problem_damp(rng):
    A = _problem(rng)
    b = rng.standard_normal(A.m)
    B = np.tile(b, (3, 1))  # same rhs so solution norms are comparable
    damps = np.array([0.0, 0.1, 1.0])
    res = lsqr_batch(A, B, damps, atol=1e-10, btol=1e-10, itnlim=200)
    # damped problems report istop 3, undamped 1/2
    assert int(res.istop[0]) in (1, 2)
    assert int(res.istop[1]) == 3
    assert int(res.istop[2]) == 3
    # stronger damping shrinks the solution
    norms = np.linalg.norm(np.asarray(res.x), axis=1)
    assert norms[2] < norms[1] <= norms[0] + 1e-9


def test_batch_validates_shape(rng):
    A = _problem(rng)
    with pytest.raises(ValueError):
        lsqr_batch(A, np.zeros((4, A.m + 1)))


def test_column_norms_per_format(rng):
    m, n = 60, 40
    nnz = 300
    # unique coordinates: column_norms requires deduplicated triplets
    lin = rng.choice(m * n, size=nnz, replace=False)
    rows, cols = lin // n, lin % n
    vals = rng.standard_normal(nnz)
    coo = lt.coo_operator(m, n, vals, rows, cols)
    dense = np.asarray(coo.todense())
    expect = np.linalg.norm(dense, axis=0)
    np.testing.assert_allclose(np.asarray(column_norms(coo)), expect, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(column_norms(lt.DenseOperator(a=jnp.asarray(dense)))),
        expect,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(column_norms(ell_operator(m, n, vals, rows, cols))),
        expect,
        atol=1e-12,
    )
    offs = [-2, 0, 3]
    data = rng.standard_normal((3, m))
    dia = dia_operator(m, n, offs, data)
    np.testing.assert_allclose(
        np.asarray(column_norms(dia)),
        np.linalg.norm(np.asarray(dia.todense()), axis=0),
        atol=1e-12,
    )


def test_column_scaling_improves_conditioning(rng):
    # badly column-scaled system
    m, n = 100, 30
    base = rng.standard_normal((m, n))
    scales = 10.0 ** rng.uniform(-6, 6, n)
    A = lt.DenseOperator(a=jnp.asarray(base * scales))
    b = rng.standard_normal(m)

    raw = lt.lsqr(A, b, 0.0, atol=1e-12, btol=1e-12, itnlim=2000)
    scaled_op, scale = column_scaled(A)
    pre = lt.lsqr(scaled_op, b, 0.0, atol=1e-12, btol=1e-12, itnlim=2000)
    x = np.asarray(scale) * np.asarray(pre.x)

    xref, *_ = np.linalg.lstsq(np.asarray(A.a), b, rcond=None)
    # scaled solve converges far faster and at least as accurately
    assert int(pre.itn) < int(raw.itn) / 2
    np.testing.assert_allclose(x, xref, atol=1e-6)


def test_right_preconditioning_recovers_solution(rng):
    m, n = 90, 40
    dense = rng.standard_normal((m, n))
    A = lt.DenseOperator(a=jnp.asarray(dense))
    b = rng.standard_normal(m)
    # use diag preconditioner M^-1 = diag(1/colnorm) as the M_inv operator
    scale = 1.0 / np.linalg.norm(dense, axis=0)
    M_inv = lt.DenseOperator(a=jnp.asarray(np.diag(scale)))
    B = right_preconditioned(A, M_inv)
    res = lt.lsqr(B, b, 0.0, atol=1e-12, btol=1e-12, itnlim=1000)
    x = np.asarray(M_inv.matvec(res.x))
    xref, *_ = np.linalg.lstsq(dense, b, rcond=None)
    np.testing.assert_allclose(x, xref, atol=1e-7)


def test_batch_rejects_pallas_operator(rng):
    from lsqr_tpu.ops.structured import dia_operator

    # f32: an f64 operator never selects Pallas (its kernels compute in f32)
    A = dia_operator(50, 50, (0,), np.ones((1, 50), np.float32),
                     use_pallas=True)
    with pytest.raises(ValueError, match="use_pallas=False"):
        lsqr_batch(A, np.ones((2, 50), np.float32))
