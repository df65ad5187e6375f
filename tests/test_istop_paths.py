"""Deterministic coverage of every termination path (istop 0-5,
lsqr.f90:520-538) and the solver option knobs — the BASELINE.json
"ill-conditioned rectangular systems exercising conlim/atol/btol early-stop
paths" configuration."""

import jax.numpy as jnp
import numpy as np
import pytest

import lsqr_tpu as lt


def _diag_op(diag):
    """Square diagonal operator as COO."""
    n = len(diag)
    return lt.coo_operator(n, n, np.asarray(diag, float), np.arange(n), np.arange(n))


def test_istop_0_zero_rhs():
    A = _diag_op([1.0, 2.0, 3.0])
    res = lt.lsqr(A, np.zeros(3), 0.0)
    assert int(res.istop) == 0 and int(res.itn) == 0


def test_istop_1_compatible():
    A = _diag_op([2.0, 4.0, 5.0])
    res = lt.lsqr(A, np.array([2.0, 8.0, 15.0]), 0.0, atol=1e-10, btol=1e-10)
    assert int(res.istop) == 1
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 2.0, 3.0], atol=1e-10)


def test_istop_2_incompatible(rng):
    # over-determined inconsistent system -> least-squares solution
    dense = rng.standard_normal((40, 10))
    b = rng.standard_normal(40)
    res = lt.lsqr(lt.DenseOperator(a=jnp.asarray(dense)), b, 0.0,
                  atol=1e-9, btol=1e-9, itnlim=200)
    assert int(res.istop) == 2


def test_istop_3_damped(rng):
    dense = rng.standard_normal((40, 10))
    b = rng.standard_normal(40)
    res = lt.lsqr(lt.DenseOperator(a=jnp.asarray(dense)), b, 0.5,
                  atol=1e-9, btol=1e-9, itnlim=200)
    assert int(res.istop) == 3


def test_istop_4_conlim():
    # condition number 1e8 with conlim 100: the acond estimate must trip
    # the test before convergence at machine-precision tolerances
    n = 50
    diag = np.logspace(0, 8, n)
    A = _diag_op(diag)
    b = diag * np.linspace(1, 2, n)  # exact solution exists
    res = lt.lsqr(A, b, 0.0, conlim=100.0, itnlim=1000)
    assert int(res.istop) == 4
    assert int(res.itn) < 1000


def test_istop_5_itnlim(rng):
    dense = rng.standard_normal((60, 30))
    b = rng.standard_normal(60)
    res = lt.lsqr(lt.DenseOperator(a=jnp.asarray(dense)), b, 0.0,
                  atol=0.0, btol=0.0, itnlim=3)
    # after 3 iterations of a random dense LS problem nothing has converged
    assert int(res.istop) == 5
    assert int(res.itn) == 3


def test_nconv_consecutive_requirement(rng):
    """nconv > 1 requires the criteria to hold on consecutive iterations
    (lsqr.f90:843-850; the reference hardcodes nconv=1)."""
    dense = rng.standard_normal((40, 10))
    b = rng.standard_normal(40)
    A = lt.DenseOperator(a=jnp.asarray(dense))
    r1 = lt.lsqr(A, b, 0.0, atol=1e-8, btol=1e-8, itnlim=500, nconv=1)
    r3 = lt.lsqr(A, b, 0.0, atol=1e-8, btol=1e-8, itnlim=500, nconv=3)
    assert int(r3.itn) >= int(r1.itn) + 2
    assert int(r3.istop) == int(r1.istop)


def test_safe_norms_off_matches(rng):
    dense = rng.standard_normal((50, 20))
    b = rng.standard_normal(50)
    A = lt.DenseOperator(a=jnp.asarray(dense))
    r_safe = lt.lsqr(A, b, 0.0, atol=1e-10, btol=1e-10, safe_norms=True, itnlim=300)
    r_fast = lt.lsqr(A, b, 0.0, atol=1e-10, btol=1e-10, safe_norms=False, itnlim=300)
    np.testing.assert_allclose(
        np.asarray(r_safe.x), np.asarray(r_fast.x), atol=1e-10
    )
    assert int(r_safe.istop) == int(r_fast.istop)


def test_safe_norms_survive_extreme_scale():
    """The scaled 2-norm must not overflow where the naive one does
    (dnrm2's raison d'etre, lsqrblas.f90:123-159) — float32 case."""
    from lsqr_tpu.ops.blas import nrm2

    big = jnp.full((4,), 1e25, jnp.float32)
    assert np.isinf(float(nrm2(big, safe=False)))
    np.testing.assert_allclose(float(nrm2(big, safe=True)), 2e25, rtol=1e-6)
    tiny = jnp.full((4,), 1e-30, jnp.float32)
    assert float(nrm2(tiny, safe=False)) == 0.0
    np.testing.assert_allclose(float(nrm2(tiny, safe=True)), 2e-30, rtol=1e-6)


def test_machine_precision_guards_zero_tolerances(rng):
    """All tolerances zero => the 1+t<=1 guards terminate at machine
    precision (lsqr.f90:798-804), not at itnlim."""
    dense = rng.standard_normal((30, 12))
    b = rng.standard_normal(30)
    res = lt.lsqr(lt.DenseOperator(a=jnp.asarray(dense)), b, 0.0,
                  atol=0.0, btol=0.0, conlim=0.0, itnlim=10_000)
    assert int(res.istop) in (1, 2)
    assert int(res.itn) < 200


def test_trace_matches_result(rng):
    dense = rng.standard_normal((30, 12))
    b = rng.standard_normal(30)
    res = lt.lsqr(lt.DenseOperator(a=jnp.asarray(dense)), b, 0.0,
                  record_trace=True, atol=1e-9, btol=1e-9, itnlim=100)
    trace = np.asarray(res.trace)
    itn = int(res.itn)
    # last recorded row must agree with the returned result fields
    np.testing.assert_allclose(trace[itn, 2], float(res.rnorm), rtol=1e-12)
    np.testing.assert_allclose(trace[itn, 5], float(res.anorm), rtol=1e-12)
    np.testing.assert_allclose(trace[itn, 6], float(res.acond), rtol=1e-12)
    np.testing.assert_allclose(trace[itn, 1], float(res.x[0]), rtol=1e-12)
    # row 0 is the pre-loop header line: test1 = 1 (lsqr.f90:663-669)
    assert trace[0, 3] == 1.0


def test_degenerate_shapes_all_solvers():
    """1x1, 1xn, mx1 and empty operators terminate correctly in every
    solver (the reference supports any m, n >= 1; lsqr.f90:91-127 only
    validates bounds)."""
    import jax.numpy as jnp

    from lsqr_tpu.ops.linop import as_operator

    for (m, n) in [(1, 1), (1, 5), (5, 1)]:
        A = as_operator(jnp.asarray(np.full((m, n), 2.0)))
        b = jnp.asarray(np.ones(m))
        for solver in (lt.lsqr, lt.lsmr, lt.cgls):
            r = solver(A, b)
            assert int(r.istop) == 1 and int(r.itn) == 1, (solver, m, n)
            # exact LS solution of all-2s matrix against ones
            expect = np.linalg.lstsq(np.full((m, n), 2.0), np.ones(m),
                                     rcond=None)[0]
            np.testing.assert_allclose(np.asarray(r.x), expect, atol=1e-6)

    # an all-zero operator: x = 0 is the answer, zero iterations
    A0 = lt.coo_operator(4, 3, np.zeros(0), np.zeros(0, np.int32),
                         np.zeros(0, np.int32))
    r = lt.lsqr(A0, jnp.asarray(np.ones(4)))
    assert int(r.istop) == 0 and float(r.xnorm) == 0.0
