"""Iteration megakernel (K LSQR iterations per pallas_call) — interpret-mode
equivalence against the regular solver. The compiled path is exercised on
real TPU hardware (BENCHMARKS.md); these tests pin the in-kernel scalar
recurrence (rotations, stopping logic, monitors) to the solver's."""

import numpy as np
import pytest

import jax

import lsqr_tpu as lt
from lsqr_tpu.ops.megakernel import lsqr_megakernel, megakernel_supported


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _problem(rng, m, n, diag_boost=4.0):
    offs = (-3, -1, 0, 2, 5)
    stripes = rng.standard_normal((len(offs), m)).astype(np.float32)
    stripes[2] += diag_boost
    A = lt.dia_operator(m, n, offs, stripes, use_pallas=False)
    b = rng.standard_normal(m).astype(np.float32)
    return A, b


@pytest.mark.parametrize(
    "m,n,damp",
    [(2048, 2048, 0.0), (2048, 2048, 0.05), (3072, 2048, 0.0), (2048, 3072, 0.0)],
)
def test_megakernel_matches_solver(rng, m, n, damp):
    A, b = _problem(rng, m, n)
    ref = lt.lsqr(A, b, damp, atol=1e-5, btol=1e-5, itnlim=150)
    res = lsqr_megakernel(A, b, damp, atol=1e-5, btol=1e-5, itnlim=150,
                          iters_per_call=16, interpret=True)
    assert int(res.istop) == int(ref.istop)
    # f32 reduction-order differences can flip a borderline stopping test
    # by one iteration
    assert abs(int(res.itn) - int(ref.itn)) <= 1
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), rtol=1e-3, atol=1e-4
    )
    # the rnorm RECURRENCE drifts a few % between paths once the true
    # residual is tiny; compare against the actual residual instead
    dense = np.asarray(A.todense(), np.float64)
    bb = np.asarray(b, np.float64)
    for r in (res, ref):
        x64 = np.asarray(r.x, np.float64)
        true_r = np.hypot(np.linalg.norm(bb - dense @ x64),
                          damp * np.linalg.norm(x64))
        np.testing.assert_allclose(float(r.rnorm), true_r,
                                   rtol=5e-2, atol=1e-4)
    # anorm accumulates one d2norm term per iteration; a one-iteration itn
    # difference shifts it by ~1/itn relative
    np.testing.assert_allclose(float(res.anorm), float(ref.anorm), rtol=1e-2)
    np.testing.assert_allclose(float(res.xnorm), float(ref.xnorm), rtol=1e-2)


def test_megakernel_istop_boundary_carryover(rng):
    """Convergence detected mid-call masks the remaining iterations: a K
    larger than itn and a K smaller than itn give identical results."""
    A, b = _problem(rng, 2048, 2048, diag_boost=8.0)
    r1 = lsqr_megakernel(A, b, 0.0, atol=1e-4, btol=1e-4, itnlim=100,
                         iters_per_call=64, interpret=True)
    r2 = lsqr_megakernel(A, b, 0.0, atol=1e-4, btol=1e-4, itnlim=100,
                         iters_per_call=4, interpret=True)
    assert int(r1.istop) == int(r2.istop)
    assert int(r1.itn) == int(r2.itn)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=0, atol=0)


def test_megakernel_b_zero(rng):
    A, _ = _problem(rng, 2048, 2048)
    res = lsqr_megakernel(A, np.zeros(2048, np.float32), 0.0,
                          iters_per_call=4, itnlim=20, interpret=True)
    assert int(res.istop) == 0 and int(res.itn) == 0
    assert np.all(np.asarray(res.x) == 0.0)


def test_megakernel_supported_gates():
    rng = np.random.default_rng(0)
    A, _ = _problem(rng, 2048, 2048)
    assert megakernel_supported(A)
    assert not megakernel_supported(A, wantse=True)
    assert not megakernel_supported(A, record_trace=True)
    # f64 stripes route to the regular x64 path
    import jax.numpy as jnp

    A64 = lt.dia_operator(2048, 2048, A.offsets,
                          np.asarray(A.data, np.float64))
    if A64.data.dtype == jnp.float64:
        assert not megakernel_supported(A64)
    # too large for VMEM residency
    big = lt.dia_operator(4_000_000, 4_000_000, (0,),
                          np.zeros((1, 1), np.float32).repeat(4_000_000, 1))
    assert not megakernel_supported(big)


def test_megakernel_x0_warm_start(rng):
    """x0 warm start (the lsqr.f90:303-320 recipe) matches the regular
    solver's x0 path on the same perturbed start."""
    A, b = _problem(rng, 2048, 2048, diag_boost=8.0)
    x0 = rng.standard_normal(2048).astype(np.float32) * 0.01
    ref = lt.lsqr(A, b, 0.0, atol=1e-5, btol=1e-5, x0=x0)
    warm = lsqr_megakernel(A, b, 0.0, atol=1e-5, btol=1e-5,
                           iters_per_call=16, interpret=True, x0=x0)
    assert int(warm.istop) == int(ref.istop)
    assert abs(int(warm.itn) - int(ref.itn)) <= 1
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(warm.xnorm), float(ref.xnorm),
                               rtol=1e-3)
    with pytest.raises(ValueError):
        lsqr_megakernel(A, b, 0.1, x0=x0, interpret=True)


def test_lsqr_megakernel_option_routing(rng):
    """LSQROptions.megakernel: True routes lsqr() through the megakernel
    (interpreted off-TPU); None stays on the regular path off-TPU; True on
    an unsupported configuration raises."""
    A, b = _problem(rng, 2048, 2048, diag_boost=8.0)
    ref = lt.lsqr(A, b, 0.0, atol=1e-5, btol=1e-5)          # auto: regular
    routed = lt.lsqr(A, b, 0.0, atol=1e-5, btol=1e-5, megakernel=True)
    assert int(routed.istop) == int(ref.istop)
    assert abs(int(routed.itn) - int(ref.itn)) <= 1
    np.testing.assert_allclose(np.asarray(routed.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)
    # the regular path keeps its trace support; megakernel=True + trace raises
    with pytest.raises(ValueError):
        lt.lsqr(A, b, 0.0, megakernel=True, record_trace=True)
    # unsupported operator type
    dense = np.asarray(A.todense())
    r2, c2 = np.nonzero(dense)
    Acoo = lt.coo_operator(2048, 2048, dense[r2, c2], r2, c2)
    with pytest.raises(ValueError):
        lt.lsqr(A=Acoo, b=b, megakernel=True)


def test_megakernel_bf16_stripes(rng):
    """bf16 stripe storage through the megakernel: supported, and matches
    a regular solve on the bf16-rounded operator (compute stays f32)."""
    import jax.numpy as jnp

    offs = (-3, -1, 0, 2, 5)
    m = 2048
    stripes = rng.standard_normal((len(offs), m)).astype(np.float32)
    stripes[2] += 8.0
    Abf = lt.dia_operator(m, m, offs, stripes, use_pallas=False,
                          storage_dtype="bfloat16")
    assert Abf.data.dtype == jnp.bfloat16
    assert megakernel_supported(Abf)
    b = rng.standard_normal(m).astype(np.float32)
    ref = lt.lsqr(Abf, b, 0.0, atol=1e-4, btol=1e-4)
    res = lsqr_megakernel(Abf, b, 0.0, atol=1e-4, btol=1e-4,
                          iters_per_call=16, interpret=True)
    assert int(res.istop) == int(ref.istop)
    assert abs(int(res.itn) - int(ref.itn)) <= 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("offs", [(0, 1, 2), (-2, -1, 0), (0,)])
def test_megakernel_one_sided_offsets(rng, offs):
    """One-sided diagonal sets (upper/lower banded): the u and v buffers
    share one halo offset; regression for the lo_f != lo_a layout
    corruption."""
    m = 2048
    stripes = rng.standard_normal((len(offs), m)).astype(np.float32)
    stripes[0] += 8.0
    A = lt.dia_operator(m, m, offs, stripes, use_pallas=False)
    b = rng.standard_normal(m).astype(np.float32)
    ref = lt.lsqr(A, b, atol=1e-4, btol=1e-4)
    res = lsqr_megakernel(A, b, atol=1e-4, btol=1e-4,
                          iters_per_call=8, interpret=True)
    assert int(res.itn) == int(ref.itn)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("m,n", [(2500, 2500), (2500, 1800), (1800, 2500)])
def test_megakernel_ragged_tiles(rng, m, n):
    """m/n not divisible by the tile: pad rows stay zero through the
    recurrence (stripes zero-padded), no in-kernel masking needed."""
    A, b = _problem(rng, m, n, diag_boost=8.0)
    ref = lt.lsqr(A, b, 0.0, atol=1e-5, btol=1e-5, itnlim=150)
    res = lsqr_megakernel(A, b, 0.0, atol=1e-5, btol=1e-5, itnlim=150,
                          iters_per_call=8, interpret=True)
    assert int(res.istop) == int(ref.istop)
    assert abs(int(res.itn) - int(ref.itn)) <= 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)


def test_fit_tm_walks_down_on_vmem_pressure():
    """Regression: m=n=500000 with 11 diagonals stack-allocated 16.05M at
    tm=32768 (> the 16M scoped-VMEM limit) on the real toolchain; the
    budget-aware selection must reject 32768 and settle on a smaller tile
    that models under budget."""
    from lsqr_tpu.ops.megakernel import (
        _fit_tm, _pick_tm, _vmem_estimate, megakernel_supported,
    )

    m = n = 500_000
    offs = tuple(range(-5, 6))
    stripes = np.ones((len(offs), m), np.float32)
    A = lt.dia_operator(m, n, offs, stripes, use_pallas=False)
    ks = tuple(int(k) for k in np.asarray(A.offsets))
    tks = tuple(int(k) for k in np.asarray(A.toffsets))

    # the calibration point: the estimate must cover the observed 16.05M
    est_32k = _vmem_estimate(ks, tks, m, n, len(offs), 4, 32768)
    assert est_32k >= int(16.05 * 2**20)

    assert _pick_tm(m, n) == 32768       # the preference that used to crash
    tm = _fit_tm(A)
    assert tm is not None and tm < 32768  # budget walk-down kicked in
    assert _vmem_estimate(ks, tks, m, n, len(offs), 4, tm) <= 14 * 2**20
    assert megakernel_supported(A)

    # the sibling kernels keep more/fewer n-vectors resident
    assert _fit_tm(A, n_nvecs=4) is not None
    assert _fit_tm(A, n_nvecs=2) is not None
