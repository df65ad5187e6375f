"""LSMR iteration megakernel — interpret-mode equivalence against
lsqr_tpu.lsmr (itself scipy-cross-checked in test_lsmr.py). Mirrors
test_megakernel.py's strategy for the LSQR kernel."""

import numpy as np
import pytest

import lsqr_tpu as lt
from lsqr_tpu.lsmr import lsmr
from lsqr_tpu.ops.megakernel_lsmr import (
    lsmr_megakernel,
    lsmr_megakernel_supported,
)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


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
def test_lsmr_megakernel_matches_solver(rng, m, n, damp):
    A, b = _problem(rng, m, n)
    ref = lsmr(A, b, damp, atol=1e-5, btol=1e-5, itnlim=150)
    res = lsmr_megakernel(A, b, damp, atol=1e-5, btol=1e-5, itnlim=150,
                          iters_per_call=16, interpret=True)
    assert int(res.istop) == int(ref.istop)
    assert abs(int(res.itn) - int(ref.itn)) <= 1
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(float(res.normr), float(ref.normr),
                               rtol=5e-2, atol=1e-5)
    np.testing.assert_allclose(float(res.norma), float(ref.norma), rtol=1e-2)
    np.testing.assert_allclose(float(res.normx), float(ref.normx), rtol=1e-2)


def test_lsmr_megakernel_boundary_carryover(rng):
    """K larger/smaller than itn give identical results (mid-call stop)."""
    A, b = _problem(rng, 2048, 2048, diag_boost=8.0)
    r1 = lsmr_megakernel(A, b, 0.0, atol=1e-4, btol=1e-4, itnlim=100,
                         iters_per_call=64, interpret=True)
    r2 = lsmr_megakernel(A, b, 0.0, atol=1e-4, btol=1e-4, itnlim=100,
                         iters_per_call=4, interpret=True)
    assert int(r1.istop) == int(r2.istop)
    assert int(r1.itn) == int(r2.itn)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=0, atol=0)


def test_lsmr_megakernel_b_zero(rng):
    A, _ = _problem(rng, 2048, 2048)
    res = lsmr_megakernel(A, np.zeros(2048, np.float32), 0.0,
                          iters_per_call=4, itnlim=20, interpret=True)
    assert int(res.istop) == 0 and int(res.itn) == 0
    assert np.all(np.asarray(res.x) == 0.0)


def test_lsmr_megakernel_supported_gates():
    rng = np.random.default_rng(0)
    A, _ = _problem(rng, 2048, 2048)
    assert lsmr_megakernel_supported(A)
    assert not lsmr_megakernel_supported(A, record_trace=True)
    big = lt.dia_operator(4_000_000, 4_000_000, (0,),
                          np.zeros((1, 1), np.float32).repeat(4_000_000, 1))
    assert not lsmr_megakernel_supported(big)


@pytest.mark.parametrize("offs", [(0, 1, 2), (-2, -1, 0)])
def test_lsmr_megakernel_one_sided_offsets(rng, offs):
    m = 2048
    stripes = rng.standard_normal((len(offs), m)).astype(np.float32)
    stripes[0] += 8.0
    A = lt.dia_operator(m, m, offs, stripes, use_pallas=False)
    b = rng.standard_normal(m).astype(np.float32)
    ref = lsmr(A, b, atol=1e-4, btol=1e-4)
    res = lsmr_megakernel(A, b, atol=1e-4, btol=1e-4,
                          iters_per_call=8, interpret=True)
    assert int(res.itn) == int(ref.itn)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-5)


def test_lsmr_megakernel_x0(rng):
    A, b = _problem(rng, 2048, 2048, diag_boost=8.0)
    x0 = rng.standard_normal(2048).astype(np.float32) * 0.01
    ref = lsmr(A, b, 0.0, atol=1e-5, btol=1e-5, x0=x0)
    warm = lsmr_megakernel(A, b, 0.0, atol=1e-5, btol=1e-5,
                           iters_per_call=16, interpret=True, x0=x0)
    assert int(warm.istop) == int(ref.istop)
    assert abs(int(warm.itn) - int(ref.itn)) <= 1
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)
    with pytest.raises(ValueError):
        lsmr_megakernel(A, b, 0.1, x0=x0, interpret=True)


def test_lsmr_megakernel_option_routing(rng):
    """lsmr(megakernel=True) routes through the LSMR megakernel
    (interpreted off-TPU); unsupported configurations raise."""
    A, b = _problem(rng, 2048, 2048, diag_boost=8.0)
    ref = lsmr(A, b, 0.0, atol=1e-5, btol=1e-5)
    routed = lsmr(A, b, 0.0, atol=1e-5, btol=1e-5, megakernel=True)
    assert int(routed.istop) == int(ref.istop)
    assert abs(int(routed.itn) - int(ref.itn)) <= 1
    np.testing.assert_allclose(np.asarray(routed.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)
    with pytest.raises(ValueError):
        lsmr(A, b, 0.0, megakernel=True, record_trace=True)


@pytest.mark.parametrize("m,n", [(2500, 2500), (2500, 1800), (1800, 2500)])
def test_lsmr_megakernel_ragged_tiles(rng, m, n):
    A, b = _problem(rng, m, n, diag_boost=8.0)
    ref = lsmr(A, b, atol=1e-5, btol=1e-5, itnlim=150)
    res = lsmr_megakernel(A, b, atol=1e-5, btol=1e-5, itnlim=150,
                          iters_per_call=8, interpret=True)
    assert int(res.istop) == int(ref.istop)
    assert abs(int(res.itn) - int(ref.itn)) <= 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)
