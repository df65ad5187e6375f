"""CRAIG iteration megakernel — interpret-mode equivalence against
lsqr_tpu.craig (itself pinv-oracle-checked in test_craig.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

import lsqr_tpu as lt
from lsqr_tpu.craig import craig
from lsqr_tpu.ops.megakernel_craig import (
    craig_megakernel,
    craig_megakernel_supported,
)


@pytest.fixture
def rng():
    return np.random.default_rng(13)


def _problem(rng, m, n, diag_boost=8.0):
    offs = (-3, -1, 0, 2, 5)
    stripes = rng.standard_normal((len(offs), m)).astype(np.float32)
    stripes[2] += diag_boost
    A = lt.dia_operator(m, n, offs, stripes, use_pallas=False)
    z = rng.standard_normal(n).astype(np.float32)
    b = np.asarray(A.matvec(jnp.asarray(z)))  # consistent by construction
    return A, b


@pytest.mark.parametrize("m,n", [(2048, 2048), (2048, 3072)])
def test_craig_megakernel_matches_solver(rng, m, n):
    A, b = _problem(rng, m, n)
    ref = craig(A, b, atol=1e-5, btol=1e-5, itnlim=150)
    res = craig_megakernel(A, b, atol=1e-5, btol=1e-5, itnlim=150,
                           iters_per_call=16, interpret=True)
    assert int(res.istop) == int(ref.istop)
    assert abs(int(res.itn) - int(ref.itn)) <= 1
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(float(res.xnorm), float(ref.xnorm), rtol=1e-4)
    np.testing.assert_allclose(float(res.anorm), float(ref.anorm), rtol=1e-2)


def test_craig_megakernel_boundary_carryover(rng):
    A, b = _problem(rng, 2048, 2048)
    r1 = craig_megakernel(A, b, atol=1e-4, btol=1e-4, itnlim=100,
                          iters_per_call=64, interpret=True)
    r2 = craig_megakernel(A, b, atol=1e-4, btol=1e-4, itnlim=100,
                          iters_per_call=4, interpret=True)
    assert int(r1.istop) == int(r2.istop)
    assert int(r1.itn) == int(r2.itn)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=0, atol=0)


def test_craig_megakernel_b_zero(rng):
    A, _ = _problem(rng, 2048, 2048)
    res = craig_megakernel(A, np.zeros(2048, np.float32),
                           iters_per_call=4, itnlim=20, interpret=True)
    assert int(res.istop) == 0 and int(res.itn) == 0
    assert np.all(np.asarray(res.x) == 0.0)


def test_craig_megakernel_x0(rng):
    A, b = _problem(rng, 2048, 2048)
    x0 = rng.standard_normal(2048).astype(np.float32) * 0.01
    ref = craig(A, b, atol=1e-5, btol=1e-5, x0=x0)
    warm = craig_megakernel(A, b, atol=1e-5, btol=1e-5,
                            iters_per_call=16, interpret=True, x0=x0)
    assert int(warm.istop) == int(ref.istop)
    assert abs(int(warm.itn) - int(ref.itn)) <= 1
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)


def test_craig_megakernel_supported_gates():
    rng = np.random.default_rng(0)
    A, _ = _problem(rng, 2048, 2048)
    assert craig_megakernel_supported(A)
    big = lt.dia_operator(4_000_000, 4_000_000, (0,),
                          np.zeros((1, 1), np.float32).repeat(4_000_000, 1))
    assert not craig_megakernel_supported(big)


def test_craig_megakernel_option_routing(rng):
    A, b = _problem(rng, 2048, 2048)
    ref = craig(A, b, atol=1e-5, btol=1e-5)
    routed = craig(A, b, atol=1e-5, btol=1e-5, megakernel=True)
    assert int(routed.istop) == int(ref.istop)
    assert abs(int(routed.itn) - int(ref.itn)) <= 1
    np.testing.assert_allclose(np.asarray(routed.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("m,n", [(2500, 2500), (1800, 2500)])
def test_craig_megakernel_ragged_tiles(rng, m, n):
    A, b = _problem(rng, m, n)
    ref = craig(A, b, atol=1e-5, btol=1e-5, itnlim=150)
    res = craig_megakernel(A, b, atol=1e-5, btol=1e-5, itnlim=150,
                          iters_per_call=8, interpret=True)
    assert int(res.istop) == int(ref.istop)
    assert abs(int(res.itn) - int(ref.itn)) <= 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)
