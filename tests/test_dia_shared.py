"""Shared-stripe DIA operator: one padded array serves both products —
half the HBM of the packed DIAOperator. Equivalence against the packed
operator (itself COO-equivalence-tested) and the dense oracle.

Reference anchor: the two aprod modes over one COO triple,
lsqr.f90:156-194 — here one stripe array over both directions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import lsqr_tpu as lt
from lsqr_tpu.ops.pallas_spmv import dia_product_shared, dia_shared_geometry
from lsqr_tpu.ops.structured import dia_operator, dia_shared_operator


@pytest.fixture
def rng():
    return np.random.default_rng(11)


CASES = [
    (300, 300, (-2, -1, 0, 1, 2)),
    (200, 330, (-3, 0, 7, 60)),
    (330, 200, (-60, -3, 0, 5)),
    (257, 129, (0,)),           # ragged, single diagonal
]


@pytest.mark.parametrize("m,n,ks", CASES)
def test_shared_matches_packed_xla(rng, m, n, ks):
    data = rng.standard_normal((len(ks), m)).astype(np.float32)
    As = dia_shared_operator(m, n, ks, data)
    Ap = dia_operator(m, n, ks, data, use_pallas=False)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(As.matvec(x)),
                                  np.asarray(Ap.matvec(x)))
    np.testing.assert_array_equal(np.asarray(As.rmatvec(y)),
                                  np.asarray(Ap.rmatvec(y)))
    np.testing.assert_array_equal(np.asarray(As.todense()),
                                  np.asarray(Ap.todense()))


@pytest.mark.parametrize("m,n,ks", CASES)
def test_shared_pallas_kernel_interpret(rng, m, n, ks):
    """The windowed Pallas kernel (interpret mode) vs the dense oracle,
    including a ragged tile size."""
    data = rng.standard_normal((len(ks), m)).astype(np.float32)
    A = np.asarray(dia_operator(m, n, ks, data, use_pallas=False).todense())
    tm = 128  # forces ragged tiles on every case
    dp = dia_shared_operator(m, n, ks, data).dp
    x = rng.standard_normal(n).astype(np.float32)
    y = rng.standard_normal(m).astype(np.float32)
    fw = dia_product_shared(dp, jnp.asarray(x), offsets=ks,
                            m=m, n=n, adjoint=False, interpret=True, tm=tm)
    aj = dia_product_shared(dp, jnp.asarray(y), offsets=ks,
                            m=m, n=n, adjoint=True, interpret=True, tm=tm)
    np.testing.assert_allclose(np.asarray(fw), A @ x, atol=2e-5)
    np.testing.assert_allclose(np.asarray(aj), A.T @ y, atol=2e-5)


def test_shared_solve_bit_identical_to_packed(rng):
    m = n = 400
    ks = (-2, -1, 0, 1, 2)
    data = rng.standard_normal((5, m)).astype(np.float32)
    data[2] += 6.0  # diagonally dominant -> well-conditioned
    As = dia_shared_operator(m, n, ks, data)
    Ap = dia_operator(m, n, ks, data, use_pallas=False)
    b = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    rs = lt.lsqr(As, b, 0.05, itnlim=30, atol=0.0, btol=0.0, conlim=0.0)
    rp = lt.lsqr(Ap, b, 0.05, itnlim=30, atol=0.0, btol=0.0, conlim=0.0)
    assert int(rs.itn) == int(rp.itn)
    np.testing.assert_array_equal(np.asarray(rs.x), np.asarray(rp.x))
    # the sibling solvers run on it too
    rl = lt.lsmr(As, b, atol=1e-6, btol=1e-6)
    rg = lt.cgls(As, b, atol=1e-6, btol=1e-6)
    np.testing.assert_allclose(np.asarray(rl.x), np.asarray(rg.x),
                               rtol=1e-3, atol=1e-4)


def test_shared_memory_is_half(rng):
    """The advertised capacity win: stored bytes ~half the packed pair."""
    m = n = 100_000
    ks = tuple(range(-5, 6))
    data = rng.standard_normal((len(ks), m)).astype(np.float32)
    As = dia_shared_operator(m, n, ks, data)
    Ap = dia_operator(m, n, ks, data)
    shared = As.dp.nbytes
    packed = Ap.data.nbytes + Ap.tdata.nbytes
    assert shared < 0.55 * packed  # halo + rounding amortize at scale


def test_shared_acheck_and_bf16(rng):
    from lsqr_tpu.diagnostics import acheck

    m, n = 500, 300
    ks = (-4, 0, 3)
    data = rng.standard_normal((3, m)).astype(np.float32)
    As = dia_shared_operator(m, n, ks, data)
    assert int(acheck(As).inform) == 0
    Abf = dia_shared_operator(m, n, ks, data, storage_dtype="bfloat16")
    assert Abf.is_bf16_storage and Abf.dtype == jnp.float32
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    ref = As.matvec(x)
    out = Abf.matvec(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_shared_fused_halfstep_path(rng):
    """use_pallas=True routes the shared operator through the fused
    product+axpy kernel (interpret off-TPU); the solve matches the packed
    XLA solve at matched iteration counts."""
    m = n = 600
    ks = (-2, -1, 0, 1, 2)
    data = rng.standard_normal((5, m)).astype(np.float32)
    data[2] += 5.0
    As = dia_shared_operator(m, n, ks, data, use_pallas=True)
    assert As.prefers_fused
    # the bounded-loop workaround is env-gated now that the backend's
    # pallas-in-while_loop hang is fixed (config.bounded_loop_workaround)
    import os
    from unittest import mock

    assert not As.prefers_bounded_loop
    with mock.patch.dict(os.environ, {"LSQR_TPU_BOUNDED_LOOP": "1"}):
        assert As.prefers_bounded_loop
    Ap = dia_operator(m, n, ks, data, use_pallas=False)
    b = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    rs = lt.lsqr(As, b, 0.05, itnlim=25, atol=0.0, btol=0.0, conlim=0.0)
    rp = lt.lsqr(Ap, b, 0.05, itnlim=25, atol=0.0, btol=0.0, conlim=0.0)
    assert int(rs.itn) == int(rp.itn)
    np.testing.assert_allclose(np.asarray(rs.x), np.asarray(rp.x),
                               rtol=1e-5, atol=1e-6)


def test_shared_axpy_kernel_oracle(rng):
    """dia_product_shared_axpy vs the dense oracle, both directions,
    rectangular + one-sided offsets, ragged tiles."""
    from lsqr_tpu.ops.pallas_spmv import dia_product_shared_axpy

    for (m, n, ks) in [(300, 300, (-2, -1, 0, 1, 2)),
                       (200, 330, (-3, 0, 7, 60)),
                       (330, 200, (-60, -3, 0, 5))]:
        data = rng.standard_normal((len(ks), m)).astype(np.float32)
        As = dia_shared_operator(m, n, ks, data)
        A = np.asarray(dia_operator(m, n, ks, data, use_pallas=False).todense())
        x = rng.standard_normal(n).astype(np.float32)
        y = rng.standard_normal(m).astype(np.float32)
        c1, c2 = 0.7, 1.3
        fw = dia_product_shared_axpy(
            As.dp, jnp.asarray(x), jnp.asarray(y), c1, c2, offsets=ks,
            m=m, n=n, adjoint=False, interpret=True, tm=128)
        np.testing.assert_allclose(np.asarray(fw), A @ (x * c1) - c2 * y,
                                   atol=3e-5)
        aj = dia_product_shared_axpy(
            As.dp, jnp.asarray(y), jnp.asarray(x), c1, c2, offsets=ks,
            m=m, n=n, adjoint=True, interpret=True, tm=128)
        np.testing.assert_allclose(np.asarray(aj), A.T @ (y * c1) - c2 * x,
                                   atol=3e-5)
