"""Bandwidth-reducing reordering (ops/reorder.py): scrambled-banded
matrices — the classic 'general input with hidden structure' — must
recover a streaming-format packing and solve correctly with x returned in
the original ordering."""

import jax.numpy as jnp
import numpy as np
import pytest

import lsqr_tpu as lt
from lsqr_tpu.ops.jdia import JDIAOperator
from lsqr_tpu.ops.reorder import bandwidth_orders, plan_general, solve_general


def _scrambled_banded(rng, m, n, bw=9):
    """A banded matrix under random row/col permutations: locality exists
    but is invisible to direct packing."""
    rows = np.repeat(np.arange(m), bw)
    cols = rows + rng.integers(-bw, bw + 1, rows.size)
    keep = (cols >= 0) & (cols < n)
    rows, cols = rows[keep], cols[keep]
    key = rows.astype(np.int64) * n + cols
    _, u = np.unique(key, return_index=True)
    rows, cols = rows[u], cols[u]
    vals = rng.standard_normal(rows.size).astype(np.float32)
    rp = rng.permutation(m)
    cp = rng.permutation(n)
    return vals, rp[rows], cp[cols]


def test_bandwidth_orders_localize(rng):
    m = n = 800
    vals, rows, cols = _scrambled_banded(rng, m, n)
    # scrambled: deltas span the whole matrix
    assert np.ptp(cols.astype(np.int64) - rows) > m // 2
    ro, co = bandwidth_orders(m, n, rows, cols)
    deltas = co[cols].astype(np.int64) - ro[rows]
    # RCM over the bipartite graph recovers near-banded structure
    assert np.ptp(deltas) < 12 * 9, np.ptp(deltas)


def test_plan_general_reorders_to_fast_format(rng):
    m = n = 1200
    vals, rows, cols = _scrambled_banded(rng, m, n)
    plan = plan_general(m, n, vals, rows, cols)
    # the reordered pattern should land on a streaming format (JDIA or DIA)
    from lsqr_tpu.ops.structured import DIAOperator

    assert isinstance(plan.op, (JDIAOperator, DIAOperator)), type(plan.op)
    if isinstance(plan.op, JDIAOperator):
        assert plan.op.fit_fraction >= 0.95


def test_solve_general_matches_direct(rng):
    m, n = 700, 500
    vals, rows, cols = _scrambled_banded(rng, m, n)
    b = rng.standard_normal(m).astype(np.float32)
    res = solve_general(m, n, vals, rows, cols, b, 0.1,
                        atol=1e-5, btol=1e-5, itnlim=400)
    ref_op = lt.coo_operator(m, n, vals, rows, cols)
    ref = lt.lsqr(ref_op, b, 0.1, atol=1e-5, btol=1e-5, itnlim=400)
    # permutation-invariant: same istop/itn/norms, x in ORIGINAL order
    assert int(res.istop) == int(ref.istop)
    assert abs(int(res.itn) - int(ref.itn)) <= 2
    np.testing.assert_allclose(float(res.rnorm), float(ref.rnorm), rtol=1e-4)
    # same math up to f32 rounding along a slightly different (permuted)
    # reduction order; both solves hit the 1e-5 tolerance
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=2e-3, atol=5e-4)


def test_plan_general_wantse_unpermuted(rng):
    # f64 so permuted-vs-direct drift is small (also exercises the f64
    # JDIA/XLA product path). The products are bit-identical (verified);
    # the residual drift is reduction-order sensitivity of the se
    # recurrence itself: permuting the problem permutes every nrm2/dot
    # summation order, and the recurrence amplifies those 1e-16
    # perturbations to ~1e-5 over 40 iterations (measured 6.4e-6; the same
    # comparison in f32 drifts 1.5e-2).
    m, n = 400, 300
    vals, rows, cols = _scrambled_banded(rng, m, n)
    vals = vals.astype(np.float64)
    plan = plan_general(m, n, vals, rows, cols)
    b = rng.standard_normal(m)
    # fixed iteration count so the permuted and direct paths accumulate se
    # over the identical iterations (se drifts with itn otherwise)
    kw = dict(wantse=True, atol=0.0, btol=0.0, conlim=0.0, itnlim=40)
    res = plan.solve(b, 0.1, **kw)
    ref = lt.lsqr(lt.coo_operator(m, n, vals, rows, cols), b, 0.1, **kw)
    assert int(res.itn) == int(ref.itn)
    np.testing.assert_allclose(np.asarray(res.se), np.asarray(ref.se),
                               rtol=1e-4, atol=1e-9)


def test_plan_general_identity_when_structured(rng):
    """Already-banded input: no reordering needed; plan keeps identity."""
    m = n = 500
    offsets = (-2, 0, 1)
    rows = np.concatenate([np.arange(m)] * 3)
    cols = np.concatenate([np.arange(m) + k for k in offsets])
    keep = (cols >= 0) & (cols < n)
    rows, cols = rows[keep], cols[keep]
    vals = rng.standard_normal(rows.size)
    plan = plan_general(m, n, vals, rows, cols)
    np.testing.assert_array_equal(plan.row_order, np.arange(m))
    np.testing.assert_array_equal(plan.col_order, np.arange(n))
