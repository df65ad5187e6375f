"""K CRAIG iterations per Pallas call — the CRAIG iteration megakernel.

Craig's method (Paige & Saunders 1982 §7.4; lsqr_tpu/craig.py) on the
megakernel substrate of :mod:`.megakernel`: u, v and x live ENTIRELY in
VMEM across the whole call, only the DIA stripes stream. CRAIG is the
lightest of the three solvers — per iteration one forward substitution
scalar y, one x-update (x += y v), and the two bidiagonalization
half-steps; ||x|| comes from the y² scalar chain so phase 2 needs no
vector reduction beyond ssq_v.

Grid: (K, 3, nt) — phase 0 = x update over n tiles (uses v_k before it
is overwritten), phase 1 = forward half-step over m tiles, phase 2 =
adjoint half-step over n tiles. The stopping tests need alpha_{k+1}
(ssq_v, complete after phase 2) and so run at the NEXT iteration's p0
boundary, replicated host-side for the final pending iteration.

Constraints: f32 DIA operators with (m + 2n + stripe tiles) * 4 bytes in
VMEM. Reference anchors: shared bidiagonalization lsqr.f90:681-699;
recurrence lsqr_tpu/craig.py:136-194.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import _fit_tm, _pick_tm, _round_up

__all__ = ["craig_megakernel", "craig_megakernel_supported"]

(ALPHA, BETA, Y, CY, ANORM2, XNORM2, RNORM, ITN) = range(8)
(ISTOP, SSQ_U, SSQ_V, C1F, C2F, C1A, C2A, BPOS) = range(8, 16)
(APREV, ACT0, BNORM, ATOL, BTOL, ITNLIM) = range(16, 22)
NSTATE = 64


def _safe_div(num, den):
    safe = jnp.where(den != 0.0, den, 1.0)
    return jnp.where(den != 0.0, num / safe, 0.0)


def _kernel(
    offsets, toffsets, lo, tm, win_f, win_a, nt_m, nt_n, m, n,
    data_ref, tdata_ref, state_in_ref,
    u_in, v_in, x_in,
    u_ref, v_ref, x_ref, state_ref,
    sem,
):
    k = pl.program_id(0)
    p = pl.program_id(1)
    t = pl.program_id(2)

    def g(i):
        return state_ref[i, 0]

    def s(i, val):
        state_ref[i, :] = jnp.full((128,), val, jnp.float32)

    @pl.when((k == 0) & (p == 0) & (t == 0))
    def _():
        state_ref[:, :] = state_in_ref[:, :]
        cps = [
            pltpu.make_async_copy(u_in, u_ref, sem.at[0]),
            pltpu.make_async_copy(v_in, v_ref, sem.at[1]),
            pltpu.make_async_copy(x_in, x_ref, sem.at[2]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

    @pl.when((p == 0) & (t == 0) & (state_ref[ACT0, 0] > 0.5))
    def _():
        # -- finish the previous iteration: alpha from ssq_v + stopping --
        @pl.when(g(ITN) > 0.5)
        def _():
            active = g(ISTOP) == 0.0
            bpos = g(BPOS) > 0.5
            alpha_cand = jnp.sqrt(g(SSQ_V))
            apos = alpha_cand > 0.0
            alpha = jnp.where(bpos & apos, alpha_cand, g(ALPHA))
            anorm2 = g(ANORM2) + jnp.where(
                bpos,
                g(BETA) * g(BETA)
                + jnp.where(apos, alpha_cand * alpha_cand, 0.0),
                0.0,
            )
            anorm = jnp.sqrt(anorm2)
            xnorm = jnp.sqrt(g(XNORM2))
            bnorm = g(BNORM)
            safe_b = jnp.where(bnorm > 0.0, bnorm, 1.0)
            test1 = g(RNORM) / safe_b
            rtol = g(BTOL) + g(ATOL) * anorm * xnorm / safe_b
            istop = jnp.zeros((), jnp.float32)
            istop = jnp.where(g(ITN) >= g(ITNLIM), 5.0, istop)
            istop = jnp.where(bpos & (~apos), 4.0, istop)
            istop = jnp.where(1.0 + test1 <= 1.0, 2.0, istop)
            istop = jnp.where(test1 <= rtol, 1.0, istop)
            istop = jnp.where(~bpos, 1.0, istop)
            s(ALPHA, jnp.where(active, alpha, g(ALPHA)))
            s(ANORM2, jnp.where(active, anorm2, g(ANORM2)))
            s(ISTOP, jnp.where(active, istop, g(ISTOP)))

        # -- this iteration's forward-substitution scalar + coefficients --
        active = g(ISTOP) == 0.0
        alpha, beta = g(ALPHA), g(BETA)
        itn = g(ITN) + 1.0
        ratio = _safe_div(beta, alpha)
        y = jnp.where(itn < 1.5, ratio, -ratio * g(Y))
        inv_a = _safe_div(1.0, alpha)
        s(Y, jnp.where(active, y, g(Y)))
        s(CY, jnp.where(active, y * inv_a, 0.0))
        s(XNORM2, jnp.where(active, g(XNORM2) + y * y, g(XNORM2)))
        s(ITN, jnp.where(active, itn, g(ITN)))
        s(C1F, inv_a)
        s(C2F, alpha * _safe_div(1.0, beta))
        s(APREV, alpha)
        s(SSQ_U, 0.0)

    @pl.when((p == 2) & (t == 0) & (state_ref[ACT0, 0] > 0.5))
    def _():
        active = g(ISTOP) == 0.0
        beta = jnp.sqrt(g(SSQ_U))
        aprev = g(APREV)
        s(BETA, jnp.where(active, beta, g(BETA)))
        s(BPOS, jnp.where(active, (beta > 0.0).astype(jnp.float32), g(BPOS)))
        s(RNORM, jnp.where(active, beta * jnp.abs(g(Y)), g(RNORM)))
        s(C1A, _safe_div(1.0, beta))
        s(C2A, beta * _safe_div(1.0, aprev))
        s(SSQ_V, 0.0)

    active = (g(ISTOP) == 0.0) & (g(ACT0) > 0.5)

    # ---- p0: x += (y/alpha) * V over n tiles (uses v_k pre-update) ----
    @pl.when((p == 0) & (t < nt_n) & active)
    def _():
        base = t * tm
        vseg = v_ref[pl.ds(base + lo, tm)].astype(jnp.float32)
        x_ref[pl.ds(base, tm)] = (
            x_ref[pl.ds(base, tm)].astype(jnp.float32) + g(CY) * vseg
        )

    # ---- p1: forward half-step, u tiles ----
    @pl.when((p == 1) & (t < nt_m) & active)
    def _():
        c1, c2 = g(C1F), g(C2F)
        base = t * tm
        vwin = v_ref[pl.ds(base, win_f)].astype(jnp.float32) * c1
        acc = (-c2) * u_ref[pl.ds(base + lo, tm)].astype(jnp.float32)
        for d, kk in enumerate(offsets):
            seg = jax.lax.slice(vwin, (lo + kk,), (lo + kk + tm,))
            acc = acc + data_ref[d, :].astype(jnp.float32) * seg
        u_ref[pl.ds(base + lo, tm)] = acc
        state_ref[SSQ_U, :] = jnp.full(
            (128,), g(SSQ_U) + jnp.sum(acc * acc), jnp.float32
        )

    # ---- p2: adjoint half-step, v tiles ----
    @pl.when((p == 2) & (t < nt_n) & active)
    def _():
        c1, c2 = g(C1A), g(C2A)
        bpos = g(BPOS) > 0.5
        base = t * tm
        uwin = u_ref[pl.ds(base, win_a)].astype(jnp.float32) * c1
        vold = v_ref[pl.ds(base + lo, tm)].astype(jnp.float32)
        acc = (-c2) * vold
        for d, kk in enumerate(toffsets):
            seg = jax.lax.slice(uwin, (lo + kk,), (lo + kk + tm,))
            acc = acc + tdata_ref[d, :].astype(jnp.float32) * seg
        acc = jnp.where(bpos, acc, vold)
        v_ref[pl.ds(base + lo, tm)] = acc
        state_ref[SSQ_V, :] = jnp.full(
            (128,), g(SSQ_V) + jnp.sum(acc * acc), jnp.float32
        )


def craig_megakernel_supported(A, *, vmem_budget=14 * 1024 * 1024) -> bool:
    """Whether craig_megakernel can run this operator: DIA, f32/bf16
    stripes, and u + v + x + stripe tiles within VMEM."""
    from .structured import DIAOperator

    if not isinstance(A, DIAOperator):
        return False
    if A.data.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return _fit_tm(A, vmem_budget, n_nvecs=2) is not None


@functools.lru_cache(maxsize=32)
def _cached_call(ks, tks, m, n, nd, K, tm, interpret):
    nt_m = -(-m // tm)
    nt_n = -(-n // tm)
    nt = max(nt_m, nt_n)
    lo = max(
        _round_up(max(0, -min(ks)), 1024),
        _round_up(max(0, -min(tks)), 1024),
    )
    win_f = _round_up(lo + max(max(ks), 0) + tm, 1024)
    win_a = _round_up(lo + max(max(tks), 0) + tm, 1024)
    vlen = _round_up(max(lo + n, (nt_m - 1) * tm + win_f, nt_n * tm + lo), 1024)
    ulen = _round_up(max(lo + m, (nt_n - 1) * tm + win_a, nt_m * tm + lo), 1024)
    xlen = _round_up(nt_n * tm, 1024)

    kernel = functools.partial(
        _kernel, ks, tks, lo, tm, win_f, win_a, nt_m, nt_n, m, n,
    )

    # Walk stripes only in their consuming phase (data: p1 forward,
    # tdata: p2 adjoint); pin to the last-visited tile elsewhere (see
    # ops/megakernel.py — the 0-pin made tdata stream twice per iteration).
    def index_data(k, p, t):
        return (0, jnp.where(p == 1, jnp.minimum(t, nt_m - 1), nt_m - 1))

    def index_tdata(k, p, t):
        return (0, jnp.where(p == 2, jnp.minimum(t, nt_n - 1), nt_n - 1))

    whole = lambda k, p, t: (0,)

    def call(data_pad, tdata_pad, u, v, x, state):
        return pl.pallas_call(
            kernel,
            grid=(K, 3, nt),
            in_specs=[
                pl.BlockSpec((nd, tm), index_data, memory_space=pltpu.VMEM),
                pl.BlockSpec((nd, tm), index_tdata, memory_space=pltpu.VMEM),
                pl.BlockSpec((NSTATE, 128), lambda k, p, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((ulen,), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((vlen,), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((xlen,), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((NSTATE, 128), lambda k, p, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((ulen,), jnp.float32),
                jax.ShapeDtypeStruct((vlen,), jnp.float32),
                jax.ShapeDtypeStruct((xlen,), jnp.float32),
                jax.ShapeDtypeStruct((NSTATE, 128), jnp.float32),
            ),
            input_output_aliases={3: 0, 4: 1, 5: 2},
            scratch_shapes=[pltpu.SemaphoreType.DMA((3,))],
            interpret=interpret,
        )(data_pad, tdata_pad, state, u, v, x)

    return jax.jit(call), dict(ulen=ulen, vlen=vlen, xlen=xlen, lo=lo,
                               nt_m=nt_m, nt_n=nt_n)


def _build_call(A, K, tm, interpret=False):
    from .structured import DIAOperator

    assert isinstance(A, DIAOperator)
    m, n = A.m, A.n
    nd = A.data.shape[0]
    run, geom = _cached_call(
        A.offsets, A.toffsets, m, n, nd, K, tm, bool(interpret)
    )
    nt_m, nt_n = geom["nt_m"], geom["nt_n"]
    data_pad = jnp.zeros((nd, nt_m * tm), A.data.dtype).at[:, :m].set(A.data)
    tdata_pad = jnp.zeros((nd, nt_n * tm), A.tdata.dtype).at[:, :n].set(A.tdata)
    return run, data_pad, tdata_pad, geom


def craig_megakernel(
    A,
    b,
    *,
    atol: float = 1e-6,
    btol: float = 1e-6,
    itnlim=None,
    iters_per_call: int = 32,
    interpret: bool = False,
    tm=None,
    x0=None,
):
    """Minimum-norm solve of a consistent system with Craig's method, K
    iterations per kernel dispatch. Semantics match
    :func:`lsqr_tpu.craig` (f32 path). Returns a CRAIGResult."""
    from ..craig import CRAIGResult
    from .blas import nrm2

    if x0 is not None:
        x0 = jnp.asarray(x0, jnp.float32)
        r0 = jnp.asarray(b, jnp.float32) - A.matvec(x0)
        res = craig_megakernel(
            A, r0, atol=atol, btol=btol, itnlim=itnlim,
            iters_per_call=iters_per_call, interpret=interpret, tm=tm,
        )
        xw = x0 + res.x
        return res._replace(x=xw, xnorm=nrm2(xw, safe=True))

    m, n = A.m, A.n
    if tm is None:
        tm = _fit_tm(A, n_nvecs=2)
        if tm is None:
            raise ValueError(
                "operator too large for the CRAIG iteration megakernel "
                "(see ops.megakernel_craig.craig_megakernel_supported)"
            )
    if itnlim is None:
        itnlim = min(m, n)
    itnlim_r = int(itnlim)
    K = min(iters_per_call, max(1, itnlim_r))

    b = jnp.asarray(b, jnp.float32)

    # ---- setup: beta_1 u_1 = b ; alpha_1 v_1 = A'u_1 ----
    beta0 = nrm2(b, safe=True)
    safe_b0 = jnp.where(beta0 > 0, beta0, 1.0)
    u0n = jnp.where(beta0 > 0, b / safe_b0, b)
    v0u = jnp.where(beta0 > 0, A.rmatvec(u0n), jnp.zeros((n,), jnp.float32))
    alpha0 = jnp.where(beta0 > 0, nrm2(v0u, safe=True), 0.0)

    run, data_pad, tdata_pad, geom = _build_call(A, K, tm, interpret=interpret)
    lo = geom["lo"]
    u = jnp.zeros((geom["ulen"],), jnp.float32).at[lo: lo + m].set(b)
    v = jnp.zeros((geom["vlen"],), jnp.float32).at[lo: lo + n].set(v0u)
    x = jnp.zeros((geom["xlen"],), jnp.float32)

    state = jnp.zeros((NSTATE, 128), jnp.float32)

    def put(st, i, val):
        return st.at[i, :].set(val)

    state = put(state, ALPHA, alpha0)
    state = put(state, BETA, beta0)
    state = put(state, ANORM2, alpha0 * alpha0 + beta0 * beta0)
    state = put(state, RNORM, beta0)
    state = put(state, BPOS, 1.0)
    state = put(state, BNORM, beta0)
    state = put(state, ATOL, jnp.float32(atol))
    state = put(state, BTOL, jnp.float32(btol))
    state = put(state, ITNLIM, float(itnlim_r))
    state = put(state, ACT0, jnp.where((beta0 > 0) & (alpha0 > 0), 1.0, 0.0))

    # Speculative host loop: dispatch call i+1 (async) BEFORE syncing the
    # convergence check of call i, hiding the host round trip behind the
    # next call's execution; post-convergence iterations are masked no-ops
    # so the one speculative call is harmless (<= K masked iterations).
    max_calls = -(-itnlim_r // K) + 1
    prev_state = None
    for _ in range(max_calls):
        u, v, x, state = run(data_pad, tdata_pad, u, v, x, state)
        if prev_state is not None:
            pcol = np.asarray(prev_state[:, 0])
            if pcol[ISTOP] != 0.0 or pcol[ITN] >= itnlim_r:
                break
        prev_state = state
    col = np.asarray(state[:, 0])

    st = col  # final state column, already fetched by the loop
    istop = st[ISTOP]
    anorm2 = st[ANORM2]
    # istop-4 breakdown at setup: b has no component in range(A)
    if st[ACT0] < 0.5:
        istop = 4.0 if float(beta0) > 0 else 0.0
    elif istop == 0.0 and st[ITN] > 0:
        # final pending tests (the kernel runs them at the next boundary)
        bpos = st[BPOS] > 0.5
        alpha_cand = float(np.sqrt(st[SSQ_V]))
        apos = alpha_cand > 0.0
        if bpos:
            anorm2 = anorm2 + st[BETA] ** 2 + (alpha_cand ** 2 if apos else 0.0)
        anorm = float(np.sqrt(anorm2))
        xnorm = float(np.sqrt(st[XNORM2]))
        safe_b = st[BNORM] if st[BNORM] > 0 else 1.0
        test1 = st[RNORM] / safe_b
        rtol = st[BTOL] + st[ATOL] * anorm * xnorm / safe_b
        f32 = np.float32
        if st[ITN] >= st[ITNLIM]:
            istop = 5.0
        if bpos and not apos:
            istop = 4.0
        if f32(1.0) + f32(test1) <= f32(1.0):
            istop = 2.0
        if test1 <= rtol:
            istop = 1.0
        if not bpos:
            istop = 1.0

    return CRAIGResult(
        x=x[:n],
        istop=jnp.asarray(int(istop), jnp.int32),
        itn=jnp.asarray(int(st[ITN]), jnp.int32),
        rnorm=jnp.asarray(st[RNORM], jnp.float32),
        anorm=jnp.asarray(np.sqrt(anorm2), jnp.float32),
        xnorm=jnp.asarray(np.sqrt(st[XNORM2]), jnp.float32),
    )
