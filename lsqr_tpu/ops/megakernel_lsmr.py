"""K LSMR iterations per Pallas call — the LSMR iteration megakernel.

The LSMR sibling of :mod:`.megakernel`: same dispatch-floor argument
(BENCHMARKS.md), same residency design — u, v and the three n-vectors
x/h/hbar live ENTIRELY in VMEM as aliased whole-vector outputs with
constant index maps, only the DIA stripes stream per grid step — but the
scalar recurrence is Fong & Saunders (2011): the two extra plane
rotations (P, Pbar after the damp rotation Phat), the h/hbar/x update,
and the monotone ||r||/||A'r|| estimators, with the istop 0-7 taxonomy of
``lsqr_tpu.lsmr`` (itself cross-checked against scipy.sparse.linalg.lsmr).

Grid: (K, 3, nt) — iteration k, phase p (0 = forward half-step over
m-rows, 1 = adjoint half-step over n-rows, 2 = h/hbar/x update over
n-rows), tile t. The bidiagonalization phases 0/1 are identical to the
LSQR megakernel's (unnormalized u/v carry, scale factors in scalars).
``normx``, needed by the stopping tests, is accumulated as ssq_x in phase
2 tiles and consumed at the NEXT iteration's p0 boundary, so the tests
for iteration k run at k+1/p0 (and are replicated host-side for the final
pending iteration), mirroring the LSQR megakernel's deferral.

Constraints: f32 DIA operators with (m + 4n + stripe tiles) * 4 bytes
within the VMEM budget; no trace. Reference anchors: iteration op
sequence lsqr.f90:681-699 (shared bidiagonalization) and the published
LSMR recurrence as implemented in lsqr_tpu/lsmr.py:228-338.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import _fit_tm, _pick_tm, _round_up

__all__ = ["lsmr_megakernel", "lsmr_megakernel_supported"]

# scalar-state rows in the (64, 128) VMEM state block
(ALPHA, BETA, ALPHABAR, RHO, RHOBAR, CBAR, SBAR, ZETA) = range(8)
(ZETABAR, BETADD, BETAD, RHODOLD, TAUTILDEOLD, THETATILDE, DACC,
 NORMA2) = range(8, 16)
(MAXRBAR, MINRBAR, NORMR, NORMAR, NORMA, CONDA, NORMX, ITN) = range(16, 24)
(ISTOP, SSQ_U, SSQ_V, SSQ_X, C1F, C2F, C1A, C2A) = range(24, 32)
(BPOS, CHB, CX, CH, INVA, APREV, ACT0, NORMB) = range(32, 40)
(ATOL, BTOL, CTOL, ITNLIM, DAMP) = range(40, 45)
NSTATE = 64


def _sym_ortho(a, b):
    """Branchless stable Givens (c, s, r); the published LSMR sign
    conventions (lsqr_tpu/lsmr.py:101-129), f32."""
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    absa, absb = jnp.abs(a), jnp.abs(b)
    sign_a = jnp.where(a >= zero, one, -one)
    sign_b = jnp.where(b >= zero, one, -one)
    safe_b = jnp.where(b != zero, b, one)
    tau_ab = a / safe_b
    s_b = sign_b / jnp.sqrt(one + tau_ab * tau_ab)
    c_b = s_b * tau_ab
    r_b = safe_b / s_b
    safe_a = jnp.where(a != zero, a, one)
    tau_ba = b / safe_a
    c_a = sign_a / jnp.sqrt(one + tau_ba * tau_ba)
    s_a = c_a * tau_ba
    r_a = safe_a / c_a
    b_zero, a_zero, b_dom = b == zero, a == zero, absb > absa
    c = jnp.where(b_zero, sign_a,
                  jnp.where(a_zero, zero, jnp.where(b_dom, c_b, c_a)))
    s = jnp.where(b_zero, zero,
                  jnp.where(a_zero, sign_b, jnp.where(b_dom, s_b, s_a)))
    r = jnp.where(b_zero, absa,
                  jnp.where(a_zero, absb, jnp.where(b_dom, r_b, r_a)))
    return c, s, r


def _safe_div(num, den):
    safe = jnp.where(den != 0.0, den, 1.0)
    return jnp.where(den != 0.0, num / safe, 0.0)


def _kernel(
    offsets, toffsets, lo, tm, win_f, win_a, nt_m, nt_n, m, n,
    data_ref, tdata_ref, state_in_ref,
    u_in, v_in, x_in, h_in, hbar_in,
    u_ref, v_ref, x_ref, h_ref, hbar_ref, state_ref,
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
            pltpu.make_async_copy(h_in, h_ref, sem.at[3]),
            pltpu.make_async_copy(hbar_in, hbar_ref, sem.at[4]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

    # =====================================================================
    # Phase boundaries
    # =====================================================================

    @pl.when((p == 0) & (t == 0) & (state_ref[ACT0, 0] > 0.5))
    def _():
        # -- previous iteration's stopping tests (need ssq_x from p2) --
        @pl.when(g(ITN) > 0.5)
        def _():
            active = g(ISTOP) == 0.0
            normx = jnp.sqrt(g(SSQ_X))
            normb = g(NORMB)
            safe_b = jnp.where(normb > 0.0, normb, 1.0)
            normr, norma, conda, normar = g(NORMR), g(NORMA), g(CONDA), g(NORMAR)
            test1 = normr / safe_b
            denom2 = norma * normr
            test2 = jnp.where(
                denom2 > 0.0,
                normar / jnp.where(denom2 > 0.0, denom2, 1.0),
                jnp.float32(jnp.inf),
            )
            safe_ca = jnp.where(conda > 0.0, conda, 1.0)
            test3 = 1.0 / safe_ca
            t1 = test1 / (1.0 + norma * normx / safe_b)
            rtol = g(BTOL) + g(ATOL) * norma * normx / safe_b
            istop = jnp.zeros((), jnp.float32)
            istop = jnp.where(g(ITN) >= g(ITNLIM), 7.0, istop)
            istop = jnp.where(1.0 + test3 <= 1.0, 6.0, istop)
            istop = jnp.where(1.0 + test2 <= 1.0, 5.0, istop)
            istop = jnp.where(1.0 + t1 <= 1.0, 4.0, istop)
            istop = jnp.where(test3 <= g(CTOL), 3.0, istop)
            istop = jnp.where(test2 <= g(ATOL), 2.0, istop)
            istop = jnp.where(test1 <= rtol, 1.0, istop)
            s(NORMX, jnp.where(active, normx, g(NORMX)))
            s(ISTOP, jnp.where(active, istop, g(ISTOP)))

        # -- forward coefficients: u_new = A (v/alpha) - (alpha/beta) u --
        alpha, beta = g(ALPHA), g(BETA)
        s(C1F, _safe_div(1.0, alpha))
        s(C2F, alpha * _safe_div(1.0, beta))
        s(APREV, alpha)
        s(SSQ_U, 0.0)

    @pl.when((p == 1) & (t == 0) & (state_ref[ACT0, 0] > 0.5))
    def _():
        active = g(ISTOP) == 0.0
        beta = jnp.sqrt(g(SSQ_U))
        aprev = g(APREV)
        s(BETA, jnp.where(active, beta, g(BETA)))
        s(BPOS, jnp.where(active, (beta > 0.0).astype(jnp.float32), 0.0))
        s(C1A, _safe_div(1.0, beta))
        s(C2A, beta * _safe_div(1.0, aprev))
        s(SSQ_V, 0.0)

    @pl.when((p == 2) & (t == 0) & (state_ref[ACT0, 0] > 0.5))
    def _():
        active = g(ISTOP) == 0.0
        bpos = g(BPOS) > 0.5
        alpha = jnp.where(bpos, jnp.sqrt(g(SSQ_V)), g(APREV))
        beta = g(BETA)
        itn = g(ITN) + 1.0

        # rotation Phat: eliminate damp
        chat, shat, alphahat = _sym_ortho(g(ALPHABAR), g(DAMP))
        # rotation P: eliminate beta
        rhoold = g(RHO)
        cgiv, sgiv, rho = _sym_ortho(alphahat, beta)
        thetanew = sgiv * alpha
        alphabar = cgiv * alpha
        # rotation Pbar: eliminate thetanew
        rhobarold = g(RHOBAR)
        zetaold = g(ZETA)
        thetabar = g(SBAR) * rho
        rhotemp = g(CBAR) * rho
        cbar, sbar, rhobar = _sym_ortho(g(CBAR) * rho, thetanew)
        zeta = cbar * g(ZETABAR)
        zetabar = -sbar * g(ZETABAR)

        # tile coefficients for hbar/x/h
        c_hb = _safe_div(thetabar * rho, rhoold * rhobarold)
        c_x = _safe_div(zeta, rho * rhobar)
        c_h = _safe_div(thetanew, rho)
        inva = jnp.where(alpha > 0.0,
                         1.0 / jnp.where(alpha > 0.0, alpha, 1.0), 1.0)

        # ||r|| recurrence
        betaacute = chat * g(BETADD)
        betacheck = -shat * g(BETADD)
        betahat = cgiv * betaacute
        betadd = -sgiv * betaacute
        thetatildeold = g(THETATILDE)
        ctold, stold, rhotildeold = _sym_ortho(g(RHODOLD), thetabar)
        thetatilde = stold * rhobar
        rhodold = ctold * rhobar
        betad = -stold * g(BETAD) + ctold * betahat
        tautildeold = _safe_div(
            zetaold - thetatildeold * g(TAUTILDEOLD), rhotildeold
        )
        taud = _safe_div(zeta - thetatilde * tautildeold, rhodold)
        dacc = g(DACC) + betacheck * betacheck
        bd_taud = betad - taud
        normr = jnp.sqrt(dacc + bd_taud * bd_taud + betadd * betadd)

        # ||A|| / cond(A) estimates
        na2 = g(NORMA2) + beta * beta
        norma = jnp.sqrt(na2)
        na2 = na2 + alpha * alpha
        maxrbar = jnp.maximum(g(MAXRBAR), rhobarold)
        minrbar = jnp.where(itn > 1.5,
                            jnp.minimum(g(MINRBAR), rhobarold), g(MINRBAR))
        num = jnp.maximum(maxrbar, rhotemp)
        den = jnp.minimum(minrbar, rhotemp)
        conda = num / jnp.where(den > 0.0, den, 1.0)
        normar = jnp.abs(zetabar)

        def upd(i, val):
            s(i, jnp.where(active, val, g(i)))

        upd(ALPHA, alpha)
        upd(ITN, itn)
        upd(ALPHABAR, alphabar)
        upd(RHO, rho)
        upd(RHOBAR, rhobar)
        upd(CBAR, cbar)
        upd(SBAR, sbar)
        upd(ZETA, zeta)
        upd(ZETABAR, zetabar)
        upd(BETADD, betadd)
        upd(BETAD, betad)
        upd(RHODOLD, rhodold)
        upd(TAUTILDEOLD, tautildeold)
        upd(THETATILDE, thetatilde)
        upd(DACC, dacc)
        upd(NORMA2, na2)
        upd(MAXRBAR, maxrbar)
        upd(MINRBAR, minrbar)
        upd(NORMR, normr)
        upd(NORMAR, normar)
        upd(NORMA, norma)
        upd(CONDA, conda)
        s(CHB, c_hb)
        s(CX, c_x)
        s(CH, c_h)
        s(INVA, inva)
        s(SSQ_X, jnp.where(active, 0.0, g(SSQ_X)))

    # =====================================================================
    # Tile work (identical bidiagonalization to the LSQR megakernel)
    # =====================================================================
    active = (g(ISTOP) == 0.0) & (g(ACT0) > 0.5)

    @pl.when((p == 0) & (t < nt_m) & active)
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

    @pl.when((p == 1) & (t < nt_n) & active)
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

    @pl.when((p == 2) & (t < nt_n) & active)
    def _():
        base = t * tm
        h_old = h_ref[pl.ds(base, tm)].astype(jnp.float32)
        hb_old = hbar_ref[pl.ds(base, tm)].astype(jnp.float32)
        vnew = v_ref[pl.ds(base + lo, tm)].astype(jnp.float32) * g(INVA)
        hbar_new = h_old - g(CHB) * hb_old
        x_new = x_ref[pl.ds(base, tm)].astype(jnp.float32) + g(CX) * hbar_new
        h_new = vnew - g(CH) * h_old
        hbar_ref[pl.ds(base, tm)] = hbar_new
        x_ref[pl.ds(base, tm)] = x_new
        h_ref[pl.ds(base, tm)] = h_new
        state_ref[SSQ_X, :] = jnp.full(
            (128,), g(SSQ_X) + jnp.sum(x_new * x_new), jnp.float32
        )


def lsmr_megakernel_supported(A, *, record_trace=False,
                              vmem_budget=14 * 1024 * 1024) -> bool:
    """Whether lsmr_megakernel can run this operator: DIA, f32/bf16
    stripes, no trace, and u + v + x/h/hbar + stripe tiles within VMEM."""
    from .structured import DIAOperator

    if not isinstance(A, DIAOperator):
        return False
    if record_trace:
        return False
    if A.data.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return _fit_tm(A, vmem_budget, n_nvecs=4) is not None


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

    # Walk stripes only in their consuming phase; pin to the last-visited
    # tile elsewhere (see ops/megakernel.py — avoids re-streaming tdata in
    # p2 and re-fetching data tile 0 every iteration).
    def index_data(k, p, t):
        return (0, jnp.where(p == 0, jnp.minimum(t, nt_m - 1), nt_m - 1))

    def index_tdata(k, p, t):
        return (0, jnp.where(p == 1, jnp.minimum(t, nt_n - 1), nt_n - 1))

    whole = lambda k, p, t: (0,)

    def call(data_pad, tdata_pad, u, v, x, h, hbar, state):
        nvec = jax.ShapeDtypeStruct((xlen,), jnp.float32)
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
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((ulen,), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((vlen,), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((xlen,), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((xlen,), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((xlen,), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((NSTATE, 128), lambda k, p, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((ulen,), jnp.float32),
                jax.ShapeDtypeStruct((vlen,), jnp.float32),
                nvec, nvec, nvec,
                jax.ShapeDtypeStruct((NSTATE, 128), jnp.float32),
            ),
            input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3, 7: 4},
            scratch_shapes=[pltpu.SemaphoreType.DMA((5,))],
            interpret=interpret,
        )(data_pad, tdata_pad, state, u, v, x, h, hbar)

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


def lsmr_megakernel(
    A,
    b,
    damp: float = 0.0,
    *,
    atol: float = 1e-6,
    btol: float = 1e-6,
    conlim: float = 1e8,
    itnlim=None,
    iters_per_call: int = 32,
    interpret: bool = False,
    tm=None,
    x0=None,
):
    """Solve min ||Ax - b|| (optionally damped) with LSMR, K iterations per
    kernel dispatch. Semantics match :func:`lsqr_tpu.lsmr` (f32 path, no
    trace). Returns an LSMRResult."""
    from ..lsmr import LSMRResult
    from .blas import nrm2

    if x0 is not None:
        if isinstance(damp, (int, float)) and damp != 0.0:
            raise ValueError(
                "x0 warm start implements the residual-correction recipe "
                "(lsqr.f90:303-320), which requires damp == 0"
            )
        x0 = jnp.asarray(x0, jnp.float32)
        r0 = jnp.asarray(b, jnp.float32) - A.matvec(x0)
        res = lsmr_megakernel(
            A, r0, damp, atol=atol, btol=btol, conlim=conlim, itnlim=itnlim,
            iters_per_call=iters_per_call, interpret=interpret, tm=tm,
        )
        xw = x0 + res.x
        return res._replace(x=xw, normx=nrm2(xw, safe=True))

    m, n = A.m, A.n
    if tm is None:
        tm = _fit_tm(A, n_nvecs=4)
        if tm is None:
            raise ValueError(
                "operator too large for the LSMR iteration megakernel "
                "(see ops.megakernel_lsmr.lsmr_megakernel_supported)"
            )
    if itnlim is None:
        itnlim = min(m, n)
    itnlim_r = int(itnlim)
    K = min(iters_per_call, max(1, itnlim_r))

    b = jnp.asarray(b, jnp.float32)
    eps = jnp.finfo(jnp.float32).eps
    ctolf = jnp.where(jnp.float32(conlim) > 0,
                      1.0 / jnp.maximum(jnp.float32(conlim), eps), 0.0)

    # ---- setup: beta u = b ; alpha v = A'u (lsqr_tpu/lsmr.py:162-223) ----
    beta0 = nrm2(b, safe=True)
    safe_b0 = jnp.where(beta0 > 0, beta0, 1.0)
    u0n = jnp.where(beta0 > 0, b / safe_b0, b)
    v0u = jnp.where(beta0 > 0, A.rmatvec(u0n), jnp.zeros((n,), jnp.float32))
    alpha0 = jnp.where(beta0 > 0, nrm2(v0u, safe=True), 0.0)
    safe_a0 = jnp.where(alpha0 > 0, alpha0, 1.0)
    h0 = jnp.where(alpha0 > 0, v0u / safe_a0, v0u)

    run, data_pad, tdata_pad, geom = _build_call(A, K, tm, interpret=interpret)
    lo = geom["lo"]
    u = jnp.zeros((geom["ulen"],), jnp.float32).at[lo: lo + m].set(b)
    v = jnp.zeros((geom["vlen"],), jnp.float32).at[lo: lo + n].set(v0u)
    x = jnp.zeros((geom["xlen"],), jnp.float32)
    h = jnp.zeros((geom["xlen"],), jnp.float32).at[:n].set(h0)
    hbar = jnp.zeros((geom["xlen"],), jnp.float32)

    state = jnp.zeros((NSTATE, 128), jnp.float32)

    def put(st, i, val):
        return st.at[i, :].set(val)

    state = put(state, ALPHA, alpha0)
    state = put(state, BETA, beta0)
    state = put(state, ALPHABAR, alpha0)
    state = put(state, RHO, 1.0)
    state = put(state, RHOBAR, 1.0)
    state = put(state, CBAR, 1.0)
    state = put(state, ZETABAR, alpha0 * beta0)
    state = put(state, BETADD, beta0)
    state = put(state, RHODOLD, 1.0)
    state = put(state, NORMA2, alpha0 * alpha0)
    state = put(state, MINRBAR, 1e30)
    state = put(state, NORMR, beta0)
    state = put(state, NORMAR, alpha0 * beta0)
    state = put(state, NORMA, alpha0)
    state = put(state, CONDA, 1.0)
    state = put(state, NORMB, beta0)
    state = put(state, ATOL, jnp.float32(atol))
    state = put(state, BTOL, jnp.float32(btol))
    state = put(state, CTOL, ctolf)
    state = put(state, ITNLIM, float(itnlim_r))
    state = put(state, DAMP, jnp.float32(damp))
    state = put(state, ACT0,
                jnp.where((beta0 > 0) & (alpha0 * beta0 != 0), 1.0, 0.0))

    # Speculative host loop: dispatch call i+1 (async) BEFORE syncing the
    # convergence check of call i, hiding the host round trip behind the
    # next call's execution; post-convergence iterations are masked no-ops
    # so the one speculative call is harmless (<= K masked iterations).
    max_calls = -(-itnlim_r // K) + 1
    prev_state = None
    for _ in range(max_calls):
        u, v, x, h, hbar, state = run(data_pad, tdata_pad, u, v, x, h, hbar,
                                      state)
        if prev_state is not None:
            pcol = np.asarray(prev_state[:, 0])
            if pcol[ISTOP] != 0.0 or pcol[ITN] >= itnlim_r:
                break
        prev_state = state
    col = np.asarray(state[:, 0])

    # the LAST iteration's tests may still be pending (they run at the next
    # p0 boundary); replicate them here if istop == 0
    st = col  # final state column, already fetched by the loop
    istop = st[ISTOP]
    normx = st[NORMX]
    if st[ACT0] > 0.5 and istop == 0.0 and st[ITN] > 0:
        normx = float(np.sqrt(st[SSQ_X]))
        safe_b = st[NORMB] if st[NORMB] > 0 else 1.0
        test1 = st[NORMR] / safe_b
        denom2 = st[NORMA] * st[NORMR]
        test2 = st[NORMAR] / denom2 if denom2 > 0 else np.inf
        test3 = 1.0 / st[CONDA] if st[CONDA] > 0 else 1.0
        t1 = test1 / (1.0 + st[NORMA] * normx / safe_b)
        rtol = st[BTOL] + st[ATOL] * st[NORMA] * normx / safe_b
        f32 = np.float32
        if st[ITN] >= st[ITNLIM]:
            istop = 7.0
        if f32(1.0) + f32(test3) <= f32(1.0):
            istop = 6.0
        if f32(1.0) + f32(test2) <= f32(1.0):
            istop = 5.0
        if f32(1.0) + f32(t1) <= f32(1.0):
            istop = 4.0
        if test3 <= st[CTOL]:
            istop = 3.0
        if test2 <= st[ATOL]:
            istop = 2.0
        if test1 <= rtol:
            istop = 1.0

    return LSMRResult(
        x=x[:n],
        istop=jnp.asarray(int(istop), jnp.int32),
        itn=jnp.asarray(int(st[ITN]), jnp.int32),
        normr=jnp.asarray(st[NORMR], jnp.float32),
        normar=jnp.asarray(st[NORMAR], jnp.float32),
        norma=jnp.asarray(st[NORMA], jnp.float32),
        conda=jnp.asarray(st[CONDA], jnp.float32),
        normx=jnp.asarray(normx, jnp.float32),
        trace=None,
    )
