"""K LSQR iterations per Pallas call — the iteration megakernel.

On relayed/remote TPU backends every kernel dispatch / loop step carries a
fixed ~0.6 ms cost (BENCHMARKS.md methodology), which dominates solve time
for m ≲ 1M where one iteration's streaming work is ~0.1 ms. This kernel
amortizes that floor by running K complete LSQR iterations — both
bidiagonalization half-steps (lsqr.f90:681-699), the damp/Givens rotations
(:703-721), the x/w update (:724-745), the xnorm estimator (:759-771) and
the full stopping logic (:773-810) — inside ONE `pl.pallas_call`.

Residency design (the enabling trick): u, v, x, w live ENTIRELY in VMEM as
aliased whole-vector input/outputs with constant index maps — they are
loaded once per call and never touch HBM between iterations. Only the DIA
stripes stream per iteration (grid-pipelined tiles). The O(1) scalar
recurrence lives in a (64, 128) VMEM state block (row i = scalar i
broadcast — Mosaic reads `state[i, 0]` as a scalar and writes full rows),
updated at phase boundaries. Iterations after convergence are masked
no-ops, mirroring solver._masked_body.

Grid: (K, 3, nt) — iteration k, phase p (0 = forward half-step over m-rows,
1 = adjoint half-step over n-rows, 2 = x/w update over n-rows), tile t.
Phase boundaries (t == 0) run the scalar math:
  p0/t0: previous iteration's stopping tests (they need dknorm, complete
         only after p2) + this iteration's forward coefficients
  p1/t0: beta = sqrt(ssq_u), anorm accumulation, adjoint coefficients
  p2/t0: alpha = sqrt(ssq_v), both rotations, x/w coefficients

Constraints: square-ish problems with (m + 3n + stripe tiles) * 4 bytes
within the ~16 MB VMEM budget (practically m = n up to ~500-700K), f32,
no wantse/trace (use the regular solver for those). The carry is the
unnormalized-u/v form of the solver's fused path, so results match the
standard f32 path to rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lsqr_megakernel", "megakernel_supported"]

# scalar-state rows in the (64, 128) VMEM state block
ALPHA, BETA, RHOBAR, PHIBAR, ANORM, DNORM, RES2, PSI = range(8)
XNORM, XNORM1, CS2, SN2, ZROW, DXMAX, MAXDX, ITN = range(8, 16)
ISTOP, NSTOP, SSQ_U, SSQ_V, SSQ_DK, RNORM, ARNORM, ACOND = range(16, 24)
BNORM, DAMP, ATOL, BTOL, CTOL, ITNLIM, NCONV, DAMPED = range(24, 32)
C1F, C2F, C1A, C2A, BPOS, T1, T2, T3 = range(32, 40)
INVA, PHI, THETA, RHO, TAU, APREV, ACT0 = range(40, 47)
NSTATE = 64


def _d2(a, b):
    scale = jnp.abs(a) + jnp.abs(b)
    safe = jnp.where(scale > 0.0, scale, 1.0)
    r = jnp.where(
        scale > 0.0,
        safe * jnp.sqrt((a / safe) ** 2 + (b / safe) ** 2),
        0.0,
    )
    return r


def _kernel(
    offsets, toffsets, lo_f, lo_a, tm, win_f, win_a, nt_m, nt_n, m, n,
    data_ref, tdata_ref, state_in_ref,
    u_in, v_in, x_in, w_in,   # ANY/HBM inputs (aliased with the outputs)
    u_ref, v_ref, x_ref, w_ref, state_ref,
    sem,
):
    k = pl.program_id(0)
    p = pl.program_id(1)
    t = pl.program_id(2)
    K = pl.num_programs(0)

    def g(i):  # read scalar i
        return state_ref[i, 0]

    def s(i, val):  # write scalar i (full broadcast row)
        state_ref[i, :] = jnp.full((128,), val, jnp.float32)

    # ---- one-time init: copy the incoming state block and DMA the four
    # vector buffers from HBM into their (resident, constant-index) output
    # VMEM blocks. Compiled output blocks start UNINITIALIZED — aliasing
    # shares the HBM buffer, not the VMEM residence (interpret mode hides
    # this), so the kernel must populate them itself.
    @pl.when((k == 0) & (p == 0) & (t == 0))
    def _():
        state_ref[:, :] = state_in_ref[:, :]
        cps = [
            pltpu.make_async_copy(u_in, u_ref, sem.at[0]),
            pltpu.make_async_copy(v_in, v_ref, sem.at[1]),
            pltpu.make_async_copy(x_in, x_ref, sem.at[2]),
            pltpu.make_async_copy(w_in, w_ref, sem.at[3]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

    # =====================================================================
    # Phase boundaries: scalar recurrence (all reads via g(), writes via s())
    # =====================================================================

    @pl.when((p == 0) & (t == 0) & (state_ref[ACT0, 0] > 0.5))
    def _():
        # -- finish the PREVIOUS iteration (k >= 1 or carried in): monitors
        #    + stopping tests; they need ssq_dk, complete only after p2 --
        @pl.when(g(ITN) > 0.5)
        def _():
            active = g(ISTOP) == 0.0
            dknorm = jnp.sqrt(g(SSQ_DK))
            dnorm = _d2(g(DNORM), dknorm)
            phi = g(PHI)
            dxk = jnp.abs(phi * dknorm)
            new_max = g(DXMAX) < dxk
            dxmax = jnp.where(new_max, dxk, g(DXMAX))
            maxdx = jnp.where(new_max, g(ITN), g(MAXDX))
            anorm = g(ANORM)
            acond = anorm * dnorm
            rnorm = g(RNORM)
            arnorm = g(ALPHA) * jnp.abs(g(TAU))
            bnorm = g(BNORM)
            safe_b = jnp.where(bnorm > 0.0, bnorm, 1.0)
            test1 = rnorm / safe_b
            test2 = jnp.where(
                rnorm > 0.0,
                arnorm / jnp.where(rnorm > 0.0, anorm * rnorm, 1.0),
                0.0,
            )
            safe_ac = jnp.where(acond > 0.0, acond, 1.0)
            test3 = 1.0 / safe_ac
            xnorm = g(XNORM)
            t1rel = test1 / (1.0 + anorm * xnorm / safe_b)
            rtol = g(BTOL) + g(ATOL) * anorm * xnorm / safe_b
            istop = jnp.zeros((), jnp.float32)
            istop = jnp.where(g(ITN) >= g(ITNLIM), 5.0, istop)
            istop = jnp.where(1.0 + test3 <= 1.0, 4.0, istop)
            istop = jnp.where(1.0 + test2 <= 1.0, 2.0, istop)
            istop = jnp.where(1.0 + t1rel <= 1.0, 1.0, istop)
            istop = jnp.where(test3 <= g(CTOL), 4.0, istop)
            istop = jnp.where(test2 <= g(ATOL), 2.0, istop)
            istop = jnp.where(test1 <= rtol, 1.0, istop)
            nstop = jnp.where(istop == 0.0, 0.0, g(NSTOP) + 1.0)
            istop = jnp.where(
                (istop != 0.0) & (nstop < g(NCONV)) & (g(ITN) < g(ITNLIM)),
                0.0,
                istop,
            )
            s(DNORM, jnp.where(active, dnorm, g(DNORM)))
            s(DXMAX, jnp.where(active, dxmax, g(DXMAX)))
            s(MAXDX, jnp.where(active, maxdx, g(MAXDX)))
            s(ACOND, jnp.where(active, acond, g(ACOND)))
            s(ARNORM, jnp.where(active, arnorm, g(ARNORM)))
            s(ISTOP, jnp.where(active, istop, g(ISTOP)))
            s(NSTOP, jnp.where(active, nstop, g(NSTOP)))

        # -- this iteration's forward coefficients (unnormalized carry):
        #    u_new = A (v/alpha) - (alpha/beta) u  --
        alpha = g(ALPHA)
        beta = g(BETA)
        inv_a = jnp.where(alpha > 0.0, 1.0 / jnp.where(alpha > 0.0, alpha, 1.0), 0.0)
        inv_b = jnp.where(beta > 0.0, 1.0 / jnp.where(beta > 0.0, beta, 1.0), 0.0)
        s(C1F, inv_a)
        s(C2F, alpha * inv_b)
        s(APREV, alpha)
        s(SSQ_U, 0.0)

    @pl.when((p == 1) & (t == 0) & (state_ref[ACT0, 0] > 0.5))
    def _():
        active = g(ISTOP) == 0.0
        beta = jnp.sqrt(g(SSQ_U))
        aprev = g(APREV)
        temp = _d2(aprev, beta)
        temp = _d2(temp, g(DAMP))
        anorm = _d2(g(ANORM), temp)
        bpos = (beta > 0.0).astype(jnp.float32)
        inv_b = jnp.where(beta > 0.0, 1.0 / jnp.where(beta > 0.0, beta, 1.0), 0.0)
        inv_ap = jnp.where(aprev > 0.0, 1.0 / jnp.where(aprev > 0.0, aprev, 1.0), 0.0)
        s(BETA, jnp.where(active, beta, g(BETA)))
        s(ANORM, jnp.where(active, anorm, g(ANORM)))
        s(BPOS, jnp.where(active, bpos, 0.0))
        s(C1A, inv_b)
        s(C2A, beta * inv_ap)
        s(SSQ_V, 0.0)

    @pl.when((p == 2) & (t == 0) & (state_ref[ACT0, 0] > 0.5))
    def _():
        active = g(ISTOP) == 0.0
        bpos = g(BPOS) > 0.5
        alpha_cand = jnp.sqrt(g(SSQ_V))
        alpha = jnp.where(bpos, alpha_cand, g(APREV))
        itn = g(ITN) + 1.0

        # damp-elimination rotation (lsqr.f90:703-710)
        damped = g(DAMPED) > 0.5
        rhbar1_d = _d2(g(RHOBAR), g(DAMP))
        safe_r1 = jnp.where(rhbar1_d > 0.0, rhbar1_d, 1.0)
        cs1 = g(RHOBAR) / safe_r1
        sn1 = g(DAMP) / safe_r1
        psi = jnp.where(damped, sn1 * g(PHIBAR), g(PSI))
        phibar0 = jnp.where(damped, cs1 * g(PHIBAR), g(PHIBAR))
        rhbar1 = jnp.where(damped, rhbar1_d, g(RHOBAR))

        # Givens rotation (lsqr.f90:714-721)
        beta = g(BETA)
        rho = _d2(rhbar1, beta)
        safe_rho = jnp.where(rho > 0.0, rho, 1.0)
        cs = rhbar1 / safe_rho
        sn = beta / safe_rho
        theta = sn * alpha
        rhobar = -cs * alpha
        phi = cs * phibar0
        phibar = sn * phibar0
        tau = sn * phi

        t1 = phi / safe_rho
        t2 = -theta / safe_rho
        t3 = 1.0 / safe_rho
        inv_an = jnp.where(alpha > 0.0, 1.0 / jnp.where(alpha > 0.0, alpha, 1.0), 1.0)

        # xnorm estimator (lsqr.f90:759-771)
        delta = g(SN2) * rho
        gambar = -g(CS2) * rho
        rhs = phi - delta * g(ZROW)
        safe_gb = jnp.where(gambar != 0.0, gambar, 1.0)
        zbar = rhs / safe_gb
        xnorm = _d2(g(XNORM1), zbar)
        gamma = _d2(gambar, theta)
        safe_g = jnp.where(gamma > 0.0, gamma, 1.0)
        cs2 = gambar / safe_g
        sn2 = theta / safe_g
        z = rhs / safe_g
        xnorm1 = _d2(g(XNORM1), z)

        res2 = _d2(g(RES2), psi)
        rnorm = _d2(res2, phibar)

        def upd(i, val):
            s(i, jnp.where(active, val, g(i)))

        upd(ALPHA, alpha)
        upd(ITN, itn)
        upd(RHOBAR, rhobar)
        upd(PHIBAR, phibar)
        upd(PSI, psi)
        upd(XNORM, xnorm)
        upd(XNORM1, xnorm1)
        upd(CS2, cs2)
        upd(SN2, sn2)
        upd(ZROW, z)
        upd(RES2, res2)
        upd(RNORM, rnorm)
        upd(PHI, phi)
        upd(THETA, theta)
        upd(RHO, rho)
        upd(TAU, tau)
        s(T1, t1)
        s(T2, t2)
        s(T3, t3)
        s(INVA, inv_an)
        s(SSQ_DK, jnp.where(active, 0.0, g(SSQ_DK)))

    # =====================================================================
    # Tile work
    # =====================================================================
    active = (g(ISTOP) == 0.0) & (g(ACT0) > 0.5)

    # ---- p0: forward half-step, u tiles [t*tm, t*tm+tm) ----
    @pl.when((p == 0) & (t < nt_m) & active)
    def _():
        c1 = g(C1F)
        c2 = g(C2F)
        base = t * tm
        vwin = v_ref[pl.ds(base, win_f)].astype(jnp.float32) * c1
        acc = (-c2) * u_ref[pl.ds(base + lo_f, tm)].astype(jnp.float32)
        for d, kk in enumerate(offsets):
            seg = jax.lax.slice(vwin, (lo_f + kk,), (lo_f + kk + tm,))
            acc = acc + data_ref[d, :].astype(jnp.float32) * seg
        u_ref[pl.ds(base + lo_f, tm)] = acc
        state_ref[SSQ_U, :] = jnp.full(
            (128,), g(SSQ_U) + jnp.sum(acc * acc), jnp.float32
        )

    # ---- p1: adjoint half-step, v tiles ----
    @pl.when((p == 1) & (t < nt_n) & active)
    def _():
        c1 = g(C1A)
        c2 = g(C2A)
        bpos = g(BPOS) > 0.5
        base = t * tm
        uwin = u_ref[pl.ds(base, win_a)].astype(jnp.float32) * c1
        vold = v_ref[pl.ds(base + lo_a, tm)].astype(jnp.float32)
        acc = (-c2) * vold
        for d, kk in enumerate(toffsets):
            seg = jax.lax.slice(uwin, (lo_a + kk,), (lo_a + kk + tm,))
            acc = acc + tdata_ref[d, :].astype(jnp.float32) * seg
        acc = jnp.where(bpos, acc, vold)
        v_ref[pl.ds(base + lo_a, tm)] = acc
        state_ref[SSQ_V, :] = jnp.full(
            (128,), g(SSQ_V) + jnp.sum(acc * acc), jnp.float32
        )

    # ---- p2: x/w update, n tiles ----
    @pl.when((p == 2) & (t < nt_n) & active)
    def _():
        base = t * tm
        wold = w_ref[pl.ds(base, tm)].astype(jnp.float32)
        vnew = v_ref[pl.ds(base + lo_a, tm)].astype(jnp.float32) * g(INVA)
        x_ref[pl.ds(base, tm)] = x_ref[pl.ds(base, tm)] + g(T1) * wold
        w_ref[pl.ds(base, tm)] = g(T2) * wold + vnew
        dk = g(T3) * wold
        state_ref[SSQ_DK, :] = jnp.full(
            (128,), g(SSQ_DK) + jnp.sum(dk * dk), jnp.float32
        )


def _round_up(v, q):
    return -(-v // q) * q


def megakernel_supported(A, *, wantse=False, record_trace=False,
                         vmem_budget=14 * 1024 * 1024) -> bool:
    """Whether lsqr_megakernel can run this operator: DIA, f32, no
    se/trace, and all four solver vectors + stripe tiles within VMEM."""
    from .structured import DIAOperator

    if not isinstance(A, DIAOperator):
        return False
    if wantse or record_trace:
        return False
    if A.data.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return _fit_tm(A, vmem_budget) is not None


def _geometry(ks, tks, m, n, tm):
    """Buffer geometry shared by the kernel build and the VMEM estimate.

    lo offsets are rounded to 1024 so every dynamic start (t*tm + lo)
    stays provably vreg-aligned for Mosaic. u and v SHARE one lo: the
    kernel reads/writes each buffer in different phases under a single
    offset, so the forward and adjoint halo must be the max of the two
    (one-sided offset sets previously got lo_f != lo_a and corrupted
    the iterate)."""
    nt_m = -(-m // tm)
    nt_n = -(-n // tm)
    lo = max(
        _round_up(max(0, -min(ks)), 1024),
        _round_up(max(0, -min(tks)), 1024),
    )
    win_f = _round_up(lo + max(max(ks), 0) + tm, 1024)
    win_a = _round_up(lo + max(max(tks), 0) + tm, 1024)
    vlen = _round_up(max(lo + n, (nt_m - 1) * tm + win_f, nt_n * tm + lo), 1024)
    ulen = _round_up(max(lo + m, (nt_n - 1) * tm + win_a, nt_m * tm + lo), 1024)
    xlen = _round_up(nt_n * tm, 1024)
    return dict(nt_m=nt_m, nt_n=nt_n, lo_f=lo, lo_a=lo,
                win_f=win_f, win_a=win_a, ulen=ulen, vlen=vlen, xlen=xlen)


def _vmem_estimate(ks, tks, m, n, nd, esz, tm, n_nvecs=3):
    """Conservative scoped-VMEM footprint for one megakernel call.

    ``n_nvecs`` = how many n-length vectors the kernel keeps resident
    (LSQR: v,x,w = 3; LSMR: v,x,h,hbar = 4; CRAIG: v,x = 2).

    Calibrated against a measured compile failure: m=n=500000, nd=11,
    tm=32768 stack-allocated 16.05M (outputs 8.44M + double-buffered
    stripes 5.77M + ~1.8M Mosaic staging for the per-diagonal shifted
    products). The staging term 2*nd*tm*4 over-covers that residual."""
    g = _geometry(ks, tks, m, n, tm)
    out_bytes = 4 * (
        g["ulen"] + g["vlen"] + (n_nvecs - 1) * g["xlen"] + NSTATE * 128
    )
    stripe_bytes = 2 * 2 * nd * tm * esz  # data+tdata, double-buffered
    staging_bytes = 2 * nd * tm * 4       # f32 compute staging per phase
    state_bytes = 2 * NSTATE * 128 * 4    # state_in block (pipelined)
    return out_bytes + stripe_bytes + staging_bytes + state_bytes


def _fit_tm(A, vmem_budget=14 * 1024 * 1024, n_nvecs=3):
    """Largest tile (<= _pick_tm's preference) whose estimated footprint
    fits the VMEM budget; None if even tm=1024 does not fit."""
    m, n = A.m, A.n
    ks = tuple(int(k) for k in np.asarray(A.offsets))
    tks = tuple(int(k) for k in np.asarray(A.toffsets))
    nd = A.data.shape[0]
    esz = A.data.dtype.itemsize
    tm = _pick_tm(m, n)
    while tm >= 1024:
        if _vmem_estimate(ks, tks, m, n, nd, esz, tm, n_nvecs) <= vmem_budget:
            return tm
        tm //= 2
    return None


def _pick_tm(m, n):
    d = max(m, n)
    if d >= 262144:
        return 32768
    if d >= 16384:
        return 8192
    return 1024


@functools.lru_cache(maxsize=32)
def _cached_call(ks, tks, m, n, nd, K, tm, interpret):
    """Build (jitted pallas callable, geometry) for a static kernel shape.

    Cached so repeated solves on same-shaped operators (production use:
    many right-hand sides / time steps on one stencil) re-trace nothing —
    without this every lsqr_megakernel call pays a fresh trace (and on a
    remote-compile backend a fresh HTTP round trip) per solve."""
    # forward: row i reads v[i + k]; window v[t*tm .. t*tm + win_f).
    # buffer lengths: window reads at the last tile must stay in bounds.
    g = _geometry(ks, tks, m, n, tm)
    nt_m, nt_n = g["nt_m"], g["nt_n"]
    lo_f, lo_a = g["lo_f"], g["lo_a"]
    win_f, win_a = g["win_f"], g["win_a"]
    ulen, vlen, xlen = g["ulen"], g["vlen"], g["xlen"]
    nt = max(nt_m, nt_n)

    kernel = functools.partial(
        _kernel, ks, tks, lo_f, lo_a, tm, win_f, win_a, nt_m, nt_n, m, n,
    )

    # Stripe index maps: walk tiles ONLY in the phase that consumes the
    # stripe and pin to the LAST-VISITED tile everywhere else, so the
    # pipeline never re-fetches a block it already has (pinning to 0 made
    # tdata stream twice per iteration — p2 walked it unused — and data
    # re-fetch tile 0 every p1: ~1.5x the necessary stripe traffic).
    def index_data(k, p, t):
        return (0, jnp.where(p == 0, jnp.minimum(t, nt_m - 1), nt_m - 1))

    def index_tdata(k, p, t):
        return (0, jnp.where(p == 1, jnp.minimum(t, nt_n - 1), nt_n - 1))

    whole = lambda k, p, t: (0,)

    def call(data_pad, tdata_pad, u, v, x, w, state):
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
            ],
            out_specs=(
                pl.BlockSpec((ulen,), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((vlen,), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((xlen,), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((xlen,), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((NSTATE, 128), lambda k, p, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((ulen,), jnp.float32),
                jax.ShapeDtypeStruct((vlen,), jnp.float32),
                jax.ShapeDtypeStruct((xlen,), jnp.float32),
                jax.ShapeDtypeStruct((xlen,), jnp.float32),
                jax.ShapeDtypeStruct((NSTATE, 128), jnp.float32),
            ),
            input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
            scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
            interpret=interpret,
        )(data_pad, tdata_pad, state, u, v, x, w)

    return jax.jit(call), dict(
        ulen=ulen, vlen=vlen, xlen=xlen, lo_f=lo_f, lo_a=lo_a,
        nt_m=nt_m, nt_n=nt_n,
    )


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


def lsqr_megakernel(
    A,
    b,
    damp: float = 0.0,
    *,
    atol: float = 0.0,
    btol: float = 0.0,
    conlim: float = 0.0,
    itnlim=None,
    nconv: int = 1,
    iters_per_call: int = 32,
    interpret: bool = False,
    tm=None,
    x0=None,
):
    """Solve min ||Ax - b|| (optionally damped) with K iterations per
    kernel dispatch. Semantics match :func:`lsqr_tpu.lsqr` (f32 path,
    wantse/trace unsupported). Returns an LSQRResult."""
    from ..config import LSQROptions
    from ..solver import LSQRResult
    from .blas import nrm2

    if x0 is not None:
        # the reference's warm-start recipe (lsqr.f90:303-320), as in
        # solver.lsqr: solve A dx = b - A x0, return x0 + dx
        if isinstance(damp, (int, float)) and damp != 0.0:
            raise ValueError(
                "x0 warm start implements the residual-correction recipe "
                "(lsqr.f90:303-320), which requires damp == 0"
            )
        x0 = jnp.asarray(x0, jnp.float32)
        r0 = jnp.asarray(b, jnp.float32) - A.matvec(x0)
        res = lsqr_megakernel(
            A, r0, damp, atol=atol, btol=btol, conlim=conlim, itnlim=itnlim,
            nconv=nconv, iters_per_call=iters_per_call, interpret=interpret,
            tm=tm,
        )
        xw = x0 + res.x
        return res._replace(x=xw, xnorm=nrm2(xw, safe=True))

    opts = LSQROptions(atol=atol, btol=btol, conlim=conlim, itnlim=itnlim)
    m, n = A.m, A.n
    if tm is None:
        tm = _fit_tm(A)
        if tm is None:
            raise ValueError(
                "operator too large for the iteration megakernel: the four "
                "solver vectors + stripe tiles exceed the VMEM budget even "
                "at tm=1024 (see ops.megakernel.megakernel_supported)"
            )
    itnlim_r = opts.resolve_itnlim(n)
    K = min(iters_per_call, max(1, itnlim_r))

    b = jnp.asarray(b, jnp.float32)
    dampf = jnp.float32(damp)
    eps = jnp.finfo(jnp.float32).eps
    atolf = jnp.where(jnp.float32(atol) > 0, jnp.float32(atol), eps)
    btolf = jnp.where(jnp.float32(btol) > 0, jnp.float32(btol), eps)
    ctolf = jnp.where(jnp.float32(conlim) > 0,
                      1.0 / jnp.maximum(jnp.float32(conlim), eps), 0.0)

    # ---- setup (outside the kernel): beta u = b ; alpha v = A'u ----
    beta0 = nrm2(b, safe=True)
    safe_b0 = jnp.where(beta0 > 0, beta0, 1.0)
    u0n = jnp.where(beta0 > 0, b / safe_b0, b)
    v0u = jnp.where(beta0 > 0, A.rmatvec(u0n), jnp.zeros((n,), jnp.float32))
    alpha0 = jnp.where(beta0 > 0, nrm2(v0u, safe=True), 0.0)
    safe_a0 = jnp.where(alpha0 > 0, alpha0, 1.0)
    w0 = jnp.where(alpha0 > 0, v0u / safe_a0, v0u)

    run, data_pad, tdata_pad, geom = _build_call(A, K, tm, interpret=interpret)
    u = jnp.zeros((geom["ulen"],), jnp.float32).at[
        geom["lo_a"]: geom["lo_a"] + m].set(b)
    v = jnp.zeros((geom["vlen"],), jnp.float32).at[
        geom["lo_f"]: geom["lo_f"] + n].set(v0u)
    x = jnp.zeros((geom["xlen"],), jnp.float32)
    w = jnp.zeros((geom["xlen"],), jnp.float32).at[:n].set(w0)

    state = jnp.zeros((NSTATE, 128), jnp.float32)

    def put(st, i, val):
        return st.at[i, :].set(val)

    state = put(state, ALPHA, alpha0)
    state = put(state, BETA, beta0)
    state = put(state, RHOBAR, alpha0)
    state = put(state, PHIBAR, beta0)
    state = put(state, RNORM, beta0)
    state = put(state, ARNORM, alpha0 * beta0)
    state = put(state, BNORM, beta0)
    state = put(state, CS2, -1.0)
    state = put(state, DAMP, dampf)
    state = put(state, ATOL, atolf)
    state = put(state, BTOL, btolf)
    state = put(state, CTOL, ctolf)
    state = put(state, ITNLIM, float(itnlim_r))
    state = put(state, NCONV, float(nconv))
    state = put(state, DAMPED, jnp.where(dampf > 0, 1.0, 0.0))

    state = put(state, ACT0,
                jnp.where((beta0 > 0) & (alpha0 * beta0 != 0), 1.0, 0.0))

    # Speculative host loop: the convergence check for call i syncs a host
    # round trip (expensive on relayed backends), so call i+1 is ALWAYS
    # dispatched first (async) and the check of call i's state overlaps
    # with call i+1's execution. Post-convergence iterations are masked
    # no-ops, so the one speculative call is harmless (<= K wasted masked
    # iterations, same bound as the bounded-loop solver's segments).
    max_calls = -(-itnlim_r // K) + 1
    prev_state = None
    for _ in range(max_calls):
        u, v, x, w, state = run(data_pad, tdata_pad, u, v, x, w, state)
        if prev_state is not None:
            pcol = np.asarray(prev_state[:, 0])
            if pcol[ISTOP] != 0.0 or pcol[ITN] >= itnlim_r:
                break
        prev_state = state
    col = np.asarray(state[:, 0])

    # the LAST iteration's tests may still be pending (they run at the next
    # p0 boundary); replicate them here in plain jnp if istop == 0
    st = col  # final state column, already fetched by the loop
    istop = st[ISTOP]
    dnorm, dxmax, maxdx, acond, arnorm = (
        st[DNORM], st[DXMAX], st[MAXDX], st[ACOND], st[ARNORM])
    if istop == 0.0 and st[ITN] > 0:
        dknorm = np.sqrt(st[SSQ_DK])
        dnorm = float(np.hypot(st[DNORM], dknorm))
        dxk = abs(st[PHI] * dknorm)
        if st[DXMAX] < dxk:
            dxmax, maxdx = dxk, st[ITN]
        acond = st[ANORM] * dnorm
        arnorm = st[ALPHA] * abs(st[TAU])
        safe_b = st[BNORM] if st[BNORM] > 0 else 1.0
        test1 = st[RNORM] / safe_b
        test2 = (arnorm / (st[ANORM] * st[RNORM])
                 if st[RNORM] > 0 else 0.0)
        test3 = 1.0 / acond if acond > 0 else 1.0
        t1rel = test1 / (1.0 + st[ANORM] * st[XNORM] / safe_b)
        rtol = st[BTOL] + st[ATOL] * st[ANORM] * st[XNORM] / safe_b
        f32 = np.float32
        if st[ITN] >= st[ITNLIM]:
            istop = 5.0
        if f32(1.0) + f32(test3) <= f32(1.0):
            istop = 4.0
        if f32(1.0) + f32(test2) <= f32(1.0):
            istop = 2.0
        if f32(1.0) + f32(t1rel) <= f32(1.0):
            istop = 1.0
        if test3 <= st[CTOL]:
            istop = 4.0
        if test2 <= st[ATOL]:
            istop = 2.0
        if test1 <= rtol:
            istop = 1.0
        nstop = 0.0 if istop == 0.0 else st[NSTOP] + 1.0
        if istop != 0.0 and nstop < st[NCONV] and st[ITN] < st[ITNLIM]:
            istop = 0.0

    damped = float(damp) > 0.0
    istop_i = int(istop)
    if damped and istop_i == 2:
        istop_i = 3

    return LSQRResult(
        x=x[:n],
        istop=jnp.asarray(istop_i, jnp.int32),
        itn=jnp.asarray(int(st[ITN]), jnp.int32),
        anorm=jnp.asarray(st[ANORM], jnp.float32),
        acond=jnp.asarray(acond, jnp.float32),
        rnorm=jnp.asarray(st[RNORM], jnp.float32),
        arnorm=jnp.asarray(arnorm, jnp.float32),
        xnorm=jnp.asarray(st[XNORM], jnp.float32),
        bnorm=jnp.asarray(st[BNORM], jnp.float32),
        se=None,
        dxmax=jnp.asarray(dxmax, jnp.float32),
        maxdx=jnp.asarray(int(maxdx), jnp.int32),
        trace=None,
    )
