"""Pallas TPU kernels for WCOO — general (random) sparsity, small n.

The reference handles general sparsity with serial COO scatter loops
(/root/reference/src/lsqr.f90:168-172, 188-192). On TPU, XLA's
gather/scatter lowering runs those at ~0.06-0.15 Gnnz/s (measured round 4
— earlier "fast" gather readings were relay-cache artifacts). The only
fast data-dependent addressing the VPU offers is the per-sublane-row
128-lane crossbar (``take_along_axis(..., axis=-1)``), plus MXU matmuls
and dynamic *slice* reads. WCOO is a layout + kernel family built from
exactly those primitives. Both products are SCATTER-FREE: every
reduction is expressed as boundary differences of prefix sums gathered
at pack-time-known positions.

LAYOUT (built by :func:`lsqr_tpu.ops.wcoo.wcoo_pack`):
  entries sorted by row, grouped into CHUNKS of ``CR = 16384`` rows;
  each chunk padded to a common ``EMAX`` (multiple of 1024) and cut into
  1024-entry SUBTILES. TWO copies of the entry stream are stored (the
  ~8 B/entry extra HBM buys out an 8-way permute crossbar that
  dominated the single-copy kernel): a plain row-sorted copy (f32 val +
  int32 col) feeding the fully BATCHED forward pass, and a
  within-subtile column-sorted copy (f32 val + packed int32
  ``col | rowlocal << 12``; n <= 4096, CR = 2^14) feeding the adjoint.
  Per subtile: a 1024-wide u-gather window base (SMEM) and the
  per-column boundary table ``ep[d]`` = (# entries with col <= d) - 1
  (dense over n). Per chunk: ``gpe[r]`` = (# entries with row <= r) - 1
  over the row-sorted order, plus per-128-row S-window bases (SMEM).

FORWARD (u = (A @ win) * c1 - c2 * y), per chunk — no loops at all:
  1. gather win[col] for the whole chunk at once — win lives in VMEM as
     (n/128, 128); an n/128-way broadcast+crossbar+select does the
     full-range gather; products land directly in row order.
  2. prefix-sum: ONE chunk-wide MXU matmul against a lower-triangular
     ones matrix (per-sublane-row prefixes) + a boundary-masked
     Kogge-Stone sublane ladder = subtile-LOCAL inclusive prefixes L,
     plus a tiny scan of the subtile totals T.
  3. row reduction as boundary differences u[r] = (L[gpe[r]] -
     L[gpe[r-1]]) + (T[gpe[r]>>10] - T[gpe[r-1]>>10]), the L-gather
     windowed by monotonicity (8-way shuffle). Keeping L and T separate
     makes same-subtile differences cancel the subtile base EXACTLY —
     a chunk-wide prefix costs ~1e-3 relative error at 80k entries per
     chunk (measured); local prefixes keep it at f32 noise.

ADJOINT (z += A^T u), per chunk:
  4. gather u[rowlocal] per subtile — the row SET of a subtile spans
     <= 1024 rows, so a windowed 8-way shuffle applies in stored order.
  5. prefix-sum the products in stored (col-sorted) order — the same
     batched MXU matmul + masked ladder, subtile-local only.
  6. column reduction as boundary differences z[d] += L2[ep[d]] -
     L2[ep[d-1]] per subtile, emitted DENSELY over the (n/128, 128)
     VMEM z accumulator — no scatter, no one-hot; absent columns repeat
     ep and contribute exactly 0. Subtile contributions are independent
     partial sums, so no cross-subtile prefix is needed.

The fused pair kernel runs 1-6 in one pass: vals/idx stream from HBM
once per iteration for BOTH products. Reference anchor for the pair:
lsqr.f90:681-694.

Performance history (m=2^21, n=2048, 10.5M-nnz Zipf(1.1), v5e,
fori-chained on-device timing): a serial carried prefix latency-bound
the first cut at 16.4 ms/pair; per-subtile fori loops with a one-hot
MXU column scatter measured 10.5 ms (ablation: skeleton 3.2 / scatter
2.9 / prefix 1.8 ms); this batched scatter-free dual-copy version
measures 8.5 ms = 2.46 Gnnz/s pair on REAL nnz — ~25x the XLA COO
path. The remaining wall is the dynamic crossbar itself: an 8-way
windowed gather pass sustains ~4.8 Gent/s regardless of window
alignment or SMEM/dynamic-slice structure (probed), i.e. ~6 cycles per
(8,128) vreg op, and the pair fundamentally needs several such passes.

Constraints (checked by the packer, which refuses and lets the caller
fall back to COO): f32; n <= 4096; per 128 consecutive rows the entry
span must fit the 1024-window (<= 896 after alignment); per 1024
consecutive entries the row span must fit 1024 rows (<= 896).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["wcoo_forward", "wcoo_adjoint", "wcoo_pair", "CR"]

#: rows per chunk (one grid step); u/y chunk blocks are (CR/128, 128)
CR = 16384


def _win_gather(W, idx):
    """Gather idx.shape values from the (8,128) window W at flat
    positions idx in [0, 1024): 8-way cross-sublane crossbar."""
    sub = idx >> 7
    lane = idx & 127
    g = jnp.zeros(idx.shape, W.dtype)
    for s in range(8):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(W[s][None, :], idx.shape), lane, axis=1
        )
        g = jnp.where(sub == s, cand, g)
    return g


def _local_prefix(p, tri, gmask):
    """Subtile-local inclusive prefix over a (R,128) chunk value laid
    out in 1024-entry subtiles of 8 sublane-rows each.

    ONE MXU matmul gives every sublane-row's 128-prefix; a Kogge-Stone
    ladder masked at subtile boundaries adds the within-subtile row
    carries. gmask[k] (R,1) f32: 1 iff rows r and r-k share a subtile."""
    P = jax.lax.dot_general(
        p, tri, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # default bf16 MXU inputs
        # cost ~4e-3 per product (measured) — bf16x3 restores f32
    )
    R = p.shape[0]
    tot = jnp.broadcast_to(P[:, 127:128], (R, 128))
    z = jnp.zeros_like(tot)
    # masked inclusive ladder over row totals, then shift to exclusive
    inc = tot
    for k in (1, 2, 4):
        sh = jnp.concatenate([z[:k], inc[:-k]], axis=0)
        inc = inc + sh * gmask[k]
    excl = jnp.concatenate([z[:1], inc[:-1]], axis=0) * gmask[1]
    return P + excl


def _group_masks(R):
    r = np.arange(R) % 8
    return {k: jnp.asarray(((r >= k)[:, None]).astype(np.float32))
            for k in (1, 2, 4)}


def _lane_diff(Se, prev):
    """Se - (Se shifted one lane back, sublane-carried; ``prev`` feeds
    position (0,0)). Values laid out lane-major: item r = s*128 + l."""
    R = Se.shape[0]
    lastcol = jnp.broadcast_to(Se[:, 127:128], (R, 128))
    up = jnp.concatenate([prev, lastcol[:-1, :]], axis=0)
    Sh = jnp.concatenate([up[:, 127:128], Se[:, :-1]], axis=1)
    return Se - Sh


def _last_lane(Se):
    """(1,128) all-lane broadcast of Se[-1, 127] (via crossbar)."""
    R = Se.shape[0]
    return jnp.take_along_axis(
        Se, jnp.full((R, 128), 127, jnp.int32), axis=1)[R - 1:R, :]


def _wcoo_kernel(
    EB, XS, UB, KB, KU, forward, adjoint, pair,
    # SMEM scalar tables
    ugb_ref, bnb_ref,
    # VMEM inputs
    vals_ref, idx_ref, valsR_ref, colR_ref, ep_ref, gpe_ref, x_ref,
    y_ref, sc_ref, tri_ref, gm1_ref, gm2_ref, gm4_ref,
    # outputs
    u_ref, z_ref,
    # scratch
    S_ref, T_ref,
):
    """One grid step = one chunk of CR rows. EB: 1024-entry subtiles per
    chunk; XS: n/128; UB: CR/128 = 128."""
    t = pl.program_id(0)
    c1 = sc_ref[0, 0]
    c2 = sc_ref[1, 0]
    tri = tri_ref[:]
    R = EB * 8
    gmask = {1: gm1_ref[:], 2: gm2_ref[:], 4: gm4_ref[:]}
    TP = max(8, -(-EB // 8) * 8)  # totals scratch sublane rows

    if forward or pair:
        X = x_ref[:]
        colR = colR_ref[0]
        # ---- 1. batched full-range gather of win[col]; products land
        # directly in ROW order (the second, row-sorted copy of the
        # entry stream costs ~8 B/entry HBM but removes the 8-way
        # in-subtile permute crossbar that dominated the first cut) ----
        clo = colR & 127
        chi = colR >> 7
        xg = jnp.zeros((R, 128), jnp.float32)
        for k in range(XS):
            cand = jnp.take_along_axis(
                jnp.broadcast_to(X[k][None, :], (R, 128)), clo, axis=1
            )
            xg = jnp.where(chi == k, cand, xg)
        S_ref[:] = valsR_ref[0] * xg

        # ---- 2. batched subtile-local prefix + totals scan ----
        L = _local_prefix(S_ref[:], tri, gmask)
        S_ref[:] = L
        last = jnp.take_along_axis(
            L, jnp.full((R, 128), 127, jnp.int32), axis=1
        )
        # row 7 of each 8-row group (strided slices are unsupported;
        # the (EB,8,128) reshape keeps the natural (8,128) tiling)
        tots = last.reshape(EB, 8, 128)[:, 7, :]              # (EB,128)
        Tz = jnp.zeros_like(tots)
        inc = tots
        k = 1
        while k < EB:
            inc = inc + jnp.concatenate([Tz[:k], inc[:-k]], axis=0)
            k *= 2
        excl = jnp.concatenate([Tz[:1], inc[:-1]], axis=0)
        if TP > EB:  # pad the write to the 8-aligned scratch
            excl = jnp.concatenate(
                [excl, jnp.zeros((TP - EB, 128), jnp.float32)], axis=0)
        T_ref[:] = excl  # exclusive base per subtile

        # ---- 3. boundary differences -> u ----
        prev_L = jnp.zeros((1, 128), jnp.float32)
        prev_B = jnp.zeros((1, 128), jnp.float32)
        for g in range(UB // 8):
            gp = gpe_ref[0, pl.ds(g * 8, 8), :]
            rows_L, rows_B = [], []
            for r in range(8):
                base = bnb_ref[0, 0, g * 8 + r]   # SMEM, mult of 128
                gpr = jnp.broadcast_to(gp[r][None, :], (8, 128))
                rel = gpr - base
                se = jnp.zeros((8, 128), jnp.float32)
                for kb in range(KB):   # KB windows cover the row span
                    W = S_ref[pl.ds((base >> 7) + kb * 8, 8), :]
                    relk = rel - kb * 1024
                    sek = _win_gather(W, jnp.clip(relk, 0, 1023))
                    se = jnp.where((relk >= 0) & (relk < 1024), sek, se)
                rows_L.append(jnp.where(gpr >= 0, se, 0.0)[0:1, :])
                # subtile base from the totals scan (subtile = gpe>>10):
                # a 1024-wide window spans <= 3 subtiles, so one dynamic
                # slice of T + an 8-way select covers every gpe here
                st = jnp.minimum(base >> 10, TP - 8)
                Wt = T_ref[pl.ds(st, 8), :]
                lidx = jnp.clip(gpr >> 10, 0, EB - 1) - st
                sb = jnp.zeros((8, 128), jnp.float32)
                for s in range(8):
                    sb = jnp.where(
                        lidx == s,
                        jnp.broadcast_to(Wt[s][None, :], (8, 128)),
                        sb,
                    )
                rows_B.append(jnp.where(gpr >= 0, sb, 0.0)[0:1, :])
            Le = jnp.concatenate(rows_L, axis=0)
            Be = jnp.concatenate(rows_B, axis=0)
            u_g = (_lane_diff(Le, prev_L) + _lane_diff(Be, prev_B)) * c1
            yv = y_ref[0, pl.ds(g * 8, 8), :]
            u_ref[0, pl.ds(g * 8, 8), :] = u_g - c2 * yv
            prev_L = _last_lane(Le)
            prev_B = _last_lane(Be)

    if adjoint or pair:
        # ---- 4. windowed u-gather + products in stored order ----
        def ug_body(i, _):
            base = ugb_ref[0, 0, i]                 # SMEM, mult of 128
            U = u_ref if (pair or forward) else y_ref
            rli = idx_ref[0, pl.ds(i * 8, 8), :] >> 12
            vi = vals_ref[0, pl.ds(i * 8, 8), :]
            # a subtile's rows span <= KU 128-row slices from its base
            # (pack-time bound; KU > 8 covers thin 2-D column blocks) —
            # one (1,128) slice + crossbar + select per covered slice
            idx = rli - base
            sub = idx >> 7
            lane = idx & 127
            g = jnp.zeros((8, 128), jnp.float32)
            for s_w in range(KU):
                row = U[0, pl.ds((base >> 7) + s_w, 1), :]
                cand = jnp.take_along_axis(
                    jnp.broadcast_to(row, (8, 128)), lane, axis=1)
                g = jnp.where(sub == s_w, cand, g)
            S_ref[pl.ds(i * 8, 8), :] = vi * g
            return 0

        jax.lax.fori_loop(0, EB, ug_body, 0)

        # ---- 5. batched subtile-local prefix ----
        L2 = _local_prefix(S_ref[:], tri, gmask)
        S_ref[:] = L2

        # ---- 6. dense boundary emission into the z accumulator ----
        def em_body(i, zacc):
            W = S_ref[pl.ds(i * 8, 8), :]
            ep = ep_ref[0, pl.ds(i * XS, XS), :]
            se = _win_gather(W, jnp.clip(ep, 0, 1023))
            se = jnp.where(ep >= 0, se, 0.0)
            z1 = jnp.zeros((1, 128), jnp.float32)
            return zacc + _lane_diff(se, z1)

        zacc = jax.lax.fori_loop(
            0, EB, em_body, jnp.zeros((XS, 128), jnp.float32))

        @pl.when(t == 0)
        def _():
            z_ref[:] = jnp.zeros((XS, 128), jnp.float32)

        z_ref[:] = z_ref[:] + zacc
    elif forward:
        @pl.when(t == 0)
        def _():
            z_ref[:] = jnp.zeros((XS, 128), jnp.float32)


def _call(packed, x, y, c1, c2, *, forward, adjoint, pair, interpret):
    """Shared pallas_call wrapper. x: (n,) input vector (or None for
    rmatvec); y: (<=m_pad,) — the -c2*y term for forward/pair, or u for
    rmatvec."""
    NC, EB, XS, n, m_pad = (packed.nc, packed.eb, packed.xs, packed.n,
                            packed.m_pad)
    UB = CR // 128
    R = EB * 8
    if x is None:
        xin = jnp.zeros((XS, 128), jnp.float32)
    else:
        xin = jnp.zeros((XS * 128,), jnp.float32).at[:n].set(
            x.astype(jnp.float32)).reshape(XS, 128)
    yin = jnp.zeros((m_pad,), jnp.float32).at[:y.shape[0]].set(
        y.astype(jnp.float32)).reshape(NC, UB, 128)
    sc = jnp.zeros((8, 128), jnp.float32)
    sc = sc.at[0, :].set(jnp.asarray(c1, jnp.float32))
    sc = sc.at[1, :].set(jnp.asarray(c2, jnp.float32))
    gm = _group_masks(R)
    kernel = functools.partial(_wcoo_kernel, EB, XS, UB, packed.kb,
                               packed.ku, forward, adjoint, pair)
    u, z = pl.pallas_call(
        kernel,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((1, 1, EB), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, UB), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EB * XS, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, UB, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XS, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, UB, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, UB, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XS, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NC, UB, 128), jnp.float32),
            jax.ShapeDtypeStruct((XS, 128), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((R, 128), jnp.float32),
                        pltpu.VMEM((max(8, -(-EB // 8) * 8), 128),
                                   jnp.float32)],
        interpret=interpret,
    )(
        packed.ugb, packed.bnb,
        packed.vals.reshape(NC, R, 128),
        packed.idx.reshape(NC, R, 128),
        packed.vals_r.reshape(NC, R, 128),
        packed.col_r.reshape(NC, R, 128),
        packed.ep.reshape(NC, EB * XS, 128),
        packed.gpe.reshape(NC, UB, 128),
        xin, yin, sc,
        jnp.asarray(np.tril(np.ones((128, 128), np.float32))),
        gm[1], gm[2], gm[4],
    )
    return u.reshape(m_pad), z.reshape(XS * 128)


def wcoo_forward(packed, win, c1, c2, y, *, interpret=False):
    """u = (A @ win) * c1 - c2 * y. Returns u (m,)."""
    u, _ = _call(packed, win, y, c1, c2,
                 forward=True, adjoint=False, pair=False,
                 interpret=interpret)
    return u[:packed.m]


def wcoo_adjoint(packed, u, *, interpret=False):
    """z = A^T @ u. Returns z (n,)."""
    _, z = _call(packed, None, u, 1.0, 0.0,
                 forward=False, adjoint=True, pair=False,
                 interpret=interpret)
    return z[:packed.n]


def wcoo_pair(packed, y, win, c1, c2, *, interpret=False):
    """Fused pair: u = A (win*c1) - c2 y;  z = A^T u (unnormalized).
    One pass over the entry stream for both products."""
    u, z = _call(packed, win, y, c1, c2,
                 forward=True, adjoint=True, pair=True,
                 interpret=interpret)
    return u[:packed.m], z[:packed.n]
