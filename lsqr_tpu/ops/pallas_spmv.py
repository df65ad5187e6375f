"""Hand-written Pallas TPU kernels for the hot SpMV/SpMV-T products.

The reference's hot kernel is the serial COO scatter loop
(/root/reference/src/lsqr.f90:168-172, 188-192) — O(nnz) scalar work. On
TPU the same products are expressed as streaming kernels:

* ``block_ell_matvec`` — block-sparse (ELL-of-blocks) SpMV: the grid walks
  block-rows; block-column indices are scalar-prefetched (SMEM) so each
  (bh, bw) dense block is multiplied against the matching x segment from a
  VMEM-resident x. All HBM traffic is the block stream itself — the product
  is memory-bound and the kernel targets the block-read roofline.
* ``dia_matvec`` — banded SpMV: each grid step holds one row tile; every
  diagonal is a statically-shifted fused multiply-add against the
  VMEM-resident x, so x is read once per tile instead of once per diagonal.

Both have pure-XLA equivalents in lsqr_tpu.ops.structured (used as the
fallback on non-TPU backends and as the correctness oracle in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "block_ell_matvec",
    "block_ell_matvec_windowed",
    "block_ell_pair_windowed",
    "dia_matvec",
    "dia_matvec_axpy",
    "dia_fused_halfstep",
    "dia_pair",
    "dia_pair_shared",
    "dia_product_shared",
    "dia_product_shared_axpy",
    "dia_shared_geometry",
    "jdia_matvec",
    "zdia_pair",
]


# ---------------------------------------------------------------------------
# Block-ELL SpMV
# ---------------------------------------------------------------------------


def _block_ell_kernel(bcols_ref, x_ref, blocks_ref, out_ref):
    """One grid step = one block-row: out[i] = sum_j blocks[i,j] @ x[bcols[i,j]].

    bcols_ref: scalar-prefetched (mb, kb) int32 (SMEM).
    x_ref:     (nb, bw) full x in VMEM.
    blocks_ref:(1, kb, bh, bw) this block-row's blocks in VMEM.
    out_ref:   (1, bh).
    """
    i = pl.program_id(0)
    kb = blocks_ref.shape[1]
    bh = blocks_ref.shape[2]
    bw = blocks_ref.shape[3]
    # 2-D matmul form (bh, bw) @ (bw, 1): keeps the accumulator constant-zero
    # per dot (a Mosaic requirement) and rides the MXU.
    acc = jnp.zeros((bh, 1), jnp.float32)
    for j in range(kb):  # static unroll over the padded row width
        c = bcols_ref[i, j]
        xseg = x_ref[c, :].reshape(bw, 1)
        acc = acc + jnp.dot(
            blocks_ref[0, j], xseg, preferred_element_type=jnp.float32
        )
    out_ref[0, 0, :] = acc[:, 0].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_ell_matvec(blocks, bcols, x, *, interpret=False):
    """y = A @ x for a BlockELL matrix.

    blocks: (mb, kb, bh, bw); bcols: (mb, kb) int32; x: (nb*bw,).
    Returns y: (mb*bh,).
    """
    mb, kb, bh, bw = blocks.shape
    nb = x.shape[0] // bw
    x2 = x.reshape(nb, bw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, kb, bh, bw),
                lambda i, bcols: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bh), lambda i, bcols: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _block_ell_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mb, 1, bh), blocks.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * mb * kb * bh * bw,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(bcols, x2, blocks)
    return out.reshape(mb * bh)


def _block_ell_win_kernel(
    tr, bcols_ref, blocks_ref, x_hbm, out_ref, xs0, xs1, sem
):
    """One grid step = ``tr`` block-rows with HBM-resident x.

    The x segments each block needs (bcols known ahead via scalar prefetch)
    are DMA'd into a (tr, kb, bw) VMEM scratch, double-buffered across grid
    steps: while step t computes, step t+1's segments stream in. Removes
    the whole-x-in-VMEM requirement of the original kernel (the 8MB guard,
    VERDICT.md round-1 weak item 3) and amortizes grid-step overhead over
    tr block-rows.
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    kb = blocks_ref.shape[1]
    bh = blocks_ref.shape[2]
    bw = blocks_ref.shape[3]
    bufs = (xs0, xs1)

    def start_tile_dmas(slot, tile):
        # kb * tr independent segment copies; each signals sem[slot] once.
        # bcols is prefetched FLAT (mb*kb,): a 2-D SMEM operand gets
        # lane-padded to (mb, 128) and blows the 1MB SMEM budget (measured).
        for r in range(tr):
            for j in range(kb):
                c = bcols_ref[(tile * tr + r) * kb + j]
                pltpu.make_async_copy(
                    x_hbm.at[c], bufs[slot].at[r, j], sem.at[slot]
                ).start()

    def wait_tile_dmas(slot):
        # one wait per started copy (semaphore counts down tr*kb signals)
        for _ in range(tr * kb):
            pltpu.make_async_copy(
                x_hbm.at[0], bufs[slot].at[0, 0], sem.at[slot]
            ).wait()

    @pl.when(t == 0)
    def _():
        start_tile_dmas(0, 0)

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        start_tile_dmas(1, t + 1)

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        start_tile_dmas(0, t + 1)

    @pl.when(even)
    def _():
        wait_tile_dmas(0)

    @pl.when(jnp.logical_not(even))
    def _():
        wait_tile_dmas(1)

    xseg = jnp.where(even, xs0[:], xs1[:])  # (tr, kb, bw)
    # (tr, kb, bh, bw) x (tr, kb, bw) -> (tr, bh), fully unrolled into 2-D
    # jnp.dot calls: Mosaic rejects both the multi_reduction a (tr, kb, bh)
    # axis-1 sum lowers to ("unsupported output implicit dimension") and
    # batched rank-1 dot_general ("only constant accumulators supported") —
    # measured round 2; plain (bh, bw) @ (bw, 1) MXU matmuls with
    # constant-zero accumulators are the supported pattern (as in
    # _block_ell_kernel above). Bandwidth-bound on the block stream, so the
    # matvec-shaped MXU work is not the bottleneck.
    blocks = blocks_ref[:]
    for r in range(tr):
        acc = jnp.zeros((bh, 1), jnp.float32)
        for j in range(kb):
            acc = acc + jnp.dot(
                blocks[r, j], xseg[r, j].reshape(bw, 1),
                preferred_element_type=jnp.float32,
            )
        out_ref[r, :] = acc[:, 0].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "tr"))
def block_ell_matvec_windowed(blocks, bcols, x, *, interpret=False, tr=None):
    """y = A @ x for a BlockELL matrix with x left in HBM.

    blocks: (mb, kb, bh, bw); bcols: (mb, kb) int32; x: (nb*bw,).
    Returns y: (mb*bh,). ``tr`` = block-rows per grid step.
    """
    mb, kb, bh, bw = blocks.shape
    if tr is None:
        # amortize grid-step overhead; keep the double-buffered block tile
        # (2 * tr * kb * bh * bw * 4B) well under VMEM
        tr = 8 if mb >= 8 else 1
    while mb % tr:
        tr -= 1
    nt = mb // tr
    nb = x.shape[0] // bw
    x2 = x.reshape(nb, bw)
    bflat = bcols.reshape(mb * kb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (tr, kb, bh, bw),
                lambda t, bcols: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (tr, bh), lambda t, bcols: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tr, kb, bw), blocks.dtype),
            pltpu.VMEM((tr, kb, bw), blocks.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_block_ell_win_kernel, tr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mb, bh), blocks.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * mb * kb * bh * bw,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + mb * kb * bw * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(bflat, blocks, x2)
    return out.reshape(mb * bh)


def _block_ell_pair_kernel(
    tr, bcols_ref, blocks_ref, y_ref, sc_ref, x_hbm, out_ref, zp_ref,
    xs0, xs1, sem
):
    """Windowed BlockELL product PAIR: one pass over the block stream
    computing u_r = sum_j blocks[r,j] @ (xseg[r,j]*c1) - c2*y_r AND the
    per-block adjoint partials zp[r,j] = blocks[r,j]' @ u_r (the caller
    segment-sums zp rows by bcols — mb*kb rows of bw, i.e. 1/bh of the
    block traffic). Blocks are read ONCE for both products."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    kb = blocks_ref.shape[1]
    bh = blocks_ref.shape[2]
    bw = blocks_ref.shape[3]
    bufs = (xs0, xs1)

    def start_tile_dmas(slot, tile):
        for r in range(tr):
            for j in range(kb):
                c = bcols_ref[(tile * tr + r) * kb + j]
                pltpu.make_async_copy(
                    x_hbm.at[c], bufs[slot].at[r, j], sem.at[slot]
                ).start()

    def wait_tile_dmas(slot):
        for _ in range(tr * kb):
            pltpu.make_async_copy(
                x_hbm.at[0], bufs[slot].at[0, 0], sem.at[slot]
            ).wait()

    @pl.when(t == 0)
    def _():
        start_tile_dmas(0, 0)

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        start_tile_dmas(1, t + 1)

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        start_tile_dmas(0, t + 1)

    @pl.when(even)
    def _():
        wait_tile_dmas(0)

    @pl.when(jnp.logical_not(even))
    def _():
        wait_tile_dmas(1)

    c1 = sc_ref[0, 0]
    c2 = sc_ref[0, 1]
    xseg = jnp.where(even, xs0[:], xs1[:])  # (tr, kb, bw)
    blocks = blocks_ref[:]
    for r in range(tr):
        acc = jnp.zeros((bh, 1), jnp.float32)
        for j in range(kb):
            acc = acc + jnp.dot(
                blocks[r, j], (xseg[r, j] * c1).reshape(bw, 1),
                preferred_element_type=jnp.float32,
            )
        u_r = acc - c2 * y_ref[r, :].astype(jnp.float32).reshape(bh, 1)
        out_ref[r, :] = u_r[:, 0].astype(out_ref.dtype)
        for j in range(kb):
            # adjoint partial: blocks[r,j]' @ u_r — (bw, bh) @ (bh, 1) MXU
            zp = jnp.dot(
                blocks[r, j].T, u_r, preferred_element_type=jnp.float32
            )
            zp_ref[r, j, :] = zp[:, 0].astype(zp_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "tr"))
def block_ell_pair_windowed(blocks, bcols, x, y, c1, c2, *, interpret=False,
                            tr=None):
    """(u_new, zp) for a BlockELL matrix with x left in HBM:
        u_new = A (x*c1) - c2*y;    zp[r, j] = blocks[r, j]' @ u_new_r
    blocks: (mb, kb, bh, bw); bcols: (mb, kb); x: (nb*bw,); y: (mb*bh,).
    Returns u_new (mb*bh,) and zp (mb, kb, bw); the caller assembles
    z = A'u_new = segment_sum(zp.reshape(mb*kb, bw), bcols.flat)."""
    mb, kb, bh, bw = blocks.shape
    if tr is None:
        tr = 8 if mb >= 8 else 1
    while mb % tr:
        tr -= 1
    nt = mb // tr
    nb = x.shape[0] // bw
    x2 = x.reshape(nb, bw)
    y2 = y.reshape(mb, bh)
    bflat = bcols.reshape(mb * kb)
    sc = jnp.stack([jnp.asarray(c1, jnp.float32),
                    jnp.asarray(c2, jnp.float32)]).reshape(1, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (tr, kb, bh, bw),
                lambda t, bcols: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((tr, bh), lambda t, bcols: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda t, bcols: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        ],
        out_specs=(
            pl.BlockSpec((tr, bh), lambda t, bcols: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, kb, bw), lambda t, bcols: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tr, kb, bw), blocks.dtype),
            pltpu.VMEM((tr, kb, bw), blocks.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, zp = pl.pallas_call(
        functools.partial(_block_ell_pair_kernel, tr),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((mb, bh), blocks.dtype),
            jax.ShapeDtypeStruct((mb, kb, bw), blocks.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * mb * kb * bh * bw,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + mb * kb * bw * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(bflat, blocks, y2, sc, x2)
    return out.reshape(mb * bh), zp


# ---------------------------------------------------------------------------
# DIA (banded) SpMV
# ---------------------------------------------------------------------------


def _dia_kernel(offsets, lo, tm, win, data_ref, x_hbm, out_ref, xw0_ref, xw1_ref, sem):
    """One grid step = one row tile of tm rows.

    data_ref: (ndiag, tm) stripe tile in VMEM (auto-pipelined).
    x_hbm:    full padded x left in HBM; the per-tile window (win,) is
              DMA'd into the xw_ref VMEM scratch — x never needs to fit in
              VMEM, so m is unbounded.
    out_ref:  (tm,).

    The window load has an aligned dynamic start (t*tm is a vreg multiple);
    per-diagonal shifts are static value-level slices, which Mosaic lowers
    to lane shifts — one HBM read of x per tile, not per diagonal.
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bufs = (xw0_ref, xw1_ref)

    def window_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile * tm, win)], bufs[slot], sem.at[slot]
        )

    # double-buffered window prefetch: warm up on the first tile, then each
    # step kicks off tile t+1's window before computing on tile t's.
    @pl.when(t == 0)
    def _():
        window_dma(0, 0).start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        window_dma(1, t + 1).start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        window_dma(0, t + 1).start()

    @pl.when(even)
    def _():
        window_dma(0, t).wait()

    @pl.when(jnp.logical_not(even))
    def _():
        window_dma(1, t).wait()

    # the unselected buffer may be mid-DMA; its values are discarded by the
    # select, so the read is benign.
    xw = jnp.where(even, xw0_ref[:], xw1_ref[:])
    acc = jnp.zeros((tm,), jnp.float32)
    for d, k in enumerate(offsets):
        # row i reads xp[lo + i + k]; within the window that is the static
        # slice [lo + k, lo + k + tm).
        seg = jax.lax.slice(xw, (lo + k,), (lo + k + tm,))
        acc = acc + data_ref[d, :].astype(jnp.float32) * seg.astype(jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("offsets", "m", "n", "interpret", "tm"))
def dia_matvec(data, x, *, offsets, m, n, interpret=False, tm=None):
    """y = A @ x for a DIA (banded) matrix.

    data: (ndiag, m) row-aligned stripes (data[d, i] = A[i, i+offsets[d]]).
    x: (n,). Returns y: (m,). bf16 stripes are supported as a STORAGE
    format: the kernel accumulates in f32 and returns f32 — half the
    dominant stripe traffic for f32-tolerant problems.
    """
    ks = tuple(offsets)
    kmin, kmax = min(ks), max(ks)
    if tm is None:
        if m >= 8_000_000:
            tm = 65536       # measured best at 8M+ (64 vs 62 Gnnz/s pair)
        elif m >= 4_000_000:
            tm = 32768
        elif m >= 8192:
            tm = 8192
        else:
            tm = 1024 if m >= 1024 else max(8, m)
        if data.dtype == jnp.bfloat16:
            # the per-diagonal bf16->f32 cast stages an extra f32 copy of
            # the stripe block in scoped VMEM; at tm=65536 that overflows
            # the 16M stack limit (measured 19.1M) — halve the tile.
            tm = min(tm, 32768)
    nt = -(-m // tm)          # ragged last tile handled by pallas masking
    lo = max(0, -kmin)
    # per-tile window covers every diagonal's static shift
    win = -(-(lo + kmax + tm) // 1024) * 1024
    # padded x must cover the last tile's window [(nt-1)*tm, (nt-1)*tm + win)
    xp_len = max(lo + n, (nt - 1) * tm + win)
    xp_len = -(-xp_len // 1024) * 1024
    xp = jnp.zeros((xp_len,), x.dtype).at[lo : lo + n].set(x)

    out_dtype = jnp.float32 if data.dtype == jnp.bfloat16 else data.dtype
    kernel = functools.partial(_dia_kernel, ks, lo, tm, win)
    out = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((len(ks), tm), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM, DMA'd per tile
        ],
        out_specs=pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m,), out_dtype),
        scratch_shapes=[
            # window scratch matches X's dtype (with bf16 STRIPES x stays f32)
            pltpu.VMEM((win,), x.dtype),
            pltpu.VMEM((win,), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(data, xp)
    return out


# ---------------------------------------------------------------------------
# Fused bidiagonalization half-step (DIA)
# ---------------------------------------------------------------------------
#
# The LSQR inner loop's HBM traffic is the two products plus the axpys and
# norms around them (lsqr.f90:681-699). With u and v kept UNNORMALIZED in
# the solver carry (their norms tracked as scalars), both half-steps have
# the same shape
#
#     out = A_or_At (win * c1)  -  c2 * y,     ssq = sum(out**2)
#
#   forward: win=v_unnorm, c1=1/alpha, y=u_unnorm, c2=alpha/beta
#   adjoint: win=u_unnorm, c1=1/beta,  y=v_unnorm, c2=beta/alpha
#
# so ONE kernel fuses product + axpy + norm reduction into a single
# streaming pass. Output layout note: XLA stack-allocates multi-output or
# ANY-space pallas outputs (blowing the 16MB scoped-vmem limit for MB-scale
# vectors), so the kernel has exactly one VMEM-blocked output of shape
# (nt, 1, tm + 128): per tile, the first tm lanes are the result and the
# last 128 carry the tile's norm partial (broadcast; summed by the caller).


def _dia_fused_kernel(
    offsets, lo, tm, win, m_total, data_ref, y_ref, sc_ref, x_hbm,
    out_ref, xw0_ref, xw1_ref, sem
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bufs = (xw0_ref, xw1_ref)

    def window_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile * tm, win)], bufs[slot], sem.at[slot]
        )

    @pl.when(t == 0)
    def _():
        window_dma(0, 0).start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        window_dma(1, t + 1).start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        window_dma(0, t + 1).start()

    @pl.when(even)
    def _():
        window_dma(0, t).wait()

    @pl.when(jnp.logical_not(even))
    def _():
        window_dma(1, t).wait()

    c1 = sc_ref[0, 0]
    c2 = sc_ref[1, 0]
    xw = jnp.where(even, xw0_ref[:], xw1_ref[:]).astype(jnp.float32) * c1
    acc = (-c2) * y_ref[:tm].astype(jnp.float32)
    for d, k in enumerate(offsets):
        seg = jax.lax.slice(xw, (lo + k,), (lo + k + tm,))
        acc = acc + data_ref[d, :].astype(jnp.float32) * seg
    if m_total % tm != 0:
        # ragged last tile: input blocks beyond m are padded with UNDEFINED
        # values — mask them out of both the output and the norm.
        idx = t * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)[:, 0]
        acc = jnp.where(idx < m_total, acc, 0.0)
    out_ref[:tm] = acc.astype(out_ref.dtype)
    sq = acc * acc
    local = jnp.sum(sq.reshape(-1, 128)) if tm % 128 == 0 else jnp.sum(sq)
    out_ref[tm:] = jnp.full((1024,), local * (1.0 / 1024.0), out_ref.dtype)


def dia_fused_halfstep(data, y, win_vec, c1, c2, *, offsets, m, n, interpret=False, tm=None):
    """One streaming pass computing
        out = DIA(data, offsets) @ (win_vec * c1)  -  c2 * y
        ssq = sum(out**2)
    with data: (ndiag, m) stripes, y: (m,), win_vec: (n,). Returns (out, ssq).
    """
    ks = tuple(offsets)
    kmin, kmax = min(ks), max(ks)
    if tm is None:
        tm = 32768 if m >= 4_000_000 else (8192 if m >= 8192 else max(128, min(m, 1024)))
    nt = -(-m // tm)
    lo = max(0, -kmin)
    win = -(-(lo + kmax + tm) // 1024) * 1024
    xp_len = max(lo + n, (nt - 1) * tm + win)
    xp_len = -(-xp_len // 1024) * 1024
    xp = jnp.zeros((xp_len,), win_vec.dtype).at[lo : lo + n].set(win_vec)
    # y padded to the interleaved tile grid (tile stride tm + 128; the tail
    # lanes of each stripe are unused on input)
    y3 = jnp.zeros((nt * tm,), y.dtype).at[:m].set(y)
    y3 = jnp.pad(y3.reshape(nt, tm), ((0, 0), (0, 1024))).reshape(-1)
    sc = jnp.stack(
        [jnp.asarray(c1, jnp.float32), jnp.asarray(c2, jnp.float32)]
    ).reshape(1, 2)
    sc = jnp.broadcast_to(sc.reshape(2, 1), (2, 128)) * jnp.ones((8, 1), jnp.float32)[:2]
    sc = jnp.pad(sc, ((0, 6), (0, 0)))  # (8, 128) VMEM tile; rows 0/1 = c1/c2

    kernel = functools.partial(_dia_fused_kernel, ks, lo, tm, win, m)
    out3 = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((len(ks), tm), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm + 1024,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tm + 1024,), lambda t: (t,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt * (tm + 1024),), data.dtype),
        scratch_shapes=[
            pltpu.VMEM((win,), data.dtype),
            pltpu.VMEM((win,), data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(data, y3, sc, xp)
    # barrier: without it XLA tries to fuse the reshape/slice consumers into
    # the custom call's output placement and stack-allocates the whole
    # buffer in VMEM
    out3 = jax.lax.optimization_barrier(out3)
    out3 = out3.reshape(nt, tm + 1024)
    out = out3[:, :tm].reshape(-1)[:m]
    ssq = jnp.sum(out3[:, tm:].astype(jnp.float32))
    return out, ssq


# ---------------------------------------------------------------------------
# Product + axpy (DIA): out = A (win * c1) - c2 * y, no norm output.
# Structurally identical to dia_matvec's (working) single clean (m,) output;
# used to fuse the bidiag axpys when the full fused half-step cannot compile
# (see BENCHMARKS.md known issues), and as the allocator-bug discriminator.
# ---------------------------------------------------------------------------


def _dia_axpy_kernel(
    offsets, lo, tm, win, data_ref, y_ref, sc_ref, x_hbm,
    out_ref, xw0_ref, xw1_ref, sem
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bufs = (xw0_ref, xw1_ref)

    def window_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile * tm, win)], bufs[slot], sem.at[slot]
        )

    @pl.when(t == 0)
    def _():
        window_dma(0, 0).start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        window_dma(1, t + 1).start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        window_dma(0, t + 1).start()

    @pl.when(even)
    def _():
        window_dma(0, t).wait()

    @pl.when(jnp.logical_not(even))
    def _():
        window_dma(1, t).wait()

    c1 = sc_ref[0, 0]
    c2 = sc_ref[1, 0]
    xw = jnp.where(even, xw0_ref[:], xw1_ref[:]).astype(jnp.float32) * c1
    acc = (-c2) * y_ref[:].astype(jnp.float32)
    for d, k in enumerate(offsets):
        seg = jax.lax.slice(xw, (lo + k,), (lo + k + tm,))
        acc = acc + data_ref[d, :].astype(jnp.float32) * seg
    out_ref[:] = acc.astype(out_ref.dtype)


def dia_matvec_axpy(data, y, win_vec, c1, c2, *, offsets, m, n, interpret=False, tm=None):
    """out = DIA(data, offsets) @ (win_vec * c1) - c2 * y in one pass."""
    ks = tuple(offsets)
    kmin, kmax = min(ks), max(ks)
    if tm is None:
        tm = 32768 if m >= 4_000_000 else (8192 if m >= 8192 else max(8, min(m, 1024)))
    nt = -(-m // tm)
    lo = max(0, -kmin)
    win = -(-(lo + kmax + tm) // 1024) * 1024
    xp_len = max(lo + n, (nt - 1) * tm + win)
    xp_len = -(-xp_len // 1024) * 1024
    xp = jnp.zeros((xp_len,), win_vec.dtype).at[lo : lo + n].set(win_vec)
    sc = jnp.zeros((8, 128), jnp.float32)
    sc = sc.at[0, :].set(jnp.asarray(c1, jnp.float32))
    sc = sc.at[1, :].set(jnp.asarray(c2, jnp.float32))

    kernel = functools.partial(_dia_axpy_kernel, ks, lo, tm, win)
    out = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((len(ks), tm), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m,), data.dtype),
        scratch_shapes=[
            pltpu.VMEM((win,), data.dtype),
            pltpu.VMEM((win,), data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(data, y, sc, xp)
    return out


# ---------------------------------------------------------------------------
# JDIA — jittered-diagonal SpMV (the general-sparsity streaming kernel)
# ---------------------------------------------------------------------------
#
# Measured constraint (BENCHMARKS.md round 2): the ONLY vectorized indexed
# access the hardware offers is tpu.dynamic_gather over per-sublane 128-wide
# tables ((8, 128) take_along_axis); XLA's generic gather runs the ELL
# x[cols] at 0.12 Gnnz/s. A general-sparsity kernel therefore cannot index
# arbitrary columns — but it can index SMALL DEVIATIONS from a per-slot
# diagonal:
#
#   col[i, j] = i + d[tile, j] + e[i, j],     |e| <= JITTER
#
# (the "jittered diagonal" — what a banded/locality-bearing matrix looks
# like after bandwidth-reducing reordering, with per-row irregularity that
# plain DIA storage would pad away). Entries that fit no slot within the
# jitter budget are split out at pack time into a small COO remainder that
# the operator applies with segment_sum.
#
# Kernel layout: rows in tiles of TM (TM = 8*128*q); per (tile, slot) the
# window base b = tile_row0 + d is prefetched; x lives padded in HBM and the
# tile's full span is DMA'd into a VMEM window (double-buffered, as in
# dia_matvec). Per (slot, 1024-row group): two overlapping (8, 128) tables
# T0 = win[s : s+1024], T1 = win[s+64 : s+64+1024] reshaped so sublane i
# covers rows [128i, 128(i+1)); the relative index r = lane + e + JITTER in
# [0, 192) is resolved as r < 128 -> T0[r], else T1[r - 64]. Two
# dynamic_gathers + a select per 1024 entries.

JDIA_JITTER = 32  # |e| budget; r = lane + e + 32 in [0, 192) with two tables


def _jdia_kernel(
    ns, tm, win, gathers, base_ref, data_ref, eoff_ref, x_hbm, out_ref,
    xw0_ref, xw1_ref, sem
):
    """One grid step = one row tile of tm rows (tm % 1024 == 0).

    NOTE argument order: the scalar-prefetched ``base_ref`` arrives FIRST
    (PrefetchScalarGridSpec convention), then the pipelined tensor inputs.

    data_ref: (ns, tm) slot values, VMEM-pipelined.
    eoff_ref: (ns, tm) int8 jitter offsets e in [-32, 32].
    base_ref: (ns_pad8, ntiles_pad128) int32 per-(slot, tile) window starts
              s = P_lo + d - 32, relative to the tile's x window.
    x_hbm:    padded x in HBM reshaped (len/128, 128); the tile's window
              rows are DMA'd (aligned: tile starts are multiples of tm) into
              a (win/128, 128) VMEM scratch, double-buffered.
    out_ref:  (tm,).

    Dynamic-addressing strategy (all alignment-provable on Mosaic —
    measured round 2): consecutive 1024-row groups of a slot start exactly
    8 window rows apart, so ONE aligned (span, 128) block read at
    ((s//128)//8)*8 plus ONE dynamic sublane roll serves every group of the
    slot; per-group tables are then static slices. ``gathers`` selects the
    residual-lane handling:
      3: r = (s%128) + lane + e + 32 in [0, 320) -> three per-sublane
         dynamic_gathers + selects per group.
      2: a dynamic LANE roll by s%128 (+ one cross-row select) folds the
         residual into the tables once per slot; r = lane + e + 32 in
         [0, 192) -> two gathers per group.
    Measured (v5e, m=8M, 10 slots): gathers=3 7.56 ms pair, gathers=2
    9.00 ms — the per-slot dynamic lane roll costs more than the third
    per-group gather, so 3 is the default.
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bufs = (xw0_ref, xw1_ref)
    wrows = win // 128
    trows = tm // 128

    def window_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile * trows, wrows), :], bufs[slot], sem.at[slot]
        )

    @pl.when(t == 0)
    def _():
        window_dma(0, 0).start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        window_dma(1, t + 1).start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        window_dma(0, t + 1).start()

    @pl.when(even)
    def _():
        window_dma(0, t).wait()

    @pl.when(jnp.logical_not(even))
    def _():
        window_dma(1, t).wait()

    ngrp = tm // 1024
    span = tm // 128 + 16  # slot coverage: last group's t1 ends at row
    #                        8*(ngrp-1)+9; +7 sublane-roll margin
    accs = [jnp.zeros((1024,), jnp.float32) for _ in range(ngrp)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    lane_sp = jax.lax.broadcasted_iota(jnp.int32, (span - 1, 128), 1)
    for j in range(ns):
        # Hoisted per-slot addressing: group starts differ by exactly 8 rows
        # (1024/128), so ONE aligned block read + ONE sublane roll serves
        # every group; per-group tables become static slices.
        s = base_ref[j, t]
        a = s // 128              # first needed window row (group 0)
        q_l = s - a * 128         # lane residual, constant across groups
        al = (a // 8) * 8         # aligned block start (provable x8)
        roff = a - al             # residual sublanes in [0, 8)
        blk0 = xw0_ref[pl.ds(al, span), :]
        blk1 = xw1_ref[pl.ds(al, span), :]
        blk = jnp.where(even, blk0, blk1)
        b = pltpu.roll(blk, -roff, 0)     # b[k] = window row a + k
        if gathers == 2:
            # absorb the lane residual once: c[k, i] = window[s + 128k + i],
            # so r = lane + e + 32 < 192 needs only TWO tables per group
            bl = pltpu.roll(b, -q_l, 1)   # bl[k, i] = b[k, (i + q_l) % 128]
            c = jnp.where(
                lane_sp + q_l < 128,
                jax.lax.slice(bl, (0, 0), (span - 1, 128)),
                jax.lax.slice(bl, (1, 0), (span, 128)),
            )
        for g in range(ngrp):
            e = eoff_ref[j, g * 1024:(g + 1) * 1024].reshape(8, 128)
            if gathers == 2:
                t0 = jax.lax.slice(c, (8 * g, 0), (8 * g + 8, 128))
                t1 = jax.lax.slice(c, (8 * g + 1, 0), (8 * g + 9, 128))
                r = lane + e.astype(jnp.int32) + JDIA_JITTER   # [0, 192)
                g0 = jnp.take_along_axis(t0, jnp.clip(r, 0, 127), axis=1)
                g1 = jnp.take_along_axis(t1, jnp.clip(r - 128, 0, 127),
                                         axis=1)
                xv = jnp.where(r < 128, g0, g1).reshape(1024)
            else:
                t0 = jax.lax.slice(b, (8 * g, 0), (8 * g + 8, 128))
                t1 = jax.lax.slice(b, (8 * g + 1, 0), (8 * g + 9, 128))
                t2 = jax.lax.slice(b, (8 * g + 2, 0), (8 * g + 10, 128))
                r = q_l + lane + e.astype(jnp.int32) + JDIA_JITTER  # [0,320)
                k1m = r < 128
                k2m = r < 256
                g0 = jnp.take_along_axis(t0, jnp.clip(r, 0, 127), axis=1)
                g1 = jnp.take_along_axis(t1, jnp.clip(r - 128, 0, 127),
                                         axis=1)
                g2 = jnp.take_along_axis(t2, jnp.clip(r - 256, 0, 127),
                                         axis=1)
                xv = jnp.where(k1m, g0, jnp.where(k2m, g1, g2)).reshape(1024)
            d = data_ref[j, g * 1024:(g + 1) * 1024]
            accs[g] = accs[g] + d.astype(jnp.float32) * xv.astype(jnp.float32)
    for g in range(ngrp):
        out_ref[g * 1024:(g + 1) * 1024] = accs[g].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("m", "n", "win", "interpret", "tm", "gathers")
)
def jdia_matvec(data, eoff, base, xpad, *, m, n, win, interpret=False,
                tm=8192, gathers=3):
    """y = A @ x for a JDIA-packed matrix.

    data: (ns, m_pad) slot values; eoff: (ns, m_pad) int8 jitter;
    base: (ns_pad, nt_pad) int32 per-(slot, tile) window starts (relative to
    the tile's DMA'd x window); xpad: padded x of length nt*tm + win.
    Returns y: (m,).
    """
    ns, m_pad = data.shape
    nt = m_pad // tm
    assert win % 1024 == 0 and xpad.shape[0] % 128 == 0
    xpad2 = xpad.reshape(-1, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((ns, tm), lambda t, base: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, tm), lambda t, base: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tm,), lambda t, base: (t,),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win // 128, 128), data.dtype),
            pltpu.VMEM((win // 128, 128), data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_jdia_kernel, ns, tm, win, gathers)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad,), data.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * ns * m_pad,
            bytes_accessed=(data.size * data.dtype.itemsize
                            + eoff.size + nt * win * 4),
            transcendentals=0,
        ),
    )(base, data, eoff, xpad2)
    return out[:m]


# ---------------------------------------------------------------------------
# Fused half-step v2: product + axpy + norm in ONE kernel, with the norm
# partial accumulated across grid steps into a SEPARATE small output
# (revisited block), instead of round-1's interleaved-lane single output
# that XLA stack-allocated (BENCHMARKS.md). Two layout candidates:
#   ssq_out='vmem': second output is an (8, 128) f32 VMEM block, same block
#                   for every grid step (accumulation pattern); caller sums.
#   ssq_out='smem': second output is a (1, 1) f32 SMEM scalar, accumulated
#                   in an SMEM scratch and written at the last step.
# ---------------------------------------------------------------------------


def _dia_axpy_ssq_kernel(
    offsets, lo, tm, win, m_total, ssq_smem,
    data_ref, y_ref, sc_ref, x_hbm,
    out_ref, ssq_ref, xw0_ref, xw1_ref, sem, *maybe_acc
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bufs = (xw0_ref, xw1_ref)

    def window_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile * tm, win)], bufs[slot], sem.at[slot]
        )

    @pl.when(t == 0)
    def _():
        window_dma(0, 0).start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        window_dma(1, t + 1).start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        window_dma(0, t + 1).start()

    @pl.when(even)
    def _():
        window_dma(0, t).wait()

    @pl.when(jnp.logical_not(even))
    def _():
        window_dma(1, t).wait()

    c1 = sc_ref[0, 0]
    c2 = sc_ref[1, 0]
    xw = jnp.where(even, xw0_ref[:], xw1_ref[:]).astype(jnp.float32) * c1
    acc = (-c2) * y_ref[:].astype(jnp.float32)
    for d, k in enumerate(offsets):
        seg = jax.lax.slice(xw, (lo + k,), (lo + k + tm,))
        acc = acc + data_ref[d, :].astype(jnp.float32) * seg
    if m_total % tm != 0:
        idx = t * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)[:, 0]
        acc = jnp.where(idx < m_total, acc, 0.0)
    out_ref[:] = acc.astype(out_ref.dtype)

    sq = acc * acc
    if ssq_smem:
        (acc_smem,) = maybe_acc
        @pl.when(t == 0)
        def _():
            acc_smem[0] = 0.0

        acc_smem[0] = acc_smem[0] + jnp.sum(sq)

        @pl.when(t == nt - 1)
        def _():
            ssq_ref[0, 0] = acc_smem[0]
    else:
        part = jnp.sum(sq.reshape(-1, 8, 128), axis=0)
        @pl.when(t == 0)
        def _():
            ssq_ref[:, :] = jnp.zeros((8, 128), jnp.float32)

        ssq_ref[:, :] = ssq_ref[:, :] + part


def _dia_axpy_ssq_rows_kernel(
    offsets, lo, tm, win, m_total,
    data_ref, y_ref, sc_ref, x_hbm,
    out_ref, ssq_ref, xw0_ref, xw1_ref, sem
):
    """v3 of the fused half-step: the norm partial goes to a DISTINCT
    (8, 128) block of an (nt*8, 128) second output per grid step — unlike
    v2's revisited block there is no cross-step read-modify-write, so the
    output pipeline never stalls on the previous step's write. (1, 128)
    rows do not lower — Mosaic requires (8, 128)-divisible output blocks.)"""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bufs = (xw0_ref, xw1_ref)

    def window_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile * tm, win)], bufs[slot], sem.at[slot]
        )

    @pl.when(t == 0)
    def _():
        window_dma(0, 0).start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        window_dma(1, t + 1).start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        window_dma(0, t + 1).start()

    @pl.when(even)
    def _():
        window_dma(0, t).wait()

    @pl.when(jnp.logical_not(even))
    def _():
        window_dma(1, t).wait()

    c1 = sc_ref[0, 0]
    c2 = sc_ref[1, 0]
    xw = jnp.where(even, xw0_ref[:], xw1_ref[:]).astype(jnp.float32) * c1
    acc = (-c2) * y_ref[:].astype(jnp.float32)
    for d, k in enumerate(offsets):
        seg = jax.lax.slice(xw, (lo + k,), (lo + k + tm,))
        acc = acc + data_ref[d, :].astype(jnp.float32) * seg
    if m_total % tm != 0:
        idx = t * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)[:, 0]
        acc = jnp.where(idx < m_total, acc, 0.0)
    out_ref[:] = acc.astype(out_ref.dtype)
    sq = acc * acc
    ssq_ref[:, :] = jnp.sum(sq.reshape(-1, 8, 128), axis=0)


def dia_fused_halfstep_v3(
    data, y, win_vec, c1, c2, *, offsets, m, n, interpret=False, tm=None
):
    """One streaming pass computing
        out = DIA(data, offsets) @ (win_vec * c1) - c2 * y,  ssq = sum(out^2)
    with per-tile norm partials in distinct rows of an (nt, 128) second
    output (summed by the caller). Returns (out, ssq)."""
    ks = tuple(offsets)
    kmin, kmax = min(ks), max(ks)
    if tm is None:
        tm = 65536 if m >= 8_000_000 else (
            32768 if m >= 4_000_000 else (8192 if m >= 8192 else max(1024, min(m, 1024)))
        )
        if data.dtype == jnp.bfloat16:
            tm = min(tm, 32768)  # bf16 cast staging; see dia_matvec
    nt = -(-m // tm)
    lo = max(0, -kmin)
    win = -(-(lo + kmax + tm) // 1024) * 1024
    xp_len = max(lo + n, (nt - 1) * tm + win)
    xp_len = -(-xp_len // 1024) * 1024
    xp = jnp.zeros((xp_len,), win_vec.dtype).at[lo : lo + n].set(win_vec)
    y2 = jnp.zeros((nt * tm,), y.dtype).at[:m].set(y)
    sc = jnp.zeros((8, 128), jnp.float32)
    sc = sc.at[0, :].set(jnp.asarray(c1, jnp.float32))
    sc = sc.at[1, :].set(jnp.asarray(c2, jnp.float32))

    kernel = functools.partial(_dia_axpy_ssq_rows_kernel, ks, lo, tm, win, m)
    out, ssq = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((len(ks), tm), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt * tm,), data.dtype),
            jax.ShapeDtypeStruct((nt * 8, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((win,), data.dtype),
            pltpu.VMEM((win,), data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(data, y2, sc, xp)
    return out[:m], jnp.sum(ssq)


def dia_fused_halfstep_v2(
    data, y, win_vec, c1, c2, *, offsets, m, n, interpret=False, tm=None,
    ssq_out="vmem",
):
    """One streaming pass computing
        out = DIA(data, offsets) @ (win_vec * c1) - c2 * y,  ssq = sum(out^2)
    with the norm partial in a separate small output. Returns (out, ssq).
    """
    ks = tuple(offsets)
    kmin, kmax = min(ks), max(ks)
    if tm is None:
        tm = 65536 if m >= 8_000_000 else (
            32768 if m >= 4_000_000 else (8192 if m >= 8192 else max(1024, min(m, 1024)))
        )
        if data.dtype == jnp.bfloat16:
            tm = min(tm, 32768)  # bf16 cast staging; see dia_matvec
    nt = -(-m // tm)
    lo = max(0, -kmin)
    win = -(-(lo + kmax + tm) // 1024) * 1024
    xp_len = max(lo + n, (nt - 1) * tm + win)
    xp_len = -(-xp_len // 1024) * 1024
    xp = jnp.zeros((xp_len,), win_vec.dtype).at[lo : lo + n].set(win_vec)
    y2 = jnp.zeros((nt * tm,), y.dtype).at[:m].set(y)
    sc = jnp.zeros((8, 128), jnp.float32)
    sc = sc.at[0, :].set(jnp.asarray(c1, jnp.float32))
    sc = sc.at[1, :].set(jnp.asarray(c2, jnp.float32))

    smem = ssq_out == "smem"
    kernel = functools.partial(
        _dia_axpy_ssq_kernel, ks, lo, tm, win, m, smem
    )
    if smem:
        ssq_shape = jax.ShapeDtypeStruct((1, 1), jnp.float32)
        ssq_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        extra_scratch = [pltpu.SMEM((1,), jnp.float32)]
    else:
        ssq_shape = jax.ShapeDtypeStruct((8, 128), jnp.float32)
        ssq_spec = pl.BlockSpec((8, 128), lambda t: (0, 0),
                                memory_space=pltpu.VMEM)
        extra_scratch = []
    out, ssq = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((len(ks), tm), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
            ssq_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt * tm,), data.dtype),
            ssq_shape,
        ),
        scratch_shapes=[
            pltpu.VMEM((win,), data.dtype),
            pltpu.VMEM((win,), data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ] + extra_scratch,
        interpret=interpret,
    )(data, y2, sc, xp)
    ssq_total = ssq[0, 0] if smem else jnp.sum(ssq)
    return out[:m], ssq_total


# ---------------------------------------------------------------------------
# Fused product PAIR: u_new = A (v*c1) - c2*u  AND  z = A' u_new in ONE
# stripe pass — the whole bidiagonalization step's matrix work per LSQR
# iteration (lsqr.f90:681-694) reading the stripes ONCE instead of twice.
# ---------------------------------------------------------------------------
#
# Key observation: the adjoint product A'u_{k+1} in the second half-step
# consumes the vector the first half-step just produced, and normalization
# commutes with A' (A'(u/beta) = (A'u)/beta). So one row-tile pass can
#   (1) form the tile of u_new = A(v*c1) - c2*u  (as dia_matvec_axpy), and
#   (2) immediately multiply the SAME stripe tile against u_new, giving the
#       tile's additive contribution to z = A'u_new at column indices
#       [t0+kmin, t1+kmax) — a per-diagonal STATIC shift inside a local
#       (lo + tm + hi) accumulator, no scatter.
# Per-tile z windows overlap neighbouring tiles by at most lo+hi entries;
# the kernel emits them as disjoint (W,) partial blocks and the caller
# overlap-adds with static pads (O(m) fused XLA, vs the O(nd*m) stripe
# traffic saved). Stripe HBM traffic per LSQR iteration drops from
# 2*nd*m to nd*m words — the dominant term for nd >= ~5.


def _dia_pair_kernel(
    offsets, lo, hi, tm, win, W, m_total,
    data_ref, y_ref, sc_ref, x_hbm,
    out_ref, z_ref, xw0_ref, xw1_ref, sem
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bufs = (xw0_ref, xw1_ref)

    def window_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile * tm, win)], bufs[slot], sem.at[slot]
        )

    @pl.when(t == 0)
    def _():
        window_dma(0, 0).start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        window_dma(1, t + 1).start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        window_dma(0, t + 1).start()

    @pl.when(even)
    def _():
        window_dma(0, t).wait()

    @pl.when(jnp.logical_not(even))
    def _():
        window_dma(1, t).wait()

    c1 = sc_ref[0, 0]
    c2 = sc_ref[1, 0]
    xw = jnp.where(even, xw0_ref[:], xw1_ref[:]).astype(jnp.float32) * c1

    ragged = m_total % tm != 0
    if ragged:
        # rows beyond m: the stripe block is padded with UNDEFINED values —
        # zero them so neither u_new nor the adjoint partials see garbage
        # (y and x are zero-padded by the caller, so masked stripes suffice).
        idx = t * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)[:, 0]
        valid = idx < m_total
    stripes = []
    for d in range(len(offsets)):
        row = data_ref[d, :].astype(jnp.float32)
        if ragged:
            row = jnp.where(valid, row, 0.0)
        stripes.append(row)

    acc = (-c2) * y_ref[:].astype(jnp.float32)
    for d, k in enumerate(offsets):
        seg = jax.lax.slice(xw, (lo + k,), (lo + k + tm,))
        acc = acc + stripes[d] * seg
    out_ref[:] = acc.astype(out_ref.dtype)

    # adjoint partials: z[t0 + r + k] += data[d, r] * u_new[r], emitted as a
    # (W,) block whose position w maps to global column t0 - lo + w.
    # Accumulate by static-slice read-modify-write on the output block
    # (each block is visited exactly once, so there is no cross-step
    # pipeline hazard; ref slicing with static bounds is the
    # Mosaic-proven pattern of the JDIA/megakernel kernels).
    z_ref[:] = jnp.zeros((W,), z_ref.dtype)
    for d, k in enumerate(offsets):
        contrib = stripes[d] * acc
        s0 = lo + k
        z_ref[s0:s0 + tm] = z_ref[s0:s0 + tm] + contrib.astype(z_ref.dtype)


def _dia_pair_kernel_carry(
    offsets, lo, hi, tm, win, W, m_total,
    data_ref, y_ref, sc_ref, x_hbm,
    out_ref, z_ref, zlast_ref, xw0_ref, xw1_ref, zcar_ref, sp_ref,
    P_ref, sem
):
    """dia_pair with IN-KERNEL overlap-add (round 5): the separate
    _overlap_add assembly pass reads all per-tile partials back and
    rewrites z — a full extra z round-trip measured at 17% of the pair
    (91.5 -> 110.8 Gnnz/s without it). Here tile t's partial is split
    into (prev | main | spill): the z block for tile t-1 is written at
    step t as carry + this tile's prev piece (the z out block index is
    max(t-1, 0), so each block flushes after its final write), the carry
    scratch becomes main + the previous tile's spill, and the last
    block's value leaves through the small zlast output (the caller
    patches it in — the nt-1 main block is never written in z).
    Requires lo, hi <= 1024 and n <= nt*tm (dia_pair gates on this and
    falls back to the _overlap_add path otherwise)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bufs = (xw0_ref, xw1_ref)

    def window_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile * tm, win)], bufs[slot], sem.at[slot]
        )

    @pl.when(t == 0)
    def _():
        window_dma(0, 0).start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        window_dma(1, t + 1).start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        window_dma(0, t + 1).start()

    @pl.when(even)
    def _():
        window_dma(0, t).wait()

    @pl.when(jnp.logical_not(even))
    def _():
        window_dma(1, t).wait()

    c1 = sc_ref[0, 0]
    c2 = sc_ref[1, 0]
    xw = jnp.where(even, xw0_ref[:], xw1_ref[:]).astype(jnp.float32) * c1

    ragged = m_total % tm != 0
    if ragged:
        idx = t * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)[:, 0]
        valid = idx < m_total
    stripes = []
    for d in range(len(offsets)):
        row = data_ref[d, :].astype(jnp.float32)
        if ragged:
            row = jnp.where(valid, row, 0.0)
        stripes.append(row)

    acc = (-c2) * y_ref[:].astype(jnp.float32)
    for d, k in enumerate(offsets):
        seg = jax.lax.slice(xw, (lo + k,), (lo + k + tm,))
        acc = acc + stripes[d] * seg
    out_ref[:] = acc.astype(out_ref.dtype)

    # full (W,) partial via ref-slice accumulation (static ref offsets
    # are the Mosaic-proven pattern; value-space pads with large offsets
    # are rejected — "Input offsets outside of the first tile")
    P_ref[:] = jnp.zeros((W,), jnp.float32)
    for d, k in enumerate(offsets):
        s0 = lo + k
        P_ref[s0:s0 + tm] = P_ref[s0:s0 + tm] + stripes[d] * acc

    # z block t-1 = carry (main(t-1) + spill(t-2)) + this tile's prev part
    @pl.when(t > 0)
    def _():
        z_ref[:] = zcar_ref[:].astype(z_ref.dtype)
        if lo:
            z_ref[tm - lo:tm] = z_ref[tm - lo:tm] + P_ref[0:lo].astype(
                z_ref.dtype)

    # next carry = main(t) + spill(t-1); stash this tile's spill
    if hi:
        sp_prev = sp_ref[0:hi]            # read BEFORE overwriting
    zcar_ref[:] = P_ref[lo:lo + tm]
    if hi:
        @pl.when(t > 0)
        def _():
            zcar_ref[0:hi] = zcar_ref[0:hi] + sp_prev
        sp_ref[0:hi] = P_ref[lo + tm:lo + tm + hi]

    # the final block leaves through zlast (its z slot is never written)
    @pl.when(t == nt - 1)
    def _():
        zlast_ref[:] = zcar_ref[:].astype(zlast_ref.dtype)


def _overlap_add(zp, nt, tm, W, lo, n, dtype):
    """Assemble z (n,) from per-tile partials zp (nt, W), where zp[t, w]
    contributes to z[t*tm - lo + w]. Static pads only — no scatters."""
    g = -(-W // tm)
    # base shift so every target position is non-negative (lo may exceed tm
    # for bands wider than the tile)
    B = max(tm, -(-lo // tm) * tm)
    rows = nt + g + B // tm + 1
    zbig = jnp.zeros((rows, tm), jnp.float32)
    for j in range(g):
        sw = min(W, (j + 1) * tm) - j * tm
        seg = jax.lax.slice(zp, (0, j * tm), (nt, j * tm + sw))
        off = B - lo + j * tm
        ro, co = divmod(off, tm)
        piece = jnp.pad(seg, ((0, 0), (co, 2 * tm - co - sw)))
        zbig = zbig + jnp.pad(
            piece[:, :tm], ((ro, rows - nt - ro), (0, 0))
        )
        zbig = zbig + jnp.pad(
            piece[:, tm:], ((ro + 1, rows - nt - ro - 1), (0, 0))
        )
    flat = zbig.reshape(-1)
    avail = rows * tm - B
    if n <= avail:
        z = jax.lax.slice(flat, (B,), (B + n,))
    else:
        z = jnp.pad(jax.lax.slice(flat, (B,), (rows * tm,)), (0, n - avail))
    return z.astype(dtype)


def dia_pair(data, y, win_vec, c1, c2, *, offsets, m, n, interpret=False,
             tm=None):
    """One streaming pass over the stripes computing BOTH
        u_new = DIA(data, offsets) @ (win_vec * c1)  -  c2 * y
        z     = DIA(data, offsets)' @ u_new
    with data: (ndiag, m) row-aligned stripes, y: (m,), win_vec: (n,).
    Returns (u_new, z) with u_new: (m,), z: (n,). bf16 stripes are a
    storage format: compute/accumulate in f32, f32 results."""
    ks = tuple(offsets)
    kmin, kmax = min(ks), max(ks)
    if tm is None:
        tm = 65536 if m >= 8_000_000 else (
            32768 if m >= 4_000_000 else (8192 if m >= 8192 else max(1024, min(m, 1024)))
        )
        if data.dtype == jnp.bfloat16:
            tm = min(tm, 32768)  # bf16 cast staging; see dia_matvec
    nt = -(-m // tm)
    lo = max(0, -kmin)
    hi = max(0, kmax)
    win = -(-(lo + kmax + tm) // 1024) * 1024
    W = -(-(lo + tm + hi) // 1024) * 1024
    xp_len = max(lo + n, (nt - 1) * tm + win)
    xp_len = -(-xp_len // 1024) * 1024
    xp = jnp.zeros((xp_len,), win_vec.dtype).at[lo : lo + n].set(win_vec)
    y2 = jnp.zeros((nt * tm,), y.dtype).at[:m].set(y)
    sc = jnp.zeros((8, 128), jnp.float32)
    sc = sc.at[0, :].set(jnp.asarray(c1, jnp.float32))
    sc = sc.at[1, :].set(jnp.asarray(c2, jnp.float32))

    out_dtype = jnp.float32 if data.dtype == jnp.bfloat16 else data.dtype

    # carry path (round 5): in-kernel overlap-add — each z block is
    # written ONCE with its final value (delayed one tile), removing the
    # separate assembly pass's full z round-trip (measured: 91.5 -> ~110
    # Gnnz/s at m=2^23). Gated on the carry scratch geometry; the
    # _overlap_add path remains for wide bands / n beyond the row tiles.
    if lo <= 1024 and hi <= 1024 and n <= nt * tm:
        kernel = functools.partial(
            _dia_pair_kernel_carry, ks, lo, hi, tm, win, W, m)
        out, zmain, zlast = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((len(ks), tm), lambda t: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm,), lambda t: (t,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((tm,), lambda t: (t,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm,), lambda t: (jnp.maximum(t - 1, 0),),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm,), lambda t: (0,),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nt * tm,), out_dtype),
                jax.ShapeDtypeStruct((nt * tm,), jnp.float32),
                jax.ShapeDtypeStruct((tm,), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((win,), win_vec.dtype),
                pltpu.VMEM((win,), win_vec.dtype),
                pltpu.VMEM((tm,), jnp.float32),
                pltpu.VMEM((1024,), jnp.float32),
                pltpu.VMEM((W,), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(data, y2, sc, xp)
        out = jax.lax.optimization_barrier(out)
        z = jax.lax.dynamic_update_slice(zmain, zlast, ((nt - 1) * tm,))
        return out[:m], jax.lax.slice(z, (0,), (n,)).astype(out_dtype)

    kernel = functools.partial(_dia_pair_kernel, ks, lo, hi, tm, win, W, m)
    out, zflat = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((len(ks), tm), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), lambda t: (t,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt * tm,), out_dtype),
            jax.ShapeDtypeStruct((nt * W,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((win,), win_vec.dtype),
            pltpu.VMEM((win,), win_vec.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(data, y2, sc, xp)
    out = jax.lax.optimization_barrier(out)
    zflat = jax.lax.optimization_barrier(zflat)
    z = _overlap_add(zflat.reshape(nt, W), nt, tm, W, lo, n, out_dtype)
    return out[:m], z


# ---------------------------------------------------------------------------
# Shared-stripe DIA: forward AND adjoint products from ONE padded stripe
# array (no tdata packing — halves operator HBM)
# ---------------------------------------------------------------------------
#
# The adjoint of a DIA matrix reads the SAME entries as the forward, just
# indexed from the column side:
#
#     forward:  y[i] = sum_d data[d, i]     * x[i + k_d]
#     adjoint:  x[j] = sum_d data[d, j - k] * y[j - k_d]
#
# With data zero-padded by a halo H >= max(|k|) on both sides
# (dp[d, H + i] = data[d, i]), both directions become static per-diagonal
# slices of the same (nd, win) stripe window — the packed `tdata` copy
# (and its 1x stripe memory) disappears. The window is DMA'd from HBM
# per tile (double-buffered), like the x window of `dia_matvec`; the
# stripe traffic per product is identical to the packed layout (plus the
# ~2H/tm window overlap), so throughput matches while operator memory
# halves.


def _dia_shared_kernel(
    offsets, H, tm, win, Lp, adjoint,
    dp_hbm, vec_hbm, out_ref,
    dw0, dw1, vw0, vw1, sem,
):
    """One grid step = one output tile of tm rows.

    dp_hbm:  (nd*Lp,) FLAT padded shared stripes in HBM — flat because
             Mosaic requires sublane-dim DMA slices to be 8-aligned, which
             a (nd, win) window with nd=11 is not; per-diagonal 1-D window
             DMAs (1024-aligned offsets) sidestep the constraint with no
             padding traffic.
    vec_hbm: (Lp,) padded input vector in HBM; window (win,) DMA'd.
    dw*/vw*: flat (nd*win,) / (win,) VMEM scratch, double-buffered.
    Slices per diagonal d (r = position in tile):
      forward: dp[d, H + r] * vec[H + r + k]
      adjoint: dp[d, H + r - k] * vec[H + r - k]
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    nd = len(offsets)
    dbufs = (dw0, dw1)
    vbufs = (vw0, vw1)

    def dmas(slot, tile):
        cps = [
            pltpu.make_async_copy(
                dp_hbm.at[pl.ds(d * Lp + tile * tm, win)],
                dbufs[slot].at[pl.ds(d * win, win)],
                sem.at[slot, d],
            )
            for d in range(nd)
        ]
        cps.append(
            pltpu.make_async_copy(
                vec_hbm.at[pl.ds(tile * tm, win)], vbufs[slot],
                sem.at[slot, nd],
            )
        )
        return cps

    @pl.when(t == 0)
    def _():
        for c in dmas(0, 0):
            c.start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        for c in dmas(1, t + 1):
            c.start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        for c in dmas(0, t + 1):
            c.start()

    @pl.when(even)
    def _():
        for c in dmas(0, t):
            c.wait()

    @pl.when(jnp.logical_not(even))
    def _():
        for c in dmas(1, t):
            c.wait()

    dw = jnp.where(even, dw0[:], dw1[:])
    vw = jnp.where(even, vw0[:], vw1[:])
    acc = jnp.zeros((tm,), jnp.float32)
    for d, k in enumerate(offsets):
        sd = (H - k if adjoint else H) + d * win
        sv = H - k if adjoint else H + k
        seg_d = jax.lax.slice(dw, (sd,), (sd + tm,))
        seg_v = jax.lax.slice(vw, (sv,), (sv + tm,))
        acc = acc + seg_d.astype(jnp.float32) * seg_v.astype(jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def dia_shared_geometry(offsets, m, n, tm_m, tm_n):
    """(H, Lp) for the shared padded stripe array: H covers every static
    slice both directions take; Lp covers the last tile's window of either
    direction for ANY tile size up to max(tm_m, tm_n) — so one dp serves
    every tm a product call may pick ((nt-1)*tm' + roundup(2H+tm', 1024)
    < dim + 2H + tm' + 1024 for all tm' <= max(tm_m, tm_n))."""
    ks = tuple(offsets)
    H = max(max(ks), -min(ks), 0)
    Lp = 2 * H + max(m, n) + max(tm_m, tm_n) + 1024
    return H, -(-Lp // 1024) * 1024


def _shared_tm(dim):
    if dim >= 8_000_000:
        return 65536
    if dim >= 4_000_000:
        return 32768
    if dim >= 8192:
        return 8192
    return 1024 if dim >= 1024 else max(8, dim)


@functools.partial(
    jax.jit, static_argnames=("offsets", "m", "n", "adjoint", "interpret", "tm")
)
def dia_product_shared(
    dp, vec, *, offsets, m, n, adjoint, interpret=False, tm=None
):
    """y = A @ x (adjoint=False, x: (n,) -> y: (m,)) or x = A' @ y
    (adjoint=True, y: (m,) -> x: (n,)) from the SHARED padded stripes dp.

    dp: FLAT (nd * Lp,) with dp[d * Lp + H + i] = A[i, i + offsets[d]] and
    the geometry of :func:`dia_shared_geometry` (H, Lp must match). bf16
    dp is a storage format: accumulation and the result are f32.
    """
    ks = tuple(offsets)
    nd = len(ks)
    dim_out = n if adjoint else m
    dim_in = m if adjoint else n
    if tm is None:
        tm = _shared_tm(dim_out)
        if dp.dtype == jnp.bfloat16:
            tm = min(tm, 32768)
    # CANONICAL geometry (independent of this call's tm) so dp built once
    # serves both directions and any tm <= the canonical tile
    H, Lp = dia_shared_geometry(ks, m, n, _shared_tm(m), _shared_tm(n))
    assert dp.shape == (nd * Lp,), (dp.shape, nd, Lp)
    nt = -(-dim_out // tm)
    win = -(-(2 * H + tm) // 1024) * 1024
    assert (nt - 1) * tm + win <= Lp, (tm, win, Lp)

    vecp = jnp.zeros((Lp,), vec.dtype).at[H : H + dim_in].set(vec)
    out_dtype = jnp.float32 if dp.dtype == jnp.bfloat16 else dp.dtype
    kernel = functools.partial(_dia_shared_kernel, ks, H, tm, win, Lp, adjoint)
    out = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # dp stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # vec stays in HBM
        ],
        out_specs=pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dim_out,), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((nd * win,), dp.dtype),
            pltpu.VMEM((nd * win,), dp.dtype),
            pltpu.VMEM((win,), vec.dtype),
            pltpu.VMEM((win,), vec.dtype),
            pltpu.SemaphoreType.DMA((2, nd + 1)),
        ],
        interpret=interpret,
    )(dp, vecp)
    return out


def _dia_shared_axpy_kernel(
    offsets, H, tm, win, Lp, adjoint,
    c_ref, dp_hbm, vec_hbm, y_ref, out_ref,
    dw0, dw1, vw0, vw1, sem,
):
    """Shared-stripe product + axpy: out = (A or A')(vec * c1) - c2 * y.

    Same window DMA scheme as _dia_shared_kernel; y is read at the OUTPUT
    tile index (aligned), so it rides the ordinary BlockSpec pipeline.
    c_ref is a (1, 2) SMEM block holding (c1, c2)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    nd = len(offsets)
    dbufs = (dw0, dw1)
    vbufs = (vw0, vw1)

    def dmas(slot, tile):
        cps = [
            pltpu.make_async_copy(
                dp_hbm.at[pl.ds(d * Lp + tile * tm, win)],
                dbufs[slot].at[pl.ds(d * win, win)],
                sem.at[slot, d],
            )
            for d in range(nd)
        ]
        cps.append(
            pltpu.make_async_copy(
                vec_hbm.at[pl.ds(tile * tm, win)], vbufs[slot],
                sem.at[slot, nd],
            )
        )
        return cps

    @pl.when(t == 0)
    def _():
        for c in dmas(0, 0):
            c.start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        for c in dmas(1, t + 1):
            c.start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        for c in dmas(0, t + 1):
            c.start()

    @pl.when(even)
    def _():
        for c in dmas(0, t):
            c.wait()

    @pl.when(jnp.logical_not(even))
    def _():
        for c in dmas(1, t):
            c.wait()

    dw = jnp.where(even, dw0[:], dw1[:])
    vw = jnp.where(even, vw0[:], vw1[:])
    c1 = c_ref[0, 0]
    c2 = c_ref[0, 1]
    acc = (-c2) * y_ref[:].astype(jnp.float32)
    for d, k in enumerate(offsets):
        sd = (H - k if adjoint else H) + d * win
        sv = H - k if adjoint else H + k
        seg_d = jax.lax.slice(dw, (sd,), (sd + tm,))
        seg_v = jax.lax.slice(vw, (sv,), (sv + tm,))
        acc = acc + seg_d.astype(jnp.float32) * (
            seg_v.astype(jnp.float32) * c1
        )
    out_ref[:] = acc.astype(out_ref.dtype)


def _dia_pair_shared_kernel(
    offsets, H, tm, win, W, Lp,
    c_ref, dp_hbm, vec_hbm, y_ref, out_ref, z_ref,
    dw0, dw1, vw0, vw1, sem,
):
    """Shared-stripe product PAIR: one row-tile pass computing
        u_new = A(vec*c1) - c2*y   and the tile's additive contribution to
        z = A'u_new  (emitted as a (W,) partial block; see dia_pair).
    The adjoint contributions use the SAME row-aligned stripe values the
    forward just consumed (data[d, r] serves A[r, r+k] both ways), so the
    window DMA scheme of _dia_shared_axpy_kernel carries over unchanged.
    Shared stripes are zero-PADDED in HBM (not pallas-padded), so ragged
    tiles need no masking: out-of-range rows contribute exact zeros."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    nd = len(offsets)
    dbufs = (dw0, dw1)
    vbufs = (vw0, vw1)

    def dmas(slot, tile):
        cps = [
            pltpu.make_async_copy(
                dp_hbm.at[pl.ds(d * Lp + tile * tm, win)],
                dbufs[slot].at[pl.ds(d * win, win)],
                sem.at[slot, d],
            )
            for d in range(nd)
        ]
        cps.append(
            pltpu.make_async_copy(
                vec_hbm.at[pl.ds(tile * tm, win)], vbufs[slot],
                sem.at[slot, nd],
            )
        )
        return cps

    @pl.when(t == 0)
    def _():
        for c in dmas(0, 0):
            c.start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        for c in dmas(1, t + 1):
            c.start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        for c in dmas(0, t + 1):
            c.start()

    @pl.when(even)
    def _():
        for c in dmas(0, t):
            c.wait()

    @pl.when(jnp.logical_not(even))
    def _():
        for c in dmas(1, t):
            c.wait()

    dw = jnp.where(even, dw0[:], dw1[:])
    vw = jnp.where(even, vw0[:], vw1[:])
    c1 = c_ref[0, 0]
    c2 = c_ref[0, 1]
    stripes = []
    acc = (-c2) * y_ref[:].astype(jnp.float32)
    for d, k in enumerate(offsets):
        sd = H + d * win
        seg_d = jax.lax.slice(dw, (sd,), (sd + tm,)).astype(jnp.float32)
        seg_v = jax.lax.slice(vw, (H + k,), (H + k + tm,))
        acc = acc + seg_d * (seg_v.astype(jnp.float32) * c1)
        stripes.append(seg_d)
    out_ref[:] = acc.astype(out_ref.dtype)

    # static-slice RMW on the (once-visited) output block — see
    # _dia_pair_kernel
    z_ref[:] = jnp.zeros((W,), z_ref.dtype)
    for d, k in enumerate(offsets):
        contrib = stripes[d] * acc
        s0 = H + k
        z_ref[s0:s0 + tm] = z_ref[s0:s0 + tm] + contrib.astype(z_ref.dtype)


def _dia_pair_shared_kernel_carry(
    offsets, H, tm, win, W, Lp,
    c_ref, dp_hbm, vec_hbm, y_ref, out_ref, z_ref, zlast_ref,
    dw0, dw1, vw0, vw1, zcar_ref, sp_ref, P_ref, sem,
):
    """Shared-stripe pair with IN-KERNEL overlap-add — the carry scheme
    of :func:`_dia_pair_kernel_carry` (z blocks written once with their
    final values, one tile delayed; the last block leaves through
    zlast), on the shared-window DMA structure. Removes the separate
    _overlap_add z round-trip (measured +14% on the packed pair)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    nd = len(offsets)
    dbufs = (dw0, dw1)
    vbufs = (vw0, vw1)

    def dmas(slot, tile):
        cps = [
            pltpu.make_async_copy(
                dp_hbm.at[pl.ds(d * Lp + tile * tm, win)],
                dbufs[slot].at[pl.ds(d * win, win)],
                sem.at[slot, d],
            )
            for d in range(nd)
        ]
        cps.append(
            pltpu.make_async_copy(
                vec_hbm.at[pl.ds(tile * tm, win)], vbufs[slot],
                sem.at[slot, nd],
            )
        )
        return cps

    @pl.when(t == 0)
    def _():
        for c in dmas(0, 0):
            c.start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        for c in dmas(1, t + 1):
            c.start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        for c in dmas(0, t + 1):
            c.start()

    @pl.when(even)
    def _():
        for c in dmas(0, t):
            c.wait()

    @pl.when(jnp.logical_not(even))
    def _():
        for c in dmas(1, t):
            c.wait()

    dw = jnp.where(even, dw0[:], dw1[:])
    vw = jnp.where(even, vw0[:], vw1[:])
    c1 = c_ref[0, 0]
    c2 = c_ref[0, 1]
    stripes = []
    acc = (-c2) * y_ref[:].astype(jnp.float32)
    for d, k in enumerate(offsets):
        sd = H + d * win
        seg_d = jax.lax.slice(dw, (sd,), (sd + tm,)).astype(jnp.float32)
        seg_v = jax.lax.slice(vw, (H + k,), (H + k + tm,))
        acc = acc + seg_d * (seg_v.astype(jnp.float32) * c1)
        stripes.append(seg_d)
    out_ref[:] = acc.astype(out_ref.dtype)

    P_ref[:] = jnp.zeros((W,), jnp.float32)
    for d, k in enumerate(offsets):
        s0 = H + k
        P_ref[s0:s0 + tm] = P_ref[s0:s0 + tm] + stripes[d] * acc

    lo = hi = H
    @pl.when(t > 0)
    def _():
        z_ref[:] = zcar_ref[:].astype(z_ref.dtype)
        if lo:
            z_ref[tm - lo:tm] = z_ref[tm - lo:tm] + P_ref[0:lo].astype(
                z_ref.dtype)

    if hi:
        sp_prev = sp_ref[0:hi]            # read BEFORE overwriting
    zcar_ref[:] = P_ref[lo:lo + tm]
    if hi:
        @pl.when(t > 0)
        def _():
            zcar_ref[0:hi] = zcar_ref[0:hi] + sp_prev
        sp_ref[0:hi] = P_ref[lo + tm:lo + tm + hi]

    @pl.when(t == nt - 1)
    def _():
        zlast_ref[:] = zcar_ref[:].astype(zlast_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("offsets", "m", "n", "interpret", "tm")
)
def dia_pair_shared(
    dp, vec, y, c1, c2, *, offsets, m, n, interpret=False, tm=None
):
    """Shared-stripe fused pair: one pass over the shared padded stripes
    computing u_new = A(vec*c1) - c2*y AND z = A' u_new, with dp the FLAT
    (nd*Lp,) shared stripe array of :func:`dia_shared_geometry`. Returns
    (u_new (m,), z (n,)). Combines the shared layout's halved operator
    HBM with the pair's halved per-iteration stripe traffic."""
    ks = tuple(offsets)
    nd = len(ks)
    if tm is None:
        tm = _shared_tm(m)
        if dp.dtype == jnp.bfloat16:
            tm = min(tm, 32768)
    H, Lp = dia_shared_geometry(ks, m, n, _shared_tm(m), _shared_tm(n))
    assert dp.shape == (nd * Lp,), (dp.shape, nd, Lp)
    nt = -(-m // tm)
    win = -(-(2 * H + tm) // 1024) * 1024
    W = -(-(2 * H + tm) // 1024) * 1024
    assert (nt - 1) * tm + win <= Lp, (tm, win, Lp)

    vecp = jnp.zeros((Lp,), vec.dtype).at[H : H + n].set(vec)
    ypad = jnp.zeros((nt * tm,), y.dtype).at[:m].set(y)
    cs = jnp.stack([jnp.asarray(c1, jnp.float32),
                    jnp.asarray(c2, jnp.float32)]).reshape(1, 2)
    out_dtype = jnp.float32 if dp.dtype == jnp.bfloat16 else dp.dtype

    # carry path (round 5): in-kernel overlap-add (see dia_pair); the
    # _overlap_add assembly pass remains for wide halos / n beyond the
    # row tiles.
    if H <= 1024 and n <= nt * tm:
        kernel = functools.partial(
            _dia_pair_shared_kernel_carry, ks, H, tm, win, W, Lp
        )
        out, zmain, zlast = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tm,), lambda t: (t,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tm,), lambda t: (t,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm,), lambda t: (jnp.maximum(t - 1, 0),),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm,), lambda t: (0,),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nt * tm,), out_dtype),
                jax.ShapeDtypeStruct((nt * tm,), jnp.float32),
                jax.ShapeDtypeStruct((tm,), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((nd * win,), dp.dtype),
                pltpu.VMEM((nd * win,), dp.dtype),
                pltpu.VMEM((win,), vec.dtype),
                pltpu.VMEM((win,), vec.dtype),
                pltpu.VMEM((tm,), jnp.float32),
                pltpu.VMEM((1024,), jnp.float32),
                pltpu.VMEM((W,), jnp.float32),
                pltpu.SemaphoreType.DMA((2, nd + 1)),
            ],
            interpret=interpret,
        )(cs, dp, vecp, ypad)
        out = jax.lax.optimization_barrier(out)
        z = jax.lax.dynamic_update_slice(zmain, zlast, ((nt - 1) * tm,))
        return out[:m], jax.lax.slice(z, (0,), (n,)).astype(out_dtype)

    kernel = functools.partial(
        _dia_pair_shared_kernel, ks, H, tm, win, W, Lp
    )
    out, zflat = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), lambda t: (t,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt * tm,), out_dtype),
            jax.ShapeDtypeStruct((nt * W,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nd * win,), dp.dtype),
            pltpu.VMEM((nd * win,), dp.dtype),
            pltpu.VMEM((win,), vec.dtype),
            pltpu.VMEM((win,), vec.dtype),
            pltpu.SemaphoreType.DMA((2, nd + 1)),
        ],
        interpret=interpret,
    )(cs, dp, vecp, ypad)
    out = jax.lax.optimization_barrier(out)
    zflat = jax.lax.optimization_barrier(zflat)
    z = _overlap_add(zflat.reshape(nt, W), nt, tm, W, H, n, out_dtype)
    return out[:m], z


@functools.partial(
    jax.jit, static_argnames=("offsets", "m", "n", "adjoint", "interpret", "tm")
)
def dia_product_shared_axpy(
    dp, vec, y, c1, c2, *, offsets, m, n, adjoint, interpret=False, tm=None
):
    """out = A(vec*c1) - c2*y (adjoint=False) or A'(vec*c1) - c2*y
    (adjoint=True) from the SHARED padded stripes — the bidiagonalization
    half-step's vector work in one streaming pass (the shared-layout
    sibling of dia_matvec_axpy; reference op sequence lsqr.f90:681-699)."""
    ks = tuple(offsets)
    nd = len(ks)
    dim_out = n if adjoint else m
    dim_in = m if adjoint else n
    if tm is None:
        tm = _shared_tm(dim_out)
        if dp.dtype == jnp.bfloat16:
            tm = min(tm, 32768)
    H, Lp = dia_shared_geometry(ks, m, n, _shared_tm(m), _shared_tm(n))
    assert dp.shape == (nd * Lp,), (dp.shape, nd, Lp)
    nt = -(-dim_out // tm)
    win = -(-(2 * H + tm) // 1024) * 1024
    assert (nt - 1) * tm + win <= Lp, (tm, win, Lp)

    vecp = jnp.zeros((Lp,), vec.dtype).at[H : H + dim_in].set(vec)
    ypad = jnp.zeros((nt * tm,), y.dtype).at[:dim_out].set(y)
    cs = jnp.stack([jnp.asarray(c1, jnp.float32),
                    jnp.asarray(c2, jnp.float32)]).reshape(1, 2)
    out_dtype = jnp.float32 if dp.dtype == jnp.bfloat16 else dp.dtype
    kernel = functools.partial(
        _dia_shared_axpy_kernel, ks, H, tm, win, Lp, adjoint
    )
    out = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt * tm,), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((nd * win,), dp.dtype),
            pltpu.VMEM((nd * win,), dp.dtype),
            pltpu.VMEM((win,), vec.dtype),
            pltpu.VMEM((win,), vec.dtype),
            pltpu.SemaphoreType.DMA((2, nd + 1)),
        ],
        interpret=interpret,
    )(cs, dp, vecp, ypad)
    return out[:dim_out]


# ---------------------------------------------------------------------------
# Complex DIA product pair — plane-split streaming kernel
# ---------------------------------------------------------------------------
#
# TPU has no native complex arithmetic; XLA decomposes c64 into interleaved
# real ops that defeat the stripe-streaming layout. The TPU-native form is
# PLANE SPLITTING: a complex banded matrix A = Ar + i*Ai is stored as two
# f32 stripe planes, and the bidiagonalization product pair
#
#     u = A (win*c1) - c2*y,      z = A^H u
#
# (c1, c2 REAL — the complex Paige-Saunders recurrence keeps every scalar
# real, see solver._build) becomes per row tile:
#
#     ur = Ar xr' - Ai xi' - c2 yr        zr[j+k] += Ar[d,j] ur + Ai[d,j] ui
#     ui = Ar xi' + Ai xr' - c2 yi        zi[j+k] += Ar[d,j] ui - Ai[d,j] ur
#
# Each plane block is read from HBM ONCE for all four products (the
# adjoint reuses the forward tile via the same overlap-add trick as
# `dia_pair`), so pair traffic is 2 plane reads = 8 bytes per complex nnz
# — 2x the f32 pair's 4 bytes, the plane-split speed of light. Reference
# anchor: the product pair lsqr.f90:681-694 (real-only there).


def _zdia_pair_head(
    offsets, lo, tm, win, m_total,
    data_ref, yr_ref, yi_ref, sc_ref, x_hbm, ur_ref, ui_ref,
    xw0_ref, xw1_ref, sem,
):
    """Shared forward half of the zdia pair kernels: window DMAs, plane
    loads, complex forward accumulation, u writes. Returns
    (accr, acci, srs, sis) for the adjoint tail."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    nd = len(offsets)
    bufs = (xw0_ref, xw1_ref)

    def window_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(tile * tm, win)], bufs[slot], sem.at[slot]
        )

    @pl.when(t == 0)
    def _():
        window_dma(0, 0).start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        window_dma(1, t + 1).start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        window_dma(0, t + 1).start()

    @pl.when(even)
    def _():
        window_dma(0, t).wait()

    @pl.when(jnp.logical_not(even))
    def _():
        window_dma(1, t).wait()

    c1 = sc_ref[0, 0]
    c2 = sc_ref[1, 0]
    xw = jnp.where(even, xw0_ref[:], xw1_ref[:]).astype(jnp.float32) * c1
    xwr = xw[0]
    xwi = xw[1]

    ragged = m_total % tm != 0
    if ragged:
        idx = t * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)[:, 0]
        valid = idx < m_total
    srs, sis = [], []
    for d in range(nd):
        r = data_ref[d, :].astype(jnp.float32)
        q = data_ref[nd + d, :].astype(jnp.float32)
        if ragged:
            r = jnp.where(valid, r, 0.0)
            q = jnp.where(valid, q, 0.0)
        srs.append(r)
        sis.append(q)

    accr = (-c2) * yr_ref[:].astype(jnp.float32)
    acci = (-c2) * yi_ref[:].astype(jnp.float32)
    for d, k in enumerate(offsets):
        segr = jax.lax.slice(xwr, (lo + k,), (lo + k + tm,))
        segi = jax.lax.slice(xwi, (lo + k,), (lo + k + tm,))
        accr = accr + srs[d] * segr - sis[d] * segi
        acci = acci + srs[d] * segi + sis[d] * segr
    ur_ref[:] = accr.astype(ur_ref.dtype)
    ui_ref[:] = acci.astype(ui_ref.dtype)
    return accr, acci, srs, sis


def _zdia_pair_kernel_carry(
    offsets, lo, hi, tm, win, W, m_total,
    data_ref, yr_ref, yi_ref, sc_ref, x_hbm,
    ur_ref, ui_ref, zr_ref, zi_ref, zlr_ref, zli_ref,
    xw0_ref, xw1_ref, zcr_ref, zci_ref, spr_ref, spi_ref,
    Pr_ref, Pi_ref, sem,
):
    """zdia pair with IN-KERNEL overlap-add on both planes — the carry
    scheme of :func:`_dia_pair_kernel_carry` applied to (zr, zi)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    accr, acci, srs, sis = _zdia_pair_head(
        offsets, lo, tm, win, m_total,
        data_ref, yr_ref, yi_ref, sc_ref, x_hbm, ur_ref, ui_ref,
        xw0_ref, xw1_ref, sem,
    )

    Pr_ref[:] = jnp.zeros((W,), jnp.float32)
    Pi_ref[:] = jnp.zeros((W,), jnp.float32)
    for d, k in enumerate(offsets):
        cr = srs[d] * accr + sis[d] * acci
        ci = srs[d] * acci - sis[d] * accr
        s0 = lo + k
        Pr_ref[s0:s0 + tm] = Pr_ref[s0:s0 + tm] + cr
        Pi_ref[s0:s0 + tm] = Pi_ref[s0:s0 + tm] + ci

    @pl.when(t > 0)
    def _():
        zr_ref[:] = zcr_ref[:]
        zi_ref[:] = zci_ref[:]
        if lo:
            zr_ref[tm - lo:tm] = zr_ref[tm - lo:tm] + Pr_ref[0:lo]
            zi_ref[tm - lo:tm] = zi_ref[tm - lo:tm] + Pi_ref[0:lo]

    if hi:
        spr_prev = spr_ref[0:hi]          # read BEFORE overwriting
        spi_prev = spi_ref[0:hi]
    zcr_ref[:] = Pr_ref[lo:lo + tm]
    zci_ref[:] = Pi_ref[lo:lo + tm]
    if hi:
        @pl.when(t > 0)
        def _():
            zcr_ref[0:hi] = zcr_ref[0:hi] + spr_prev
            zci_ref[0:hi] = zci_ref[0:hi] + spi_prev
        spr_ref[0:hi] = Pr_ref[lo + tm:lo + tm + hi]
        spi_ref[0:hi] = Pi_ref[lo + tm:lo + tm + hi]

    @pl.when(t == nt - 1)
    def _():
        zlr_ref[:] = zcr_ref[:]
        zli_ref[:] = zci_ref[:]


def _zdia_pair_kernel(
    offsets, lo, hi, tm, win, W, m_total,
    data_ref, yr_ref, yi_ref, sc_ref, x_hbm,
    ur_ref, ui_ref, zr_ref, zi_ref, xw0_ref, xw1_ref, sem
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    nd = len(offsets)
    bufs = (xw0_ref, xw1_ref)

    def window_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(tile * tm, win)], bufs[slot], sem.at[slot]
        )

    @pl.when(t == 0)
    def _():
        window_dma(0, 0).start()

    even = t % 2 == 0

    @pl.when((t + 1 < nt) & even)
    def _():
        window_dma(1, t + 1).start()

    @pl.when((t + 1 < nt) & jnp.logical_not(even))
    def _():
        window_dma(0, t + 1).start()

    @pl.when(even)
    def _():
        window_dma(0, t).wait()

    @pl.when(jnp.logical_not(even))
    def _():
        window_dma(1, t).wait()

    c1 = sc_ref[0, 0]
    c2 = sc_ref[1, 0]
    xw = jnp.where(even, xw0_ref[:], xw1_ref[:]).astype(jnp.float32) * c1
    xwr = xw[0]
    xwi = xw[1]

    ragged = m_total % tm != 0
    if ragged:
        # stripe blocks beyond m are UNDEFINED — zero them (y/x are
        # zero-padded by the caller)
        idx = t * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)[:, 0]
        valid = idx < m_total
    srs, sis = [], []
    for d in range(nd):
        r = data_ref[d, :].astype(jnp.float32)
        q = data_ref[nd + d, :].astype(jnp.float32)
        if ragged:
            r = jnp.where(valid, r, 0.0)
            q = jnp.where(valid, q, 0.0)
        srs.append(r)
        sis.append(q)

    accr = (-c2) * yr_ref[:].astype(jnp.float32)
    acci = (-c2) * yi_ref[:].astype(jnp.float32)
    for d, k in enumerate(offsets):
        segr = jax.lax.slice(xwr, (lo + k,), (lo + k + tm,))
        segi = jax.lax.slice(xwi, (lo + k,), (lo + k + tm,))
        accr = accr + srs[d] * segr - sis[d] * segi
        acci = acci + srs[d] * segi + sis[d] * segr
    ur_ref[:] = accr.astype(ur_ref.dtype)
    ui_ref[:] = acci.astype(ui_ref.dtype)

    # conjugate-transpose partials, overlap-added by the caller (see
    # _dia_pair_kernel for the static-slice read-modify-write rationale)
    zr_ref[:] = jnp.zeros((W,), zr_ref.dtype)
    zi_ref[:] = jnp.zeros((W,), zi_ref.dtype)
    for d, k in enumerate(offsets):
        cr = srs[d] * accr + sis[d] * acci
        ci = srs[d] * acci - sis[d] * accr
        s0 = lo + k
        zr_ref[s0:s0 + tm] = zr_ref[s0:s0 + tm] + cr
        zi_ref[s0:s0 + tm] = zi_ref[s0:s0 + tm] + ci


def zdia_pair(dr, di, y, win_vec, c1, c2, *, offsets, m, n, interpret=False,
              tm=None):
    """Complex product pair in ONE pass over the two stripe planes:
        u = (dr + i*di, offsets) @ (win_vec * c1)  -  c2 * y
        z = A^H u
    dr/di: (ndiag, m) f32 stripe planes; y: (m,) complex; win_vec: (n,)
    complex; c1/c2 REAL scalars. Returns (u (m,), z (n,)) complex64."""
    ks = tuple(offsets)
    kmin, kmax = min(ks), max(ks)
    if tm is None:
        # half the real pair's tiles: two planes + two components double
        # the per-tile VMEM footprint
        tm = 32768 if m >= 8_000_000 else (
            16384 if m >= 4_000_000 else (8192 if m >= 8192 else max(1024, min(m, 1024)))
        )
    nt = -(-m // tm)
    lo = max(0, -kmin)
    hi = max(0, kmax)
    win = -(-(lo + kmax + tm) // 1024) * 1024
    W = -(-(lo + tm + hi) // 1024) * 1024
    xp_len = max(lo + n, (nt - 1) * tm + win)
    xp_len = -(-xp_len // 1024) * 1024
    xp = jnp.zeros((2, xp_len), jnp.float32)
    xp = xp.at[0, lo : lo + n].set(jnp.real(win_vec).astype(jnp.float32))
    xp = xp.at[1, lo : lo + n].set(jnp.imag(win_vec).astype(jnp.float32))
    yr = jnp.zeros((nt * tm,), jnp.float32).at[:m].set(
        jnp.real(y).astype(jnp.float32))
    yi = jnp.zeros((nt * tm,), jnp.float32).at[:m].set(
        jnp.imag(y).astype(jnp.float32))
    sc = jnp.zeros((8, 128), jnp.float32)
    sc = sc.at[0, :].set(jnp.asarray(c1, jnp.float32))
    sc = sc.at[1, :].set(jnp.asarray(c2, jnp.float32))
    d2 = jnp.concatenate([dr, di], axis=0)

    # carry path (round 5): in-kernel overlap-add on both planes (see
    # dia_pair); fallback below for wide halos / n beyond the row tiles.
    if lo <= 1024 and hi <= 1024 and n <= nt * tm:
        kernel = functools.partial(
            _zdia_pair_kernel_carry, ks, lo, hi, tm, win, W, m)
        tile = lambda t: (t,)
        prev = lambda t: (jnp.maximum(t - 1, 0),)
        first = lambda t: (0,)
        ur, ui, zrm, zim, zlr, zli = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((2 * len(ks), tm), lambda t: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm,), tile, memory_space=pltpu.VMEM),
                pl.BlockSpec((tm,), tile, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((tm,), tile, memory_space=pltpu.VMEM),
                pl.BlockSpec((tm,), tile, memory_space=pltpu.VMEM),
                pl.BlockSpec((tm,), prev, memory_space=pltpu.VMEM),
                pl.BlockSpec((tm,), prev, memory_space=pltpu.VMEM),
                pl.BlockSpec((tm,), first, memory_space=pltpu.VMEM),
                pl.BlockSpec((tm,), first, memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nt * tm,), jnp.float32),
                jax.ShapeDtypeStruct((nt * tm,), jnp.float32),
                jax.ShapeDtypeStruct((nt * tm,), jnp.float32),
                jax.ShapeDtypeStruct((nt * tm,), jnp.float32),
                jax.ShapeDtypeStruct((tm,), jnp.float32),
                jax.ShapeDtypeStruct((tm,), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, win), jnp.float32),
                pltpu.VMEM((2, win), jnp.float32),
                pltpu.VMEM((tm,), jnp.float32),
                pltpu.VMEM((tm,), jnp.float32),
                pltpu.VMEM((1024,), jnp.float32),
                pltpu.VMEM((1024,), jnp.float32),
                pltpu.VMEM((W,), jnp.float32),
                pltpu.VMEM((W,), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(d2, yr, yi, sc, xp)
        ur = jax.lax.optimization_barrier(ur)
        ui = jax.lax.optimization_barrier(ui)
        zr = jax.lax.dynamic_update_slice(zrm, zlr, ((nt - 1) * tm,))
        zi = jax.lax.dynamic_update_slice(zim, zli, ((nt - 1) * tm,))
        return (jax.lax.complex(ur[:m], ui[:m]),
                jax.lax.complex(jax.lax.slice(zr, (0,), (n,)),
                                jax.lax.slice(zi, (0,), (n,))))

    kernel = functools.partial(_zdia_pair_kernel, ks, lo, hi, tm, win, W, m)
    ur, ui, zrf, zif = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((2 * len(ks), tm), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), lambda t: (t,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt * tm,), jnp.float32),
            jax.ShapeDtypeStruct((nt * tm,), jnp.float32),
            jax.ShapeDtypeStruct((nt * W,), jnp.float32),
            jax.ShapeDtypeStruct((nt * W,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win), jnp.float32),
            pltpu.VMEM((2, win), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(d2, yr, yi, sc, xp)
    ur = jax.lax.optimization_barrier(ur)
    ui = jax.lax.optimization_barrier(ui)
    zrf = jax.lax.optimization_barrier(zrf)
    zif = jax.lax.optimization_barrier(zif)
    zr = _overlap_add(zrf.reshape(nt, W), nt, tm, W, lo, n, jnp.float32)
    zi = _overlap_add(zif.reshape(nt, W), nt, tm, W, lo, n, jnp.float32)
    u = jax.lax.complex(ur[:m], ui[:m])
    z = jax.lax.complex(zr, zi)
    return u, z
