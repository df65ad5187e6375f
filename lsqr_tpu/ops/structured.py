"""Structured sparse operators — the TPU performance path for SpMV/SpMV-T.

The reference's only sparse format is COO with a serial scatter loop
(/root/reference/src/lsqr.f90:156-194). Scatter is the wrong primitive for a
vector machine: the TPU-native answer is to pick a storage layout whose
products are dense, regular, and compiler-tileable:

* DIA (diagonal/banded): each diagonal is a contiguous stripe; SpMV is a
  handful of shifted fused multiply-adds — pure VPU streaming at HBM
  bandwidth, zero gathers/scatters. The natural format for banded systems
  (finite differences, splines, time-series regularization).
* ELL (padded rows): fixed row width k; SpMV is one gather of x + a dense
  (m, k) multiply-reduce. The transpose product uses a precomputed ELL of
  A' (built once at construction) so that SpMV-T is also gather-based —
  no scatters anywhere, the layout answer to Pallas/TPU having no atomics.
* Blocked-ELL (BSR-style): dense (bh, bw) blocks in ELL layout; products
  are batches of small dense matmuls that map onto the MXU. See
  lsqr_tpu.ops.pallas_spmv for the hand-written kernels.

All operators implement the LinearOperator protocol and are exact drop-ins
for COOOperator (equivalence-tested against it).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .linop import LinearOperator

__all__ = [
    "DIAOperator",
    "dia_operator_device",
    "dia_operator",
    "DIASharedOperator",
    "dia_shared_operator",
    "ELLOperator",
    "ell_operator",
    "hyb_operator",
    "dia_pair_xla",
    "BlockELLOperator",
    "block_ell_operator",
]


# ---------------------------------------------------------------------------
# DIA — diagonal storage
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DIAOperator(LinearOperator):
    """Banded m x n matrix in diagonal storage.

    ``data[j, i] = A[i, i + offsets[j]]`` (row-aligned stripes, shape
    (ndiag, m); entries outside the matrix are zero). ``offsets`` are static
    so every shift is a compile-time constant slice — XLA fuses the whole
    matvec into a single streaming pass.
    """

    data: jax.Array    # (ndiag, m) — data[j, i] = A[i, i + offsets[j]]
    tdata: jax.Array   # (ndiag, n) — transpose stripes: A'[c, c - offsets[j]]
    m: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    offsets: tuple = dataclasses.field(metadata=dict(static=True))  # (ndiag,)
    #: None = auto (Pallas on TPU for m >= 2M, where the kernel beats the
    #: XLA fused path by ~5x; XLA below, where call overhead dominates)
    use_pallas: object = dataclasses.field(default=None, metadata=dict(static=True))

    @property
    def dtype(self):
        # bf16 STORAGE computes and returns f32 (mixed-precision mode):
        # downstream (solver vectors, dtype resolution) sees float32
        if self.data.dtype == jnp.bfloat16:
            return jnp.dtype(jnp.float32)
        return self.data.dtype

    @property
    def nnz(self) -> int:
        # stored entries (incl. structural zeros at band edges)
        return self.data.shape[0] * self.m

    @property
    def toffsets(self) -> tuple:
        return tuple(-k for k in self.offsets)

    def _pallas_selected(self, dim: int) -> bool:
        # The Pallas kernels compute in float32; routing an x64 solve through
        # them would silently degrade f64 accuracy (advisor finding, ADVICE.md
        # round 1) — the XLA path preserves the operator dtype, so f64 always
        # takes it.
        if self.data.dtype == jnp.float64:
            return False
        if self.use_pallas is None:
            return dim >= 2_000_000 and jax.default_backend() == "tpu"
        return bool(self.use_pallas)

    @property
    def prefers_bounded_loop(self) -> bool:
        # pallas products hung lax.while_loop compiles on the rounds-1-3
        # backend; the workaround is env-gated now that the backend is fixed
        # (config.bounded_loop_workaround)
        from ..config import bounded_loop_workaround

        return bounded_loop_workaround() and self._pallas_selected(
            max(self.m, self.n)
        )

    @property
    def prefers_fused(self) -> bool:
        # pays off exactly where the Pallas product kernels do; the fused
        # axpy kernels are not bf16-storage-aware (plain products are)
        if self.data.dtype == jnp.bfloat16:
            return False
        return self._pallas_selected(max(self.m, self.n))

    def fused_halfstep(self, *, forward: bool, y, win, c1, c2):
        """Fused bidiagonalization half-step (see
        ops/pallas_spmv.dia_fused_halfstep):
          forward:  A  (win*c1) - c2*y   with y (m,), win (n,)
          adjoint:  A' (win*c1) - c2*y   with y (n,), win (m,)
        Returns (out, ssq(out)).

        On TPU this uses the product+axpy kernel plus an XLA norm reduction
        (the all-in-one kernel's combined output layout trips an XLA
        stack-allocation bug at MB-scale on the current toolchain, see
        BENCHMARKS.md); elsewhere the all-in-one kernel runs in interpret
        mode (tests)."""
        from .pallas_spmv import dia_fused_halfstep, dia_matvec_axpy

        stripes = self.data if forward else self.tdata
        offs = self.offsets if forward else self.toffsets
        m_out = self.m if forward else self.n
        n_in = self.n if forward else self.m
        if jax.default_backend() == "tpu":
            out = dia_matvec_axpy(
                stripes, y, win, c1, c2, offsets=offs, m=m_out, n=n_in
            )
            ssq = jnp.sum(jnp.square(out.astype(jnp.float32)))
            return out, ssq
        return dia_fused_halfstep(
            stripes, y, win, c1, c2,
            offsets=offs, m=m_out, n=n_in, interpret=True,
        )

    @property
    def prefers_pair(self) -> bool:
        # the pair kernel reads the stripes ONCE for both products of the
        # bidiagonalization step; profitable wherever the product kernels
        # are (the adjoint reuses the forward stripes, so bf16 storage is
        # supported — compute stays f32)
        if self._pallas_selected(max(self.m, self.n)):
            return True
        # blocked XLA pair: wins over separate blocked products for large
        # f32 (21.4 vs 18.5 Gnnz/s at m=8M, BENCHMARKS.md round 3) but
        # LOSES for bf16 storage (28.5 vs 31.1 — the adjoint partials
        # outweigh the already-halved stripe reads) and is skipped for f64
        # (keep the exact two-product path)
        if self.data.dtype != jnp.float32:
            return False
        return (
            jax.default_backend() == "tpu"
            and max(self.m, self.n) >= 2_000_000
        )

    def fused_pair(self, *, y, win, c1, c2):
        """Both products of the bidiagonalization step in ONE stripe pass
        (ops/pallas_spmv.dia_pair; reference op sequence lsqr.f90:681-694):
            u_new = A (win*c1) - c2*y,     z = A' u_new
        with y (m,), win (n,). Returns (u_new, z) — z unnormalized (the
        1/beta normalization commutes with A' and is applied by the
        caller). Halves the dominant stripe HBM traffic per iteration
        vs calling the forward and adjoint kernels separately."""
        if self.data.dtype == jnp.float64:
            # the Pallas pair kernel computes in f32; routing a forced
            # pair=True x64 solve through it would silently degrade f64
            # (the round-1 advisor pattern, ADVICE.md) — compute exactly
            # with the XLA products instead.
            u = self.matvec(win * c1) - c2 * y
            return u, self.rmatvec(u)
        if self._pallas_selected(max(self.m, self.n)):
            from .pallas_spmv import dia_pair

            interpret = jax.default_backend() != "tpu"
            return dia_pair(
                self.data, y, win, c1, c2,
                offsets=self.offsets, m=self.m, n=self.n, interpret=interpret,
            )
        # non-Pallas selection (use_pallas=False, or small/CPU): the blocked
        # pure-XLA pair — one pass over each stripe block for both products
        # (measured 21.4 vs 18.5 Gnnz/s separate at m=8M f32, BENCHMARKS.md)
        return dia_pair_xla(
            self.data, y, win, c1, c2,
            offsets=self.offsets, m=self.m, n=self.n,
        )

    def matvec(self, x: jax.Array) -> jax.Array:
        if self._pallas_selected(self.m):
            from .pallas_spmv import dia_matvec

            return dia_matvec(
                self.data, x, offsets=self.offsets, m=self.m, n=self.n
            )
        return _dia_matvec_xla(self.data, x, self.offsets, self.m, self.n)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        # A' is itself a DIA matrix with negated offsets and shifted stripes
        # (precomputed as tdata) — SpMV-T is just another streaming SpMV;
        # no scatters (contrast the reference's column-scatter transpose,
        # lsqr.f90:188-192).
        if self._pallas_selected(self.n):
            from .pallas_spmv import dia_matvec

            return dia_matvec(
                self.tdata, y, offsets=self.toffsets, m=self.n, n=self.m
            )
        return _dia_matvec_xla(self.tdata, y, self.toffsets, self.n, self.m)

    @property
    def is_bf16_storage(self) -> bool:
        return self.data.dtype == jnp.bfloat16

    def todense(self) -> jax.Array:
        dense = jnp.zeros((self.m, self.n), self.dtype)
        i = jnp.arange(self.m)
        for j, k in enumerate(self.offsets):
            cols = i + k
            valid = (cols >= 0) & (cols < self.n)
            dense = dense.at[i, jnp.clip(cols, 0, self.n - 1)].add(
                jnp.where(valid, self.data[j], 0.0)
            )
        return dense


#: block size for the large-m XLA DIA path (elements). At whole-vector
#: sizes XLA stops fusing the shift-FMA chain and materializes every
#: intermediate (measured 12.5 ms/pair at m=8M vs ~1 ms of streaming);
#: statically-unrolled block slices keep each fused chain inside XLA's
#: fusion budget. Swept on v5e at m=8M/11diag: 256k ~= 128k ~= 64k >
#: 512k > 2M; at 256k the path saturates the measured memory bandwidth
#: (traffic/time == the elementwise streaming rate), so it is
#: bandwidth-optimal for the 2-pass (no-pair) formulation.
_XLA_DIA_BLOCK = 256 * 1024


def _dia_matvec_xla(data, x, offsets, m, n):
    """Pure-XLA DIA SpMV: statically shifted slice + FMA per diagonal
    (fallback / oracle for the Pallas kernel). bf16 stripes accumulate in
    f32 (the convert fuses into the FMA — HBM traffic stays bf16).

    For large m the product is computed in statically-unrolled blocks —
    the per-element FMA order (sum over diagonals in offset order) is
    IDENTICAL to the whole-vector form, so results are bitwise equal; the
    blocking exists purely so XLA keeps each shift-FMA chain in one fusion
    instead of materializing whole-vector intermediates (measured ~5x on
    v5e at m=8M, and it avoids the Pallas/Mosaic compile path entirely)."""
    ks = offsets or (0,)
    lo = max(0, -min(ks))                 # slice start lo + k >= 0
    hi = max(0, m + max(ks) - n)          # slice end lo + k + m fits
    acc_dt = jnp.float32 if data.dtype == jnp.bfloat16 else data.dtype

    if m <= _XLA_DIA_BLOCK or not offsets:
        xp = jnp.zeros((lo + n + hi,), x.dtype).at[lo : lo + n].set(x)
        y = jnp.zeros((m,), acc_dt)
        for j, k in enumerate(offsets):
            y = y + data[j].astype(acc_dt) * jax.lax.dynamic_slice(
                xp, (lo + k,), (m,)
            ).astype(acc_dt)
        return y

    block = _XLA_DIA_BLOCK
    nb = -(-m // block)
    mp = nb * block
    kmax = max(0, max(ks))
    # xp holds x at [lo, lo+n); reads go up to lo + kmax + mp
    xp_len = lo + max(n, mp + kmax)
    xp = jnp.zeros((xp_len,), x.dtype).at[lo : lo + n].set(x)
    dp = data
    if mp != m:
        dp = jnp.pad(data, ((0, 0), (0, mp - m)))
    outs = []
    for b in range(nb):
        s = b * block
        yb = jnp.zeros((block,), acc_dt)
        for j, k in enumerate(offsets):
            yb = yb + dp[j, s : s + block].astype(acc_dt) * jax.lax.slice(
                xp, (lo + k + s,), (lo + k + s + block,)
            ).astype(acc_dt)
        outs.append(yb)
    y = jnp.concatenate(outs)
    return y[:m] if mp != m else y


def dia_operator_device(
    m, n, offsets: Sequence[int], data: jax.Array, *, use_pallas=None,
    storage_dtype=None,
) -> DIAOperator:
    """Build a DIAOperator from stripes already resident on device, with the
    masking and transpose-stripe packing computed on device (jnp). Use this
    for large matrices: it avoids any host<->device transfer of the stripes
    (important on relayed/remote TPU setups where bulk transfers are slow).

    ``storage_dtype='bfloat16'`` stores the stripes in bf16 (products still
    accumulate and return f32): matrix entries are rounded to 8-bit
    mantissa at pack time, halving the dominant HBM stripe traffic — the
    TPU-native mixed-precision mode for f32-tolerant problems.
    """
    offsets = tuple(int(k) for k in offsets)
    nd = len(offsets)
    if data.shape != (nd, m):
        raise ValueError(f"data must have shape ({nd}, {m}), got {data.shape}")
    i = jnp.arange(m)
    mask = jnp.stack([(i + k >= 0) & (i + k < n) for k in offsets])
    data = data * mask.astype(data.dtype)

    # tdata[j, c] = data[j, c - k] on an n-length axis
    tdata_rows = []
    for j, k in enumerate(offsets):
        row = jnp.zeros((n,), data.dtype)
        src_lo, src_hi = max(0, -k), min(m, n - k)
        if src_hi > src_lo:
            row = row.at[src_lo + k : src_hi + k].set(data[j, src_lo:src_hi])
        tdata_rows.append(row)
    tdata = jnp.stack(tdata_rows)
    if storage_dtype is not None:
        data = data.astype(storage_dtype)
        tdata = tdata.astype(storage_dtype)
    return DIAOperator(
        data=data,
        tdata=tdata,
        m=int(m),
        n=int(n),
        offsets=offsets,
        use_pallas=use_pallas,
    )


def dia_operator(
    m, n, offsets: Sequence[int], data, *, dtype=None, use_pallas=None,
    storage_dtype=None,
) -> DIAOperator:
    """Build a DIAOperator. ``data`` has shape (len(offsets), m) with
    ``data[j, i] = A[i, i + offsets[j]]``; out-of-matrix entries must be 0
    (they are zeroed defensively here). The transpose stripe packing is
    precomputed so SpMV-T streams exactly like SpMV.
    ``storage_dtype='bfloat16'`` selects bf16 stripe STORAGE with f32
    compute (see :func:`dia_operator_device`). Complex stripes dispatch to
    the plane-split :func:`lsqr_tpu.zdia_operator`."""
    data = np.asarray(jnp.asarray(data, dtype=dtype))
    if np.iscomplexobj(data):
        if storage_dtype is not None:
            raise ValueError("storage_dtype applies to real stripes only")
        from .zdia import zdia_operator

        return zdia_operator(m, n, offsets, data, use_pallas=use_pallas)
    offsets = tuple(int(k) for k in offsets)
    if data.shape != (len(offsets), m):
        raise ValueError(
            f"data must have shape ({len(offsets)}, {m}), got {data.shape}"
        )
    i = np.arange(m)
    mask = np.stack([(i + k >= 0) & (i + k < n) for k in offsets])
    data = data * mask

    # transpose stripes: tdata[j, c] = A[c - k, c] = data[j, c - k]
    tdata = np.zeros((len(offsets), n), data.dtype)
    for j, k in enumerate(offsets):
        src_lo = max(0, -k)               # row index range [src_lo, src_hi)
        src_hi = min(m, n - k)
        if src_hi > src_lo:
            tdata[j, src_lo + k : src_hi + k] = data[j, src_lo:src_hi]
    data_j, tdata_j = jnp.asarray(data), jnp.asarray(tdata)
    if storage_dtype is not None:
        data_j = data_j.astype(storage_dtype)
        tdata_j = tdata_j.astype(storage_dtype)
    return DIAOperator(
        data=data_j,
        tdata=tdata_j,
        m=int(m),
        n=int(n),
        offsets=offsets,
        use_pallas=use_pallas,
    )




# ---------------------------------------------------------------------------
# DIA with SHARED stripes — one padded array serves both products
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DIASharedOperator(LinearOperator):
    """Banded m x n matrix storing ONE zero-padded stripe array that serves
    both the forward and the adjoint product — no packed transpose copy, so
    operator HBM is HALF of :class:`DIAOperator`'s (the largest bandable
    problem per chip doubles).

    ``dp[d, H + i] = A[i, i + offsets[d]]`` with halo ``H = max(|k|)``;
    both products are static per-diagonal slices of (stripe, vector)
    windows (ops/pallas_spmv.dia_product_shared). Stripe traffic per
    product matches the packed layout (+ the ~2H/tile window overlap),
    so throughput is on par — and since round 5's carry pair kernels the
    shared pair is FASTER than the packed one (112-125 vs 104-106
    Gnnz/s at 92M nnz), making this the f32 default in
    ``auto_operator``. Trade-offs: the iteration megakernels require the
    packed layout, and the distributed DIA row shards accept this class
    but repack each shard's row slice in packed form (via ``data``).
    """

    dp: jax.Array      # (ndiag * Lp,) FLAT padded shared stripes
    m: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    H: int = dataclasses.field(metadata=dict(static=True))
    use_pallas: object = dataclasses.field(default=None, metadata=dict(static=True))

    @property
    def dtype(self):
        if self.dp.dtype == jnp.bfloat16:
            return jnp.dtype(jnp.float32)
        return self.dp.dtype

    @property
    def nnz(self) -> int:
        return len(self.offsets) * self.m

    @property
    def Lp(self) -> int:
        return self.dp.shape[0] // len(self.offsets)

    @property
    def data(self) -> jax.Array:
        """The unpadded row-aligned stripes (lazy reshape+slice — fuses
        under jit; kept for parity with DIAOperator introspection)."""
        nd = len(self.offsets)
        return jax.lax.slice(
            self.dp.reshape(nd, self.Lp), (0, self.H), (nd, self.H + self.m)
        )

    def _pallas_selected(self, dim: int) -> bool:
        if self.dp.dtype == jnp.float64:
            return False
        if self.use_pallas is None:
            return dim >= 2_000_000 and jax.default_backend() == "tpu"
        return bool(self.use_pallas)

    @property
    def prefers_bounded_loop(self) -> bool:
        from ..config import bounded_loop_workaround

        return bounded_loop_workaround() and self._pallas_selected(
            max(self.m, self.n)
        )

    @property
    def prefers_fused(self) -> bool:
        # the shared-layout product+axpy kernel covers the fused path
        # (ops/pallas_spmv.dia_product_shared_axpy); bf16 stripes keep the
        # plain products like the packed operator
        if self.dp.dtype == jnp.bfloat16:
            return False
        return self._pallas_selected(max(self.m, self.n))

    def fused_halfstep(self, *, forward: bool, y, win, c1, c2):
        """Fused bidiagonalization half-step on the shared stripes:
          forward:  A  (win*c1) - c2*y   with y (m,), win (n,)
          adjoint:  A' (win*c1) - c2*y   with y (n,), win (m,)
        Returns (out, ssq(out)) — product+axpy in one streaming pass plus
        an XLA norm reduction (the same split the packed operator uses on
        TPU; see DIAOperator.fused_halfstep)."""
        from .pallas_spmv import dia_product_shared_axpy

        out = dia_product_shared_axpy(
            self.dp, win, y, c1, c2, offsets=self.offsets, m=self.m,
            n=self.n, adjoint=not forward,
            interpret=jax.default_backend() != "tpu",
        )
        ssq = jnp.sum(jnp.square(out.astype(jnp.float32)))
        return out, ssq

    @property
    def prefers_pair(self) -> bool:
        # same profitability condition as the packed operator; the shared
        # layout's zero-padded stripes make the pair kernel mask-free
        return self._pallas_selected(max(self.m, self.n))

    def fused_pair(self, *, y, win, c1, c2):
        """Both bidiagonalization products in ONE pass over the SHARED
        stripes (ops/pallas_spmv.dia_pair_shared):
            u_new = A (win*c1) - c2*y,     z = A' u_new
        with y (m,), win (n,). Combines the layout's halved operator HBM
        with the pair's halved per-iteration stripe traffic."""
        if self.dp.dtype == jnp.float64:
            # f32 kernel — keep forced-pair x64 solves exact (see
            # DIAOperator.fused_pair)
            u = self.matvec(win * c1) - c2 * y
            return u, self.rmatvec(u)
        from .pallas_spmv import dia_pair_shared

        return dia_pair_shared(
            self.dp, win, y, c1, c2, offsets=self.offsets, m=self.m,
            n=self.n, interpret=jax.default_backend() != "tpu",
        )

    def _product_xla(self, vec, adjoint: bool):
        ks = self.offsets
        H = self.H
        dim_out = self.n if adjoint else self.m
        dim_in = self.m if adjoint else self.n
        acc_dt = jnp.float32 if self.dp.dtype == jnp.bfloat16 else self.dp.dtype
        Lp = self.Lp
        vecp = jnp.zeros((Lp,), vec.dtype).at[H : H + dim_in].set(vec)
        out = jnp.zeros((dim_out,), acc_dt)
        for d, k in enumerate(ks):
            s = (H - k if adjoint else H) + d * Lp
            sv = H - k if adjoint else H + k
            seg_d = jax.lax.slice(self.dp, (s,), (s + dim_out,))
            seg_v = jax.lax.slice(vecp, (sv,), (sv + dim_out,))
            out = out + seg_d.astype(acc_dt) * seg_v.astype(acc_dt)
        return out

    def matvec(self, x: jax.Array) -> jax.Array:
        if self._pallas_selected(self.m):
            from .pallas_spmv import dia_product_shared

            return dia_product_shared(
                self.dp, x, offsets=self.offsets, m=self.m, n=self.n,
                adjoint=False, interpret=jax.default_backend() != "tpu",
            )
        return self._product_xla(x, adjoint=False)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        if self._pallas_selected(self.n):
            from .pallas_spmv import dia_product_shared

            return dia_product_shared(
                self.dp, y, offsets=self.offsets, m=self.m, n=self.n,
                adjoint=True, interpret=jax.default_backend() != "tpu",
            )
        return self._product_xla(y, adjoint=True)

    @property
    def is_bf16_storage(self) -> bool:
        return self.dp.dtype == jnp.bfloat16

    def todense(self) -> jax.Array:
        dense = jnp.zeros((self.m, self.n), self.dtype)
        i = jnp.arange(self.m)
        data = self.data
        for j, k in enumerate(self.offsets):
            cols = i + k
            valid = (cols >= 0) & (cols < self.n)
            dense = dense.at[i, jnp.clip(cols, 0, self.n - 1)].add(
                jnp.where(valid, data[j], 0.0)
            )
        return dense


def dia_shared_operator(
    m, n, offsets: Sequence[int], data, *, dtype=None, use_pallas=None,
    storage_dtype=None,
) -> DIASharedOperator:
    """Build a :class:`DIASharedOperator` (half the HBM of
    :func:`dia_operator`). ``data`` has shape (len(offsets), m) as in
    `dia_operator`; it may be a device array — the padding is a single
    on-device copy (no transpose packing pass at all)."""
    from .pallas_spmv import _shared_tm, dia_shared_geometry

    offsets = tuple(int(k) for k in offsets)
    nd = len(offsets)
    data = jnp.asarray(data, dtype=dtype)
    if data.shape != (nd, m):
        raise ValueError(f"data must have shape ({nd}, {m}), got {data.shape}")
    i = jnp.arange(m)
    mask = jnp.stack([(i + k >= 0) & (i + k < n) for k in offsets])
    data = data * mask.astype(data.dtype)
    if storage_dtype is not None:
        data = data.astype(storage_dtype)
    H, Lp = dia_shared_geometry(offsets, m, n, _shared_tm(m), _shared_tm(n))
    dp = jnp.zeros((nd, Lp), data.dtype).at[:, H : H + m].set(data).reshape(-1)
    return DIASharedOperator(
        dp=dp, m=int(m), n=int(n), offsets=offsets, H=H,
        use_pallas=use_pallas,
    )


# ---------------------------------------------------------------------------
# ELL — padded-row storage (gather-only products)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ELLOperator(LinearOperator):
    """m x n sparse matrix in ELL (padded-row) layout, with a precomputed
    transpose packing so BOTH products are gather-based (no scatters —
    the TPU answer to the reference's column-scatter transpose loop,
    lsqr.f90:188-192).

    vals/cols: (m, k) forward packing (padded entries: val 0, col 0).
    tvals/trows: (n, kt) packing of A'.
    """

    vals: jax.Array
    cols: jax.Array
    tvals: jax.Array
    trows: jax.Array
    m: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def nnz(self) -> int:
        return self.vals.shape[0] * self.vals.shape[1]

    def matvec(self, x: jax.Array) -> jax.Array:
        return jnp.sum(self.vals * x[self.cols], axis=1)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        return jnp.sum(self.tvals * y[self.trows], axis=1)

    def todense(self) -> jax.Array:
        dense = jnp.zeros((self.m, self.n), self.dtype)
        rows = jnp.repeat(jnp.arange(self.m), self.vals.shape[1])
        return dense.at[rows, self.cols.reshape(-1)].add(self.vals.reshape(-1))


def ell_operator(m, n, vals, rows, cols, *, dtype=None) -> ELLOperator:
    """Build an ELLOperator (plus its transpose packing) from COO triplets.

    Packing runs in the native C++ runtime (lsqr_tpu.native) when available,
    with a vectorized numpy fallback."""
    from .. import native

    vals = np.asarray(vals, dtype=dtype if dtype else None)
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    fv, fc = native.ell_pack(rows, cols, vals, m)
    tv, tr = native.ell_pack(cols, rows, vals, n)
    return ELLOperator(
        vals=jnp.asarray(fv),
        cols=jnp.asarray(fc),
        tvals=jnp.asarray(tv),
        trows=jnp.asarray(tr),
        m=int(m),
        n=int(n),
    )


#: pair-path block (swept at m=8M f32: 512k 21.4 > 256k 21.2 > 1M 20.9
#: Gnnz/s; larger blocks also compile faster — 38s vs 57s)
_XLA_PAIR_BLOCK = 512 * 1024


def dia_pair_xla(data, y, win, c1, c2, *, offsets, m, n,
                 block=_XLA_PAIR_BLOCK):
    """Blocked pure-XLA fused product pair (real dtypes):

        u = DIA(data, offsets) @ (win * c1) - c2 * y
        z = DIA(data, offsets)' @ u

    computed block by block so each stripe block feeds BOTH the forward
    FMA chain and the adjoint overlap-add while it is hot — the XLA
    analogue of the Pallas ``dia_pair`` kernel (which needs the fragile
    Mosaic compile path at large m). The adjoint is emitted as per-block
    shifted partials accumulated with static-index adds (scatter-free,
    like the Pallas kernel's overlap-add; reference op sequence
    lsqr.f90:681-694). Returns (u (m,), z (n,))."""
    ks = tuple(offsets) or (0,)
    kmin, kmax = min(ks), max(ks)
    lo = max(0, -kmin)
    acc_dt = jnp.float32 if data.dtype == jnp.bfloat16 else data.dtype
    nb = -(-m // block)
    mp = nb * block
    xv = win * c1
    xp_len = lo + max(n, mp + max(0, kmax))
    xp = jnp.zeros((xp_len,), xv.dtype).at[lo : lo + n].set(xv)
    yp = jnp.zeros((mp,), y.dtype).at[:m].set(y)
    dp = data
    if mp != m:
        dp = jnp.pad(data, ((0, 0), (0, mp - m)))
    span = kmax - kmin
    zp_len = lo + max(n, mp + max(0, kmax)) + span
    zp = jnp.zeros((zp_len,), acc_dt)
    u_blocks = []
    for b in range(nb):
        s = b * block
        ub = (-c2) * jax.lax.slice(yp, (s,), (s + block,)).astype(acc_dt)
        dslices = []
        for j, k in enumerate(offsets):
            dj = dp[j, s : s + block].astype(acc_dt)
            dslices.append(dj)
            ub = ub + dj * jax.lax.slice(
                xp, (lo + k + s,), (lo + k + s + block,)
            ).astype(acc_dt)
        u_blocks.append(ub)
        # adjoint partial of this block: z[i + k_j] += data[j, i] * u[i]
        zb = jnp.zeros((block + span,), acc_dt)
        for j, k in enumerate(offsets):
            zb = zb.at[k - kmin : k - kmin + block].add(dslices[j] * ub)
        s0 = s + kmin + lo  # >= 0: lo covers the most negative offset
        zp = zp.at[s0 : s0 + block + span].add(zb)
    u = jnp.concatenate(u_blocks)[:m]
    z = jax.lax.slice(zp, (lo,), (lo + n,))
    return u, z


def hyb_operator(m, n, vals, rows, cols, *, width=None, dtype=None):
    """HYB (hybrid ELL + COO) operator for POWER-LAW row distributions.

    The classic failure mode of pure ELL is a few heavy rows inflating the
    padded width for every row (the reason ``auto_operator`` documents a
    padding blowup for true power-law patterns). HYB caps the ELL width:
    each row's first ``width`` entries go to the streaming ELL part, the
    heavy-row spill becomes a (small) COO remainder handled by
    segment-sum — composed with :class:`~lsqr_tpu.ops.compose.SumOperator`
    so each part keeps its own product path. Reference anchor: the COO
    scatter kernels this bounds, lsqr.f90:168-172, 188-192.

    ``width=None`` picks the cost-balanced width: the smallest w where the
    padded ELL volume m*w plus SPILL_COST x the spilled entries stops
    improving. SPILL_COST is calibrated from MEASUREMENT, not theory:
    on TPU the ELL gather and the COO scatter both hit XLA's scalar
    gather/scatter floor (0.12 vs 0.10 Gnnz/s, round 3), so a spilled
    entry costs ~1.2x a streamed slot in time and 1.5x in bytes
    (12 vs 8 B) — SPILL_COST = 1.5 balances the two. On TPU, HYB is
    therefore a MEMORY format (it caps ELL's power-law padding blowup),
    not a speed format: route general sparsity with n <= 4096 to
    :func:`lsqr_tpu.wcoo_operator` instead (~25x faster, round 4); HYB
    remains the fallback for large-n unstructured patterns. (A direct
    HYB benchmark at 10M-nnz Zipf(1.1) could not be banked in round 4:
    the relay's remote-compile helper rejects the fori-of-gather/scatter
    graph and eager steps exceed the bench budget at the ~0.1 Gnnz/s
    floor.)
    """
    from .compose import add_operators
    from .coo import coo_operator

    vals = np.asarray(vals, dtype=dtype if dtype else None)
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    if np.iscomplexobj(vals):
        # the ELL part's native packing is real-only (silently casting
        # would drop imaginary parts — ADVICE.md round 3); complex general
        # sparsity takes the conj-correct COO path, as auto_operator does
        raise ValueError(
            "hyb_operator is real-only; complex matrices use the COO path "
            "(coo_operator / auto_operator)"
        )
    if vals.size == 0:
        return coo_operator(m, n, vals, rows, cols, dtype=dtype)

    order = np.lexsort((cols, rows))
    rows_s, cols_s, vals_s = rows[order], cols[order], vals[order]
    counts = np.bincount(rows_s, minlength=m)
    row_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(len(vals_s)) - np.repeat(row_start, counts)

    if width is None:
        # measured on TPU: spilled COO entry ~ 1.2x a streamed ELL slot
        # in time (both at the XLA gather/scatter floor) and 1.5x in
        # bytes; round 3's assumed 8x came from a GPU-era mental model
        SPILL_COST = 1.5
        wmax = int(counts.max())
        best_w, best_cost = wmax, m * wmax
        # cost(w) = m*w + S*spilled(w) is convex piecewise-linear with
        # breakpoints at the distinct row lengths; the integer minimum is
        # at a breakpoint OR at the w=1 boundary (one dense row in an
        # otherwise sparse matrix must pick w=1, not w=max row length —
        # ADVICE.md round 3), so include 1 in the candidate set
        for w in np.union1d([1], np.unique(counts[counts > 0])):
            w = int(w)
            spilled = int(np.maximum(counts - w, 0).sum())
            cost = m * w + SPILL_COST * spilled
            if cost < best_cost:
                best_w, best_cost = w, cost
        width = max(1, best_w)

    main = rank < width
    E = ell_operator(m, n, vals_s[main], rows_s[main], cols_s[main],
                     dtype=dtype)
    if bool(np.all(main)):
        return E
    C = coo_operator(m, n, vals_s[~main], rows_s[~main], cols_s[~main],
                     dtype=dtype)
    return add_operators([E, C])


# ---------------------------------------------------------------------------
# Blocked-ELL — dense blocks for the MXU
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockELLOperator(LinearOperator):
    """Block-sparse m x n matrix: dense (bh, bw) blocks in ELL layout.

    blocks:  (mb, kb, bh, bw) — kb blocks per block-row (padded with zeros).
    bcols:   (mb, kb) block-column indices.
    tblocks/tbrows: the transpose packing (nb, kt, bw, bh).

    Products run as batched small matmuls; on TPU the Pallas kernel in
    lsqr_tpu.ops.pallas_spmv streams blocks through VMEM onto the MXU.
    ``use_pallas`` selects the kernel (falls back to pure-XLA einsum when
    False or on non-TPU backends).
    """

    blocks: jax.Array
    bcols: jax.Array
    tblocks: jax.Array
    tbrows: jax.Array
    m: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    #: None = auto (XLA einsum — measured at/above the Pallas kernel at all
    #: scales on v5e, see BENCHMARKS.md). True forces the windowed Pallas
    #: kernel (HBM-resident x, no VMEM-size restriction), False forces XLA.
    use_pallas: object = dataclasses.field(default=None, metadata=dict(static=True))

    @property
    def dtype(self):
        return self.blocks.dtype

    @property
    def bh(self) -> int:
        return self.blocks.shape[2]

    @property
    def bw(self) -> int:
        return self.blocks.shape[3]

    @property
    def nnz(self) -> int:
        return int(np.prod(self.blocks.shape))

    def _matvec_xla(self, x, blocks, bcols, out_len, blk_w):
        mb, kb = bcols.shape
        # gather x block segments: (mb, kb, bw)
        xb = x.reshape(-1, blk_w)[bcols]
        # (mb, kb, bh, bw) @ (mb, kb, bw) -> sum over kb -> (mb, bh)
        yb = jnp.einsum(
            "rkij,rkj->ri", blocks, xb, preferred_element_type=self.dtype
        )
        return yb.reshape(-1)[:out_len]

    def _pallas_selected(self) -> bool:
        # f64 never routes through the kernels (they compute in f32)
        if self.dtype == jnp.float64:
            return False
        if self.use_pallas is None:
            # auto: XLA. Measured on v5e (BENCHMARKS.md): the einsum path is
            # at or slightly above the windowed Pallas kernel at every scale
            # tried (m=1M kb=4: 69.2 vs 69.4; m=8M kb=2: 94.6 vs 90.1
            # Gnnz/s) — the x-gather it materializes is only 1/bh of the
            # block traffic, so there is nothing for the kernel to win back.
            # The windowed kernel remains available (use_pallas=True) as the
            # HBM-resident-x path with no VMEM-size restriction.
            return False
        return bool(self.use_pallas)

    @property
    def prefers_bounded_loop(self) -> bool:
        from ..config import bounded_loop_workaround

        return bounded_loop_workaround() and self._pallas_selected()

    def matvec(self, x: jax.Array) -> jax.Array:
        xp = _pad_to(x, self.tblocks.shape[0] * self.bw)
        if self._pallas_selected():
            from .pallas_spmv import block_ell_matvec_windowed

            return block_ell_matvec_windowed(self.blocks, self.bcols, xp)[: self.m]
        return self._matvec_xla(xp, self.blocks, self.bcols, self.m, self.bw)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        yp = _pad_to(y, self.blocks.shape[0] * self.bh)
        if self._pallas_selected():
            from .pallas_spmv import block_ell_matvec_windowed

            return block_ell_matvec_windowed(self.tblocks, self.tbrows, yp)[: self.n]
        return self._matvec_xla(yp, self.tblocks, self.tbrows, self.n, self.bh)

    @property
    def prefers_pair(self) -> bool:
        # pair=True is supported on both substrates (kernel and einsum) but
        # not auto-routed: the windowed pair KERNEL halves block traffic yet
        # is pending on-chip verification (multi-output + transposed MXU
        # dots), and the einsum pair has no traffic advantage over separate
        # products. Flip after a TPU A/B (BENCHMARKS.md).
        return False

    def fused_pair(self, *, y, win, c1, c2):
        """Both products of the bidiagonalization step for a BlockELL
        matrix: u_new = A(win*c1) - c2*y and z = A'u_new. The adjoint is
        assembled WITHOUT the transpose packing: per-block partials
        zp[r, j] = blocks[r, j]' @ u_r (blocks read once in the Pallas
        windowed form) + a block-level segment-sum over bcols — mb*kb rows
        of bw, i.e. 1/bh of the block traffic (contrast the reference's
        per-entry column scatter, lsqr.f90:188-192)."""
        mb, kb, bh, bw = self.blocks.shape
        nb = self.tblocks.shape[0]
        xp = _pad_to(win, nb * bw)
        yp = _pad_to(y, mb * bh)
        if self._pallas_selected():
            from .pallas_spmv import block_ell_pair_windowed

            u, zp = block_ell_pair_windowed(
                self.blocks, self.bcols, xp, yp, c1, c2,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            xb = xp.reshape(nb, bw)[self.bcols] * c1   # (mb, kb, bw)
            ub = jnp.einsum(
                "rkij,rkj->ri", self.blocks, xb,
                preferred_element_type=self.dtype,
            ) - c2 * yp.reshape(mb, bh)
            u = ub.reshape(-1)
            zp = jnp.einsum(
                "rkij,ri->rkj", self.blocks, ub,
                preferred_element_type=self.dtype,
            )
        z = jax.ops.segment_sum(
            zp.reshape(mb * kb, bw).astype(self.dtype),
            self.bcols.reshape(-1), num_segments=nb,
        ).reshape(-1)
        return u[: self.m], z[: self.n]

    def todense(self) -> jax.Array:
        mb, kb, bh, bw = self.blocks.shape
        dense = np.zeros((mb * bh, self.tblocks.shape[0] * bw), self.blocks.dtype)
        bcols = np.asarray(self.bcols)
        blocks = np.asarray(self.blocks)
        for r in range(mb):
            for k in range(kb):
                c = int(bcols[r, k])
                dense[r * bh : (r + 1) * bh, c * bw : (c + 1) * bw] += blocks[r, k]
        return jnp.asarray(dense[: self.m, : self.n])


def _pad_to(x: jax.Array, length: int) -> jax.Array:
    if x.shape[0] == length:
        return x
    return jnp.zeros((length,), x.dtype).at[: x.shape[0]].set(x)


def block_ell_operator(
    m, n, vals, rows, cols, *, block=(128, 128), dtype=None, use_pallas=None
) -> BlockELLOperator:
    """Build a BlockELLOperator from COO triplets by snapping nonzeros into
    dense (bh, bw) blocks. Efficient when the sparsity pattern is blocky
    (banded, block-structured); a uniformly random pattern will densify.
    """
    from .. import native

    bh, bw = block
    vals = np.asarray(vals, dtype=dtype if dtype else None)
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    mb = -(-m // bh)
    nb = -(-n // bw)
    nb_all = max(nb, mb)
    fb, fc = native.block_pack(rows, cols, vals, mb, bh, bw, nb_all)
    tb, tr = native.block_pack(cols, rows, vals, nb, bw, bh, nb_all)
    return BlockELLOperator(
        blocks=jnp.asarray(fb),
        bcols=jnp.asarray(fc),
        tblocks=jnp.asarray(tb),
        tbrows=jnp.asarray(tr),
        m=int(m),
        n=int(n),
        use_pallas=use_pallas,
    )
