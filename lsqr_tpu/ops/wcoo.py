"""WCOO operator — general (random) sparsity made TPU-fast for small n.

Until round 4 every general-sparsity matrix (no banded/jitter/block
structure) ran through COO segment-sum at ~0.1 Gnnz/s — XLA's TPU
gather/scatter lowering is effectively scalar (round-3 verdict missing
#3; reference anchor lsqr.f90:156-194). WCOO re-lays the matrix out so
that every data-dependent access in both products maps to the TPU's
actual fast primitives (the 128-lane crossbar, MXU contractions, and
dynamic slices) — see :mod:`lsqr_tpu.ops.pallas_wcoo` for the kernel
design.

Scope: real f32, n <= 4096 (x and the z accumulator must be
VMEM-resident, and the full-range gather is an n/128-way crossbar
select). That is the tall-skinny least-squares regime — the natural
LSQR workload — and it composes with 2-D column sharding
(parallel/sharding.py), which hands each device an n/devices slice:
a sharded square problem routes each shard through WCOO. Patterns the
packer refuses (heavy >~900-entry rows inside one 128-row window, or
128 consecutive entries spanning >~900 rows, i.e. mostly-empty row
ranges) fall back to the COO path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .coo import COOOperator, coo_operator
from .linop import LinearOperator
from .pallas_wcoo import CR, wcoo_adjoint, wcoo_forward, wcoo_pair

__all__ = ["WCOOOperator", "WCOOPacked", "WCOOPackError", "wcoo_operator"]


class WCOOPackError(ValueError):
    """The sparsity pattern violates a WCOO window constraint."""


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WCOOPacked:
    """Device-side WCOO layout (see pallas_wcoo module docstring)."""

    vals: jax.Array   # (NC, EMAX) f32, col-sorted within each subtile
    idx: jax.Array    # (NC, EMAX) int32: col | rowlocal << 12 (stored order)
    vals_r: jax.Array  # (NC, EMAX) f32, plain row-sorted copy (forward)
    col_r: jax.Array   # (NC, EMAX) int32, columns in row-sorted order
    ep: jax.Array     # (NC, EB * n_pad) int32: per-subtile column
                      # boundary table, (# entries with col <= d) - 1
    gpe: jax.Array    # (NC, CR) int32: last entry pos of rows <= r (-1 none)
    ugb: jax.Array    # (NC, 1, EB) int32: u-window base per entry subtile
    bnb: jax.Array    # (NC, 1, 128) int32: S-window base per row sublane-row
    m: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    m_pad: int = dataclasses.field(metadata=dict(static=True))
    nc: int = dataclasses.field(metadata=dict(static=True))
    eb: int = dataclasses.field(metadata=dict(static=True))
    xs: int = dataclasses.field(metadata=dict(static=True))
    #: boundary-gather window count: the S-gather walks kb 1024-entry
    #: windows (kb = ceil(max 128-row entry span / 1024), <= 7)
    kb: int = dataclasses.field(default=1, metadata=dict(static=True))
    #: u-gather window rows: each subtile's rows span <= ku 128-row
    #: sublane rows from its base (ku = ceil((rmax - base + 1)/128),
    #: typically 2-3; up to _KU_MAX=16 for thin 2-D blocks) — the
    #: adjoint's gather loops ku per-sublane-row slices
    ku: int = dataclasses.field(default=8, metadata=dict(static=True))


#: window slack reserved for the 128-alignment of window bases
_SPAN = 1024 - 128
#: max boundary windows (the subtile-base T-gather covers kb+1 <= 8
#: consecutive subtiles with one dynamic slice)
_KB_MAX = 7
#: max u-gather window rows per subtile (128 rows each): 16 allows
#: per-block densities down to ~0.5 entries/row (thin 2-D column blocks)
_KU_MAX = 16


def _vmem_guard(eb, npad):
    """Refuse packs whose per-chunk kernel blocks would blow the ~16 MiB
    scoped VMEM at compile time (measured round 5: eb=111 at npad=4096
    demands 21.18 MiB — Mosaic stack OOM; eb=80 at npad=2048 runs at
    13.9 MiB). The empirical fit is ~(158 KiB + 8*npad) per subtile
    (double-buffered entry planes + ep table + scratch + pipeline
    overhead); cap the estimate at 15 MiB so auto_operator falls back
    instead of the user hitting a compile error."""
    demand = eb * (158_000 + 8 * npad)
    if demand > 15 * (1 << 20):
        raise WCOOPackError(
            f"chunk density too high: {eb} entry subtiles at n_pad "
            f"{npad} would need ~{demand / (1 << 20):.0f} MiB of VMEM "
            f"(> ~16 MiB scoped limit); use more rows per entry or a "
            f"blocked/COO format"
        )


def wcoo_pack(m, n, vals, rows, cols, *, force_emax=None,
              force_kb=None, force_ku=None) -> WCOOPacked:
    """Build the WCOO layout from (unsorted) COO triplets.

    ``force_emax``/``force_kb`` pin the padded entry capacity and the
    boundary window count (so per-device shards of a row-partitioned
    solve share one static shape — parallel/sharding.py); packing fails
    if the data needs more.

    Raises :class:`WCOOPackError` when n > 4096 or a window constraint
    fails (callers fall back to the COO path)."""
    if n > 4096:
        raise WCOOPackError(f"WCOO requires n <= 4096, got {n}")
    vals = np.asarray(vals, np.float32)
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    nnz = vals.size
    if nnz == 0:
        raise WCOOPackError("empty matrix")

    nc = max(1, -(-m // CR))
    m_pad = nc * CR
    xs = max(1, -(-n // 128))
    npad = xs * 128
    counts0 = np.bincount(rows // CR, minlength=nc)
    emax = int(-(-max(1, int(counts0.max())) // 1024) * 1024)
    if force_emax is not None:
        if emax > force_emax:
            raise WCOOPackError(
                f"chunk needs {emax} entry slots > forced {force_emax}")
        emax = int(force_emax)
    eb = emax // 1024
    _vmem_guard(eb, npad)

    # ---- native fast path (round-5 item 8): the per-chunk pipeline in
    # thread-parallel C++ (native/sparse_pack.cpp lsqr_wcoo_pack),
    # bit-identical to the numpy loop below — measured ~10x at 10M nnz
    # and it removes the global lexsort too (chunks sort independently).
    from .. import native

    try:
        nat = native.wcoo_pack_chunks(rows, cols, vals, nc, emax, npad,
                                      CR, _KU_MAX, _KB_MAX)
    except ValueError as e:
        raise WCOOPackError(str(e)) from None
    if nat is not None:
        return WCOOPacked(
            vals=jnp.asarray(nat["vals_p"]),
            idx=jnp.asarray(nat["col_p"] | (nat["rowl_p"] << 12)),
            vals_r=jnp.asarray(nat["vals_r"]),
            col_r=jnp.asarray(nat["col_r"]),
            ep=jnp.asarray(nat["ep"]),
            gpe=jnp.asarray(nat["gpe"]),
            ugb=jnp.asarray(nat["ugb"]),
            bnb=jnp.asarray(nat["bnb"]),
            m=int(m), n=int(n), m_pad=int(m_pad), nc=int(nc),
            eb=int(eb), xs=int(xs),
            kb=int(min(max(nat["kb_req"], force_kb or 1), eb)),
            ku=int(max(nat["ku_req"], force_ku or 1)),
        )

    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    chunk_of = rows // CR
    cstart = np.searchsorted(chunk_of, np.arange(nc))
    cend = np.searchsorted(chunk_of, np.arange(nc), side="right")

    npad = xs * 128
    vals_p = np.zeros((nc, emax), np.float32)
    col_p = np.zeros((nc, emax), np.int32)
    rowl_p = np.zeros((nc, emax), np.int32)
    vals_r = np.zeros((nc, emax), np.float32)
    col_r = np.zeros((nc, emax), np.int32)
    ep_p = np.zeros((nc, eb * npad), np.int32)
    gpe = np.zeros((nc, CR), np.int64)
    ugb = np.zeros((nc, 1, eb), np.int32)
    bnb = np.zeros((nc, 1, CR // 128), np.int32)
    kb_req = 1
    ku_req = 1

    for t in range(nc):
        st, e = int(cstart[t]), int(cend[t])
        k = e - st
        vals_p[t, :k] = vals[st:e]
        col_p[t, :k] = cols[st:e]
        rl = (rows[st:e] - t * CR).astype(np.int32)
        rowl_p[t, :k] = rl
        # zero-valued padding entries sit on the LAST real row (keeps
        # rowl sorted, window spans tight, and that row's sum unchanged)
        if k and k < emax:
            rowl_p[t, k:] = rl[-1]
        cnt = np.bincount(rowl_p[t], minlength=CR)
        # cap at the last REAL entry: the zero padding never changes the
        # prefix value, and pointing past it would inflate the window span
        g = np.minimum(np.cumsum(cnt) - 1, k - 1)   # in [-1, emax)
        gpe[t] = g

        # ---- u-gather window bases (vectorized over subtiles) ----
        R2 = rowl_p[t].reshape(eb, 1024)
        rmin = R2[:, 0].astype(np.int64)     # sorted within chunk
        rmax = R2[:, -1].astype(np.int64)
        base_u = rmin & ~127
        need_u = (-(-(rmax - base_u + 1) // 128)).astype(np.int64)
        if need_u.max() > _KU_MAX:
            i = int(need_u.argmax())
            raise WCOOPackError(
                f"row span {int(rmax[i] - rmin[i])} in one entry subtile "
                f"exceeds {_KU_MAX} 128-row u-window slices "
                f"(chunk {t}, subtile {i})"
            )
        ugb[t, 0, :] = base_u.astype(np.int32)
        ku_req = max(ku_req, int(need_u.max()))

        # ---- within-subtile column sort + row->stored permutation ----
        C2 = col_p[t].reshape(eb, 1024)
        V2 = vals_p[t].reshape(eb, 1024)
        vals_r[t] = vals_p[t]
        col_r[t] = col_p[t]
        oc = np.argsort(C2, axis=1, kind="stable")
        C2s = np.take_along_axis(C2, oc, axis=1)
        col_p[t] = C2s.reshape(-1)
        vals_p[t] = np.take_along_axis(V2, oc, axis=1).reshape(-1)
        rowl_p[t] = np.take_along_axis(R2, oc, axis=1).reshape(-1)

        # ---- per-subtile column boundary tables (one bincount) ----
        flat = (np.arange(eb)[:, None] * npad + C2s).reshape(-1)
        hist = np.bincount(flat, minlength=eb * npad).reshape(eb, npad)
        ep_p[t] = (np.cumsum(hist, axis=1) - 1).reshape(-1)

        # ---- boundary window bases per 128-row sublane-row ----
        # (gpe monotone; kb 1024-entry windows cover spans up to
        # kb*1024-128; beyond _KB_MAX the pattern is refused)
        G2 = g.reshape(CR // 128, 128)
        last = G2[:, -1]
        first = np.where(G2 >= 0, G2, np.int64(1) << 60).min(axis=1)
        first = np.where(first == (np.int64(1) << 60),
                         np.maximum(last, 0), first)
        span = last - first
        need = np.maximum(1, -(-(span + 128) // 1024))
        if need.max() > _KB_MAX:
            j = int(need.argmax())
            raise WCOOPackError(
                f"entry span {int(span[j])} under 128 rows exceeds "
                f"{_KB_MAX} 1024-entry S-windows (chunk {t}, "
                f"rows {j * 128}..)"
            )
        kb_req = max(kb_req, int(need.max()))
        base = np.maximum(0, last - (need * 1024 - 1))
        base = -(-base // 128) * 128            # round UP (keeps cover)
        bnb[t, 0, :] = np.minimum(base, max(0, emax - 1024)).astype(np.int32)

    return WCOOPacked(
        vals=jnp.asarray(vals_p),
        idx=jnp.asarray(col_p | (rowl_p << 12)),
        vals_r=jnp.asarray(vals_r),
        col_r=jnp.asarray(col_r),
        ep=jnp.asarray(ep_p),
        gpe=jnp.asarray(gpe.astype(np.int32)),
        ugb=jnp.asarray(ugb),
        bnb=jnp.asarray(bnb),
        m=int(m), n=int(n), m_pad=int(m_pad), nc=int(nc), eb=int(eb),
        xs=int(xs), kb=int(min(max(kb_req, force_kb or 1), eb)),
        ku=int(max(ku_req, force_ku or 1)),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WCOOOperator(LinearOperator):
    """General-sparsity m x n operator with the WCOO fast path.

    ``coo`` is the oracle/fallback path (CPU, f64, or use_pallas=False);
    the Pallas kernels are selected on TPU (or in interpret mode when
    ``use_pallas=True`` off-TPU, for tests)."""

    packed: WCOOPacked
    coo: COOOperator
    #: None = auto (Pallas on TPU); True/False force
    use_pallas: object = dataclasses.field(default=None,
                                           metadata=dict(static=True))

    #: solver hook — the fused pair path (prefers_pair) is profitable at
    #: every size the packer accepts (the COO alternative is ~50x slower)
    @property
    def prefers_pair(self) -> bool:
        return self._pallas_selected()

    @property
    def m(self) -> int:
        return self.packed.m

    @property
    def n(self) -> int:
        return self.packed.n

    @property
    def dtype(self):
        return jnp.dtype(jnp.float32)

    @property
    def nnz(self) -> int:
        return self.coo.nnz

    def _pallas_selected(self) -> bool:
        if self.use_pallas is None:
            return jax.default_backend() == "tpu"
        return bool(self.use_pallas)

    def _interp(self) -> bool:
        return jax.default_backend() != "tpu"

    def matvec(self, x: jax.Array) -> jax.Array:
        if self._pallas_selected():
            y0 = jnp.zeros((self.packed.m,), jnp.float32)
            return wcoo_forward(self.packed, x, 1.0, 0.0, y0,
                                interpret=self._interp())
        return self.coo.matvec(x)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        if self._pallas_selected():
            return wcoo_adjoint(self.packed, y, interpret=self._interp())
        return self.coo.rmatvec(y)

    def fused_pair(self, *, y, win, c1, c2):
        """u = A(win*c1) - c2*y and z = A^H u in one pass over the entry
        stream. Returns (u, z), z unnormalized (1/beta commutes)."""
        if self._pallas_selected():
            return wcoo_pair(self.packed, y, win, c1, c2,
                             interpret=self._interp())
        u = self.coo.matvec(win) * c1 - c2 * y
        return u, self.coo.rmatvec(u)

    def todense(self) -> jax.Array:
        return self.coo.todense()


def wcoo_operator(m, n, vals, rows, cols, *, dtype=None,
                  use_pallas=None) -> WCOOOperator:
    """Build a WCOOOperator from COO triplets (real f32, n <= 4096).

    HBM cost: the layout stores TWO copies of the (padded) entry stream
    (vals+idx col-sorted, vals_r+col_r row-sorted: 16 B/slot) plus a
    DENSE per-1024-entry-subtile column boundary table ``ep`` of
    ``eb * ceil(n/128)*128`` int32 per 128-row chunk — i.e. ``4 * n_pad /
    1024 ~ 16 B`` per entry *slot* at n=4096, independent of how full the
    subtile is. Total is ~32 B per padded entry at n=4096 (vs 12 B for raw
    COO), and sparse subtiles pay the full table: the operator footprint
    can be ~3x COO's. ``auto_operator`` weighs this against the ~25x
    product-throughput win and only routes here for non-blocky patterns.

    Raises :class:`WCOOPackError` for patterns outside WCOO's window
    constraints — ``auto_operator`` catches it and falls back to COO."""
    vals = np.asarray(vals)
    if np.iscomplexobj(vals):
        raise WCOOPackError("WCOO is real-only")
    if dtype is not None and jnp.dtype(dtype) == jnp.float64:
        raise WCOOPackError("WCOO computes in f32; use the COO path for f64")
    packed = wcoo_pack(m, n, vals, rows, cols)
    coo = coo_operator(m, n, vals.astype(np.float32), rows, cols,
                       dtype=jnp.float32)
    return WCOOOperator(packed=packed, coo=coo, use_pallas=use_pallas)
