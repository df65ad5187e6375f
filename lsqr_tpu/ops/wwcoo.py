"""WWCOO operator — general (random) sparsity made TPU-fast for WIDE n.

WCOO (ops/wcoo.py) covers unstructured f32 patterns with n <= 4096; its
column-range mechanisms scale linearly with n, which left n > 4096
unstructured matrices on the COO gather/scatter floor (VERDICT r4
missing #2; reference anchor /root/reference/src/lsqr.f90:156-194).
WWCOO extends the same chunk/boundary-difference machinery to wide n
with PER-CHUNK COLUMN COMPACTION plus pack-time window work lists — see
:mod:`lsqr_tpu.ops.pallas_wwcoo` for the kernel design. The per-chunk
work is the WCOO passes plus ~2*(n/1024 + D/1024) extra crossbar items
(D = distinct columns in the chunk), paid once per chunk instead of per
subtile, so throughput is nearly independent of n and of the column
distribution (uniform and Zipf both work).

HBM cost: two copies of the padded entry stream (row-sorted vals +
compacted cols, within-subtile column-sorted vals + rowlocal:
16 B/slot), the per-chunk colmap (4 B per distinct column), and the
windowed boundary/position tables (4 KB per emission/expansion work
item, ~(n_pad + D_pad + padded_entries)/1024 items per chunk). Total
~24-32 B per padded entry at the benchmark shapes.

Scope: real f32, n <= 262,144 (x and the z accumulator are VMEM blocks:
2*n*4 bytes plus tables), same per-window row constraints as WCOO.
Patterns the packer refuses raise :class:`WWCOOPackError` and callers
fall back to the COO path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .coo import COOOperator, coo_operator
from .linop import LinearOperator
from .pallas_wcoo import CR
from .pallas_wwcoo import wwcoo_adjoint, wwcoo_forward, wwcoo_pair
from .wcoo import _KB_MAX

__all__ = ["WWCOOOperator", "WWCOOPacked", "WWCOOPackError",
           "wwcoo_operator"]

#: widest n the VMEM-resident x/z blocks support (2 * n * 4 bytes + the
#: entry planes, compaction scratches, and tables stay well under VMEM)
_N_MAX = 262_144
#: hard caps on the per-chunk work lists; the natural sizes are
#: ~(n/1024 + D/1024 + eb) — a pattern needing far more is refused
_W_MAX = 1024


class WWCOOPackError(ValueError):
    """The sparsity pattern violates a WWCOO window constraint."""


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WWCOOPacked:
    """Device-side WWCOO layout (see pallas_wwcoo module docstring)."""

    vals: jax.Array    # (NC, EMAX) f32, col-sorted within each subtile
    rowl: jax.Array    # (NC, EMAX) int32 row-local, col-sorted order
    vals_r: jax.Array  # (NC, EMAX) f32, plain row-sorted copy (forward)
    col_r: jax.Array   # (NC, EMAX) int32 COMPACTED columns, row-sorted
    colmap: jax.Array  # (NC, D_pad) int32 sorted distinct columns
    ep: jax.Array      # (NC, WM*8, 128) int32 emission boundary tables
    zexp: jax.Array    # (NC, WZ*8, 128) int32 expansion position tables
    gpe: jax.Array     # (NC, CR) int32: last entry pos of rows <= r (-1)
    bnb: jax.Array     # (NC, 1, 128) int32: S-window base per row group
    cwk_jb: jax.Array  # (NC, WC) int32 compaction item: xc slab base
    cwk_xb: jax.Array  # (NC, WC) int32 compaction item: x window base
    fwk_sub: jax.Array    # (NC, WF) int32 forward item: subtile
    fwk_jb: jax.Array     # (NC, WF) int32 forward item: xc window base
    uwk_sub: jax.Array    # (NC, WU) int32 u-gather item: subtile
    uwk_ub: jax.Array     # (NC, WU) int32 u-gather item: u row base
    ewk_sub: jax.Array    # (NC, WM) int32 emission item: subtile
    ewk_jb: jax.Array     # (NC, WM) int32 emission item: zc slab base
    ewk_first: jax.Array  # (NC, WM) int32 1 iff first window of subtile
    zwk_zb: jax.Array     # (NC, WZ) int32 expansion item: z slab base
    zwk_jb: jax.Array     # (NC, WZ) int32 expansion item: zc window base
    m: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    m_pad: int = dataclasses.field(metadata=dict(static=True))
    nc: int = dataclasses.field(metadata=dict(static=True))
    eb: int = dataclasses.field(metadata=dict(static=True))
    xs: int = dataclasses.field(metadata=dict(static=True))
    #: compacted-column slots per chunk / 128
    js: int = dataclasses.field(default=8, metadata=dict(static=True))
    kb: int = dataclasses.field(default=1, metadata=dict(static=True))
    wc: int = dataclasses.field(default=1, metadata=dict(static=True))
    wf: int = dataclasses.field(default=1, metadata=dict(static=True))
    wu: int = dataclasses.field(default=1, metadata=dict(static=True))
    wm: int = dataclasses.field(default=1, metadata=dict(static=True))
    wz: int = dataclasses.field(default=1, metadata=dict(static=True))


def _value_windows(lo, hi):
    """128-aligned 1024-wide window bases covering [lo, hi] per row of
    the (sorted) bounds arrays; returns ragged per-row base lists."""
    base0 = lo & ~np.int64(127)
    k = (-(-(hi - base0 + 1) // 1024)).astype(np.int64)
    return base0, k


def wwcoo_pack(m, n, vals, rows, cols, *, force_emax=None, force_kb=None,
               force_js=None, force_w=None) -> WWCOOPacked:
    """Build the WWCOO layout from (unsorted) COO triplets.

    The ``force_*`` knobs pin the padded capacities so per-device shards
    of a row-partitioned solve can share one static shape; packing fails
    if the data needs more. ``force_w`` pins all four work-list lengths
    at once (they are padded to a common max anyway).

    Raises :class:`WWCOOPackError` when n > 262,144 or a window
    constraint fails (callers fall back to the COO path)."""
    if n > _N_MAX:
        raise WWCOOPackError(f"WWCOO requires n <= {_N_MAX}, got {n}")
    vals = np.asarray(vals, np.float32)
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    nnz = vals.size
    if nnz == 0:
        raise WWCOOPackError("empty matrix")
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]

    nc = max(1, -(-m // CR))
    m_pad = nc * CR
    n_pad = max(1024, -(-n // 1024) * 1024)
    xs = n_pad // 128
    chunk_of = rows // CR
    cstart = np.searchsorted(chunk_of, np.arange(nc))
    cend = np.searchsorted(chunk_of, np.arange(nc), side="right")
    counts = cend - cstart
    emax = int(-(-max(1, counts.max()) // 1024) * 1024)
    if force_emax is not None:
        if emax > force_emax:
            raise WWCOOPackError(
                f"chunk needs {emax} entry slots > forced {force_emax}")
        emax = int(force_emax)
    eb = emax // 1024

    vals_r_p = np.zeros((nc, emax), np.float32)
    col_r_p = np.zeros((nc, emax), np.int32)
    vals_c_p = np.zeros((nc, emax), np.float32)
    rowl_c_p = np.zeros((nc, emax), np.int32)
    gpe = np.zeros((nc, CR), np.int64)
    bnb = np.zeros((nc, 1, CR // 128), np.int32)
    kb_req = 1

    # per-chunk ragged structures, padded to common statics at the end
    colmaps = []        # sorted distinct columns per chunk
    cwk, fwk, uwk, ewk, zwk = [], [], [], [], []
    ep_tabs, zexp_tabs = [], []

    for t in range(nc):
        st, e = int(cstart[t]), int(cend[t])
        k = e - st
        rl = (rows[st:e] - t * CR).astype(np.int32)
        cl = cols[st:e]
        # ---- column compaction map for this chunk ----
        cmap = np.unique(cl) if k else np.zeros(1, np.int64)
        D = len(cmap)
        cj = np.searchsorted(cmap, cl).astype(np.int32)  # compacted cols
        colmaps.append(cmap)

        rowl = np.zeros(emax, np.int32)
        colp = np.zeros(emax, np.int32)
        rowl[:k] = rl
        colp[:k] = cj
        vals_r_p[t, :k] = vals[st:e]
        # zero-valued padding entries sit on the LAST real (row, col):
        # keeps rowl sorted, window spans tight, and sums unchanged
        if k and k < emax:
            rowl[k:] = rl[-1]
            colp[k:] = cj[-1]
        col_r_p[t] = colp
        cnt = np.bincount(rowl, minlength=CR)
        g = np.minimum(np.cumsum(cnt) - 1, k - 1)   # in [-1, emax)
        gpe[t] = g

        # ---- u-gather work items: one per spanned 128-row u slice ----
        # (item-based: cost tracks real subtile row spans, so there is
        # no density floor — the static-KU wall of the n <= 4096 WCOO)
        R2 = rowl.reshape(eb, 1024)
        rmin = R2[:, 0].astype(np.int64)     # sorted within chunk
        rmax = R2[:, -1].astype(np.int64)
        base_u = rmin & ~127
        need_u = (-(-(rmax - base_u + 1) // 128)).astype(np.int64)
        items = []
        for i in range(eb):
            for j in range(int(need_u[i])):
                items.append((i, int(base_u[i]) + 128 * j))
        uwk.append(np.asarray(items, np.int64).reshape(-1, 2))

        # ---- within-subtile sort by compacted column (adjoint copy) ----
        C2 = colp.reshape(eb, 1024)
        V2 = vals_r_p[t].reshape(eb, 1024)
        oc = np.argsort(C2, axis=1, kind="stable")
        C2s = np.take_along_axis(C2, oc, axis=1)
        vals_c_p[t] = np.take_along_axis(V2, oc, axis=1).reshape(-1)
        rowl_c_p[t] = np.take_along_axis(
            rowl.reshape(eb, 1024), oc, axis=1).reshape(-1)

        # ---- compaction work items: xc[j] = x[colmap[j]] ----
        # j-slabs of 1024; per slab, 1024-wide value windows over the
        # (monotone) colmap values it holds
        items = []
        for jb in range(0, max(D, 1), 1024):
            seg = cmap[jb:jb + 1024]
            b0, kx = _value_windows(seg[0], seg[-1])
            for j in range(int(kx)):
                items.append((jb, min(int(b0) + 1024 * j, n_pad - 1024)))
        cwk.append(np.asarray(items, np.int64).reshape(-1, 2))

        # ---- forward entry-gather items: (subtile, xc window) ----
        cmin = C2s[:, 0].astype(np.int64)
        cmax = C2s[:, -1].astype(np.int64)
        items = []
        b0, kx = _value_windows(cmin, cmax)
        for i in range(eb):
            for j in range(int(kx[i])):
                items.append((i, int(b0[i]) + 1024 * j))
        fwk.append(np.asarray(items, np.int64).reshape(-1, 2))

        # ---- emission items: (subtile, zc slab) + boundary tables ----
        zbase = (cmin >> 10) << 10
        kz = (-(-(cmax - zbase + 1) // 1024)).astype(np.int64)
        items, tabs = [], []
        for i in range(eb):
            row = C2s[i]
            for j in range(int(kz[i])):
                jb = int(zbase[i]) + j * 1024
                table = (np.searchsorted(
                    row, np.arange(jb, jb + 1024), side="right") - 1
                ).astype(np.int32)
                items.append((i, jb, 1 if j == 0 else 0))
                tabs.append(table.reshape(8, 128))
        ewk.append(np.asarray(items, np.int64).reshape(-1, 3))
        ep_tabs.append(np.stack(tabs) if tabs else
                       np.zeros((0, 8, 128), np.int32))

        # ---- expansion items: (z slab, zc slab) + position tables ----
        # occupied absolute 1024-column windows of this chunk; the zc
        # side uses disjoint 1024-ALIGNED slabs (the expansion ADDS, so
        # overlapping windows would double-count — unlike the idempotent
        # gather merges of the compaction/forward items)
        items, tabs = [], []
        occ = np.unique(cmap >> 10) if k else np.zeros(0, np.int64)
        for zw in occ:
            zb = int(zw) << 10
            jlo = int(np.searchsorted(cmap, zb))
            jhi = max(int(np.searchsorted(cmap, zb + 1024)) - 1, jlo)
            table = np.searchsorted(
                cmap, np.arange(zb, zb + 1024)).astype(np.int64)
            hit = (table < D) & (cmap[np.minimum(table, D - 1)]
                                 == np.arange(zb, zb + 1024))
            table = np.where(hit, table, -1).astype(np.int32)
            for q in range(jlo >> 10, (jhi >> 10) + 1):
                items.append((zb, q * 1024))
                tabs.append(table.reshape(8, 128))
        zwk.append(np.asarray(items, np.int64).reshape(-1, 2))
        zexp_tabs.append(np.stack(tabs) if tabs else
                         np.zeros((0, 8, 128), np.int32))

        # ---- boundary window bases per 128-row sublane-row (WCOO) ----
        G2 = g.reshape(CR // 128, 128)
        last = G2[:, -1]
        first = np.where(G2 >= 0, G2, np.int64(1) << 60).min(axis=1)
        first = np.where(first == (np.int64(1) << 60),
                         np.maximum(last, 0), first)
        span = last - first
        need = np.maximum(1, -(-(span + 128) // 1024))
        if need.max() > _KB_MAX:
            j = int(need.argmax())
            raise WWCOOPackError(
                f"entry span {int(span[j])} under 128 rows exceeds "
                f"{_KB_MAX} 1024-entry S-windows (chunk {t}, "
                f"rows {j * 128}..)"
            )
        kb_req = max(kb_req, int(need.max()))
        base = np.maximum(0, last - (need * 1024 - 1))
        base = -(-base // 128) * 128            # round UP (keeps cover)
        bnb[t, 0, :] = np.minimum(base, max(0, emax - 1024)).astype(np.int32)

    # ---- pad ragged structures to common statics ----
    d_pad = max(1024, -(-max(len(c) for c in colmaps) // 1024) * 1024)
    if force_js is not None:
        if d_pad // 128 > force_js:
            raise WWCOOPackError(
                f"chunk needs {d_pad // 128} colmap rows > forced "
                f"{force_js}")
        d_pad = int(force_js) * 128
    js = d_pad // 128
    wc = max(1, max(len(a) for a in cwk))
    wf = max(1, max(len(a) for a in fwk))
    wu = max(1, max(len(a) for a in uwk))
    wm = max(1, max(len(a) for a in ewk))
    wz = max(1, max(len(a) for a in zwk))
    if max(wc, wf, wu, wm, wz) > _W_MAX:
        raise WWCOOPackError(
            f"chunk needs {max(wc, wf, wu, wm, wz)} work items > "
            f"{_W_MAX} — row/column spread too wide for the WWCOO "
            f"window budget")
    if force_w is not None:
        if max(wc, wf, wu, wm, wz) > force_w:
            raise WWCOOPackError(
                f"chunk needs {max(wc, wf, wu, wm, wz)} work items > "
                f"forced {force_w}")
        wc = wf = wu = wm = wz = int(force_w)

    # VMEM guard (round 5, see ops/wcoo._vmem_guard): double-buffered
    # entry planes + windowed tables + x/z/colmap blocks + scratches must
    # fit the ~16 MiB scoped limit; refuse instead of compile-OOMing
    demand = (eb * 36_864 + (wm + wz) * 8_192
              + (xs + js) * 2_048)
    if demand > 14 * (1 << 20):
        raise WWCOOPackError(
            f"chunk density too high: ~{demand / (1 << 20):.0f} MiB of "
            f"VMEM blocks (eb={eb}, wm={wm}, wz={wz}, n_pad={xs * 128}, "
            f"D_pad={js * 128}) exceeds the ~16 MiB scoped limit"
        )

    colmap_p = np.full((nc, d_pad), n_pad, np.int32)  # pad: out of range
    cwk_jb = np.zeros((nc, wc), np.int32)
    # padding compaction items re-merge slab 0 against the top x window:
    # the by-value select is idempotent, so re-gathers are harmless
    cwk_xb = np.full((nc, wc), n_pad - 1024, np.int32)
    fwk_sub = np.zeros((nc, wf), np.int32)
    fwk_jb = np.full((nc, wf), d_pad - 1024, np.int32)
    # padding u-gather items re-merge subtile 0 against u slice 0: the
    # by-value select is idempotent, so re-gathers are harmless
    uwk_sub = np.zeros((nc, wu), np.int32)
    uwk_ub = np.zeros((nc, wu), np.int32)
    ewk_sub = np.zeros((nc, wm), np.int32)
    ewk_jb = np.zeros((nc, wm), np.int32)
    # padding emission items carry first=1 and all-(-1) tables: se == 0
    # and prev_use == 0, so they add exactly 0 to zc[0:8)
    ewk_first = np.ones((nc, wm), np.int32)
    ep = np.full((nc, wm * 8, 128), -1, np.int32)
    zwk_zb = np.zeros((nc, wz), np.int32)
    zwk_jb = np.zeros((nc, wz), np.int32)
    zexp = np.full((nc, wz * 8, 128), -1, np.int32)
    for t in range(nc):
        colmap_p[t, :len(colmaps[t])] = colmaps[t]
        a = cwk[t]
        cwk_jb[t, :len(a)] = a[:, 0]
        cwk_xb[t, :len(a)] = a[:, 1]
        a = fwk[t]
        fwk_sub[t, :len(a)] = a[:, 0]
        fwk_jb[t, :len(a)] = np.minimum(a[:, 1], d_pad - 1024)
        a = uwk[t]
        uwk_sub[t, :len(a)] = a[:, 0]
        uwk_ub[t, :len(a)] = a[:, 1]
        a = ewk[t]
        ewk_sub[t, :len(a)] = a[:, 0]
        ewk_jb[t, :len(a)] = np.minimum(a[:, 1], d_pad - 1024)
        ewk_first[t, :len(a)] = a[:, 2]
        if len(a):
            ep[t, :len(a) * 8, :] = ep_tabs[t].reshape(-1, 128)
        a = zwk[t]
        zwk_zb[t, :len(a)] = a[:, 0]
        zwk_jb[t, :len(a)] = np.minimum(a[:, 1], d_pad - 1024)
        if len(a):
            zexp[t, :len(a) * 8, :] = zexp_tabs[t].reshape(-1, 128)

    return WWCOOPacked(
        vals=jnp.asarray(vals_c_p),
        rowl=jnp.asarray(rowl_c_p),
        vals_r=jnp.asarray(vals_r_p),
        col_r=jnp.asarray(col_r_p),
        colmap=jnp.asarray(colmap_p),
        ep=jnp.asarray(ep),
        zexp=jnp.asarray(zexp),
        gpe=jnp.asarray(gpe.astype(np.int32)),
        bnb=jnp.asarray(bnb),
        cwk_jb=jnp.asarray(cwk_jb),
        cwk_xb=jnp.asarray(cwk_xb),
        fwk_sub=jnp.asarray(fwk_sub),
        fwk_jb=jnp.asarray(fwk_jb),
        uwk_sub=jnp.asarray(uwk_sub),
        uwk_ub=jnp.asarray(uwk_ub),
        ewk_sub=jnp.asarray(ewk_sub),
        ewk_jb=jnp.asarray(ewk_jb),
        ewk_first=jnp.asarray(ewk_first),
        zwk_zb=jnp.asarray(zwk_zb),
        zwk_jb=jnp.asarray(zwk_jb),
        m=int(m), n=int(n), m_pad=int(m_pad), nc=int(nc), eb=int(eb),
        xs=int(xs), js=int(js),
        kb=int(min(max(kb_req, force_kb or 1), eb)),
        wc=int(wc), wf=int(wf), wu=int(wu), wm=int(wm), wz=int(wz),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WWCOOOperator(LinearOperator):
    """General-sparsity m x n operator, wide n, with the WWCOO fast path.

    ``coo`` is the oracle/fallback path (CPU, f64, or use_pallas=False);
    the Pallas kernels are selected on TPU (or in interpret mode when
    ``use_pallas=True`` off-TPU, for tests)."""

    packed: WWCOOPacked
    coo: COOOperator
    #: None = auto (Pallas on TPU); True/False force
    use_pallas: object = dataclasses.field(default=None,
                                           metadata=dict(static=True))

    #: solver hook — the fused pair path is profitable at every size the
    #: packer accepts (the COO alternative is ~10-50x slower)
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
            return wwcoo_forward(self.packed, x, 1.0, 0.0, y0,
                                 interpret=self._interp())
        return self.coo.matvec(x)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        if self._pallas_selected():
            return wwcoo_adjoint(self.packed, y, interpret=self._interp())
        return self.coo.rmatvec(y)

    def fused_pair(self, *, y, win, c1, c2):
        """u = A(win*c1) - c2*y and z = A^H u in one pass over the entry
        stream. Returns (u, z), z unnormalized (1/beta commutes)."""
        if self._pallas_selected():
            return wwcoo_pair(self.packed, y, win, c1, c2,
                              interpret=self._interp())
        u = self.coo.matvec(win) * c1 - c2 * y
        return u, self.coo.rmatvec(u)

    def todense(self) -> jax.Array:
        return self.coo.todense()


def wwcoo_operator(m, n, vals, rows, cols, *, dtype=None,
                   use_pallas=None) -> WWCOOOperator:
    """Build a WWCOOOperator from COO triplets (real f32, n <= 262,144).

    Raises :class:`WWCOOPackError` for patterns outside the window
    constraints — ``auto_operator`` catches it and falls back."""
    vals = np.asarray(vals)
    if np.iscomplexobj(vals):
        raise WWCOOPackError("WWCOO is real-only")
    if dtype is not None and jnp.dtype(dtype) == jnp.float64:
        raise WWCOOPackError("WWCOO computes in f32; use COO for f64")
    packed = wwcoo_pack(m, n, vals, rows, cols)
    coo = coo_operator(m, n, vals.astype(np.float32), rows, cols,
                       dtype=jnp.float32)
    return WWCOOOperator(packed=packed, coo=coo, use_pallas=use_pallas)
