"""Batched solves: many right-hand sides against one operator in a single
compiled program.

No reference analogue (the Fortran solves one rhs per call); on TPU,
batching is how small/medium solves reach high utilization: ``jax.vmap``
lifts the whole while_loop so all systems iterate together (each keeps its
own istop and stops updating once converged — the masked-carry semantics of
a vmapped while_loop), and the operator products become matrix-matrix work
that feeds the MXU/VPU far better than lone matvecs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .config import LSQROptions
from .ops.linop import as_operator
from .solver import LSQRResult, _lsqr_impl

__all__ = ["lsqr_batch"]


@partial(
    jax.jit,
    static_argnames=(
        "itnlim", "wantse", "nconv", "record_trace", "safe_norms", "debug_log",
        "scalar_dtype",
    ),
)
def _batch_impl(A, B, damp, atol, btol, conlim, **static_opts):
    def solve_one(b, d):
        return _lsqr_impl(A, b, d, atol, btol, conlim, **static_opts)

    return jax.vmap(solve_one)(B, damp)


def lsqr_batch(
    A,
    B,
    damp=0.0,
    *,
    options: Optional[LSQROptions] = None,
    m: Optional[int] = None,
    n: Optional[int] = None,
    **option_overrides,
) -> LSQRResult:
    """Solve ``min ||A x_i - b_i||`` for every column batch entry at once.

    Args:
      B: right-hand sides, shape (batch, m).
      damp: scalar or per-problem array of shape (batch,).

    Returns an :class:`LSQRResult` whose fields carry a leading batch
    dimension (x: (batch, n), istop: (batch,), ...). Each problem stops at
    its own iteration; ``itn`` reports per-problem counts while the compiled
    loop runs until the last one converges.
    """
    opts = options or LSQROptions()
    if option_overrides:
        opts = opts.replace(**option_overrides)

    A = as_operator(A, m=m, n=n)
    if getattr(A, "prefers_bounded_loop", False):
        raise ValueError(
            "lsqr_batch vmaps a lax.while_loop, which does not compose with "
            "this operator's Pallas kernels on the current TPU toolchain "
            "(see BENCHMARKS.md); rebuild the operator with use_pallas=False "
            "for batched solves"
        )
    B = jnp.asarray(B)
    if B.ndim != 2 or B.shape[1] != A.m:
        raise ValueError(
            f"B must have shape (batch, m={A.m}); got {B.shape}"
        )
    dtype = opts.dtype or (
        B.dtype if jnp.issubdtype(B.dtype, jnp.floating) else None
    )
    if dtype is None:
        from .config import default_dtype

        dtype = default_dtype()
    B = B.astype(dtype)
    batch = B.shape[0]
    damp_arr = jnp.broadcast_to(jnp.asarray(damp, dtype), (batch,))

    return _batch_impl(
        A,
        B,
        damp_arr,
        jnp.asarray(opts.atol, dtype),
        jnp.asarray(opts.btol, dtype),
        jnp.asarray(opts.conlim, dtype),
        itnlim=opts.resolve_itnlim(A.n),
        wantse=opts.wantse,
        nconv=opts.nconv,
        record_trace=opts.record_trace,
        safe_norms=opts.safe_norms,
        debug_log=False,  # debug printing is not meaningful under vmap
        scalar_dtype=(str(jnp.dtype(opts.scalar_dtype))
                      if opts.scalar_dtype is not None else None),
    )
