"""Configuration layer for the TPU-native LSQR framework.

This is the analogue of the reference's L0 config layer (``lsqr_kinds``,
/root/reference/src/lsqr_kinds.F90:8-31): it selects the working precision and
holds the solver tolerances/knobs that the reference passes as (optional)
arguments (lsqr.f90:481-519 and the EZ-class defaults at lsqr.f90:46-51).

Reference semantics preserved:

* ``atol``/``btol``/``conlim`` equal to zero mean "machine precision"
  (lsqr.f90:509-512) — the solver's built-in ``1 + t <= 1`` guards give the
  same effect without substitution, so zeros are passed through untouched.
* ``itnlim`` default follows the docstring suggestion of ``4*n``
  (lsqr.f90:513-517) when left as ``None``; the EZ class defaults to 100
  (lsqr.f90:50) to match the reference class default.

TPU-first additions (no reference analogue):

* dtype policy: float32 is the native fast path; float64 (via
  ``jax.config.update('jax_enable_x64', True)``) is the conformance mode that
  reproduces the reference's real64 iteration counts. The reference's
  optional real128 build (lsqr_kinds.F90:19-21) has no TPU equivalent —
  there is no quad-precision hardware path; x64 + safe_norms is the
  maximum-robustness configuration here.
* ``safe_norms`` selects the overflow-safe scaled two-pass 2-norm (the
  functional replacement for the reference's sequential scale/ssq ``dnrm2``,
  lsqrblas.f90:123-159).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "LSQROptions",
    "bounded_loop_workaround",
    "default_dtype",
    "enable_x64",
    "eps_for",
]


def bounded_loop_workaround() -> bool:
    """Whether Pallas operators should steer solvers to the bounded
    (host-stepped masked fori-segment) loop form instead of the plain
    ``lax.while_loop``.

    Rounds 1-3 of the relayed TPU backend HUNG compiling Pallas kernels
    inside ``lax.while_loop`` (BENCHMARKS.md findings log), so Pallas
    operators advertised ``prefers_bounded_loop`` unconditionally. The hang
    is fixed as of 2026-08-19 (re-probed every round by bench.py's solve
    stage), and the while form measures faster (2.22 vs 2.49 ms/iter at
    m=2^23) while restoring true early exit on convergence — so the
    workaround is now OPT-IN: set ``LSQR_TPU_BOUNDED_LOOP=1`` if a backend
    regresses. Explicit ``loop='bounded'`` always works regardless.
    """
    import os

    return os.environ.get("LSQR_TPU_BOUNDED_LOOP", "0") == "1"


def enable_x64(enable: bool = True) -> None:
    """Enable float64 mode (the conformance-precision analogue of the
    reference's ``-DREAL64`` build flag, lsqr_kinds.F90:16-24).

    On TPU, float64 is emulated by XLA — correct but slow. Use it for
    reproducing the reference's double-precision iteration counts; use the
    default float32 for performance runs.
    """
    jax.config.update("jax_enable_x64", enable)


def default_dtype() -> jnp.dtype:
    """The working precision `wp` equivalent: f64 when x64 is on, else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def eps_for(dtype) -> float:
    """Machine precision (`relpr` in the reference docs, lsqr.f90:353-356)."""
    return float(jnp.finfo(jnp.dtype(dtype)).eps)


@dataclasses.dataclass(frozen=True)
class LSQROptions:
    """Solver options. Mirrors the reference's LSQR arguments
    (lsqr.f90:481-519) plus TPU-specific knobs.

    Attributes:
      atol: relative error estimate for A (0 => machine precision).
      btol: relative error estimate for b (0 => machine precision).
      conlim: upper limit on cond(Abar); 0 => 1/eps effectively.
      itnlim: max iterations; None => 4*n (docstring suggestion,
        lsqr.f90:513-517).
      wantse: compute standard-error estimates se (lsqr.f90:451-460).
      nconv: number of consecutive iterations the convergence criteria must
        hold (reference hardcodes nconv=1, lsqr.f90:846).
      record_trace: record the per-iteration log columns in a device-side
        buffer (the functional replacement for the `nout` iteration log,
        lsqr.f90:813-837). Shape is (itnlim+1, 11).
      safe_norms: use the overflow-safe scaled 2-norm like dnrm2
        (lsqrblas.f90:123-159); if False use the plain sqrt(sum(x^2)).
      debug_log: emit a live jax.debug.print line per logged iteration
        (throttled like the reference, lsqr.f90:815-822).
      dtype: working dtype; None => f64 if x64 enabled else f32.
    """

    atol: float = 0.0
    btol: float = 0.0
    conlim: float = 0.0
    itnlim: Optional[int] = None
    wantse: bool = False
    nconv: int = 1
    record_trace: bool = False
    safe_norms: bool = True
    debug_log: bool = False
    dtype: Optional[jnp.dtype] = None
    #: loop form: "while" (single lax.while_loop, default), "bounded"
    #: (host-stepped fixed-size fori segments — required for operators whose
    #: products are Pallas kernels on backends where pallas inside
    #: lax.while_loop misbehaves), or None = auto from the operator's
    #: prefers_bounded_loop property.
    loop: Optional[str] = None
    #: segment length for the bounded loop form
    loop_segment: int = 64
    #: fuse each bidiagonalization half-step (product + axpy + norm) into a
    #: single streaming kernel, keeping u/v unnormalized in the carry.
    #: None = auto from the operator's prefers_fused property. Fused norms
    #: are plain (unscaled) sums of squares.
    fused: Optional[bool] = None
    #: fuse BOTH products of each bidiagonalization step (u_new = A v -
    #: alpha u and z = A' u_new, lsqr.f90:681-694) into ONE streaming pass
    #: over the operator data (ops/pallas_spmv.dia_pair) — the stripes are
    #: read once per iteration instead of twice, halving the dominant HBM
    #: traffic. Implies the fused (unnormalized-carry) form. None = auto
    #: from the operator's prefers_pair property; False disables.
    pair: Optional[bool] = None
    #: optional WIDER dtype for the scalar recurrence only (e.g. "float64"
    #: with f32 vectors): the TPU-native mixed-precision robustness mode —
    #: vectors stream at f32 speed while the O(1)-per-iteration rotations
    #: and running norm estimates accumulate in f64 (requires x64 enabled).
    #: None = scalars in the vector dtype (reference behavior).
    scalar_dtype: Optional[str] = None
    #: route the solve through the iteration megakernel (K iterations per
    #: Pallas dispatch, ops.megakernel) when the operator supports it.
    #: True forces (interpreted off-TPU), False disables. None currently
    #: means False: on this backend the regular bounded-loop path measures
    #: 0.18-0.42 ms/iteration (m = 65K-500K) while the megakernel carries
    #: ~28 ms/call fixed + ~40 us/grid-step overhead and loses at every
    #: size (BENCHMARKS.md "iteration megakernel" section) — the ~0.6
    #: ms/iteration dispatch floor it was built to amortize is no longer
    #: present. Auto-routing will return if a backend shows that floor.
    megakernel: Optional[bool] = None

    def resolve_itnlim(self, n: int) -> int:
        return int(self.itnlim) if self.itnlim is not None else 4 * int(n)

    def replace(self, **kw) -> "LSQROptions":
        return dataclasses.replace(self, **kw)
