"""The iteration megakernel: K complete LSQR iterations per kernel dispatch.

For small-to-mid problems (m = n up to ~500-700K) the per-dispatch fixed
cost — not bandwidth — dominates solve time on relayed TPU backends.
`lsqr_megakernel` runs both bidiagonalization half-steps, the Givens
rotations, the x/w update and the full stopping logic (lsqr.f90:681-810)
inside ONE Pallas kernel, K iterations per dispatch, with u/v/x/w resident
in VMEM for the whole call. Results match the regular f32 solver to
rounding.

On a non-TPU backend this example runs the kernel in interpreter mode
(slow, but bit-faithful to the kernel's logic).
"""

import numpy as np
import jax
import jax.numpy as jnp

import lsqr_tpu as lt
from lsqr_tpu.ops.megakernel import lsqr_megakernel, megakernel_supported
from lsqr_tpu.ops.structured import dia_operator

on_tpu = jax.devices()[0].platform == "tpu"
m = 262_144 if on_tpu else 8_192
offsets = (-2, -1, 0, 1, 2)

rng = np.random.default_rng(0)
data = rng.standard_normal((len(offsets), m)).astype(np.float32)
data[2] += 6.0  # dominant main diagonal
A = dia_operator(m, m, offsets, data, dtype=jnp.float32)
b = rng.standard_normal(m).astype(np.float32)

print("megakernel_supported:", megakernel_supported(A))

res = lt.lsqr(A, b, atol=1e-5, btol=1e-5)
print(f"regular   : istop={int(res.istop)} itn={int(res.itn)} "
      f"rnorm={float(res.rnorm):.6e}")

resm = lsqr_megakernel(A, b, atol=1e-5, btol=1e-5,
                       iters_per_call=32, interpret=not on_tpu)
print(f"megakernel: istop={int(resm.istop)} itn={int(resm.itn)} "
      f"rnorm={float(resm.rnorm):.6e}")

dx = np.abs(np.asarray(res.x) - np.asarray(resm.x)).max()
print(f"max |x_regular - x_megakernel| = {dx:.2e}")
