# What blocks lsqr_refined past cond ~1e8? Measure the per-cycle
# contraction factor of the inner f32 LSRN-preconditioned solve as a
# function of cond(A), against the eps32*cond(A_f32-representation)
# model: at cond >~ 1/eps32 ~ 1.7e7 the STORED f32 matrix's small
# singular subspace is itself rounded away, so no f32 inner iteration
# (preconditioned or not) can contract components along it.
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from lsqr_tpu.refine import lsqr_refined
from lsqr_tpu.ops.linop import DenseOperator

rng = np.random.default_rng(0)
m, n = 400, 200
U, _ = np.linalg.qr(rng.standard_normal((m, n)))
V, _ = np.linalg.qr(rng.standard_normal((n, n)))
eps32 = float(np.finfo(np.float32).eps)
for logc in (6, 7, 8, 9, 10):
    cond = 10.0 ** logc
    s = np.logspace(0, -logc, n)
    A64 = (U * s) @ V.T
    x_true = rng.standard_normal(n)
    b = A64 @ x_true
    A32 = A64.astype(np.float32)
    # f64 LS solution of the STORED f32 matrix (the best any f32-stored
    # method can target)
    x_best32 = np.linalg.lstsq(A32.astype(np.float64), b, rcond=None)[0]
    stored_gap = np.linalg.norm(x_best32 - x_true) / np.linalg.norm(x_true)
    Ad = DenseOperator(a=jnp.asarray(A32))
    res = lsqr_refined(Ad, jnp.asarray(b),
                       host_matvec=lambda x: A64 @ x,
                       host_rmatvec=lambda y: A64.T @ y,
                       cycles=12)
    err = np.linalg.norm(np.asarray(res.x, np.float64) - x_true) / np.linalg.norm(x_true)
    print("cond=1e%-2d refined_err=%.2e conv=%s cycles=%d | stored-matrix gap=%.2e  eps32*cond=%.1e" % (
        logc, err, bool(res.converged), int(res.cycles), stored_gap, eps32 * cond), flush=True)
