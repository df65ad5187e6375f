"""Differentiable solves: learn a regularization weight by gradient
descent THROUGH the solver (lsqr_tpu.implicit.lsqr_grad).

Setup: noisy linear measurements b = A x_true + noise. The damped
solution x(damp) trades data fit against ||x||; we tune damp to minimize
reconstruction error on a validation target using jax.grad — gradients
flow through the LSQR solve via the implicit function theorem (no
differentiation of the iteration; one extra CG solve per backward pass).
A Fortran library cannot do this at all."""

import jax
import jax.numpy as jnp
import numpy as np

import lsqr_tpu as lt

rng = np.random.default_rng(0)
m, n = 300, 120
# ill-posed operator: geometrically decaying singular values (condition
# ~1e4) — the regime where the damp choice actually matters
U, _ = np.linalg.qr(rng.standard_normal((m, n)))
V, _ = np.linalg.qr(rng.standard_normal((n, n)))
svals = np.logspace(0, -4, n)
A = jnp.asarray((U * svals) @ V.T, jnp.float32)
x_true = jnp.asarray(rng.standard_normal(n).astype(np.float32))
b = A @ x_true + 0.01 * jnp.asarray(
    rng.standard_normal(m).astype(np.float32)
)


def recon_error(log_damp):
    x = lt.lsqr_grad(A, b, jnp.exp(log_damp), atol=1e-10, btol=1e-10)
    return jnp.mean((x - x_true) ** 2)


loss_and_grad = jax.jit(jax.value_and_grad(recon_error))

log_damp = jnp.asarray(np.log(0.5), jnp.float32)  # start badly over-damped
lr = 0.5
for step in range(30):
    loss, g = loss_and_grad(log_damp)
    log_damp = log_damp - lr * g
    if step % 5 == 0:
        print(f"step {step:2d}: damp = {float(jnp.exp(log_damp)):.5f}  "
              f"reconstruction MSE = {float(loss):.6f}")

print(f"learned damp = {float(jnp.exp(log_damp)):.5f}")

# sanity: the learned damp beats both extremes
for d in (1e-5, float(jnp.exp(log_damp)), 0.5):
    x = lt.lsqr(A, b, d, atol=1e-10, btol=1e-10).x
    print(f"damp = {d:.5f}: MSE = {float(jnp.mean((x - x_true)**2)):.6f}")
