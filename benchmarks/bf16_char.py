# bf16-STORAGE itn/accuracy characterization on the 18 conformance
# problems (f32 scale): materialize each lstp problem densely, solve with
# f32 storage vs bf16 storage (f32 compute), compare itn and solution.
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import lsqr_tpu as lt
from lsqr_tpu.models.paige_saunders import lstp, suite_configs
import dataclasses
from lsqr_tpu.ops.linop import DenseOperator, LinearOperator

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Bf16Dense(LinearOperator):
    a: jax.Array  # bf16 storage
    @property
    def m(self): return self.a.shape[0]
    @property
    def n(self): return self.a.shape[1]
    @property
    def dtype(self): return jnp.dtype(jnp.float32)
    def matvec(self, x):
        return jnp.dot(self.a, x.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    def rmatvec(self, y):
        return jnp.dot(self.a.T, y.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

eps32 = float(np.finfo(np.float32).eps)
print("| problem | acond | itn f32 | itn bf16 | x err f32 | x err bf16 |")
print("|---|---|---|---|---|---|")
for (m, n, nduplc, npower, damp) in suite_configs():
    prob = lstp(m, n, nduplc, npower, damp)
    I = jnp.eye(n, dtype=jnp.float32)
    Ad = jax.vmap(prob.A.matvec, in_axes=1, out_axes=1)(I)  # (m, n)
    b = jnp.asarray(prob.b, jnp.float32)
    xt = np.asarray(prob.x_true)
    kw = dict(atol=eps32**0.9, btol=eps32**0.9,
              conlim=1.0/(10*eps32), itnlim=4*(m+n+50))
    r32 = lt.lsqr(DenseOperator(a=Ad.astype(jnp.float32)), b, damp, **kw)
    rbf = lt.lsqr(Bf16Dense(a=Ad.astype(jnp.bfloat16)), b, damp, **kw)
    e32 = np.abs(np.asarray(r32.x) - xt).max() / max(1.0, np.abs(xt).max())
    ebf = np.abs(np.asarray(rbf.x) - xt).max() / max(1.0, np.abs(xt).max())
    print("| P(%d,%d,%d,%d,%.2g) | %.1e | %d | %d | %.1e | %.1e |" % (
        m, n, nduplc, npower, damp, float(prob.acond),
        int(r32.itn), int(rbf.itn), e32, ebf), flush=True)
