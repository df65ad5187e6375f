"""Segmented solve with checkpointing: cut a long solve into fixed-size
segments, persist the carry after each, resume from disk (bit-identical to
the uninterrupted solve)."""

import tempfile

import numpy as np

import lsqr_tpu as lt
from lsqr_tpu.utils.checkpoint import lsqr_checkpointed

rng = np.random.default_rng(0)
m, n, nnz = 3000, 1200, 40_000
A = lt.coo_operator(
    m, n,
    rng.standard_normal(nnz),
    rng.integers(0, m, nnz),
    rng.integers(0, n, nnz),
)
b = rng.standard_normal(m)

ckpt = tempfile.mktemp(suffix=".npz")
res = lsqr_checkpointed(
    A, b, damp=0.05,
    segment_iters=50,
    checkpoint_path=ckpt,
    on_segment=lambda seg, carry: print(
        f"segment {seg}: itn={int(carry.itn)} rnorm={float(carry.rnorm):.6f}"
    ),
    atol=1e-9, btol=1e-9, itnlim=1000,
)
print("final: istop =", int(res.istop), " itn =", int(res.itn))
print("carry checkpoint saved at:", ckpt)
