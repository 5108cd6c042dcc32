"""ML-DSA-style module products: A_hat·s_hat in ONE fused kernel.

The hot pattern of Dilithium-style schemes is a matrix of ring elements
times a vector of ring elements.  PallasPolymul.matvec routes it through
ops/matvec.PallasMatvec: c vector transforms, r·c matrix transforms, a
spectral multiply-accumulate and r shared inverse transforms — one
kernel launch per batch block instead of r·c + r + c.

Run:  python examples/mldsa_matvec.py
"""

import jax
import numpy as np

from tpu_ntt import preset, ref
from tpu_ntt.ops.butterfly import PallasPolymul

p = preset("dilithium256")                 # n=256, q=8380417 (f32 flavor)
on_cpu = jax.devices()[0].platform == "cpu"
plan = PallasPolymul(p, interpret=on_cpu)  # interpret only off-TPU

r, c, batch = 4, 4, 8 if on_cpu else 64
rng = np.random.default_rng(0)
A = rng.integers(0, p.q, (batch, r, c, p.n)).astype(np.int32)
s = rng.integers(0, p.q, (batch, c, p.n)).astype(np.int32)

t = np.asarray(plan.matvec(A, s))          # (batch, r, n)
print(f"matvec: A {A.shape} x s {s.shape} -> {t.shape}")

# verify row 0 of batch 0 against the schoolbook oracle
want = np.zeros(p.n, dtype=np.int64)
for j in range(c):
    want = (want + ref.schoolbook_negacyclic(
        A[0, 0, j].astype(object), s[0, j].astype(object), p.q)) % p.q
assert np.array_equal(t[0, 0].astype(np.int64), want)
print("row (0,0) matches the schoolbook oracle")
