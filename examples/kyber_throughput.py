"""Batched ML-KEM-style polynomial products at full chip throughput.

Demonstrates the serving-style hot path: one fused Pallas kernel per chip
(PallasIncompletePolymul: the q=3329 ring has no 512th root, so the
transform is the levels=1 incomplete NTT), optionally data-parallel over
every chip in the mesh with dp_polymul (no cross-chip communication).

Run:  python examples/kyber_throughput.py [batch]
"""

import sys
import time

import numpy as np
import jax

from tpu_ntt import PallasIncompletePolymul
from tpu_ntt.parallel.sharded import dp_polymul, make_mesh

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
n, q = 256, 3329
on_cpu = jax.default_backend() == "cpu"
plan = PallasIncompletePolymul(n, q, interpret=on_cpu)

rng = np.random.default_rng(0)
a = rng.integers(0, q, (batch, n)).astype(np.int32)
b = rng.integers(0, q, (batch, n)).astype(np.int32)

ndev = len(jax.devices())
if ndev > 1 and batch % ndev == 0:
    f = dp_polymul(plan, make_mesh())        # every chip runs the kernel
else:
    f = jax.jit(plan.polymul)

c = np.asarray(f(a, b))                      # warm-up + correctness probe
t0 = time.perf_counter()
iters = 20
for _ in range(iters):
    f(a, b).block_until_ready()
dt = (time.perf_counter() - t0) / iters
print(f"{batch} kyber polymuls in {dt * 1e3:.2f} ms  "
      f"({batch / dt / 1e6:.1f} M/s on {ndev} device(s))")

# spot-check one row against the independent schoolbook oracle
from tpu_ntt import ref
assert np.array_equal(c[0], ref.schoolbook_negacyclic(a[0], b[0], q))
print("row 0 matches the schoolbook oracle")
