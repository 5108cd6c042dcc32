"""The Ring surface end-to-end: negacyclic, cyclic (hardware-semantics),
64-bit goldilocks, and a staged fixed-shape session.

Run:  python examples/ring_api.py
"""

import numpy as np

from tpu_ntt.ring import Ring
from tpu_ntt.runtime.staged import StagedSession

rng = np.random.default_rng(0)

# -- negacyclic (the reference's software semantics) -----------------------
R = Ring(256, 12289)
a, b = R.random(256, rng), R.random(256, rng)
c = R.mul(a, b)
print(f"{R!r}: c[0..4] = {c[:4]}")

# transform domain: intt(pointwise(ntt a, ntt b)) == mul(a, b)
fa, fb = R.ntt(a[None]), R.ntt(b[None])
assert np.array_equal(R.intt(R.pointwise(fa, fb))[0], c)

# -- cyclic (the HARDWARE's own semantics: PolyMult.v mode 3) --------------
Rc = Ring(256, 7681, negacyclic=False)
ch = Rc.mul(a % 7681, b % 7681)
print(f"{Rc!r}: c[0..4] = {ch[:4]}")

# -- 64-bit goldilocks prime (the top of the reference's K<=64 claim) ------
GOLD = 0xFFFFFFFF00000001
Rg = Ring(4096, GOLD)
ag = rng.integers(0, GOLD, (2, 4096), dtype=np.uint64)
bg = rng.integers(0, GOLD, (2, 4096), dtype=np.uint64)
cg = Rg.mul(ag, bg)
print(f"{Rg!r}: c[0,0] = {cg[0, 0]}")

# -- staged fixed-shape session (the v1 address-mapped-protocol analog) ----
sess = StagedSession(R._engine, batch=1024)
big_a = rng.integers(0, R.q, (1024, 256))
big_b = rng.integers(0, R.q, (1024, 256))
out = sess.multiply(big_a, big_b)
stats = sess.measure_overhead(iters=10)
print(f"staged {stats['staged_us']:.0f} us/call vs engine "
      f"{stats['engine_us']:.0f} us/call (x{stats['ratio']:.2f})")
