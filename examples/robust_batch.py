"""Production batch multiplication with failure detection + resume.

multiply_robust wraps every device call in a deadline (the busy/done
polling-timeout analog of the reference host app) and retries;
multiply_batch persists completed chunks so a crashed or wedged job
resumes from the last checkpoint instead of restarting.  The checkpoint
directory is fingerprinted to the inputs — resuming with different data
refuses instead of mixing stale chunks.

Run:  python examples/robust_batch.py
"""

import tempfile

import numpy as np

from tpu_ntt import ref
from tpu_ntt.runtime.engine import PolyMultEngine

eng = PolyMultEngine(n=256, q=12289)
rng = np.random.default_rng(0)
a = rng.integers(0, 12289, (64, 256))
b = rng.integers(0, 12289, (64, 256))

# one-shot with a deadline + retry
c = eng.multiply_robust(a[:4], b[:4], deadline_s=300, attempts=2)
assert np.array_equal(
    c[0].astype(object),
    ref.schoolbook_negacyclic(a[0].astype(object), b[0].astype(object),
                              12289).astype(object))
print("multiply_robust: 4 products, verified")

# checkpointed batch: chunks persist; rerunning skips completed work
with tempfile.TemporaryDirectory() as d:
    out = eng.multiply_batch(d, a, b, chunk=16)
    print(f"multiply_batch: {out.shape[0]} products via chunked "
          f"checkpointed run")
    out2 = eng.multiply_batch(d, a, b, chunk=16)   # all chunks cached
    assert np.array_equal(out, out2)
    print("resume path: all chunks served from the checkpoint")
