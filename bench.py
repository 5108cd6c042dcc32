"""Benchmark harness — the time_testing256.c analog, on real TPU.

Methodology mirrors the reference harness (NTT_Software_Evaluations/
NTT-256/time_testing256.c:144-187): warm-up, then a fixed number of timed
iterations, mean wall-clock — but over batched device-resident arrays with
one fused XLA graph per call.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference FPGA's butterfly speed-of-light is
PE × f_clk = 8 butterflies/cycle × 50 MHz = 4.0e8 butterflies/s
(defines.v:27 PE_NUMBER=8; DE2i-150 50 MHz board clock, and the design
closes timing well below that — nttParametric.sta.rpt restricted Fmax
18.29 MHz — so this is a *generous* baseline).  vs_baseline is our
butterflies/sec/chip divided by that number.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

FPGA_BUTTERFLIES_PER_SEC = 8 * 50e6          # PE x board clock (generous)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_polymul(config: str, batch: int, iters: int, warmup: int,
                  backend: str = "xla"):
    import jax
    from tpu_ntt.utils.jaxcache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from tpu_ntt.params import preset
    from tpu_ntt.transform import Plan

    p = preset(config)
    log(f"[bench] backend={backend}")
    if backend == "pallas":
        from tpu_ntt.ops.butterfly import PallasPolymul
        plan = PallasPolymul(p)
        plan.polymul_jit = plan.polymul
    else:
        plan = Plan(p)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, p.q, (batch, p.n)), jnp.int32)
    b = jnp.asarray(rng.integers(0, p.q, (batch, p.n)), jnp.int32)

    t0 = time.time()
    c = plan.polymul_jit(a, b)
    c.block_until_ready()
    log(f"[bench] {config} batch={batch} compile+first-run "
        f"{time.time() - t0:.1f}s on {jax.devices()[0].device_kind}")

    for _ in range(warmup):
        c = plan.polymul_jit(a, b)
    c.block_until_ready()

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        c = plan.polymul_jit(a, b)
        c.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.mean(times))

    # sanity: bit-exact vs the NumPy oracle on one row
    from tpu_ntt import ref
    row = np.asarray(c[0])
    want = ref.schoolbook_negacyclic(np.asarray(a[0]), np.asarray(b[0]), p.q)
    if not np.array_equal(row, want):
        raise AssertionError("bench result failed correctness check")

    butterflies = 3 * batch * (p.n // 2) * p.log2n   # 2 fwd + 1 inv NTT
    bf_per_s = butterflies / dt
    log(f"[bench] mean {dt * 1e3:.3f} ms  "
        f"{batch / dt:,.0f} polymuls/s  {bf_per_s / 1e9:.1f} G butterflies/s")
    return bf_per_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sw256")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    args = ap.parse_args()

    bf_per_s = bench_polymul(args.config, args.batch, args.iters,
                             args.warmup, args.backend)
    print(json.dumps({
        "metric": f"ntt_butterflies_per_sec_per_chip ({args.config} "
                  f"negacyclic polymul, batch={args.batch})",
        "value": round(bf_per_s / 1e9, 3),
        "unit": "Gbutterflies/s",
        "vs_baseline": round(bf_per_s / FPGA_BUTTERFLIES_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
