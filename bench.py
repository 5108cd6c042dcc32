"""Benchmark harness — the time_testing256.c analog, on real TPU.

Methodology mirrors the reference harness (NTT_Software_Evaluations/
NTT-256/time_testing256.c:144-187): warm-up, then a fixed number of timed
iterations (device-synchronised), mean wall-clock — over batched
device-resident arrays with one fused XLA graph per call.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Additional configs / sweep details go to stderr.

vs_baseline: the reference FPGA's butterfly speed-of-light is
PE × f_clk = 8 butterflies/cycle × 50 MHz = 4.0e8 butterflies/s
(defines.v:27 PE_NUMBER=8; DE2i-150 50 MHz board clock — generous, since
the design's restricted Fmax is 18.29 MHz per nttParametric.sta.rpt).
vs_baseline is our butterflies/sec/chip divided by that number.
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


class _HostResult:
    """Duck-typed wrapper so host-computed results fit the timing loop."""

    def __init__(self, v):
        self.v = v

    def block_until_ready(self):
        return self.v


def _timeit(fn, iters, warmup):
    for _ in range(warmup):
        r = fn()
    r.block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn().block_until_ready()
        ts.append(time.perf_counter() - t0)
    # median is the headline stat: the tunneled device path occasionally
    # stalls a single dispatch for tens of ms, which poisons the mean
    return float(np.median(ts)), float(np.mean(ts)), float(np.min(ts))


def _butterflies(n, log2n, batch):
    return 3 * batch * (n // 2) * log2n      # 2 fwd + 1 inv NTT


def bench_config(config: str, batch: int, iters: int, warmup: int,
                 backend: str = "xla"):
    """Returns (butterflies/s, detail dict)."""
    import jax
    import jax.numpy as jnp
    from tpu_ntt.utils.jaxcache import enable_compile_cache
    enable_compile_cache()
    from tpu_ntt import ref
    from tpu_ntt.params import find_params, preset
    from tpu_ntt.transform import Plan

    rng = np.random.default_rng(0)

    if config == "kyber":                    # incomplete NTT, n=256 q=3329
        from tpu_ntt.schemes import kyber_plan
        plan = kyber_plan()
        n, q = 256, 3329
        a = jnp.asarray(rng.integers(0, q, (batch, n)), jnp.int32)
        b = jnp.asarray(rng.integers(0, q, (batch, n)), jnp.int32)
        fn = lambda: plan.polymul_jit(a, b)
        bf = 3 * batch * 2 * (128 // 2) * 7  # 2 size-128 sub-transforms each
    elif config == "bigq62":                 # RNS channels + CRT, n=4096
        from tpu_ntt.bigq import BigQPlan
        p = find_params(4096, 62)
        plan = BigQPlan(p)
        n, q = p.n, p.q
        ah = rng.integers(0, q, (batch, n)).astype(np.uint64)
        bh = rng.integers(0, q, (batch, n)).astype(np.uint64)
        a, b = ah, bh
        fn = lambda: _HostResult(plan.polymul(ah, bh))
        bf = len(plan.primes) * _butterflies(n, p.log2n, batch)
    elif config == "large":                  # single-chip n=2^16 transform
        # four-step (ShardedPlan on a 1-device mesh) — far better compile
        # time and VMEM locality than a flat 16-stage graph at this size
        from tpu_ntt.parallel.sharded import ShardedPlan, make_mesh
        p = find_params(1 << 16, 28)
        plan = ShardedPlan(p, make_mesh(1))
        n, q = p.n, p.q
        a = plan.shard_coeffs(rng.integers(0, q, (batch, n)))
        b = plan.shard_coeffs(rng.integers(0, q, (batch, n)))
        fn = lambda: plan.polymul_jit(a, b)
        bf = _butterflies(n, p.log2n, batch)
    else:                                    # preset name: sw256/hw256/...
        p = preset(config)
        if backend == "pallas":
            from tpu_ntt.ops.butterfly import PallasPolymul
            fn_impl = PallasPolymul(p).polymul
        elif backend == "mxu":
            from tpu_ntt.ops.matmul_ntt import MatmulNTT
            fn_impl = MatmulNTT(p).polymul_jit
        else:
            fn_impl = Plan(p).polymul_jit
        n, q = p.n, p.q
        a = jnp.asarray(rng.integers(0, q, (batch, n)), jnp.int32)
        b = jnp.asarray(rng.integers(0, q, (batch, n)), jnp.int32)
        fn = lambda: fn_impl(a, b)
        bf = _butterflies(n, p.log2n, batch)

    t0 = time.time()
    out = fn().block_until_ready()
    log(f"[bench] {config} backend={backend} batch={batch} n={n} "
        f"compile+first-run {time.time() - t0:.1f}s on "
        f"{jax.devices()[0].device_kind}")

    med_s, mean_s, min_s = _timeit(fn, iters, warmup)

    # correctness spot-check on one row
    if config == "large":
        out = plan.unshard(out)
        a = plan.unshard(a)
        b = plan.unshard(b)
    row = np.asarray(out)[0].astype(object)
    a0 = np.asarray(a[0]).astype(object)
    b0 = np.asarray(b[0]).astype(object)
    want = ref.schoolbook_negacyclic(a0, b0, q).astype(object)
    if not np.array_equal(row, want):
        raise AssertionError(f"bench {config} failed correctness check")

    bf_per_s = bf / med_s
    log(f"[bench] {config}: median {med_s * 1e3:.3f} ms (mean "
        f"{mean_s * 1e3:.3f}, min {min_s * 1e3:.3f})  "
        f"{batch / med_s:,.0f} polymuls/s  "
        f"{bf_per_s / 1e9:.1f} G butterflies/s")
    return bf_per_s, {"config": config, "n": n, "q": int(q), "batch": batch,
                      "median_ms": round(med_s * 1e3, 4),
                      "mean_ms": round(mean_s * 1e3, 4),
                      "polymuls_per_s": round(batch / med_s),
                      "gbutterflies_per_s": round(bf_per_s / 1e9, 2)}


SWEEP = [("sw256", 8192), ("hw256", 8192), ("kyber", 8192),
         ("dilithium256", 4096), ("large", 16), ("bigq62", 64)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sw256")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas", "mxu"])
    ap.add_argument("--sweep", action="store_true",
                    help="run every config class; details to stderr")
    args = ap.parse_args()

    if args.sweep:
        details = []
        for cfg, batch in SWEEP:
            try:
                _, d = bench_config(cfg, batch, max(5, args.iters // 3),
                                    args.warmup)
                details.append(d)
            except Exception as e:          # keep sweeping
                log(f"[bench] {cfg} FAILED: {e}")
        log("[bench] sweep: " + json.dumps(details))

    bf_per_s, _ = bench_config(args.config, args.batch, args.iters,
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
