"""Profiling and roofline accounting.

The reference's observability is wall-clock timing around whole products
(``time_testing256.c:144-187``, host-side HW timing in
``NTT_PCIECommunicationv2.c:162-229``) plus static Quartus timing reports.
Here: the same warm-up + N-run methodology as a reusable timer, a
jax.profiler trace hook (the TPU equivalent of a ModelSim waveform), and a
roofline model that plays the role of the Fmax/resource reports — how close
a measured run is to the chip's compute/bandwidth ceilings.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import numpy as np

__all__ = ["Timer", "time_fn", "trace", "polymul_roofline", "RooflineReport"]

# v5e per-chip ceilings.  DEFAULT_VPU_INT_OPS is a spec-sheet ESTIMATE
# (lane count x assumed issue width x assumed clock) used by the op-count
# roofline model; the measured, compiler-faithful ceiling is the
# per-flavor butterfly-only kernel rate in CALIBRATION.json
# (utils/calibrate.butterfly_ceiling), which bench.py reports against as
# ``pe_fraction``.  The HBM rate is replaced by the measured stream
# bandwidth when a calibration artifact exists.
DEFAULT_VPU_INT_OPS = 3.9e12     # 8x128 lanes x ~4 ALUs x ~0.94 GHz
DEFAULT_HBM_BYTES = 8.1e11       # ~810 GB/s spec; measured ~640 GB/s

def _apply_calibration() -> None:
    global DEFAULT_HBM_BYTES
    try:
        from .calibrate import load_calibration
        cal = load_calibration()
    except Exception:
        cal = None
    if cal and cal.get("hbm_bytes_per_s", 0) > 0:
        DEFAULT_HBM_BYTES = float(cal["hbm_bytes_per_s"])

_apply_calibration()


class Timer:
    """Warm-up + repeated timing with per-call device sync
    (time_testing256.c methodology)."""

    def __init__(self, warmup: int = 3, iters: int = 30):
        self.warmup, self.iters = warmup, iters

    def run(self, fn) -> dict:
        r = None
        for _ in range(self.warmup):
            r = fn()
        _block(r)
        ts = []
        for _ in range(self.iters):
            t0 = time.perf_counter()
            r = fn()
            _block(r)
            ts.append(time.perf_counter() - t0)
        ts = np.array(ts)
        return {"mean_s": float(ts.mean()), "min_s": float(ts.min()),
                "p50_s": float(np.median(ts)), "std_s": float(ts.std()),
                "iters": self.iters}


def _block(r):
    if hasattr(r, "block_until_ready"):
        r.block_until_ready()
    elif isinstance(r, (list, tuple)):
        for x in r:
            _block(x)


def time_fn(fn, warmup: int = 3, iters: int = 30) -> dict:
    return Timer(warmup, iters).run(fn)


@contextlib.contextmanager
def trace(out_dir: str):
    """jax.profiler trace context — view with TensorBoard/XProf."""
    import jax
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class RooflineReport:
    butterflies: int
    measured_s: float
    ops_per_butterfly: float
    vpu_ops_ceiling: float
    hbm_bytes: int
    hbm_ceiling: float

    @property
    def butterflies_per_s(self) -> float:
        return self.butterflies / self.measured_s

    @property
    def compute_bound_s(self) -> float:
        return self.butterflies * self.ops_per_butterfly / self.vpu_ops_ceiling

    @property
    def memory_bound_s(self) -> float:
        return self.hbm_bytes / self.hbm_ceiling

    @property
    def roofline_s(self) -> float:
        return max(self.compute_bound_s, self.memory_bound_s)

    @property
    def roofline_fraction(self) -> float:
        """Measured throughput as a fraction of the model's bound."""
        return self.roofline_s / self.measured_s

    def __str__(self):
        lim = ("compute" if self.compute_bound_s >= self.memory_bound_s
               else "HBM")
        return (f"{self.butterflies_per_s / 1e9:.1f} G butterflies/s — "
                f"{100 * self.roofline_fraction:.0f}% of {lim}-bound "
                f"roofline ({self.roofline_s * 1e6:.1f} µs bound vs "
                f"{self.measured_s * 1e6:.1f} µs measured)")


def polymul_roofline(params, batch: int, measured_s: float,
                     ops_per_butterfly: float = 32.0,
                     vpu_ops: float = DEFAULT_VPU_INT_OPS,
                     hbm_bytes_per_s: float = DEFAULT_HBM_BYTES,
                     ) -> RooflineReport:
    """Roofline for one batched polymul call (2 fwd + 1 inv transform,
    3 arrays of HBM traffic).

    ``ops_per_butterfly`` default models the lane-masked radix-2 Shoup
    kernel (ops/butterfly.py): ~16 elementwise int32 ops per stage
    position x 2 positions per butterfly (SIMD masking computes both
    branch values full-width), rolls excluded.  The v5e fused kernel
    measures ~78% of this bound (94.6 G butterflies/s vs the 122 G
    model ceiling at 3.9e12 lane-ops/s).  Montgomery-flavor kernels
    (2^14 <= q < 2^29) cost ~2x: pass ~64."""
    bf = 3 * batch * (params.n // 2) * params.log2n
    traffic = 3 * batch * params.n * 4          # a, b in; c out
    return RooflineReport(bf, measured_s, ops_per_butterfly, vpu_ops,
                          traffic, hbm_bytes_per_s)
