"""Empirical device calibration for the roofline / speed-of-light model.

The reference's performance ceiling is stated as PE × f_clk — 8
butterfly PEs at the 50 MHz board clock = 0.4 G butterflies/s
(defines.v PE, the DE2i-150 clock).  The TPU analog of that number is
NOT derivable from a datasheet: what a butterfly costs depends on how
Mosaic schedules the int32 mul/add/select mix onto the VPU, and generic
int-op microbenchmarks measure the wrong thing (a dependent scalar-mix
chain sustains ~2.5e12 lane-ops/s on this chip while the real NTT
kernels sustain the equivalent of ~3.7e12 model-ops/s — the model's op
weights, not the hardware, are what's uncertain).

So measure the ceiling in BUTTERFLIES, per arithmetic flavor: a
stripped kernel that runs nothing but back-to-back butterfly stages on
VMEM-resident planes — same arithmetic, same compiler, same layout as
the real kernels, but no repack, no base-case product, no HBM
re-streaming, no dispatch.  Two unroll depths, min-time fit: the slope
is the pure butterfly rate.  That is the per-chip speed of light the
fused polymul kernels are judged against (``pe_fraction`` in
bench.py's sweep details), exactly parallel to judging the FPGA
pipeline against PE × f_clk.

Also measured: sustained HBM stream bandwidth (read+add1+write, gridded
blocks, min-time fit over repetition count) — the memory-side ceiling.

``calibrate()`` writes CALIBRATION.json at the repo root;
``profiling._apply_calibration`` picks up the measured HBM rate for the
memory-bound side of the model (the VPU-op ceiling stays the documented
spec-sheet estimate — see the module comment there).
"""

from __future__ import annotations

import json
import pathlib
import time

import numpy as np

__all__ = ["calibrate", "load_calibration", "butterfly_ceiling",
           "kernel_class_ceiling", "incomplete_kernel_ceiling",
           "bigq_flat_ceiling", "fourstep_class_ceiling",
           "blocked_bigq_phase_times", "hbm_bytes_per_s"]

_H, _TILE, _BLOCKS = 128, 512, 16     # two (128, 512) planes per block
_BROWS, _BLANES = 512, 1024           # 2 MB HBM streaming block


def _min_time(fn, iters=10, warmup=2):
    w = None
    for _ in range(warmup):
        w = fn()
    if w is not None:
        int(np.asarray(w))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        int(np.asarray(fn()))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _stage_ops(flavor: str, q: int):
    """One packed butterfly stage (A, B, w_row) -> (A', B'), the same
    arithmetic as ops/butterfly's packed kernels (no repack)."""
    import jax.numpy as jnp
    q32 = np.int32(q)
    two_q = np.int32(2 * q)

    def csub(x, m):
        r = x - m
        return r + ((r >> 31) & m)

    if flavor == "shoup":
        # the packed kernels' Harvey-lazy CT form (butterfly.
        # _make_kernel_packed fwd): planes live in [0, 4q) between
        # stages, only the add operand is reduced — the ruler must use
        # the same (cheaper) stage the real kernels run, else a kernel
        # can "beat the ceiling" (the round-3 kyber 1.028 defect class)
        from ..ops.butterfly import _shoup_u

        def stage(A, B, w, wsh):
            a0 = csub(A, two_q)
            m = _shoup_u(B, w, wsh, q32)
            return a0 + m, a0 + two_q - m
        return stage

    if flavor == "f32":
        three_q = np.int32(3 * q)
        four_q = np.int32(4 * q)

        def stage(A, B, w, wf):
            t = (B.astype(jnp.float32) * wf).astype(jnp.int32)
            r = B * w - t * q32 + three_q
            m = csub(csub(r, four_q), two_q)
            return csub(A + m, two_q), csub(A - m + two_q, two_q)
        return stage

    # mont: 15-bit digit-serial Montgomery (ops/butterfly mont kernels)
    q0 = np.int32(q & ((1 << 15) - 1))
    q1 = np.int32(q >> 15)
    qp = np.int32((-pow(q, -1, 1 << 15)) % (1 << 15))
    m15 = np.int32((1 << 15) - 1)

    def redc(H, Mid, L0):
        u0 = ((L0 & m15) * qp) & m15
        t1 = (L0 + u0 * q0) >> 15
        A1 = Mid + u0 * q1 + t1
        a1h, a1l = A1 >> 15, A1 & m15
        u1 = (a1l * qp) & m15
        t2 = (a1l + u1 * q0) >> 15
        return csub(csub(H + a1h + u1 * q1 + t2, q32), q32)

    def subm(x, y):
        r = x - y
        return r + ((r >> 31) & q32)

    def stage(A, B, w, _):
        x1, x0 = B >> 15, B & m15
        y1, y0 = w >> 15, w & m15
        m = redc(x1 * y1, x1 * y0 + x0 * y1, x0 * y0)
        return csub(A + m, q32), subm(A, m)
    return stage


_FLAVOR_Q = {"shoup": 12289, "f32": 8380417, "mont": 134348801}


def butterfly_ceiling(flavor: str, r_hi: int = 1024,
                      unroll: int = 16, repack: bool = False,
                      layout: str = "sublane") -> dict:
    """Measured butterflies/s of a butterfly-only kernel (planes
    resident in VMEM, no base-case product, no HBM re-streaming, no
    dispatch) — the PE x f_clk analog.  ``repack=True`` adds the
    constant-geometry two-plane repack (mask + two rolls + two selects)
    after every stage, i.e. the real kernels' exact stage loop: the
    STAGE speed-of-light a perfect fused transform could reach.

    ``layout`` picks the repack/broadcast geometry (the two the real
    kernels use):

    - ``"sublane"``: coefficients on sublanes, twiddles broadcast along
      lanes, repack rolls axis 0 — the packed butterfly kernels
      (ops/butterfly._make_kernel_packed*, ops/matvec).
    - ``"lane"``: coefficients on lanes, twiddles broadcast along
      sublanes, repack rolls axis 1 — the bigq flat kernels
      (ops/bigq_kernel) and the row-stage half of the four-step kernels
      (ops/fourstep).  Lane rolls cost ~25% more than sublane rolls on
      this hardware, so a lane-geometry kernel judged against the
      sublane ceiling looks artificially slow (ADVICE r3 #2).
    - ``"lane_wide"``: lane layout at 2048-lane planes with roll
      distances up to 1024 — the bigq62 flat kernel's actual geometry
      (h = n/2 = 2048 coefficient lanes); long cross-register lane
      rolls cost more than the 512-lane unit's ≤64-distance rolls.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if layout not in ("sublane", "lane", "lane_wide"):
        raise ValueError(f"bad layout: {layout}")
    lane = layout in ("lane", "lane_wide")
    wide = layout == "lane_wide"
    # coefficient-axis length: 128 sublanes or 512/2048 lanes per plane
    clen = (2048 if wide else _TILE) if lane else _H
    q = _FLAVOR_Q[flavor]
    stage = _stage_ops(flavor, q)
    rng = np.random.default_rng(0)
    lanes = clen if wide else _TILE
    x = jnp.asarray(rng.integers(0, q, (_BLOCKS * 2 * _H, lanes)),
                    jnp.int32)
    # 16 twiddle rows cycled per stage: data-dependent planes + varying
    # broadcast rows leave the compiler nothing to fold
    tw = rng.integers(1, q, (16, clen)).astype(np.int32)
    twf = ((tw.astype(np.int64) << 16) // q).astype(np.int32) \
        if flavor == "shoup" else tw
    if flavor == "f32":
        twf32 = (tw.astype(np.float64) / q).astype(np.float32)
    spec = pl.BlockSpec((2 * _H, lanes), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((16, clen), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    comp = twf32 if flavor == "f32" else twf
    tw_j, comp_j = jnp.asarray(tw), jnp.asarray(comp)

    def make(outer):
        from jax.experimental.pallas import tpu as _pltpu
        raxis = 1 if lane else 0

        def do_repack(A, B, s):
            bsz = 1 << (s % (11 if wide else 7))   # representative dists
            i = jax.lax.broadcasted_iota(jnp.int32, A.shape, raxis)
            mask = ((i // bsz) & 1) == 0
            A2 = jnp.where(mask, A, _pltpu.roll(B, bsz, raxis))
            B2 = jnp.where(mask, _pltpu.roll(A, clen - bsz, raxis), B)
            return A2, B2

        def kernel(x_ref, tw_ref, cp_ref, o_ref):
            A = x_ref[: _H, :]
            B = x_ref[_H:, :]

            def body(_, ab):
                A, B = ab
                for s in range(unroll):
                    w = tw_ref[s % 16, :]
                    w = w[None, :] if lane else w[:, None]
                    c = None
                    if flavor != "mont":
                        c = cp_ref[s % 16, :]
                        c = c[None, :] if lane else c[:, None]
                    A, B = stage(A, B, w, c)
                    if repack:
                        A, B = do_repack(A, B, s)
                return A, B

            A, B = jax.lax.fori_loop(0, outer, body, (A, B))
            o_ref[...] = jnp.concatenate([A, B], axis=0)
        return kernel

    def run(outer):
        call = pl.pallas_call(
            make(outer), grid=(_BLOCKS,),
            in_specs=[spec, tw_spec, tw_spec],
            out_specs=spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32))
        f = jax.jit(lambda v: jnp.max(call(v, tw_j, comp_j)))
        return _min_time(lambda: f(x))

    r_lo = max(1, r_hi // 4)
    t_hi, t_lo = run(r_hi), run(r_lo)
    slope = (t_hi - t_lo) / (r_hi - r_lo)       # s per unroll-block
    bf = unroll * _BLOCKS * _H * lanes          # butterflies per block
    rate = bf / slope if slope > 0 else float("nan")
    return {"gbf_per_s": round(rate / 1e9, 2),
            "t_hi_s": t_hi, "t_lo_s": t_lo, "r_hi": r_hi,
            "unroll": unroll, "q": q}


class _Box:
    """Minimal Ref stand-in so a shipped Pallas kernel FUNCTION can run
    inline inside a calibration kernel: ``ref[...]`` reads the held
    value, ``ref[...] = v`` stores it.  Using the kernel function itself
    (not a re-implementation) is what makes the ruler drift-proof."""

    __slots__ = ("v",)

    def __init__(self, v=None):
        self.v = v

    def __getitem__(self, idx):
        return self.v

    def __setitem__(self, idx, val):
        self.v = val


def _independent_products_rate(kernel_fn, n: int, tile: int, tabs,
                               tab_specs, q: int, r_hi: int,
                               unroll: int = 2, iters: int = 10):
    """Resident-kernel speed-of-light: run ``kernel_fn`` (the EXACT
    shipped kernel function, via :class:`_Box` refs) on VMEM-resident
    planes, ``unroll·outer`` times per grid block, with INDEPENDENT
    operands per iteration (inputs advance by a 1-op sublane roll, the
    output folds into an xor accumulator) — the same product-level
    parallelism the streamed kernel enjoys across grid blocks, with the
    HBM streaming and dispatch removed.  A resident CHAIN (out feeds
    the next input) is the wrong unit: it serializes products and
    measured ~8% BELOW the streamed kernel, i.e. not a ceiling.

    Two-point min-time fit over ``outer``; returns rows/s (one row =
    one n-coefficient product per lane)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, q, (_BLOCKS * n, tile)), jnp.int32)
    y = jnp.asarray(rng.integers(0, q, (_BLOCKS * n, tile)), jnp.int32)
    spec = pl.BlockSpec((n, tile), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def make(outer):
        def kernel(a_ref, b_ref, *rest):
            tab_vals = [r[...] for r in rest[:-1]]
            o_ref = rest[-1]

            def body(_, st):
                a, b, acc = st
                for _s in range(unroll):
                    out = _Box()
                    kernel_fn(_Box(a), _Box(b),
                              *[_Box(t) for t in tab_vals], out)
                    acc = acc ^ out.v
                    a = pltpu.roll(a, 1, 0)
                    b = pltpu.roll(b, 2, 0)
                return a, b, acc

            a, b, acc = jax.lax.fori_loop(
                0, outer, body,
                (a_ref[...], b_ref[...], jnp.zeros_like(a_ref[...])))
            o_ref[...] = acc
        return kernel

    def run(outer):
        call = pl.pallas_call(
            make(outer), grid=(_BLOCKS,),
            in_specs=[spec, spec] + list(tab_specs),
            out_specs=spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32))
        f = jax.jit(lambda a, b: jnp.max(call(a, b, *tabs)))
        return _min_time(lambda: f(x, y), iters=iters)

    # best of 2 interleaved visits per point: tunnel noise is strictly
    # one-sided (slow), so the max over repeated rate measurements is
    # the consistent estimator for a CEILING — a single-visit unit can
    # read a few percent low and make the real kernel "beat" it
    r_lo = max(1, r_hi // 4)
    t_hi = t_lo = np.inf
    for _visit in range(2):
        t_hi = min(t_hi, run(r_hi))
        t_lo = min(t_lo, run(r_lo))
    slope = (t_hi - t_lo) / (r_hi - r_lo)
    rows = unroll * _BLOCKS * tile
    rate = rows / slope if slope > 0 else float("nan")
    return {"mrows_per_s": round(rate / 1e6, 2),
            "t_hi_s": t_hi, "t_lo_s": t_lo, "r_hi": r_hi,
            "unroll": unroll, "n": n, "q": q}


def _chain_fit_rate(step, init_state, rows_per_call: int,
                    ivs: tuple[int, ...]) -> float:
    """Best sustained STREAMED rate of a device-chained kernel: run
    ``step(state) -> state`` (one product whose output feeds the next
    input) ``iv`` times per call at the chain lengths ``ivs``, with an
    interleaved 2-visit min-time least-squares fit over iv — the slope
    excludes dispatch, the interleaving cancels minute-scale relay
    drift (r4 methodology, now in ONE place for every class ruler).
    Returns rows/s."""
    import jax
    import jax.numpy as jnp
    import time as _time

    def chain(iv):
        def f(*state):
            st = jax.lax.fori_loop(0, iv, lambda _, t: step(t),
                                   tuple(state))
            return jnp.max(st[0])
        return jax.jit(f)

    fns = {iv: chain(iv) for iv in ivs}
    mins = {}
    for fv in fns.values():
        int(np.asarray(fv(*init_state)))      # compile + sync
    for _visit in range(2):
        for iv, fv in fns.items():
            ts = []
            for _ in range(6):
                t0 = _time.perf_counter()
                int(np.asarray(fv(*init_state)))
                ts.append(_time.perf_counter() - t0)
            mins[iv] = min(mins.get(iv, float("inf")), min(ts))
    xs = np.array(list(mins), float)
    ys = np.array([mins[iv] for iv in mins], float)
    den = float(((xs - xs.mean()) ** 2).sum())
    slope = float(((xs - xs.mean()) * (ys - ys.mean())).sum()) / den
    return rows_per_call / slope if slope > 0 else 0.0


def _streamed_chain_rate(polymul_cm, n: int, q: int,
                         batch: int = 4096) -> float:
    """Streamed class-rate of a coefficient-major packed kernel (see
    :func:`_chain_fit_rate`): used as a component of the whole-kernel
    class ceilings — resident fori_loop harnesses schedule some kernel
    bodies worse than the streamed grid does (the f32 body measured
    ~35% below its own streamed rate), so the class ceiling is
    max(resident, streamed-at-calibration-time)."""
    import jax.numpy as jnp

    rng2 = np.random.default_rng(1)
    a = jnp.asarray(rng2.integers(0, q, (batch, n)), jnp.int32).T
    b = jnp.asarray(rng2.integers(0, q, (batch, n)), jnp.int32).T
    return _chain_fit_rate(lambda st: (polymul_cm(st[0], st[1]), st[0]),
                           (a, b), batch, (128, 64, 32))


def kernel_class_ceiling(kind: str, r_hi: int = 192) -> dict:
    """Whole-kernel-class ceiling for the n=256 preset rows: the EXACT
    shipped packed kernel function (ops/butterfly) with HBM streaming
    and dispatch removed (resident harness), maxed with the streamed
    chained rate measured at calibration time.  ``kind``: "shoup256"
    (sw256/hw256 class) or "f32_256" (dilithium256 class — VERDICT r4
    next #5: previously judged on the generic stage ruler because the
    resident harness alone under-reads the float-assisted body ~35%;
    the streamed component makes the class ceiling valid for it)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops.butterfly import PallasPolymul
    from ..params import make_params

    q = {"shoup256": 12289, "f32_256": 8380417}[kind]
    n, tile = 256, _TILE
    pk = PallasPolymul(make_params(n, q), tile=tile, layout="cm")
    assert pk.packed and pk.cm
    kernel_fn = pk._PACKED[pk.flavor](pk.params, tile, cm=True)
    tw_spec = pl.BlockSpec((pk.params.log2n, n // 2), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    tabs = tuple(jnp.asarray(t) for t in
                 (pk._ptwf, pk._ptwfsh, pk._ptwi, pk._ptwish))
    out = _independent_products_rate(kernel_fn, n, tile, tabs,
                                     [tw_spec] * 4, q, r_hi)
    streamed = _streamed_chain_rate(pk.polymul_cm, n, q) / 1e6
    out["streamed_mrows_per_s"] = round(streamed, 2)
    out["resident_mrows_per_s"] = out["mrows_per_s"]
    out["mrows_per_s"] = round(max(out["mrows_per_s"], streamed), 2)
    return out


def incomplete_kernel_ceiling(r_hi: int = 192, n: int = 256,
                              q: int = 3329) -> dict:
    """Whole-kernel-class resident ceiling for the incomplete-NTT
    (Kyber) class.  Round-3's kyber pe_fraction landed at 1.028 because
    the base-case product was converted to butterflies at a
    hand-estimated op weight; pricing the row from the shipped kernel's
    own resident rate removes the op model entirely (VERDICT r3
    missing #2).

    Two units:

    - ``polymul``: the exact shipped kernel function (2 fwd, 2
      basemuls, 1 inv, scale per product).
    - ``roundtrip``: fwd + inv + scale only (shared closures,
      butterfly._incomplete_packed_closures) — isolates the transform
      cost so the fused matvec (k(k+2) transforms + k² basemuls) can be
      priced from the same measurements.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops.butterfly import (PallasIncompletePolymul,
                                 _incomplete_packed_closures,
                                 _make_incomplete_kernel_packed)

    tile = _TILE
    pk = PallasIncompletePolymul(n, q, tile=tile)
    assert pk.packed and pk.cm
    log2m = pk.sub_p.log2n
    tw_spec = pl.BlockSpec((log2m, n // 2), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((n // 2, 2), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    tabs = tuple(jnp.asarray(t) for t in
                 (pk._ptwf, pk._ptwfsh, pk._ptwi, pk._ptwish,
                  pk._pt, pk._ptsh))
    out = {"tile": tile}
    out["polymul"] = _independent_products_rate(
        _make_incomplete_kernel_packed(pk.sub_p, n, tile), n, tile,
        tabs, [tw_spec] * 4 + [t_spec] * 2, q, r_hi)

    # The resident fori_loop harness cannot pipeline across loop
    # iterations the way the streamed grid pipelines across blocks, so
    # for this roll-heavy kernel it reads a few percent BELOW the real
    # kernel's sustained rate.  Measure the streamed kernel itself and
    # take the max: the class ceiling is the best sustained rate
    # demonstrably achievable on this chip, measured at calibration
    # time — independent of any sweep run judged against it.
    streamed = _streamed_chain_rate(pk.polymul_cm, n, q) / 1e6
    out["polymul"]["streamed_mrows_per_s"] = round(streamed, 2)
    out["polymul"]["resident_mrows_per_s"] = out["polymul"]["mrows_per_s"]
    out["polymul"]["mrows_per_s"] = round(
        max(out["polymul"]["mrows_per_s"], streamed), 2)

    # roundtrip unit: fwd + inv + scale from the shared closures, same
    # independent-products discipline (b operand unused)
    cl = _incomplete_packed_closures(pk.sub_p, n, tile)
    rt = cl["roundtrip_planes"]

    def rt_kernel(a_ref, b_ref, twf_ref, twfsh_ref, twi_ref, twish_ref,
                  t_ref, tsh_ref, o_ref):
        del b_ref, t_ref, tsh_ref
        o_ref[...] = rt(a_ref[...], twf_ref[...], twfsh_ref[...],
                        twi_ref[...], twish_ref[...])

    out["roundtrip"] = _independent_products_rate(
        rt_kernel, n, tile, tabs, [tw_spec] * 4 + [t_spec] * 2, q, r_hi)
    return out


def bigq_flat_ceiling(n: int = 4096, qbits: int = 62,
                      r_hi: int = 48, q: int | None = None) -> dict:
    """Whole-kernel-class ceiling + per-section breakdown for the flat
    one-kernel big-q class (ops/bigq_kernel.PallasBigQ at the bigq62
    sweep point) — the incomplete_kernel methodology applied to the one
    row that had neither a >=0.90 fraction nor a committed diagnosis
    (VERDICT r4 next #1).

    Three resident units, all built from the SHIPPED kernel's own
    closures (ops/bigq_kernel._flat_pieces):

    - ``split``:    chunk extraction + all-k channel residues (×2 operands)
    - ``channels``: all-k packed fwd×2 + pointwise + inv + final scale
    - ``garner``:   signed Garner CRT + Barrett mod-q + plane packing (×2
                    output plane pairs, matching the kernel's A/B halves)

    plus the full kernel resident rate and its streamed chained rate;
    the class ceiling is max(resident, streamed).  Sections let a
    sub-ceiling sweep row name the dominant term instead of shipping an
    opaque fraction."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..bigq import select_rns_primes
    from ..ops import bigq_kernel as bk
    from ..params import find_params, make_params

    if q is not None:
        p = make_params(n, q)
        qbits = q.bit_length()
    else:
        p = find_params(n, qbits)
    primes = select_rns_primes(n, 1 + p.log2n + 2 * qbits + 1)
    kb = bk.PallasBigQ(n, primes, p.q)
    tile, k = kb.tile, len(primes)
    pc = bk._flat_pieces(n, kb.primes, kb.q, tile)
    h, wide = pc["h"], pc["wide"]
    kernel_fn = bk._make_bigq_kernel(n, kb.primes, kb.q, tile)

    rng = np.random.default_rng(0)
    nblk = 4                                  # grid blocks resident
    vals = rng.integers(0, p.q, (nblk * tile, n), dtype=np.uint64)
    from ..ops.limb import pack_u64_planes
    lo_np, hi_np = pack_u64_planes(vals, wide=wide)
    lo = jnp.asarray(lo_np)
    hi = jnp.asarray(hi_np)
    twf = jnp.asarray(kb._twf)
    twi = jnp.asarray(kb._twi)
    data_spec = pl.BlockSpec((tile, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec(kb._twf.shape, lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)

    def measure(make_kernel, r_hi_local: int | None = None):
        """Resident two-point fit of a (loop-body) kernel factory."""
        rh = r_hi_local if r_hi_local is not None else r_hi

        def run(outer):
            call = pl.pallas_call(
                make_kernel(outer), grid=(nblk,),
                in_specs=[data_spec] * 4 + [tw_spec] * 2,
                out_specs=data_spec,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                out_shape=jax.ShapeDtypeStruct(lo.shape, jnp.int32))
            f = jax.jit(lambda a, b, c, d: jnp.max(call(a, b, c, d,
                                                        twf, twi)))
            return _min_time(lambda: f(lo, hi, lo, hi), iters=8)

        r_lo = max(1, rh // 4)
        t_hi = t_lo = np.inf
        for _visit in range(2):
            t_hi = min(t_hi, run(rh))
            t_lo = min(t_lo, run(r_lo))
        slope = (t_hi - t_lo) / (rh - r_lo)
        rows = nblk * tile
        return {"mrows_per_s": round(rows / slope / 1e6, 3)
                if slope > 0 else float("nan"),
                "t_hi_s": t_hi, "t_lo_s": t_lo, "r_hi": rh}

    ops, garner = pc["ops"], pc["garner"]
    channel_products = pc["channel_products"]

    def full_kernel(outer):
        def kern(la_ref, ha_ref, lb_ref, hb_ref, twf_ref, twi_ref,
                 o_ref):
            twf_, twi_ = twf_ref[...], twi_ref[...]

            def body(_, st):
                la, ha, lb, hb, acc = st
                out = _Box()
                kernel_fn(_Box(la), _Box(ha), _Box(lb), _Box(hb),
                          _Box(twf_), _Box(twi_), out, _Box())
                acc = acc ^ out.v
                return (pltpu.roll(la, 1, 1), pltpu.roll(ha, 1, 1),
                        pltpu.roll(lb, 2, 1), pltpu.roll(hb, 2, 1),
                        acc)

            st = jax.lax.fori_loop(
                0, outer, body,
                (la_ref[...], ha_ref[...], lb_ref[...], hb_ref[...],
                 jnp.zeros_like(la_ref[...])))
            o_ref[...] = st[4]
        return kern

    def split_kernel(outer):
        def kern(la_ref, ha_ref, lb_ref, hb_ref, twf_ref, twi_ref,
                 o_ref):
            del twf_ref, twi_ref

            def body(_, st):
                la, ha, lb, hb, acc = st
                ca = bk._chunks(la, ha, wide)
                cb = bk._chunks(lb, hb, wide)
                for i in range(k):
                    acc = acc ^ ops[i]["residue"](*ca)
                    acc = acc ^ ops[i]["residue"](*cb)
                return (pltpu.roll(la, 1, 1), pltpu.roll(ha, 1, 1),
                        pltpu.roll(lb, 2, 1), pltpu.roll(hb, 2, 1),
                        acc)

            st = jax.lax.fori_loop(
                0, outer, body,
                (la_ref[...], ha_ref[...], lb_ref[...], hb_ref[...],
                 jnp.zeros_like(la_ref[...])))
            o_ref[...] = st[4]
        return kern

    def channels_kernel(outer):
        def kern(la_ref, ha_ref, lb_ref, hb_ref, twf_ref, twi_ref,
                 o_ref):
            twf_, twi_ = twf_ref[...], twi_ref[...]
            ca = bk._chunks(la_ref[...], ha_ref[...], wide)
            cb = bk._chunks(lb_ref[...], hb_ref[...], wide)
            ra0 = [ops[i]["residue"](*ca) for i in range(k)]
            rb0 = [ops[i]["residue"](*cb) for i in range(k)]

            def body(_, st):
                ra, rb, acc = st
                prods = channel_products(ra, rb, twf_, twi_)
                for A, B in prods:
                    acc = acc ^ jnp.concatenate([A, B], axis=1)
                return ([pltpu.roll(r, 1, 1) for r in ra],
                        [pltpu.roll(r, 2, 1) for r in rb], acc)

            st = jax.lax.fori_loop(
                0, outer, body, (ra0, rb0, jnp.zeros_like(la_ref[...])))
            o_ref[...] = st[2]
        return kern

    def garner_kernel(outer):
        def kern(la_ref, ha_ref, lb_ref, hb_ref, twf_ref, twi_ref,
                 o_ref):
            del twf_ref, twi_ref
            ca = bk._chunks(la_ref[...], ha_ref[...], wide)
            cb = bk._chunks(lb_ref[...], hb_ref[...], wide)
            pa0 = [ops[i]["residue"](*ca)[:, :h] for i in range(k)]
            pb0 = [ops[i]["residue"](*cb)[:, :h] for i in range(k)]

            def body(_, st):
                pa, pb, acc = st
                loA, hiA = garner(pa)
                loB, hiB = garner(pb)
                acc = acc ^ jnp.concatenate([loA ^ hiA, loB ^ hiB],
                                            axis=1)
                return ([pltpu.roll(x, 1, 1) for x in pa],
                        [pltpu.roll(x, 2, 1) for x in pb], acc)

            st = jax.lax.fori_loop(
                0, outer, body, (pa0, pb0, jnp.zeros_like(la_ref[...])))
            o_ref[...] = st[2]
        return kern

    out = {"n": n, "q": int(p.q), "k": k, "tile": tile,
           "polymul": measure(full_kernel),
           "sections": {"split": measure(split_kernel, 16 * r_hi),
                        "channels": measure(channels_kernel),
                        "garner": measure(garner_kernel, 4 * r_hi)}}

    # streamed chained rate of the REAL kernel (packed-plane chain)
    batch = 512
    vals2 = rng.integers(0, p.q, (batch, n), dtype=np.uint64)
    l2, h2 = pack_u64_planes(vals2, wide=wide)
    la = jnp.asarray(l2)
    ha = jnp.asarray(h2)

    def step(st):
        lc, hc = kb.polymul_planes(st[0], st[1], st[2], st[3])
        return lc, hc, st[0], st[1]

    streamed = _chain_fit_rate(step, (la, ha, la, ha), batch,
                               (32, 16, 8)) / 1e6
    out["polymul"]["streamed_mrows_per_s"] = round(streamed, 3)
    out["polymul"]["resident_mrows_per_s"] = out["polymul"]["mrows_per_s"]
    out["polymul"]["mrows_per_s"] = round(
        max(out["polymul"]["mrows_per_s"], streamed), 3)
    return out


def fourstep_class_ceiling(flavor: str = "f32", n: int = 1 << 16,
                           r_hi: int = 48) -> dict:
    """Whole-kernel-class ceiling for the fused four-step kernels at the
    large/large23 sweep shapes: the EXACT shipped kernel function
    (ops/fourstep._make_fourstep_kernel) run resident in VMEM with
    independent operands per iteration, maxed with the streamed chained
    rate — the same discipline as kernel_class_ceiling, applied to the
    class the f32 large-ring row is judged against (VERDICT r4 next #5).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops import fourstep as fsm
    from ..params import find_params, make_params

    p = (make_params(n, 7340033) if flavor == "f32"
         else find_params(n, 28))
    fs = fsm.PallasFourStep(p)

    def resident_rate(tile: int) -> float:
        """Resident _Box harness of the shipped kernel at one tile."""
        fst = fsm.PallasFourStep(p, tile=tile)
        n1, n2 = fst.n1, fst.n2
        kernel_fn = fsm._make_fourstep_kernel(fst.p1, fst.p2, p.q, tile)
        tabs_np = (fst._ctwf, fst._ctwfsh, fst._ctwi, fst._ctwish,
                   fst._rtwf, fst._rtwfsh, fst._rtwi, fst._rtwish,
                   fst._twfA, fst._twfAsh, fst._twfB, fst._twfBsh,
                   fst._twiA, fst._twiAsh, fst._twiB, fst._twiBsh)
        tabs = tuple(jnp.asarray(t) for t in tabs_np)
        rng = np.random.default_rng(0)
        nblk = 4
        x = jnp.asarray(rng.integers(0, p.q, (nblk * tile, n1, n2)),
                        jnp.int32)
        y = jnp.asarray(rng.integers(0, p.q, (nblk * tile, n1, n2)),
                        jnp.int32)
        data_spec = pl.BlockSpec((tile, n1, n2), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)

        def tab_spec(t):
            return pl.BlockSpec(t.shape, lambda i, s=len(t.shape):
                                (0,) * s, memory_space=pltpu.VMEM)

        def make(outer):
            def kern(a_ref, b_ref, *rest):
                tab_vals = [r[...] for r in rest[:-1]]
                o_ref = rest[-1]

                def body(_, st):
                    a, b, acc = st
                    out = _Box()
                    kernel_fn(_Box(a), _Box(b),
                              *[_Box(t) for t in tab_vals], out)
                    acc = acc ^ out.v
                    return (pltpu.roll(a, 1, 1), pltpu.roll(b, 1, 2),
                            acc)

                a, b, acc = jax.lax.fori_loop(
                    0, outer, body,
                    (a_ref[...], b_ref[...],
                     jnp.zeros_like(a_ref[...])))
                o_ref[...] = acc
            return kern

        def run(outer):
            call = pl.pallas_call(
                make(outer), grid=(nblk,),
                in_specs=[data_spec, data_spec] + [tab_spec(t)
                                                   for t in tabs_np],
                out_specs=data_spec,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32))
            f = jax.jit(lambda a, b: jnp.max(call(a, b, *tabs)))
            return _min_time(lambda: f(x, y), iters=8)

        r_lo = max(1, r_hi // 4)
        t_hi = t_lo = np.inf
        for _visit in range(2):
            t_hi = min(t_hi, run(r_hi))
            t_lo = min(t_lo, run(r_lo))
        slope = (t_hi - t_lo) / (r_hi - r_lo)
        return (nblk * tile) / slope if slope > 0 else 0.0

    # the resident harness's scheduling is tile-sensitive in both
    # directions; a CEILING takes the best over the tile variants the
    # shipped kernel could use
    res = max(resident_rate(t) for t in {1, fs.tile})
    out = {"mrows_per_s": round(res / 1e6, 4), "r_hi": r_hi,
           "n": n, "q": int(p.q), "flavor": flavor,
           "tile": fs.tile}

    # streamed chained component (outputs are canonical: chainable)
    batch = 16
    rng = np.random.default_rng(1)
    a2 = jnp.asarray(rng.integers(0, p.q, (batch, n)), jnp.int32)
    b2 = jnp.asarray(rng.integers(0, p.q, (batch, n)), jnp.int32)
    streamed = _chain_fit_rate(
        lambda st: (fs.polymul(st[0], st[1]), st[0]),
        (a2, b2), batch, (64, 32, 16)) / 1e6
    out["streamed_mrows_per_s"] = round(streamed, 4)
    out["resident_mrows_per_s"] = out["mrows_per_s"]
    out["mrows_per_s"] = round(max(out["mrows_per_s"], streamed), 4)
    return out


def blocked_bigq_phase_times(n: int = 1 << 20, qbits: int = 62,
                             b_hi: int = 64, b_lo: int = 16) -> dict:
    """Measured per-phase marginal costs of the blocked big-q pipeline
    (bigq.PallasBigQBlocked at the bigq1m sweep point): each phase
    kernel — split, channel K1/K2/K3 (channel 0, identical op count per
    prime), Garner — timed standalone over two batch sizes; the slope is
    that phase's seconds-per-row with dispatch excluded.  The sum prices
    a 'serial composition of its own parts' ceiling for the pipeline,
    and the per-phase terms name where the time goes (VERDICT r4 next
    #1: bigq1m needs a committed per-section breakdown or a fix)."""
    import jax
    import jax.numpy as jnp

    from ..bigq import BigQPlan
    from ..params import find_params
    from ..ops.limb import pack_u64_planes

    p = find_params(n, qbits)
    plan = BigQPlan(p)
    kb = plan.fused_kernel
    if kb is None or not hasattr(kb, "channels"):
        raise RuntimeError("blocked pipeline not selected at this point")
    k = len(kb.primes)
    ck = kb.channels.kernels[0]
    n1, n2 = ck.n1, ck.n2
    rng = np.random.default_rng(0)

    def fit(make_fn, mk_args):
        """Batch-slope fit; sync via a SCALAR witness — materialising a
        (k, B, 2^20) output would time the tunnel d2h transfer (~1 s for
        192 MB), not the kernel."""
        pts = {}
        fns = {}
        for bsz in (b_hi, b_lo):
            args = mk_args(bsz)
            raw = make_fn()
            f = jax.jit(lambda *a, _r=raw: jnp.max(
                jax.tree_util.tree_leaves(_r(*a))[0]))
            fns[bsz] = (f, args)
            int(np.asarray(f(*args)))                    # compile
        for _visit in range(2):
            for bsz, (f, args) in fns.items():
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    int(np.asarray(f(*args)))
                    ts.append(time.perf_counter() - t0)
                pts[bsz] = min(pts.get(bsz, np.inf), min(ts))
        return (pts[b_hi] - pts[b_lo]) / (b_hi - b_lo)   # s per row

    # split: packed planes -> k residue planes
    def mk_split_args(bsz):
        vals = rng.integers(0, p.q, (bsz, n), dtype=np.uint64)
        lo, hi = pack_u64_planes(vals, wide=kb.wide)
        return jnp.asarray(lo), jnp.asarray(hi)

    t_split = fit(lambda: kb.split.split_planes, mk_split_args)

    # channel kernels on channel 0 (op count identical across primes)
    k1tabs = (ck._ctwf, ck._ctwfsh, ck._twfA, ck._twfAsh,
              ck._twfB, ck._twfBsh)
    k2tabs = (ck._rtwf, ck._rtwfsh, ck._rtwi, ck._rtwish,
              ck._twi_full, ck._twish_full)
    k3tabs = (ck._ctwi, ck._ctwish)
    call_k1, call_k2, call_k3 = ck._calls

    def mk_mat_args(bsz):
        x = rng.integers(0, ck.params.q, (bsz, n1, n2))
        return (jnp.asarray(x, jnp.int32),)

    def mk_mat2_args(bsz):
        x = rng.integers(0, ck.params.q, (bsz, n1, n2))
        y = rng.integers(0, ck.params.q, (bsz, n1, n2))
        return jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32)

    t_k1 = fit(lambda: (lambda x: call_k1(x, *k1tabs)), mk_mat_args)
    t_k2 = fit(lambda: (lambda x, y: call_k2(x, y, *k2tabs)),
               mk_mat2_args)
    t_k3 = fit(lambda: (lambda x: call_k3(x, *k3tabs)), mk_mat_args)

    # garner: k channel planes -> packed output planes
    def mk_garner_args(bsz):
        r = rng.integers(0, min(kb.primes), (k, bsz, n))
        return (jnp.asarray(r, jnp.int32),)

    t_garner = fit(lambda: kb.garner.garner_planes, mk_garner_args)

    total = 2 * t_split + k * (2 * t_k1 + t_k2 + t_k3) + t_garner
    return {"n": n, "q": int(p.q), "k": k,
            "per_row_s": {"split": t_split, "k1": t_k1, "k2": t_k2,
                          "k3": t_k3, "garner": t_garner},
            "composed_row_s": total,
            "note": "split and k1 counted twice (operands a and b), "
                    "channel kernels x k channels; measured "
                    "batch-slope, dispatch excluded"}


def hbm_bytes_per_s(nblocks: int = 128, reps_hi: int = 32) -> dict:
    """Sustained HBM stream bandwidth (read + write) in bytes/s."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.ones((nblocks * _BROWS, _BLANES), jnp.int32)
    in_spec = pl.BlockSpec((_BROWS, _BLANES), lambda r, i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_BROWS, _BLANES), lambda r, i: (i, 0),
                            memory_space=pltpu.VMEM)

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1

    def run(reps):
        call = pl.pallas_call(
            kernel, grid=(reps, nblocks), in_specs=[in_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32))
        f = jax.jit(lambda v: jnp.max(call(v)))
        return _min_time(lambda: f(x))

    r_lo = max(1, reps_hi // 4)
    t_hi, t_lo = run(reps_hi), run(r_lo)
    slope = (t_hi - t_lo) / (reps_hi - r_lo)
    bytes_per_rep = 2 * nblocks * _BROWS * _BLANES * 4
    rate = bytes_per_rep / slope if slope > 0 else float("nan")
    return {"hbm_bytes_per_s": rate,
            "hbm_detail": {"t_hi_s": t_hi, "t_lo_s": t_lo,
                           "reps_hi": reps_hi, "reps_lo": r_lo,
                           "bytes_per_rep": bytes_per_rep}}


_CAL_PATH = pathlib.Path(__file__).resolve().parents[2] / \
    "CALIBRATION.json"


def calibrate(path: pathlib.Path | str | None = None) -> dict:
    """Measure the per-flavor butterfly ceilings + HBM bandwidth on the
    current default device; write CALIBRATION.json."""
    import jax
    dev = jax.devices()[0]
    out = {"what": "measured speed-of-light ceilings "
                   "(tpu_ntt.utils.calibrate)",
           "platform": dev.platform, "device_kind": dev.device_kind,
           "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                      time.gmtime()),
           "pe_ceiling": {f: butterfly_ceiling(f)
                          for f in ("shoup", "f32", "mont")},
           "stage_ceiling": {f: butterfly_ceiling(f, repack=True)
                             for f in ("shoup", "f32", "mont")},
           "stage_ceiling_lane": {f: butterfly_ceiling(f, repack=True,
                                                       layout="lane")
                                  for f in ("shoup", "f32", "mont")},
           "stage_ceiling_lane_wide": {
               "mont": butterfly_ceiling("mont", repack=True,
                                         layout="lane_wide")},
           "kernel_ceiling": {
               "shoup256": kernel_class_ceiling("shoup256"),
               "f32_256": kernel_class_ceiling("f32_256")},
           "incomplete_kernel": incomplete_kernel_ceiling()}
    # big-q class rulers (each tolerates failure independently — a
    # tunnel hiccup on one must not lose the whole artifact)
    for key, fn in (("bigq_flat", bigq_flat_ceiling),
                    ("bigq_flat64",
                     lambda: bigq_flat_ceiling(q=0xFFFFFFFF00000001)),
                    ("fourstep_kernel_f32", fourstep_class_ceiling),
                    ("bigq_blocked_phases", blocked_bigq_phase_times)):
        try:
            out[key] = fn()
        except Exception as e:                # pragma: no cover
            out[key] = {"error": f"{type(e).__name__}: {e}"}
    out.update(hbm_bytes_per_s())
    p = pathlib.Path(path) if path else _CAL_PATH
    p.write_text(json.dumps(out, indent=1))
    return out


def load_calibration(path: pathlib.Path | str | None = None):
    """Parsed CALIBRATION.json dict, or None if absent/invalid."""
    p = pathlib.Path(path) if path else _CAL_PATH
    try:
        d = json.loads(p.read_text())
        if "pe_ceiling" in d or "hbm_bytes_per_s" in d:
            return d
    except (OSError, ValueError):
        pass
    return None
