"""Fused Pallas TPU kernel: whole negacyclic polymul in one VMEM pass.

The per-chip hot path for single-word moduli (odd q < 2^29: the
reference's q=7681/q=12289, Kyber-style 3329, Dilithium 8380417, and RNS
channel primes).  One kernel performs
forward NTT(a), forward NTT(b), pointwise product and inverse NTT over a
batch tile resident in VMEM — the TPU equivalent of the FPGA keeping the
whole ring in banked BRAM across all stages (NTTN.v:94-117) instead of
spilling to DRAM between stages.

Layout strategy: the block keeps a FIXED (tile, n) shape for all stages —
Mosaic cannot re-tile lane-splitting reshapes — and each butterfly stage
is expressed as lane rotations (``pltpu.roll``) plus iota masks:

    up[i]   = x[i+d]          (partner of a lo element)
    down[i] = x[i-d]          (partner of a hi element)
    hi_vals = where(lo_mask, up, x)       # everyone sees "their hi"
    CT:  x' = where(lo_mask, lo + m, down - m + 2q),  m = shoup(hi_vals, w)
    GS:  x' = where(lo_mask, lo + hi, shoup(lo_vals - hi + 2q, w))

This is the vectorised re-expression of the FPGA's cross-PE exchange: the
brsel/brscramble permutation network (AddressGenerator.v:310-337) becomes
two lane rotations per stage, and the per-position dense twiddle tables
absorb all address generation.

Arithmetic comes in three flavors selected by q (``_flavor``):

- q < 2^14 — *lazy* Shoup/Harvey: values live in [0, 2q) between
  butterflies (one conditional 2q-subtract per output), only the final
  n^-1 scale maps back to canonical [0, q) — the int32-lane analog of the
  lazy bounds the reference's NTT-RED software documents
  (ntt_red.h:86-137).
- 2^14 <= q < 2^23 — float-assisted Barrett (ops/modmul.FBarrettArith
  in-kernel): the f32 VPU estimates each quotient to within ±3 and int32
  wraparound arithmetic recovers the exact residual — 3 multiplies per
  butterfly, covering Dilithium's q=8380417.  Values lazy in [0, 2q)
  (2q < 2^24 keeps f32 conversions exact).
- 2^23 <= q < 2^29 — 15-bit digit-serial Montgomery (the in-kernel twin
  of ops/modmul.MontArith, itself the lane re-derivation of the FPGA's
  word-level ModRed chain): twiddles stored in Montgomery form w·R mod q
  exactly like the hardware's R-scaled twiddle stream
  (test_generator.py:183-189), values canonical [0, q) between stages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import NTTParams, stage_powers
from ..validation import check_domain

__all__ = ["PallasPolymul", "PallasIncompletePolymul", "supported"]


def supported(params: NTTParams) -> bool:
    """Lazy-Shoup (q < 2^14) or digit-serial Montgomery (odd q < 2^29);
    lane rolls want n >= 2 lanes' worth."""
    return params.q < (1 << 29) and params.q % 2 == 1 and params.n >= 8


def _csub(x, m):
    """Branchless conditional subtract: [0, 2m) -> [0, m)."""
    r = x - m
    return r + ((r >> 31) & m)


def _shoup_u(x, w, wsh, q32):
    """Shoup multiply valid for ANY x in [0, 2^16) (Harvey bounds): the
    x*wsh quotient product can exceed int31 so it runs on uint32 lanes;
    x*w and t*q both stay < 2^30.  ``w``/``wsh`` may be scalars or rows.
    Returns x·w mod q in [0, 2q)."""
    t = (x.astype(jnp.uint32) * jnp.asarray(wsh).astype(jnp.uint32)) >> 16
    return x * w - t.astype(jnp.int32) * q32


# ---------------------------------------------------------------------------
# host-side table packing: dense per-position twiddles, (log2n, n)
# ---------------------------------------------------------------------------

def _flavor(q: int) -> str:
    """Kernel arithmetic class for modulus q (mirrors modmul.select_arith):
    lazy Shoup (q < 2^14), float-assisted Barrett (q < 2^23),
    digit-serial Montgomery (q < 2^29)."""
    if q < (1 << 14):
        return "shoup"
    if q < (1 << 23):
        return "f32"
    return "mont"


def _dense_stage_tables(p: NTTParams, inverse: bool, flavor: str = "shoup"):
    """w_full[s, i] = twiddle of the butterfly pair containing position i
    at stage s (same value at the lo and hi position of a pair).

    Forward: CT std2rev (psi merged when negacyclic): stage s has t=2^s
    blocks of width d=n/2t; block j (positions [2dj, 2dj+2d)) uses
    flat[t + j] with the *_rev table.
    Inverse: GS rev2std (psi^-1 merged): stage s has d=2^s-wide blocks,
    t=n/2d of them; block j uses flat[t + j].

    Returns (table, companion) per ``flavor``:
    - "shoup": int32 w, int32 floor(w·2^16/q)
    - "f32":   int32 w, float32 w/q (quotient-estimate table)
    - "mont":  int32 w·R mod q (R=2^30), zero companion (unused)
    """
    q = p.q
    base = p.omega_inv if inverse else p.omega
    psi_b = (p.psi_inv if inverse else p.psi) if p.psi else 0
    flat = stage_powers(p, base, rev=True, psi_base=psi_b)
    out = np.zeros((p.log2n, p.n), dtype=np.int64)
    for s in range(p.log2n):
        if not inverse:
            t = 1 << s
            d = p.n // (2 * t)
        else:
            d = 1 << s
            t = p.n // (2 * d)
        tw = flat[t:2 * t]                  # per block j
        out[s] = np.repeat(tw, 2 * d)       # both halves of each block
    if flavor == "mont":
        out = out * (1 << 30) % q
        return out.astype(np.int32), np.zeros_like(out, dtype=np.int32)
    if flavor == "f32":
        return (out.astype(np.int32),
                (out.astype(np.float64) / float(q)).astype(np.float32))
    sh = (out << 16) // q
    return out.astype(np.int32), sh.astype(np.int32)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _make_kernel(p: NTTParams, tile: int, mode: str = "polymul",
                 cm: bool = False):
    """``cm`` (coefficient-major): block layout (n, tile) with coefficients
    on the SUBLANE axis and batch on lanes, so every butterfly exchange is
    a sublane roll — measured ~25% cheaper than cross-lane rolls on v5e
    (rolls dominate the stage cost; arithmetic hides behind them)."""
    n, q = p.n, p.q
    log2n = p.log2n
    q32 = np.int32(q)
    two_q = np.int32(2 * q)
    axis = 0 if cm else 1
    shape = (n, tile) if cm else (tile, n)

    def bcast(row):                         # (n,) -> broadcast over batch
        return row[:, None] if cm else row[None, :]

    def csub2q(x):
        r = x - two_q
        return r + ((r >> 31) & two_q)

    def csubq(x):
        r = x - q32
        return r + ((r >> 31) & q32)

    def shoup(x, w, wsh):
        t = (x * wsh) >> 16
        return x * w - t * q32              # in [0, 2q)

    def lo_mask(d):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        return ((i // d) & 1) == 0

    def fwd(x, twf, twfsh):
        # CT std2rev: stage s pairs at lane distance d = n >> (s+1)
        for s in range(log2n):
            d = n >> (s + 1)
            mask = lo_mask(d)
            up = pltpu.roll(x, n - d, axis)   # roll requires shift >= 0
            down = pltpu.roll(x, d, axis)
            w = bcast(twf[s, :])
            wsh = bcast(twfsh[s, :])
            hi_vals = jnp.where(mask, up, x)
            m = shoup(hi_vals, w, wsh)
            # both branches land in [0, 4q): one shared csub2q after the
            # select keeps stage outputs in [0, 2q)
            x = csub2q(jnp.where(mask, x + m, down - m + two_q))
        return x                            # [0, 2q)

    def inv(x, twi, twish):
        # GS rev2std: stage s pairs at lane distance d = 2^s
        for s in range(log2n):
            d = 1 << s
            mask = lo_mask(d)
            up = pltpu.roll(x, n - d, axis)   # roll requires shift >= 0
            down = pltpu.roll(x, d, axis)
            w = bcast(twi[s, :])
            wsh = bcast(twish[s, :])
            hi_vals = jnp.where(mask, up, x)
            lo_vals = jnp.where(mask, x, down)
            # shoup input must stay < 2^15, so the sub branch reduces
            # before the multiply; the add branch ([0,4q)) shares the
            # post-select csub2q (m in [0,2q) passes through unchanged)
            m = shoup(csub2q(lo_vals - hi_vals + two_q), w, wsh)
            x = csub2q(jnp.where(mask, lo_vals + hi_vals, m))
        return x

    def mul_lazy(a, b):
        # data x data, both [0, 2q) subset of [0, 2^15): z < 2^30
        z = a * b
        hi = z >> 15
        lo = z & np.int32((1 << 15) - 1)
        c = (1 << 15) % q
        r1 = shoup(hi, np.int32(c), np.int32((c << 16) // q))
        r2 = shoup(lo, np.int32(1), np.int32((1 << 16) // q))
        return csub2q(r1 + r2)              # [0, 2q)

    ninv = p.n_inv
    ninv_sh = (ninv << 16) // q

    def kernel(a_ref, b_ref, twf_ref, twfsh_ref, twi_ref, twish_ref,
               out_ref):
        twf, twfsh = twf_ref[...], twfsh_ref[...]
        twi, twish = twi_ref[...], twish_ref[...]
        fa = fwd(a_ref[...], twf, twfsh)
        fb = fwd(b_ref[...], twf, twfsh)
        c = mul_lazy(fa, fb)
        c = inv(c, twi, twish)
        c = shoup(c, np.int32(ninv), np.int32(ninv_sh))
        out_ref[...] = csubq(c)

    def fwd_kernel(a_ref, twf_ref, twfsh_ref, out_ref):
        out_ref[...] = csubq(fwd(a_ref[...], twf_ref[...], twfsh_ref[...]))

    def inv_kernel(a_ref, twi_ref, twish_ref, out_ref):
        c = inv(a_ref[...], twi_ref[...], twish_ref[...])
        c = shoup(c, np.int32(ninv), np.int32(ninv_sh))
        out_ref[...] = csubq(c)

    return {"polymul": kernel, "fwd": fwd_kernel, "inv": inv_kernel}[mode]


def _make_kernel_mont(p: NTTParams, tile: int, mode: str = "polymul",
                      cm: bool = False):
    """Fused polymul kernel for 2^14 <= q < 2^29: canonical [0, q) values,
    15-bit digit-serial Montgomery multiplies (ops/modmul.MontArith
    re-derived in-kernel; bounds identical — all intermediates < 2^31).
    ``cm``: coefficient-major (n, tile) layout, see _make_kernel."""
    n, q = p.n, p.q
    log2n = p.log2n
    q32 = np.int32(q)
    q0 = np.int32(q & ((1 << 15) - 1))
    q1 = np.int32(q >> 15)
    qp = np.int32((-pow(q, -1, 1 << 15)) % (1 << 15))
    m15 = np.int32((1 << 15) - 1)
    axis = 0 if cm else 1
    shape = (n, tile) if cm else (tile, n)

    def bcast(row):
        return row[:, None] if cm else row[None, :]

    def csubq(x):
        r = x - q32
        return r + ((r >> 31) & q32)

    def subm(x, y):
        r = x - y
        return r + ((r >> 31) & q32)

    def redc(H, Mid, L0):
        u0 = ((L0 & m15) * qp) & m15
        t1 = (L0 + u0 * q0) >> 15
        A1 = Mid + u0 * q1 + t1
        a1h, a1l = A1 >> 15, A1 & m15
        u1 = (a1l * qp) & m15
        t2 = (a1l + u1 * q0) >> 15
        return csubq(csubq(H + a1h + u1 * q1 + t2))

    def mul(x, y):
        # x·y·R^-1 mod q; constants stored ·R cancel the R^-1
        x1, x0 = x >> 15, x & m15
        y1, y0 = y >> 15, y & m15
        return redc(x1 * y1, x1 * y0 + x0 * y1, x0 * y0)

    def lo_mask(d):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        return ((i // d) & 1) == 0

    def fwd(x, twf):
        for s in range(log2n):
            d = n >> (s + 1)
            mask = lo_mask(d)
            up = pltpu.roll(x, n - d, axis)
            down = pltpu.roll(x, d, axis)
            w = bcast(twf[s, :])
            hi_vals = jnp.where(mask, up, x)
            m = mul(hi_vals, w)
            # both branches in [0, 2q): one shared csubq after the select
            x = csubq(jnp.where(mask, x + m, down - m + q32))
        return x

    def inv(x, twi):
        for s in range(log2n):
            d = 1 << s
            mask = lo_mask(d)
            up = pltpu.roll(x, n - d, axis)
            down = pltpu.roll(x, d, axis)
            w = bcast(twi[s, :])
            hi_vals = jnp.where(mask, up, x)
            lo_vals = jnp.where(mask, x, down)
            m = mul(subm(lo_vals, hi_vals), w)   # canonical, csubq-stable
            x = csubq(jnp.where(mask, lo_vals + hi_vals, m))
        return x

    # n^-1·R² mod q: one Montgomery mul applies n^-1·R, cancelling the
    # stray R^-1 the pointwise data×data mul introduced
    final = np.int32(p.n_inv * (1 << 30) % q * (1 << 30) % q)

    def kernel(a_ref, b_ref, twf_ref, _twfsh_ref, twi_ref, _twish_ref,
               out_ref):
        twf, twi = twf_ref[...], twi_ref[...]
        fa = fwd(a_ref[...], twf)
        fb = fwd(b_ref[...], twf)
        c = mul(fa, fb)
        c = inv(c, twi)
        out_ref[...] = mul(c, jnp.full((), final, jnp.int32))

    def fwd_kernel(a_ref, twf_ref, _twfsh_ref, out_ref):
        out_ref[...] = fwd(a_ref[...], twf_ref[...])

    def inv_kernel(a_ref, twi_ref, _twish_ref, out_ref):
        # standalone inverse mirrors Plan.inverse: the n^-1·R scale also
        # cancels the R^-1 a preceding Montgomery pointwise mul left behind
        c = inv(a_ref[...], twi_ref[...])
        out_ref[...] = mul(c, jnp.full((), final, jnp.int32))

    return {"polymul": kernel, "fwd": fwd_kernel, "inv": inv_kernel}[mode]


def _make_kernel_f32(p: NTTParams, tile: int, mode: str = "polymul",
                     cm: bool = False):
    """Fused polymul kernel for 2^14 <= q < 2^23: float-assisted Barrett
    (ops/modmul.FBarrettArith re-derived in-kernel).  The f32 VPU path
    estimates each multiply's quotient to within ±3 and int32 wraparound
    arithmetic recovers the exact residual — 3 multiplies + 2 lane
    conversions per butterfly instead of the digit-serial Montgomery
    chain's 10 multiplies.  Values lazy in [0, 2q) between stages
    (2q < 2^24 keeps every f32 conversion exact); only the final n^-1
    scale maps back to canonical [0, q).  Covers Dilithium q=8380417.
    ``cm``: coefficient-major (n, tile) layout, see _make_kernel."""
    n, q = p.n, p.q
    log2n = p.log2n
    q32 = np.int32(q)
    two_q = np.int32(2 * q)
    three_q = np.int32(3 * q)
    four_q = np.int32(4 * q)
    qinv_f = np.float32(1.0 / q)
    axis = 0 if cm else 1
    shape = (n, tile) if cm else (tile, n)

    def bcast(row):
        return row[:, None] if cm else row[None, :]

    def fbar(x, w, wf):
        # x in [0, 2q) < 2^24 (f32-exact); |t - floor(x·w/q)| <= 3, so
        # x·w - t·q + 3q lands in [0, 7q) and is exact under int32
        # wraparound (|value| < 2^26 even though raw products are ~2^46)
        t = (x.astype(jnp.float32) * wf).astype(jnp.int32)
        r = x * w - t * q32 + three_q
        return _csub(_csub(r, four_q), two_q)   # [0, 2q)

    def mul_data(x, y):
        # data x data: pre-correct to canonical so the estimate error
        # stays within ±2 (three roundings on a < 2^23 quotient)
        xc = _csub(x, q32)
        yc = _csub(y, q32)
        pf = (xc.astype(jnp.float32) * yc.astype(jnp.float32) * qinv_f)
        t = pf.astype(jnp.int32)
        r = xc * yc - t * q32 + two_q           # [0, 5q)
        return _csub(_csub(r, four_q), two_q)   # [0, 2q)

    def lo_mask(d):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        return ((i // d) & 1) == 0

    def fwd(x, twf, twff):
        for s in range(log2n):
            d = n >> (s + 1)
            mask = lo_mask(d)
            up = pltpu.roll(x, n - d, axis)
            down = pltpu.roll(x, d, axis)
            w = bcast(twf[s, :])
            wf = bcast(twff[s, :])
            hi_vals = jnp.where(mask, up, x)
            m = fbar(hi_vals, w, wf)
            # both branches in [0, 4q): one shared csub2q after the select
            x = _csub(jnp.where(mask, x + m, down - m + two_q), two_q)
        return x                                # [0, 2q)

    def inv(x, twi, twif):
        for s in range(log2n):
            d = 1 << s
            mask = lo_mask(d)
            up = pltpu.roll(x, n - d, axis)
            down = pltpu.roll(x, d, axis)
            w = bcast(twi[s, :])
            wf = bcast(twif[s, :])
            hi_vals = jnp.where(mask, up, x)
            lo_vals = jnp.where(mask, x, down)
            m = fbar(_csub(lo_vals - hi_vals + two_q, two_q), w, wf)
            x = _csub(jnp.where(mask, lo_vals + hi_vals, m), two_q)
        return x

    ninv = np.int32(p.n_inv)
    ninv_f = np.float32(p.n_inv / q)

    def scale(x):
        return _csub(fbar(x, ninv, ninv_f), q32)

    def kernel(a_ref, b_ref, twf_ref, twff_ref, twi_ref, twif_ref,
               out_ref):
        twf, twff = twf_ref[...], twff_ref[...]
        twi, twif = twi_ref[...], twif_ref[...]
        fa = fwd(a_ref[...], twf, twff)
        fb = fwd(b_ref[...], twf, twff)
        c = inv(mul_data(fa, fb), twi, twif)
        out_ref[...] = scale(c)

    def fwd_kernel(a_ref, twf_ref, twff_ref, out_ref):
        out_ref[...] = _csub(fwd(a_ref[...], twf_ref[...], twff_ref[...]),
                             q32)

    def inv_kernel(a_ref, twi_ref, twif_ref, out_ref):
        out_ref[...] = scale(inv(a_ref[...], twi_ref[...], twif_ref[...]))

    return {"polymul": kernel, "fwd": fwd_kernel, "inv": inv_kernel}[mode]


# ---------------------------------------------------------------------------
# packed two-plane (constant-geometry) fused kernel
# ---------------------------------------------------------------------------

def _packed_slot_index(n: int, s: int, inverse: bool) -> np.ndarray:
    """Slot -> low-pair-position map for the packed layout at stage s.

    Packed form keeps the two members of every butterfly pair in separate
    half-length planes (A, B); slot j of stage s corresponds to the pair
    (i, i+d) with i = ((j >> log2 d) << (log2 d + 1)) | (j & (d-1)) —
    the enumeration of positions with bit d clear, in increasing order."""
    d = (1 << s) if inverse else (n >> (s + 1))
    ld = d.bit_length() - 1
    j = np.arange(n // 2)
    return ((j >> ld) << (ld + 1)) | (j & (d - 1))


def _packed_stage_tables(p: NTTParams, inverse: bool, flavor: str = "shoup"):
    """(log2n, n/2) twiddle tables: the dense per-position tables gathered
    at each stage's low-pair positions (pairs share one twiddle)."""
    tw, sh = _dense_stage_tables(p, inverse, flavor)
    idx = np.stack([_packed_slot_index(p.n, s, inverse)
                    for s in range(p.log2n)])
    return (np.take_along_axis(tw, idx, axis=1),
            np.take_along_axis(sh, idx, axis=1))


def _make_kernel_packed(p: NTTParams, tile: int, cm: bool = True):
    """Fused polymul with butterflies in constant-geometry two-plane form
    (q < 2^14, lazy Shoup).

    The mask/select kernel above computes every Shoup product and roll at
    all n positions although a pair shares one product — 2x redundant.
    Here the pair partners live in separate (n/2, tile) planes, so each
    butterfly is elementwise:

        fwd (CT):  m = shoup(B, w);  A' = A + m,  B' = A - m
        inv (GS):  A' = A + B,       B' = shoup(A - B, w)

    and the inter-stage exchange is one repack of each plane (roll +
    select on half-size data) with block size b = pair distance of the
    NEXT stage in slot space (fwd: n >> (s+2), halving; inv: 2^s,
    doubling — the exact mirror).  Total per stage: 2 half-size rolls +
    1 half-size multiply chain, versus 2 full-size rolls + 1 full-size
    multiply chain in mask/select form.

    Boundary packs are free by construction:
      entry    A = x[:n/2], B = x[n/2:]          (fwd stage 0, d = n/2)
      seam     fwd ends with A = even, B = odd slots of the bitrev
               spectrum — exactly the d=1 pairing GS-rev2std starts with,
               so pointwise runs per-plane and no repack crosses the seam
      exit     inv ends with A = out[:n/2], B = out[n/2:] (d = n/2)

    This is the Pease/constant-geometry factorisation of the same
    transform the FPGA schedules through its brsel/brscramble network
    (AddressGenerator.v:310-337) — one fixed exchange pattern per stage,
    re-expressed as vector-register rolls."""
    n, q = p.n, p.q
    h = n // 2
    log2n = p.log2n
    q32 = np.int32(q)
    two_q = np.int32(2 * q)
    axis = 0 if cm else 1
    shape = (h, tile) if cm else (tile, h)

    def bcast(row):
        return row[:, None] if cm else row[None, :]

    def csub2q(x):
        r = x - two_q
        return r + ((r >> 31) & two_q)

    def csubq(x):
        r = x - q32
        return r + ((r >> 31) & q32)

    def shoup(x, w, wsh):
        t = (x * wsh) >> 16
        return x * w - t * q32              # in [0, 2q)

    def shoup_u(x, w, wsh):
        return _shoup_u(x, w, wsh, q32)     # module helper, [0, 2q)

    shoup_u_row = shoup_u

    def block_mask(bsz):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        return ((i // bsz) & 1) == 0

    def repack(A, B, bsz):
        mask = block_mask(bsz)
        A2 = jnp.where(mask, A, pltpu.roll(B, bsz, axis))
        B2 = jnp.where(mask, pltpu.roll(A, h - bsz, axis), B)
        return A2, B2

    def fwd(A, B, twf, twfsh):
        # Harvey lazy CT: planes live in [0, 4q) (< 2^16) BETWEEN stages;
        # only the add operand is conditionally reduced, saving one csub2q
        # per butterfly vs reducing both outputs
        for s in range(log2n):
            a0 = csub2q(A)                  # [0, 2q)
            m = shoup_u_row(B, bcast(twf[s, :]), bcast(twfsh[s, :]))
            A, B = a0 + m, a0 + two_q - m   # [0, 4q)
            if s < log2n - 1:
                A, B = repack(A, B, n >> (s + 2))
        return A, B                          # planes in [0, 4q)

    def inv(A, B, twi, twish):
        # GS with [0, 2q) invariant; A-B+2q < 4q goes straight into the
        # uint32-capable Shoup multiply (no pre-reduction)
        for s in range(log2n):
            m = shoup_u_row(A - B + two_q, bcast(twi[s, :]),
                            bcast(twish[s, :]))
            A, B = csub2q(A + B), m
            if s < log2n - 1:
                A, B = repack(A, B, 1 << s)
        return A, B

    def mul_lazy(a, b):
        # data x data, both in [0, 4q) < 2^16: the product needs uint32
        z = a.astype(jnp.uint32) * b.astype(jnp.uint32)
        hi = (z >> 16).astype(jnp.int32)
        lo = (z & jnp.uint32(0xFFFF)).astype(jnp.int32)
        c = (1 << 16) % q
        r1 = shoup_u(hi, np.int32(c), np.uint32((c << 16) // q))
        r2 = shoup_u(lo, np.int32(1), np.uint32((1 << 16) // q))
        return csub2q(r1 + r2)               # [0, 2q): the inv entry bound

    ninv = p.n_inv
    ninv_sh = (ninv << 16) // q
    # scale()'s int32 shoup takes x in [0, 2q) (the inv output bound), so
    # x·wsh < 2q·2^16 must stay below int32 max: requires 2q < 2^15.  At
    # the q < 2^14 boundary (q=16381) x·wsh peaks ~295k under 2^31 — if
    # the q guard or the inv laziness window ever widens, switch scale to
    # the uint32-quotient _shoup_u.
    assert 2 * q < (1 << 15), "packed Shoup scale needs 2q < 2^15"

    def scale(x):
        return csubq(shoup(x, np.int32(ninv), np.int32(ninv_sh)))

    def split(x):
        return (x[:h], x[h:]) if cm else (x[:, :h], x[:, h:])

    def kernel(a_ref, b_ref, twf_ref, twfsh_ref, twi_ref, twish_ref,
               out_ref):
        twf, twfsh = twf_ref[...], twfsh_ref[...]
        twi, twish = twi_ref[...], twish_ref[...]
        faA, faB = fwd(*split(a_ref[...]), twf, twfsh)
        fbA, fbB = fwd(*split(b_ref[...]), twf, twfsh)
        A, B = inv(mul_lazy(faA, fbA), mul_lazy(faB, fbB), twi, twish)
        out_ref[...] = jnp.concatenate([scale(A), scale(B)], axis=axis)

    return kernel


def _make_kernel_packed_f32(p: NTTParams, tile: int, cm: bool = True):
    """Two-plane constant-geometry polymul for 2^14 <= q < 2^23: identical
    geometry to _make_kernel_packed, float-assisted Barrett arithmetic
    identical to _make_kernel_f32 (planes lazy in [0, 2q) between stages;
    every f32 conversion exact since 2q < 2^24)."""
    n, q = p.n, p.q
    h = n // 2
    log2n = p.log2n
    q32 = np.int32(q)
    two_q = np.int32(2 * q)
    three_q = np.int32(3 * q)
    four_q = np.int32(4 * q)
    qinv_f = np.float32(1.0 / q)
    axis = 0 if cm else 1
    shape = (h, tile) if cm else (tile, h)

    def bcast(row):
        return row[:, None] if cm else row[None, :]

    def fbar(x, w, wf):
        # see _make_kernel_f32: x in [0, 2q), result exact in [0, 2q)
        t = (x.astype(jnp.float32) * wf).astype(jnp.int32)
        r = x * w - t * q32 + three_q
        return _csub(_csub(r, four_q), two_q)

    def mul_data(x, y):
        xc = _csub(x, q32)
        yc = _csub(y, q32)
        pf = (xc.astype(jnp.float32) * yc.astype(jnp.float32) * qinv_f)
        t = pf.astype(jnp.int32)
        r = xc * yc - t * q32 + two_q
        return _csub(_csub(r, four_q), two_q)   # [0, 2q)

    def block_mask(bsz):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        return ((i // bsz) & 1) == 0

    def repack(A, B, bsz):
        mask = block_mask(bsz)
        A2 = jnp.where(mask, A, pltpu.roll(B, bsz, axis))
        B2 = jnp.where(mask, pltpu.roll(A, h - bsz, axis), B)
        return A2, B2

    def fwd(A, B, twf, twff):
        for s in range(log2n):
            m = fbar(B, bcast(twf[s, :]), bcast(twff[s, :]))
            A, B = _csub(A + m, two_q), _csub(A - m + two_q, two_q)
            if s < log2n - 1:
                A, B = repack(A, B, n >> (s + 2))
        return A, B                              # planes in [0, 2q)

    def inv(A, B, twi, twif):
        for s in range(log2n):
            m = fbar(_csub(A - B + two_q, two_q), bcast(twi[s, :]),
                     bcast(twif[s, :]))
            A, B = _csub(A + B, two_q), m
            if s < log2n - 1:
                A, B = repack(A, B, 1 << s)
        return A, B

    ninv = np.int32(p.n_inv)
    ninv_f = np.float32(p.n_inv / q)

    def scale(x):
        return _csub(fbar(x, ninv, ninv_f), q32)

    def split(x):
        return (x[:h], x[h:]) if cm else (x[:, :h], x[:, h:])

    def kernel(a_ref, b_ref, twf_ref, twff_ref, twi_ref, twif_ref,
               out_ref):
        twf, twff = twf_ref[...], twff_ref[...]
        twi, twif = twi_ref[...], twif_ref[...]
        faA, faB = fwd(*split(a_ref[...]), twf, twff)
        fbA, fbB = fwd(*split(b_ref[...]), twf, twff)
        A, B = inv(mul_data(faA, fbA), mul_data(faB, fbB), twi, twif)
        out_ref[...] = jnp.concatenate([scale(A), scale(B)], axis=axis)

    return kernel


def _make_kernel_packed_mont(p: NTTParams, tile: int, cm: bool = True):
    """Two-plane constant-geometry polymul for 2^14 <= q < 2^29: identical
    geometry to _make_kernel_packed, digit-serial Montgomery arithmetic
    identical to _make_kernel_mont (canonical [0, q) values).
    ``cm=False``: planes are (tile, n/2) with slots on lanes — measured
    faster for this arithmetic-dominated kernel (lane rolls hide behind
    the Montgomery chains, and the row-major layout vectorises them
    better on v5e)."""
    n, q = p.n, p.q
    h = n // 2
    log2n = p.log2n
    q32 = np.int32(q)
    q0 = np.int32(q & ((1 << 15) - 1))
    q1 = np.int32(q >> 15)
    qp = np.int32((-pow(q, -1, 1 << 15)) % (1 << 15))
    m15 = np.int32((1 << 15) - 1)
    axis = 0 if cm else 1
    shape = (h, tile) if cm else (tile, h)

    def bcast(row):
        return row[:, None] if cm else row[None, :]

    def csubq(x):
        r = x - q32
        return r + ((r >> 31) & q32)

    def subm(x, y):
        r = x - y
        return r + ((r >> 31) & q32)

    def redc(H, Mid, L0):
        u0 = ((L0 & m15) * qp) & m15
        t1 = (L0 + u0 * q0) >> 15
        A1 = Mid + u0 * q1 + t1
        a1h, a1l = A1 >> 15, A1 & m15
        u1 = (a1l * qp) & m15
        t2 = (a1l + u1 * q0) >> 15
        return csubq(csubq(H + a1h + u1 * q1 + t2))

    def mul(x, y):
        x1, x0 = x >> 15, x & m15
        y1, y0 = y >> 15, y & m15
        return redc(x1 * y1, x1 * y0 + x0 * y1, x0 * y0)

    def block_mask(bsz):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        return ((i // bsz) & 1) == 0

    def repack(A, B, bsz):
        mask = block_mask(bsz)
        A2 = jnp.where(mask, A, pltpu.roll(B, bsz, axis))
        B2 = jnp.where(mask, pltpu.roll(A, h - bsz, axis), B)
        return A2, B2

    def fwd(A, B, twf):
        for s in range(log2n):
            m = mul(B, bcast(twf[s, :]))
            A, B = csubq(A + m), csubq(A - m + q32)
            if s < log2n - 1:
                A, B = repack(A, B, n >> (s + 2))
        return A, B

    def inv(A, B, twi):
        for s in range(log2n):
            m = mul(subm(A, B), bcast(twi[s, :]))
            A, B = csubq(A + B), m
            if s < log2n - 1:
                A, B = repack(A, B, 1 << s)
        return A, B

    final = np.int32(p.n_inv * (1 << 30) % q * (1 << 30) % q)

    def split(x):
        return (x[:h], x[h:]) if cm else (x[:, :h], x[:, h:])

    def kernel(a_ref, b_ref, twf_ref, _twfsh_ref, twi_ref, _twish_ref,
               out_ref):
        twf, twi = twf_ref[...], twi_ref[...]
        faA, faB = fwd(*split(a_ref[...]), twf)
        fbA, fbB = fwd(*split(b_ref[...]), twf)
        A, B = inv(mul(faA, fbA), mul(faB, fbB), twi)
        fin = jnp.full((), final, jnp.int32)
        out_ref[...] = jnp.concatenate([mul(A, fin), mul(B, fin)],
                                       axis=axis)

    return kernel


class PallasPolymul:
    """Plan-level wrapper: fused-kernel polymul for (batch, n) int32.

    ``layout`` picks the block orientation (default: auto per modulus
    class, measured on v5e at n=256/batch 8192):

    - ``"cm"`` (coefficient-major): (n, batch) blocks, coefficients on
      sublanes — butterfly exchanges are sublane rolls.  Fastest for the
      roll-dominated lazy-Shoup kernel (q < 2^14): 173 vs 168 G
      butterflies/s packed.
    - ``"rows"``: (batch, n) blocks, exchanges are cross-lane rolls.
      Fastest for the arithmetic-dominated Montgomery kernel
      (q >= 2^14): 73 vs 46 G butterflies/s packed — the lane layout
      vectorises the digit-serial multiply chains better and the rolls
      hide behind them.

    The boundary transposes the (batch, n) API needs under ``cm`` cost
    ~3 µs and XLA fuses them into adjacent ops; ``polymul_cm``
    takes/returns (n, batch) directly for transpose-free chaining."""

    def __init__(self, params: NTTParams, tile: int | None = None,
                 interpret: bool = False, layout: str | None = None,
                 packed: bool | None = None):
        if not supported(params):
            raise ValueError(
                f"Pallas kernel needs odd q < 2^29, got {params.q}")
        if layout not in ("rows", "cm", None):
            raise ValueError(f"layout must be 'rows' or 'cm', got {layout}")
        self.params = params
        self.flavor = _flavor(params.q)
        self.mont = self.flavor == "mont"
        if layout is None:
            # measured on v5e: the roll-dominated Shoup/f32 kernels prefer
            # sublane rolls (cm); the arithmetic-dominated Montgomery
            # kernel prefers lane layout (rolls hide behind the chains)
            layout = "rows" if self.mont else "cm"
        self.cm = layout == "cm"
        n = params.n
        if tile is None:
            tile = max(8, min(512, (1 << 18) // n))
        if self.cm and not interpret:
            tile = max(128, -(-tile // 128) * 128)  # full lane registers
        self.tile = tile
        self.interpret = interpret
        # packed two-plane polymul kernel: planes need >= one register's
        # worth of slots (n/2 >= 8)
        self.packed = (n >= 16) if packed is None else packed
        if self.packed and n < 16:
            raise ValueError("packed kernel needs n >= 16")
        self._twf, self._twfsh = _dense_stage_tables(
            params, inverse=False, flavor=self.flavor)
        self._twi, self._twish = _dense_stage_tables(
            params, inverse=True, flavor=self.flavor)
        if self.packed:
            self._ptwf, self._ptwfsh = _packed_stage_tables(
                params, inverse=False, flavor=self.flavor)
            self._ptwi, self._ptwish = _packed_stage_tables(
                params, inverse=True, flavor=self.flavor)

    def _data_spec(self):
        n, tile = self.params.n, self.tile
        if self.cm:
            return pl.BlockSpec((n, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((tile, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    _FLAT = {"shoup": _make_kernel, "f32": _make_kernel_f32,
             "mont": _make_kernel_mont}
    _PACKED = {"shoup": _make_kernel_packed, "f32": _make_kernel_packed_f32,
               "mont": _make_kernel_packed_mont}

    @functools.cached_property
    def _call(self):
        p = self.params
        n, tile = p.n, self.tile
        kernel = self._FLAT[self.flavor](p, tile, cm=self.cm)
        tw_shape = (p.log2n, n)
        tw_spec = pl.BlockSpec(tw_shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        data_spec = self._data_spec()
        batch_axis = 1 if self.cm else 0

        def run(a, b, twf, twfsh, twi, twish):
            grid = (a.shape[batch_axis] // tile,)
            flops_est = 3 * a.shape[batch_axis] * (n // 2) * p.log2n * 10
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[data_spec, data_spec] + [tw_spec] * 4,
                out_specs=data_spec,
                out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
                cost_estimate=pl.CostEstimate(
                    flops=flops_est,
                    bytes_accessed=3 * a.size * 4,
                    transcendentals=0),
                # independent batch blocks: let Mosaic pipeline the grid
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                interpret=self.interpret,
            )(a, b, twf, twfsh, twi, twish)

        return jax.jit(run)

    @functools.cached_property
    def _call_packed(self):
        """pallas_call around the two-plane constant-geometry kernel
        (cm layout; twiddle tables are the packed (log2n, n/2) gathers)."""
        p = self.params
        n, tile = p.n, self.tile
        kernel = self._PACKED[self.flavor](p, tile, cm=self.cm)
        tw_shape = (p.log2n, n // 2)
        tw_spec = pl.BlockSpec(tw_shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        data_spec = self._data_spec()

        batch_axis = 1 if self.cm else 0

        def run(a, b, twf, twfsh, twi, twish):
            grid = (a.shape[batch_axis] // tile,)
            flops_est = 3 * a.shape[batch_axis] * (n // 2) * p.log2n * 10
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[data_spec, data_spec] + [tw_spec] * 4,
                out_specs=data_spec,
                out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
                cost_estimate=pl.CostEstimate(
                    flops=flops_est,
                    bytes_accessed=3 * a.size * 4,
                    transcendentals=0),
                # independent batch blocks: let Mosaic pipeline the grid
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                interpret=self.interpret,
            )(a, b, twf, twfsh, twi, twish)

        return jax.jit(run)

    def _polymul_call(self, a, b):
        """Dispatch a padded kernel-layout block ((n, batch) for cm,
        (batch, n) for rows) to the fastest kernel."""
        if self.packed:
            return self._call_packed(a, b, self._ptwf, self._ptwfsh,
                                     self._ptwi, self._ptwish)
        return self._call(a, b, self._twf, self._twfsh, self._twi,
                          self._twish)

    @functools.cached_property
    def _full(self):
        """One jit covering pad + kernel + unpad (no eager dispatch)."""
        n, tile = self.params.n, self.tile
        twf, twfsh, twi, twish = (self._twf, self._twfsh, self._twi,
                                  self._twish)
        cm = self.cm

        def full(a, b):
            lead = a.shape[:-1]
            a = a.astype(jnp.int32).reshape(-1, n)
            b = b.astype(jnp.int32).reshape(-1, n)
            batch = a.shape[0]
            pad = (-batch) % tile
            if pad:
                a = jnp.pad(a, ((0, pad), (0, 0)))
                b = jnp.pad(b, ((0, pad), (0, 0)))
            if cm:
                out = self._polymul_call(a.T, b.T).T
            else:
                out = self._polymul_call(a, b)
            return out[:batch].reshape(*lead, n)

        return jax.jit(full)

    @functools.cached_property
    def _full_cm(self):
        """Native coefficient-major entry: (n, batch) in/out, no
        transposes — for device-side chaining."""
        if not self.cm:
            raise ValueError("polymul_cm needs layout='cm'")
        n, tile = self.params.n, self.tile

        def full(a, b):
            batch = a.shape[1]
            pad = (-batch) % tile
            if pad:
                a = jnp.pad(a, ((0, 0), (0, pad)))
                b = jnp.pad(b, ((0, 0), (0, pad)))
            out = self._polymul_call(a.astype(jnp.int32),
                                     b.astype(jnp.int32))
            return out[:, :batch]

        return jax.jit(full)

    def polymul(self, a, b):
        """Negacyclic (psi set) or cyclic product; canonical in/out."""
        check_domain(a, self.params.q, "polymul a")
        check_domain(b, self.params.q, "polymul b")
        return self._full(jnp.asarray(a), jnp.asarray(b))

    def polymul_cm(self, a, b):
        """Coefficient-major product: (n, batch) int32 in/out."""
        check_domain(a, self.params.q, "polymul_cm a")
        check_domain(b, self.params.q, "polymul_cm b")
        return self._full_cm(jnp.asarray(a), jnp.asarray(b))

    # -- standalone transforms (Plan.forward/inverse API parity) ---------

    @functools.lru_cache(maxsize=None)
    def _unary(self, mode: str):
        """Jitted padded wrapper around the fwd-only/inv-only kernel."""
        p = self.params
        n, tile = p.n, self.tile
        kernel = self._FLAT[self.flavor](p, tile, mode, cm=self.cm)
        tw_shape = (p.log2n, n)
        tw_spec = pl.BlockSpec(tw_shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        data_spec = self._data_spec()
        tabs = ((self._twf, self._twfsh) if mode == "fwd"
                else (self._twi, self._twish))
        cm = self.cm

        def run(x):
            lead = x.shape[:-1]
            x = x.astype(jnp.int32).reshape(-1, n)
            batch = x.shape[0]
            pad = (-batch) % tile
            if pad:
                x = jnp.pad(x, ((0, pad), (0, 0)))
            xin = x.T if cm else x
            out = pl.pallas_call(
                kernel,
                grid=(x.shape[0] // tile,),
                in_specs=[data_spec, tw_spec, tw_spec],
                out_specs=data_spec,
                out_shape=jax.ShapeDtypeStruct(xin.shape, jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                interpret=self.interpret,
            )(xin, *tabs)
            if cm:
                out = out.T
            return out[:batch].reshape(*lead, n)

        return jax.jit(run)

    def forward(self, x):
        """Merged-twist CT std2rev forward NTT (Plan.forward twin)."""
        return self._unary("fwd")(jnp.asarray(x))

    def inverse(self, x):
        """Merged GS rev2std inverse + n^-1·fix scale (Plan.inverse twin:
        exact after a pointwise product; a bare forward->inverse roundtrip
        carries the arith fix factor, as with Plan)."""
        return self._unary("inv")(jnp.asarray(x))

    @functools.cached_property
    def arith(self):
        """Companion lane arithmetic (Plan API parity: Ring/pointwise)."""
        from .modmul import select_arith
        return select_arith(self.params.q)

    def pointwise(self, fa, fb):
        """Spectral-domain product, scale-compatible with inverse()."""
        return self.arith.mul(jnp.asarray(fa, jnp.int32),
                              jnp.asarray(fb, jnp.int32))

    @functools.cached_property
    def _matvec_jit(self):
        fwd_k = self._unary("fwd")
        inv_k = self._unary("inv")
        ar = self.arith

        def mv(A, s):
            r, c = A.shape[-3], A.shape[-2]
            fs = [fwd_k(s[..., j, :]) for j in range(c)]
            rows = []
            for i in range(r):
                acc = None
                for j in range(c):
                    t = ar.mul(fwd_k(A[..., i, j, :]), fs[j])
                    acc = t if acc is None else ar.add(acc, t)
                rows.append(inv_k(acc))
            return jnp.stack(rows, axis=-2)

        return jax.jit(mv)

    @functools.cached_property
    def _fused_matvec(self):
        from .matvec import PallasMatvec
        return PallasMatvec(self.params, interpret=self.interpret)

    def matvec(self, A, s):
        """Module product A (..., r, c, n) × s (..., c, n) -> (..., r, n)
        — the ML-DSA A_hat·s_hat pattern.  Fast path: ONE fused kernel
        per batch block (ops/matvec.PallasMatvec: c vector transforms,
        r·c matrix transforms, spectral multiply-accumulate, r shared
        inverses, one dispatch).  Shapes outside that kernel's VMEM
        envelope fall back to composing the unary kernels in one jit
        (r·c + r + c pallas_calls)."""
        check_domain(A, self.params.q, "matvec A")
        check_domain(s, self.params.q, "matvec s")
        A = jnp.asarray(A, jnp.int32)
        s = jnp.asarray(s, jnp.int32)
        if s.shape[-2] != A.shape[-2] or A.shape[-1] != self.params.n:
            raise ValueError(f"matvec shape mismatch: A {A.shape} vs "
                             f"s {s.shape}")
        r, c = A.shape[-3], A.shape[-2]
        if self.params.n >= 16 and self._fused_matvec.supported_shape(r, c):
            return self._fused_matvec.matvec(A, s)
        return self._matvec_jit(A, s)


# ---------------------------------------------------------------------------
# incomplete (truncated) NTT: the fused Kyber-style kernel
# ---------------------------------------------------------------------------

def _make_incomplete_kernel(sub_p: NTTParams, n: int, tile: int,
                            cm: bool = False):
    """Fused negacyclic polymul over Z_q[x]/(x^n+1) via an incomplete NTT
    with ONE missing level (schemes.IncompletePlan levels=1, the ML-KEM
    structure), entirely in VMEM.

    Layout insight: splitting into even/odd sub-polynomials and running
    the two size-m=n/2 merged CT transforms on the stride-2 interleaved
    lanes is EXACTLY the full-size CT lane-roll schedule with the last
    stage dropped (sub-stage roll distance d_sub appears as 2*d_sub full
    lanes), with the sub-transform's dense twiddle row repeated per lane
    pair.  The degree-1 base multiplication then acts on ADJACENT lane
    pairs (2k, 2k+1):

        c0 = a0*b0 + t_k*a1*b1 ;  c1 = a0*b1 + a1*b0,
        t_k = psi_m^(2*bitrev(k)+1)

    realised with two data multiplies, one constant multiply and two
    pairwise lane swaps.  The inverse mirrors with the first stage
    dropped and the final m^-1 scale.  Lazy Shoup arithmetic as in
    _make_kernel (q < 2^14; Kyber q=3329).
    """
    m, q = sub_p.n, sub_p.q
    assert n == 2 * m
    log2n = sub_p.log2n + 1
    q32 = np.int32(q)
    two_q = np.int32(2 * q)
    axis = 0 if cm else 1
    shape = (n, tile) if cm else (tile, n)

    def bcast(row):                         # (n,) -> broadcast over batch
        return row[:, None] if cm else row[None, :]

    def csub2q(x):
        r = x - two_q
        return r + ((r >> 31) & two_q)

    def csubq(x):
        r = x - q32
        return r + ((r >> 31) & q32)

    def shoup(x, w, wsh):
        t = (x * wsh) >> 16
        return x * w - t * q32              # in [0, 2q)

    def lo_mask(d):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        return ((i // d) & 1) == 0

    def fwd(x, twf, twfsh):
        for s in range(log2n - 1):          # skip the last (d=1) stage
            d = n >> (s + 1)
            mask = lo_mask(d)
            up = pltpu.roll(x, n - d, axis)
            down = pltpu.roll(x, d, axis)
            w = bcast(twf[s, :])
            wsh = bcast(twfsh[s, :])
            hi_vals = jnp.where(mask, up, x)
            mm = shoup(hi_vals, w, wsh)
            # shared post-select csub2q (both branches in [0, 4q))
            x = csub2q(jnp.where(mask, x + mm, down - mm + two_q))
        return x                            # [0, 2q), sub spectra interleaved

    def inv(x, twi, twish):
        for s in range(1, log2n):           # skip the first (d=1) stage
            d = 1 << s
            mask = lo_mask(d)
            up = pltpu.roll(x, n - d, axis)
            down = pltpu.roll(x, d, axis)
            w = bcast(twi[s - 1, :])
            wsh = bcast(twish[s - 1, :])
            hi_vals = jnp.where(mask, up, x)
            lo_vals = jnp.where(mask, x, down)
            mm = shoup(csub2q(lo_vals - hi_vals + two_q), w, wsh)
            x = csub2q(jnp.where(mask, lo_vals + hi_vals, mm))
        return x

    def mul_lazy(a, b):
        z = a * b
        hi = z >> 15
        lo = z & np.int32((1 << 15) - 1)
        c = (1 << 15) % q
        r1 = shoup(hi, np.int32(c), np.int32((c << 16) // q))
        r2 = shoup(lo, np.int32(1), np.int32((1 << 16) // q))
        return csub2q(r1 + r2)              # [0, 2q)

    def pair_swap(x):
        even = lo_mask(1)
        return jnp.where(even, pltpu.roll(x, n - 1, axis),
                         pltpu.roll(x, 1, axis))

    def basemul(fa, fb, t, tsh):
        even = lo_mask(1)
        term1 = mul_lazy(fa, fb)            # even: a0b0, odd: a1b1
        cross = mul_lazy(fa, pair_swap(fb)) # even: a0b1, odd: a1b0
        mt = shoup(pair_swap(term1), t, tsh)     # t, tsh are (1, n)
        # sums are in [0, 4q): one csub2q after the select suffices
        return csub2q(jnp.where(even, term1 + mt,
                                cross + pair_swap(cross)))

    minv = sub_p.n_inv                      # m^-1: the sub-transform scale
    minv_sh = (minv << 16) // q

    def kernel(a_ref, b_ref, twf_ref, twfsh_ref, twi_ref, twish_ref,
               t_ref, tsh_ref, out_ref):
        twf, twfsh = twf_ref[...], twfsh_ref[...]
        twi, twish = twi_ref[...], twish_ref[...]
        fa = fwd(a_ref[...], twf, twfsh)
        fb = fwd(b_ref[...], twf, twfsh)
        c = basemul(fa, fb, t_ref[...], tsh_ref[...])
        c = inv(c, twi, twish)
        c = shoup(c, np.int32(minv), np.int32(minv_sh))
        out_ref[...] = csubq(c)

    return kernel


def _incomplete_packed_closures(sub_p: NTTParams, n: int, tile: int):
    """The packed incomplete kernel's compute closures (fwd/inv stage
    loops, base-case product, final scale) — shared between the real
    streamed kernel (:func:`_make_incomplete_kernel_packed`) and the
    VMEM-resident chained ceiling kernel
    (utils/calibrate.incomplete_kernel_ceiling), so the speed-of-light
    ruler and the shipped kernel can never drift apart."""
    q = sub_p.q
    h = n // 2
    log2n = sub_p.log2n + 1                 # full ring size exponent
    q32 = np.int32(q)
    two_q = np.int32(2 * q)
    shape = (h, tile)

    def bcast(row):
        return row[:, None]

    def csub2q(x):
        r = x - two_q
        return r + ((r >> 31) & two_q)

    def csubq(x):
        r = x - q32
        return r + ((r >> 31) & q32)

    def shoup(x, w, wsh):
        t = (x * wsh) >> 16
        return x * w - t * q32              # in [0, 2q)

    def shoup_u(x, w, wsh):
        return _shoup_u(x, w, wsh, q32)     # module helper, [0, 2q)

    shoup_u_row = shoup_u

    def block_mask(bsz):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        return ((i // bsz) & 1) == 0

    def repack(A, B, bsz):
        mask = block_mask(bsz)
        A2 = jnp.where(mask, A, pltpu.roll(B, bsz, 0))
        B2 = jnp.where(mask, pltpu.roll(A, h - bsz, 0), B)
        return A2, B2

    def fwd(A, B, twf, twfsh):
        # Harvey lazy CT: planes in [0, 4q) between stages (see
        # _make_kernel_packed)
        for s in range(log2n - 1):          # last executed stage: d = 2
            a0 = csub2q(A)
            m = shoup_u_row(B, bcast(twf[s, :]), bcast(twfsh[s, :]))
            A, B = a0 + m, a0 + two_q - m
            if s < log2n - 2:
                A, B = repack(A, B, n >> (s + 2))
        return A, B                          # [0, 4q)

    def inv(A, B, twi, twish):
        for s in range(1, log2n):           # first executed stage: d = 2
            m = shoup_u_row(A - B + two_q, bcast(twi[s - 1, :]),
                            bcast(twish[s - 1, :]))
            A, B = csub2q(A + B), m
            if s < log2n - 1:
                A, B = repack(A, B, 1 << s)
        return A, B

    def mul_lazy(a, b):
        # operands in [0, 4q) < 2^16: product on uint32 lanes
        z = a.astype(jnp.uint32) * b.astype(jnp.uint32)
        hi = (z >> 16).astype(jnp.int32)
        lo = (z & jnp.uint32(0xFFFF)).astype(jnp.int32)
        c = (1 << 16) % q
        r1 = shoup_u(hi, np.int32(c), np.uint32((c << 16) // q))
        r2 = shoup_u(lo, np.int32(1), np.uint32((1 << 16) // q))
        return csub2q(r1 + r2)              # [0, 2q)

    def pair_swap(x):
        return jnp.where(block_mask(1), pltpu.roll(x, h - 1, 0),
                         pltpu.roll(x, 1, 0))

    def basemul(fa, fb, t, tsh):
        term1 = mul_lazy(fa, fb)
        cross = mul_lazy(fa, pair_swap(fb))
        mt = shoup(pair_swap(term1), t, tsh)
        return csub2q(jnp.where(block_mask(1), term1 + mt,
                                cross + pair_swap(cross)))

    minv = sub_p.n_inv
    minv_sh = (minv << 16) // q

    def fin(x):
        return csubq(shoup(x, np.int32(minv), np.int32(minv_sh)))

    def polymul_planes(xa, xb, twf, twfsh, twi, twish, t, tsh):
        """One full product on resident planes: (n, tile) in/out."""
        faA, faB = fwd(xa[:h], xa[h:], twf, twfsh)
        fbA, fbB = fwd(xb[:h], xb[h:], twf, twfsh)
        cA = basemul(faA, fbA, t[:, 0:1], tsh[:, 0:1])
        cB = basemul(faB, fbB, t[:, 1:2], tsh[:, 1:2])
        A, B = inv(cA, cB, twi, twish)
        return jnp.concatenate([fin(A), fin(B)], axis=0)

    def roundtrip_planes(xa, twf, twfsh, twi, twish):
        """fwd + inv + scale (no basemul): the transform-only unit."""
        A, B = fwd(xa[:h], xa[h:], twf, twfsh)
        A, B = inv(csub2q(A), csub2q(B), twi, twish)
        return jnp.concatenate([fin(A), fin(B)], axis=0)

    return {"h": h, "fwd": fwd, "inv": inv, "basemul": basemul,
            "fin": fin, "polymul_planes": polymul_planes,
            "roundtrip_planes": roundtrip_planes}


def _make_incomplete_kernel_packed(sub_p: NTTParams, n: int, tile: int):
    """Two-plane constant-geometry variant of the incomplete kernel.

    Same geometry as _make_kernel_packed with the d=1 stage replaced by
    the base-case product: forward stops after the d=2 stage, where plane
    A holds lanes with bit 1 clear ({0,1,4,5,...}) and B their d=2
    partners — so the (2k, 2k+1) base pairs sit at (even, odd) SLOTS
    inside each plane and basemul runs per-plane; the inverse's first
    (d=2) stage consumes exactly that layout, no repack at either seam."""
    c = _incomplete_packed_closures(sub_p, n, tile)
    polymul_planes = c["polymul_planes"]

    def kernel(a_ref, b_ref, twf_ref, twfsh_ref, twi_ref, twish_ref,
               t_ref, tsh_ref, out_ref):
        out_ref[...] = polymul_planes(
            a_ref[...], b_ref[...], twf_ref[...], twfsh_ref[...],
            twi_ref[...], twish_ref[...], t_ref[...], tsh_ref[...])

    return kernel


def _make_incomplete_matvec_kernel(sub_p: NTTParams, n: int, tile: int,
                                   r: int, c: int):
    """Fused module-product (matvec) kernel: A_hat·s_hat for the
    incomplete (ML-KEM) ring, specialised to a static (r, c) module shape.

    One block transforms the c vector entries once, transforms each of
    the r·c matrix entries, base-multiplies and accumulates in the
    spectral domain (the base-case product is linear, so rows share one
    inverse), and runs r inverse transforms — 2c + r(c+1) transforms'
    worth of work for r output polynomials instead of 3·r·c for r·c
    independent polymuls.  Same packed two-plane geometry and lazy Shoup
    arithmetic as _make_incomplete_kernel_packed; the spectral
    accumulator stays exact while (c+1)·2q < 2^15 (c ≤ 4 at Kyber's
    q=3329).
    """
    q = sub_p.q
    h = n // 2
    log2n = sub_p.log2n + 1
    q32 = np.int32(q)
    two_q = np.int32(2 * q)
    four_q = np.int32(4 * q)
    # accumulator: c basemul terms in [0, 2q) sum to < 2cq; the two-fold
    # normalisation below covers c <= 4 (all ML-KEM module ranks)
    assert c <= 4, "spectral accumulator fold chain covers c <= 4"
    shape = (h, tile)

    def bcast(row):
        return row[:, None]

    def csub(x, m):
        rr = x - m
        return rr + ((rr >> 31) & m)

    def csub2q(x):
        return csub(x, two_q)

    def shoup(x, w, wsh):
        t = (x * wsh) >> 16
        return x * w - t * q32

    def shoup_u(x, w, wsh):
        return _shoup_u(x, w, wsh, q32)

    def block_mask(bsz):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        return ((i // bsz) & 1) == 0

    def repack(A, B, bsz):
        mask = block_mask(bsz)
        A2 = jnp.where(mask, A, pltpu.roll(B, bsz, 0))
        B2 = jnp.where(mask, pltpu.roll(A, h - bsz, 0), B)
        return A2, B2

    def fwd(A, B, twf, twfsh):
        for s in range(log2n - 1):          # last executed stage: d = 2
            a0 = csub2q(A)
            m = shoup_u(B, bcast(twf[s, :]), bcast(twfsh[s, :]))
            A, B = a0 + m, a0 + two_q - m
            if s < log2n - 2:
                A, B = repack(A, B, n >> (s + 2))
        return A, B                          # [0, 4q)

    def inv(A, B, twi, twish):
        for s in range(1, log2n):           # first executed stage: d = 2
            m = shoup_u(A - B + two_q, bcast(twi[s - 1, :]),
                        bcast(twish[s - 1, :]))
            A, B = csub2q(A + B), m
            if s < log2n - 1:
                A, B = repack(A, B, 1 << s)
        return A, B

    def mul_lazy(a, b):
        z = a.astype(jnp.uint32) * b.astype(jnp.uint32)
        hi = (z >> 16).astype(jnp.int32)
        lo = (z & jnp.uint32(0xFFFF)).astype(jnp.int32)
        cc = (1 << 16) % q
        r1 = shoup_u(hi, np.int32(cc), np.uint32((cc << 16) // q))
        r2 = shoup_u(lo, np.int32(1), np.uint32((1 << 16) // q))
        return csub2q(r1 + r2)               # [0, 2q)

    def pair_swap(x):
        return jnp.where(block_mask(1), pltpu.roll(x, h - 1, 0),
                         pltpu.roll(x, 1, 0))

    def basemul(fa, fb, t, tsh):
        term1 = mul_lazy(fa, fb)
        cross = mul_lazy(fa, pair_swap(fb))
        mt = shoup(pair_swap(term1), t, tsh)
        return csub2q(jnp.where(block_mask(1), term1 + mt,
                                cross + pair_swap(cross)))   # [0, 2q)

    minv = sub_p.n_inv
    minv_sh = (minv << 16) // q

    def fin(x):
        return csub(csub2q(shoup(x, np.int32(minv), np.int32(minv_sh))),
                    q32)

    def kernel(A_ref, s_ref, twf_ref, twfsh_ref, twi_ref, twish_ref,
               t_ref, tsh_ref, out_ref):
        twf, twfsh = twf_ref[...], twfsh_ref[...]
        twi, twish = twi_ref[...], twish_ref[...]
        t, tsh = t_ref[...], tsh_ref[...]
        s_all = s_ref[...]
        A_all = A_ref[...]
        fs = []
        for j in range(c):
            xs = s_all[j * n:(j + 1) * n]
            fs.append(fwd(xs[:h], xs[h:], twf, twfsh))
        rows = []
        for i in range(r):
            accA = accB = None
            for j in range(c):
                xa = A_all[(i * c + j) * n:(i * c + j + 1) * n]
                faA, faB = fwd(xa[:h], xa[h:], twf, twfsh)
                bA = basemul(faA, fs[j][0], t[:, 0:1], tsh[:, 0:1])
                bB = basemul(faB, fs[j][1], t[:, 1:2], tsh[:, 1:2])
                accA = bA if accA is None else accA + bA
                accB = bB if accB is None else accB + bB
            # acc in [0, 2cq) with 2cq < 2^15: two folds -> [0, 2q)
            accA = csub2q(csub(accA, four_q))
            accB = csub2q(csub(accB, four_q))
            A2, B2 = inv(accA, accB, twi, twish)
            rows.append(jnp.concatenate([fin(A2), fin(B2)], axis=0))
        out_ref[...] = jnp.concatenate(rows, axis=0)

    return kernel


class PallasIncompletePolymul:
    """Fused-kernel negacyclic polymul for rings without 2n-th roots
    (schemes.IncompletePlan levels=1 twin; e.g. Kyber n=256, q=3329).
    ``layout="cm"`` (default): coefficient-major sublane-roll layout,
    see :class:`PallasPolymul`."""

    def __init__(self, n: int, q: int, tile: int | None = None,
                 interpret: bool = False, layout: str = "cm",
                 packed: bool | None = None):
        from ..params import make_params
        if q >= (1 << 14):
            raise ValueError("incomplete Pallas kernel needs q < 2^14")
        if layout not in ("rows", "cm"):
            raise ValueError(f"layout must be 'rows' or 'cm', got {layout}")
        m = n // 2
        self.n, self.q = n, q
        self.cm = layout == "cm"
        self.sub_p = make_params(m, q)      # negacyclic size-m sub-ring
        if not self.sub_p.psi:
            # make_params falls back to a cyclic ring when q has no 2m-th
            # root; a levels-1 incomplete negacyclic product needs one
            # (q ≡ 1 mod n), else the base-case points don't exist
            raise ValueError(
                f"incomplete NTT needs an order-{n} root mod q: "
                f"q ≡ 1 (mod {n}), got q={q} (use schemes.IncompletePlan "
                f"with more levels)")
        if tile is None:
            tile = max(8, min(512, (1 << 18) // n))
        if self.cm and not interpret:
            tile = max(128, -(-tile // 128) * 128)
        self.tile = tile
        self.interpret = interpret
        self.packed = (self.cm and n >= 16) if packed is None else packed
        if self.packed and not (self.cm and n >= 16):
            raise ValueError("packed kernel needs layout='cm' and n >= 16")

        # interleave the sub-transform's dense stage tables: sub position
        # i lives at lanes 2i and 2i+1
        def interleave(tab):
            return np.repeat(tab, 2, axis=1)

        twf, twfsh = _dense_stage_tables(self.sub_p, inverse=False)
        twi, twish = _dense_stage_tables(self.sub_p, inverse=True)
        self._twf, self._twfsh = interleave(twf), interleave(twfsh)
        self._twi, self._twish = interleave(twi), interleave(twish)

        # base-case evaluation points t_k = psi_m^(2*bitrev(k)+1) at both
        # lanes of pair k (only read at even lanes)
        from ..utils.bitrev import bit_reverse_indices
        rev = bit_reverse_indices(m)
        exps = (2 * rev + 1) % (2 * m)
        t = np.array([pow(self.sub_p.psi, int(e), q) for e in exps],
                     dtype=np.int64)
        t = np.repeat(t, 2)
        t32 = t.astype(np.int32)
        tsh32 = ((t << 16) // q).astype(np.int32)
        if self.cm:
            self._t = t32[:, None]
            self._tsh = tsh32[:, None]
        else:
            self._t = t32[None, :]
            self._tsh = tsh32[None, :]

        if self.packed:
            log2n = self.sub_p.log2n + 1
            # forward stages 0..log2n-2 gather the interleaved dense rows
            # at each stage's slot->lane map; inverse rows are indexed by
            # executed stage s = 1..log2n-1 (row s-1)
            fidx = np.stack([_packed_slot_index(n, s, inverse=False)
                             for s in range(log2n - 1)])
            iidx = np.stack([_packed_slot_index(n, s, inverse=True)
                             for s in range(1, log2n)])
            self._ptwf = np.take_along_axis(self._twf, fidx, axis=1)
            self._ptwfsh = np.take_along_axis(self._twfsh, fidx, axis=1)
            self._ptwi = np.take_along_axis(self._twi, iidx, axis=1)
            self._ptwish = np.take_along_axis(self._twish, iidx, axis=1)
            # base-case points per plane: after the d=2 stage plane A
            # holds lanes iA(j) (bit 1 clear), plane B their +2 partners
            iA = _packed_slot_index(n, log2n - 2, inverse=False)
            self._pt = np.stack([t32[iA], t32[iA + 2]], axis=1)
            self._ptsh = np.stack([tsh32[iA], tsh32[iA + 2]], axis=1)

    @functools.cached_property
    def _full(self):
        n, tile = self.n, self.tile
        cm = self.cm
        log2m = self.sub_p.log2n
        if self.packed:
            kernel = _make_incomplete_kernel_packed(self.sub_p, n, tile)
            tw_spec = pl.BlockSpec((log2m, n // 2), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
            t_spec = pl.BlockSpec((n // 2, 2), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
            tabs = (self._ptwf, self._ptwfsh, self._ptwi, self._ptwish,
                    self._pt, self._ptsh)
        else:
            kernel = _make_incomplete_kernel(self.sub_p, n, tile, cm=cm)
            tw_spec = pl.BlockSpec((log2m, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
            t_spec = pl.BlockSpec(self._t.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
            tabs = (self._twf, self._twfsh, self._twi, self._twish,
                    self._t, self._tsh)
        if cm:
            data_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
        else:
            data_spec = pl.BlockSpec((tile, n), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)

        def call(a, b):
            batch_axis = 1 if cm else 0
            return pl.pallas_call(
                kernel,
                grid=(a.shape[batch_axis] // tile,),
                in_specs=[data_spec, data_spec] + [tw_spec] * 4
                + [t_spec] * 2,
                out_specs=data_spec,
                out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                interpret=self.interpret,
            )(a, b, *tabs)

        def full(a, b):
            lead = a.shape[:-1]
            a = a.astype(jnp.int32).reshape(-1, n)
            b = b.astype(jnp.int32).reshape(-1, n)
            batch = a.shape[0]
            pad = (-batch) % tile
            if pad:
                a = jnp.pad(a, ((0, pad), (0, 0)))
                b = jnp.pad(b, ((0, pad), (0, 0)))
            out = call(a.T, b.T).T if cm else call(a, b)
            return out[:batch].reshape(*lead, n)

        self._call_raw = call
        return jax.jit(full)

    @functools.cached_property
    def _full_cm(self):
        """Native coefficient-major entry: (n, batch) in/out."""
        if not self.cm:
            raise ValueError("polymul_cm needs layout='cm'")
        self._full  # materialise _call_raw
        n, tile = self.n, self.tile
        call = self._call_raw

        def full(a, b):
            batch = a.shape[1]
            pad = (-batch) % tile
            if pad:
                a = jnp.pad(a, ((0, 0), (0, pad)))
                b = jnp.pad(b, ((0, 0), (0, pad)))
            return call(a.astype(jnp.int32), b.astype(jnp.int32))[:, :batch]

        return jax.jit(full)

    def polymul(self, a, b):
        """Negacyclic product, canonical [0, q) in/out."""
        check_domain(a, self.q, "polymul a")
        check_domain(b, self.q, "polymul b")
        return self._full(jnp.asarray(a), jnp.asarray(b))

    def polymul_cm(self, a, b):
        """Coefficient-major product: (n, batch) int32 in/out."""
        check_domain(a, self.q, "polymul_cm a")
        check_domain(b, self.q, "polymul_cm b")
        return self._full_cm(jnp.asarray(a), jnp.asarray(b))

    def matvec_supported(self, r: int, c: int) -> bool:
        """True when the fused matvec kernel covers this (r, c) module
        shape: packed cm geometry, the c <= 4 exact-accumulator bound,
        and the VMEM plane budget at the minimum 128-lane tile."""
        if not (self.packed and self.cm):
            return False
        if c > 4 or c < 1 or r < 1:
            return False
        # same constant as _matvec_call's tile-shrink target (12 MB data
        # budget at the minimum 128-lane tile) so this check exactly
        # matches the envelope the call can honor (ADVICE r4 #2)
        planes = 2 * r * c + 2 * c + 2 * r + 8
        return planes * self.n * 4 * 128 < (12 << 20)

    def _matvec_call(self, r: int, c: int):
        """Jitted fused module-product kernel for a static (r, c) shape.
        Takes cm-stacked blocks: A (r·c·n, batch), s (c·n, batch) ->
        (r·n, batch).  Memoized per instance (a method lru_cache would
        pin self in a class-level cache for the process lifetime)."""
        cache = self.__dict__.setdefault("_matvec_calls", {})
        hit = cache.get((r, c))
        if hit is not None:
            return hit
        if not (self.packed and self.cm):
            raise ValueError("matvec kernel needs layout='cm', packed")
        n = self.n
        # VMEM budget: ~(A + s + out blocks, the c cached spectra, and
        # ~8 half-plane temporaries) int32 planes must fit the ~16 MB
        # scoped limit; keep ~12 MB for data
        planes = 2 * r * c + 2 * c + 2 * r + 8
        tile = min(self.tile,
                   max(128, (12 << 20) // (planes * n * 4) // 128 * 128))
        kernel = _make_incomplete_matvec_kernel(self.sub_p, n, tile, r, c)
        log2m = self.sub_p.log2n
        tw_spec = pl.BlockSpec((log2m, n // 2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        t_spec = pl.BlockSpec((n // 2, 2), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        A_spec = pl.BlockSpec((r * c * n, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((c * n, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((r * n, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        tabs = (self._ptwf, self._ptwfsh, self._ptwi, self._ptwish,
                self._pt, self._ptsh)

        def call(A, s):
            return pl.pallas_call(
                kernel,
                grid=(A.shape[1] // tile,),
                in_specs=[A_spec, s_spec] + [tw_spec] * 4 + [t_spec] * 2,
                out_specs=o_spec,
                out_shape=jax.ShapeDtypeStruct((r * n, A.shape[1]),
                                               jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                interpret=self.interpret,
            )(A, s, *tabs)

        def full(A, s):
            lead = A.shape[:-3]
            A = A.astype(jnp.int32).reshape(-1, r * c * n)
            s = s.astype(jnp.int32).reshape(-1, c * n)
            batch = A.shape[0]
            pad = (-batch) % tile
            if pad:
                A = jnp.pad(A, ((0, pad), (0, 0)))
                s = jnp.pad(s, ((0, pad), (0, 0)))
            out = call(A.T, s.T).T[:batch]
            return out.reshape(*lead, r, n)

        jitted = jax.jit(full)
        cache[(r, c)] = jitted
        return jitted

    def matvec(self, A, s):
        """Module product A (..., r, c, n) × s (..., c, n) -> (..., r, n)
        through ONE fused kernel: c vector transforms, r·c matrix
        transforms, spectral basemul-accumulate, r inverses — the ML-KEM
        A_hat·s_hat pattern (IncompletePlan.matvec fast-path twin)."""
        check_domain(A, self.q, "matvec A")
        check_domain(s, self.q, "matvec s")
        A = jnp.asarray(A)
        s = jnp.asarray(s)
        r, c = A.shape[-3], A.shape[-2]
        if s.shape[-2] != c or A.shape[-1] != self.n:
            raise ValueError(f"matvec shape mismatch: A {A.shape} vs "
                             f"s {s.shape}")
        return self._matvec_call(r, c)(A, s)
