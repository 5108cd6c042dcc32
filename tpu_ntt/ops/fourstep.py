"""Fused four-step Pallas kernel: whole large-n polymul in one VMEM pass.

For n = n1·n2 too large for the flat (n, tile) kernel to be efficient,
the four-step factorisation (the same one parallel/sharded.py distributes
over a mesh — column NTTs, twist, row NTTs; see its module docstring for
the algebra and the FPGA analogy) runs entirely inside one Pallas block:

    (T, n1, n2) coefficient matrices -> column transforms along the
    SUBLANE axis, twist, row transforms along the LANE axis — no
    transpose, no per-stage HBM round-trips.

The XLA ShardedPlan path on a single chip materialises every butterfly
stage to HBM (~35 passes x the array size per product): measured
HBM-bound at n=2^16 (~560 GB/s of a v5e's ~810). Here the whole product
touches HBM 3 times (a, b in; c out).

Both sub-transforms use the packed two-plane constant-geometry form of
ops/butterfly.py (butterflies elementwise on half-planes, roll+select
repacks, free seams): the representation nests — the column spectrum
stays in packed (even, odd) plane order while the row transforms run
along lanes inside each plane, the pointwise product is elementwise in
any consistent layout, and both inverses start exactly at their packed
seams.  Twist tables are gathered host-side into the packed row order.

Scale bookkeeping matches parallel/sharded.py exactly: the inverse twist
folds n^-1 and arith.pointwise_fix (R for Montgomery — cancelling the
one data x data pointwise multiply's R^-1), so the output is canonical
with no separate final scale.

Reference lineage: the four-step split of NTTN.v's monolithic stage loop
(NTTN.v:190-198) with the twist playing the role of the inter-bank
brscramble exchange (AddressGenerator.v:310-337) at matrix scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import NTTParams, make_params, modinv
from ..utils.bitrev import bit_reverse_indices
from .butterfly import _flavor, _packed_stage_tables

__all__ = ["PallasFourStep", "supported"]


def _default_split(n: int) -> tuple[int, int]:
    """n2 takes the lane axis: keep it at full-register multiples."""
    n2 = min(512, max(128, n // 256))
    while n2 * 16 > n:
        n2 //= 2
    return n // n2, n2


def supported(params: NTTParams, n1: int | None = None) -> bool:
    if params.q >= (1 << 29) or params.q % 2 == 0:
        return False
    if n1 is None:
        if params.n < 16 * 128:
            return False
        n1, n2 = _default_split(params.n)
    else:
        n2 = params.n // n1
    # VMEM budget: ~10 live (n1, n2) int32 planes per block
    return (n1 >= 16 and n2 >= 128 and n1 * n2 * 4 * 10 < (1 << 25)
            and params.n == n1 * n2)


def _flavor_ops(q: int) -> dict:
    """Per-modulus-class arithmetic closures shared by the fused and the
    blocked four-step kernels: lazy Shoup (q < 2^14), float-assisted
    Barrett (q < 2^23), digit-serial Montgomery (< 2^29).  Returns
    cmul (x · table constant), dmul (data x data), badd/bsub (CT
    butterfly add/sub), gsub (GS subtract), csubq, and the flavor name."""
    flavor = _flavor(q)
    mont = flavor == "mont"
    q32 = np.int32(q)
    two_q = np.int32(2 * q)
    m15 = np.int32((1 << 15) - 1)

    def csubq(x):
        r = x - q32
        return r + ((r >> 31) & q32)

    def csub2q(x):
        r = x - two_q
        return r + ((r >> 31) & two_q)

    if flavor == "f32":
        # float-assisted Barrett (see butterfly._make_kernel_f32 /
        # modmul.FBarrettArith for the exactness bounds); values lazy
        # [0, 2q) between stages, 2q < 2^24 keeps f32 conversions exact
        three_q = np.int32(3 * q)
        four_q = np.int32(4 * q)
        qinv_f = np.float32(1.0 / q)

        def csub4q(x):
            r = x - four_q
            return r + ((r >> 31) & four_q)

        def cmul(x, w, wf):
            t = (x.astype(jnp.float32) * wf).astype(jnp.int32)
            return csub2q(csub4q(x * w - t * q32 + three_q))

        def dmul(x, y):
            xc, yc = csubq(x), csubq(y)
            pf = (xc.astype(jnp.float32) * yc.astype(jnp.float32) * qinv_f)
            t = pf.astype(jnp.int32)
            return csub2q(csub4q(xc * yc - t * q32 + two_q))

        badd = lambda A, m: csub2q(A + m)
        bsub = lambda A, m: csub2q(A - m + two_q)
        gsub = lambda A, B: csub2q(A - B + two_q)
    elif mont:
        q0 = np.int32(q & ((1 << 15) - 1))
        q1 = np.int32(q >> 15)
        qp = np.int32((-pow(q, -1, 1 << 15)) % (1 << 15))

        def redc(H, Mid, L0):
            u0 = ((L0 & m15) * qp) & m15
            t1 = (L0 + u0 * q0) >> 15
            A1 = Mid + u0 * q1 + t1
            a1h, a1l = A1 >> 15, A1 & m15
            u1 = (a1l * qp) & m15
            t2 = (a1l + u1 * q0) >> 15
            return csubq(csubq(H + a1h + u1 * q1 + t2))

        def cmul(x, w, _wsh):
            """x times a Montgomery-form (w·R) constant."""
            x1, x0 = x >> 15, x & m15
            y1, y0 = w >> 15, w & m15
            return redc(x1 * y1, x1 * y0 + x0 * y1, x0 * y0)

        dmul = lambda x, y: cmul(x, y, None)  # data x data: leaves R^-1
        badd = lambda A, m: csubq(A + m)
        bsub = lambda A, m: csubq(A - m + q32)

        def gsub(A, B):
            r = A - B
            return r + ((r >> 31) & q32)
    else:
        def cmul(x, w, wsh):
            t = (x * wsh) >> 16
            return x * w - t * q32           # in [0, 2q)

        def dmul(a, b):
            z = a * b                        # both < 2^15: z < 2^30
            hi = z >> 15
            lo = z & np.int32((1 << 15) - 1)
            c = (1 << 15) % q
            r1 = cmul(hi, np.int32(c), np.int32((c << 16) // q))
            r2 = cmul(lo, np.int32(1), np.int32((1 << 16) // q))
            return csub2q(r1 + r2)           # [0, 2q)

        badd = lambda A, m: csub2q(A + m)
        bsub = lambda A, m: csub2q(A - m + two_q)
        gsub = lambda A, B: csub2q(A - B + two_q)

    return {"flavor": flavor, "mont": mont, "cmul": cmul, "dmul": dmul,
            "badd": badd, "bsub": bsub, "gsub": gsub, "csubq": csubq,
            "csub2q": csub2q}


def _make_fourstep_kernel(p1: NTTParams, p2: NTTParams, q: int, tile: int):
    """Kernel factory. p1: negacyclic column sub-ring (psi^n2 merged);
    p2: cyclic row sub-ring (omega^n1). Arithmetic flavor per q, see
    :func:`_flavor_ops`."""
    n1, n2 = p1.n, p2.n
    h1, h2 = n1 // 2, n2 // 2
    l1, l2 = p1.log2n, p2.log2n
    ops = _flavor_ops(q)
    mont = ops["mont"]
    cmul, dmul = ops["cmul"], ops["dmul"]
    badd, bsub, gsub = ops["badd"], ops["bsub"], ops["gsub"]
    csubq, csub2q = ops["csubq"], ops["csub2q"]

    def block_mask(shape, axis, bsz):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        return ((i // bsz) & 1) == 0

    def repack(A, B, bsz, axis, h):
        mask = block_mask(A.shape, axis, bsz)
        A2 = jnp.where(mask, A, pltpu.roll(B, bsz, axis))
        B2 = jnp.where(mask, pltpu.roll(A, h - bsz, axis), B)
        return A2, B2

    def bcast(row, axis):
        """(k,) stage table -> broadcastable over a (T, s1, s2) plane."""
        return row[None, :, None] if axis == 1 else row[None, None, :]

    def packed_fwd(A, B, tw, twsh, log2n, n, h, axis):
        for s in range(log2n):
            m = cmul(B, bcast(tw[s], axis), bcast(twsh[s], axis))
            A, B = badd(A, m), bsub(A, m)
            if s < log2n - 1:
                A, B = repack(A, B, n >> (s + 2), axis, h)
        return A, B                          # packed (even, odd) planes

    def packed_inv(A, B, tw, twsh, log2n, h, axis):
        for s in range(log2n):
            m = cmul(gsub(A, B), bcast(tw[s], axis), bcast(twsh[s], axis))
            if mont:
                A, B = csubq(A + B), m
            else:
                A, B = csub2q(A + B), m
            if s < log2n - 1:
                A, B = repack(A, B, 1 << s, axis, h)
        return A, B

    def fwd_spectrum(x, ctwf, ctwfsh, rtwf, rtwfsh, twfA, twfAsh,
                     twfB, twfBsh):
        """(T, n1, n2) -> four packed quadrants (T, h1, h2)."""
        A, B = x[:, :h1], x[:, h1:]
        A, B = packed_fwd(A, B, ctwf, ctwfsh, l1, n1, h1, axis=1)
        A = cmul(A, twfA[None], twfAsh[None])       # (h1, n2) twist
        B = cmul(B, twfB[None], twfBsh[None])
        AA, AB = packed_fwd(A[..., :h2], A[..., h2:], rtwf, rtwfsh,
                            l2, n2, h2, axis=2)
        BA, BB = packed_fwd(B[..., :h2], B[..., h2:], rtwf, rtwfsh,
                            l2, n2, h2, axis=2)
        return AA, AB, BA, BB

    def kernel(a_ref, b_ref, ctwf_ref, ctwfsh_ref, ctwi_ref, ctwish_ref,
               rtwf_ref, rtwfsh_ref, rtwi_ref, rtwish_ref,
               twfA_ref, twfAsh_ref, twfB_ref, twfBsh_ref,
               twiA_ref, twiAsh_ref, twiB_ref, twiBsh_ref, out_ref):
        # twist tables arrive pre-split per plane half — slicing a loaded
        # table in-kernel lowers to a Mosaic gather, which doesn't
        # lower for these shapes
        ctwf, ctwfsh = ctwf_ref[...], ctwfsh_ref[...]
        ctwi, ctwish = ctwi_ref[...], ctwish_ref[...]
        rtwf, rtwfsh = rtwf_ref[...], rtwfsh_ref[...]
        rtwi, rtwish = rtwi_ref[...], rtwish_ref[...]
        twfA, twfAsh = twfA_ref[...], twfAsh_ref[...]
        twfB, twfBsh = twfB_ref[...], twfBsh_ref[...]
        twiA, twiAsh = twiA_ref[...], twiAsh_ref[...]
        twiB, twiBsh = twiB_ref[...], twiBsh_ref[...]

        fa = fwd_spectrum(a_ref[...], ctwf, ctwfsh, rtwf, rtwfsh,
                          twfA, twfAsh, twfB, twfBsh)
        fb = fwd_spectrum(b_ref[...], ctwf, ctwfsh, rtwf, rtwfsh,
                          twfA, twfAsh, twfB, twfBsh)
        cAA, cAB, cBA, cBB = (dmul(x, y) for x, y in zip(fa, fb))

        A = jnp.concatenate(
            packed_inv(cAA, cAB, rtwi, rtwish, l2, h2, axis=2), axis=2)
        B = jnp.concatenate(
            packed_inv(cBA, cBB, rtwi, rtwish, l2, h2, axis=2), axis=2)
        A = cmul(A, twiA[None], twiAsh[None])   # inverse twist
        B = cmul(B, twiB[None], twiBsh[None])   # (incl. n^-1·fix)
        A, B = packed_inv(A, B, ctwi, ctwish, l1, h1, axis=1)
        out = jnp.concatenate([A, B], axis=1)
        if not mont:
            out = csubq(out)                 # lazy [0,2q) -> canonical
        out_ref[...] = out

    return kernel


class PallasFourStep:
    """Plan-level wrapper: fused four-step polymul for (batch, n) int32,
    n = n1·n2 with n1 on sublanes and n2 on lanes (default split keeps
    n2 at 128–512 lanes).  API-compatible with PallasPolymul.polymul."""

    def __init__(self, params: NTTParams, n1: int | None = None,
                 tile: int | None = None, interpret: bool = False):
        if not supported(params, n1):
            raise ValueError(
                f"PallasFourStep needs odd q < 2^29 and a supported "
                f"n1 x n2 split (got n={params.n}, q={params.q})")
        self.params = params
        p, q = params, params.q
        if n1 is None:
            n1, n2 = _default_split(p.n)
        else:
            n2 = p.n // n1
        self.n1, self.n2 = n1, n2
        self.flavor = _flavor(q)
        self.mont = self.flavor == "mont"
        if tile is None:
            tile = max(1, (1 << 16) // p.n)  # polys per block (~256 KiB)
            if self.flavor == "f32" and tile == 1:
                # measured on v5e (r5): the f32 body's smaller live set
                # leaves VMEM headroom a second resident poly converts
                # into grid-pipeline overlap — marginal 138.6 vs 90.5
                # Krows/s at n=2^16 (tile=4 regresses; mont regresses
                # at tile=2 already, its working set is larger)
                tile = 2
        self.tile = tile
        self.interpret = interpret

        # sub-rings: negacyclic columns (psi^n2), cyclic rows (omega^n1)
        om1 = pow(p.omega, n2, q)
        psi1 = pow(p.psi, n2, q) if p.psi else 0
        self.p1 = NTTParams(n=n1, q=q, omega=om1, psi=psi1)
        self.p2 = NTTParams(n=n2, q=q, omega=pow(p.omega, n1, q), psi=0)

        self._ctwf, self._ctwfsh = _packed_stage_tables(
            self.p1, inverse=False, flavor=self.flavor)
        self._ctwi, self._ctwish = _packed_stage_tables(
            self.p1, inverse=True, flavor=self.flavor)
        self._rtwf, self._rtwfsh = _packed_stage_tables(
            self.p2, inverse=False, flavor=self.flavor)
        self._rtwi, self._rtwish = _packed_stage_tables(
            self.p2, inverse=True, flavor=self.flavor)
        self._twist_tables()

    def _twist_tables(self):
        """Step-3 twist tables in (n1-position, i2) orientation, gathered
        into the packed row order (even slots ‖ odd slots), with the
        inverse folding n^-1 and the pointwise fix — the single-block
        twin of parallel/sharded.ShardedPlan._twiddles."""
        p, q = self.params, self.params.q
        n1, n2 = self.n1, self.n2
        k1 = bit_reverse_indices(n1)
        exp = (k1[:, None].astype(np.int64)
               * np.arange(n2, dtype=np.int64)[None, :]) % p.n
        psi = p.psi if p.psi else 1
        psi_inv = modinv(psi, q) if p.psi else 1

        def powers(base, count):
            out = np.empty(count, dtype=np.int64)
            acc = 1
            for i in range(count):
                out[i] = acc
                acc = acc * base % q
            return out

        w_pow = powers(p.omega, p.n)
        wi_pow = powers(p.omega_inv, p.n)
        psi_row = powers(psi, n2)[None, :]
        psi_inv_row = powers(psi_inv, n2)[None, :]
        fix = (1 << 30) % q if self.mont else 1
        inv_scale = modinv(p.n, q) * fix % q

        fwd = w_pow[exp] * psi_row % q                  # (n1-pos, i2)
        inv = wi_pow[exp] * psi_inv_row % q * inv_scale % q
        pack = np.concatenate([np.arange(0, n1, 2), np.arange(1, n1, 2)])

        def tabs(m):
            m = m[pack]
            if self.mont:
                return ((m << 30) % q).astype(np.int32), \
                    np.zeros_like(m, dtype=np.int32)
            if self.flavor == "f32":
                return (m.astype(np.int32),
                        (m.astype(np.float64) / float(q)).astype(np.float32))
            return m.astype(np.int32), ((m << 16) // q).astype(np.int32)

        h1 = n1 // 2
        twf, twfsh = tabs(fwd)
        twi, twish = tabs(inv)
        # pre-split per plane half: in-kernel table slicing doesn't lower
        self._twfA, self._twfB = twf[:h1], twf[h1:]
        self._twfAsh, self._twfBsh = twfsh[:h1], twfsh[h1:]
        self._twiA, self._twiB = twi[:h1], twi[h1:]
        self._twiAsh, self._twiBsh = twish[:h1], twish[h1:]

    @functools.cached_property
    def _call(self):
        n1, n2, tile = self.n1, self.n2, self.tile
        kernel = _make_fourstep_kernel(self.p1, self.p2, self.params.q,
                                       tile)

        def spec(shape):
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        data_spec = pl.BlockSpec((tile, n1, n2), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        tabs = (self._ctwf, self._ctwfsh, self._ctwi, self._ctwish,
                self._rtwf, self._rtwfsh, self._rtwi, self._rtwish,
                self._twfA, self._twfAsh, self._twfB, self._twfBsh,
                self._twiA, self._twiAsh, self._twiB, self._twiBsh)
        specs = [data_spec, data_spec] + [spec(t.shape) for t in tabs]

        def run(a, b):
            return pl.pallas_call(
                kernel,
                grid=(a.shape[0] // tile,),
                in_specs=specs,
                out_specs=data_spec,
                out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
                cost_estimate=pl.CostEstimate(
                    flops=3 * a.shape[0] * (self.params.n // 2)
                    * self.params.log2n * 10,
                    bytes_accessed=3 * a.size * 4,
                    transcendentals=0),
                # independent batch blocks: pipeline the grid (measured
                # +14% streamed at n=2^16 f32, r5)
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                interpret=self.interpret,
            )(a, b, *tabs)

        return jax.jit(run)

    @functools.cached_property
    def _full(self):
        n1, n2, tile = self.n1, self.n2, self.tile
        n = self.params.n

        def full(a, b):
            lead = a.shape[:-1]
            a = a.astype(jnp.int32).reshape(-1, n1, n2)
            b = b.astype(jnp.int32).reshape(-1, n1, n2)
            batch = a.shape[0]
            pad = (-batch) % tile
            if pad:
                a = jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
                b = jnp.pad(b, ((0, pad), (0, 0), (0, 0)))
            out = self._call(a, b)
            return out[:batch].reshape(*lead, n)

        return jax.jit(full)

    def polymul(self, a, b):
        """Negacyclic (psi set) or cyclic product; canonical in/out."""
        return self._full(jnp.asarray(a), jnp.asarray(b))


# ---------------------------------------------------------------------------
# blocked four-step: n = 2^17 .. 2^20 (matrix too large for one VMEM block)
# ---------------------------------------------------------------------------

def _blocked_split(n: int) -> tuple[int, int]:
    """Square-ish split with n1, n2 powers of two, n2 >= 128."""
    l = n.bit_length() - 1
    l2 = max(7, l // 2)
    return n >> l2, 1 << l2


def blocked_supported(params: NTTParams, n1: int | None = None) -> bool:
    if params.q >= (1 << 29) or params.q % 2 == 0:
        return False
    if n1 is None:
        n1, n2 = _blocked_split(params.n)
    else:
        n2 = params.n // n1
    return (params.n == n1 * n2 and n1 >= 256 and n2 >= 128
            and params.n > (1 << 16))


def _make_blocked_kernels(p1: NTTParams, p2: NTTParams, q: int):
    """Three grid kernels over slabs of the (n1, n2) coefficient matrix:

      K1  column packed-fwd + forward twist      (grid over n2 lane-blocks)
      K2  row fwd(a), fwd(b), pointwise, row inv,
          inverse twist (incl. n^-1·fix)          (grid over n1 row-blocks)
      K3  column packed-inv + final correction    (grid over n2 lane-blocks)

    The (n1, n2) intermediate lives in HBM between kernels in PACKED row
    order (column-spectrum even slots ‖ odd slots) — the same seam the
    fused kernel keeps in VMEM, so the twist/stage tables are shared with
    :class:`PallasFourStep` unchanged.  9 HBM plane-passes per product vs
    ~3·log2(n) for the stage-by-stage XLA path."""
    n1, n2 = p1.n, p2.n
    h1, h2 = n1 // 2, n2 // 2
    l1, l2 = p1.log2n, p2.log2n
    ops = _flavor_ops(q)
    mont = ops["mont"]
    cmul, dmul = ops["cmul"], ops["dmul"]
    badd, bsub, gsub = ops["badd"], ops["bsub"], ops["gsub"]
    csubq, csub2q = ops["csubq"], ops["csub2q"]

    def block_mask(shape, axis, bsz):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        return ((i // bsz) & 1) == 0

    def repack(A, B, bsz, axis, h):
        mask = block_mask(A.shape, axis, bsz)
        A2 = jnp.where(mask, A, pltpu.roll(B, bsz, axis))
        B2 = jnp.where(mask, pltpu.roll(A, h - bsz, axis), B)
        return A2, B2

    def bcast(row, axis):
        return row[None, :, None] if axis == 1 else row[None, None, :]

    def packed_fwd(A, B, tw, twsh, log2n, n, h, axis):
        for s in range(log2n):
            m = cmul(B, bcast(tw[s], axis), bcast(twsh[s], axis))
            A, B = badd(A, m), bsub(A, m)
            if s < log2n - 1:
                A, B = repack(A, B, n >> (s + 2), axis, h)
        return A, B

    def packed_inv(A, B, tw, twsh, log2n, h, axis):
        for s in range(log2n):
            m = cmul(gsub(A, B), bcast(tw[s], axis), bcast(twsh[s], axis))
            if mont:
                A, B = csubq(A + B), m
            else:
                A, B = csub2q(A + B), m
            if s < log2n - 1:
                A, B = repack(A, B, 1 << s, axis, h)
        return A, B

    def k1(x_ref, ctwf_ref, ctwfsh_ref, twfA_ref, twfAsh_ref,
           twfB_ref, twfBsh_ref, out_ref):
        """(t, n1, L2) natural columns -> packed twisted column spectrum."""
        x = x_ref[...]
        A, B = packed_fwd(x[:, :h1], x[:, h1:], ctwf_ref[...],
                          ctwfsh_ref[...], l1, n1, h1, axis=1)
        A = cmul(A, twfA_ref[...][None], twfAsh_ref[...][None])
        B = cmul(B, twfB_ref[...][None], twfBsh_ref[...][None])
        out_ref[...] = jnp.concatenate([A, B], axis=1)

    def k2(fa_ref, fb_ref, rtwf_ref, rtwfsh_ref, rtwi_ref, rtwish_ref,
           twi_ref, twish_ref, out_ref):
        """(t, S1, n2) packed rows: rows fwd x2, pointwise, rows inv,
        inverse twist (twi rows are the packed-order (n1, n2) table)."""
        rtwf, rtwfsh = rtwf_ref[...], rtwfsh_ref[...]
        rtwi, rtwish = rtwi_ref[...], rtwish_ref[...]
        fa, fb = fa_ref[...], fb_ref[...]
        aA, aB = packed_fwd(fa[..., :h2], fa[..., h2:], rtwf, rtwfsh,
                            l2, n2, h2, axis=2)
        bA, bB = packed_fwd(fb[..., :h2], fb[..., h2:], rtwf, rtwfsh,
                            l2, n2, h2, axis=2)
        A, B = packed_inv(dmul(aA, bA), dmul(aB, bB), rtwi, rtwish,
                          l2, h2, axis=2)
        c = jnp.concatenate([A, B], axis=2)
        out_ref[...] = cmul(c, twi_ref[...][None], twish_ref[...][None])

    def k3(c_ref, ctwi_ref, ctwish_ref, out_ref):
        """(t, n1, L2) packed rows -> natural-order canonical output."""
        c = c_ref[...]
        A, B = packed_inv(c[:, :h1], c[:, h1:], ctwi_ref[...],
                          ctwish_ref[...], l1, h1, axis=1)
        out = jnp.concatenate([A, B], axis=1)
        if not mont:
            out = csubq(out)
        out_ref[...] = out

    return k1, k2, k3


class PallasFourStepBlocked:
    """Large-n polymul (n = 2^17 .. 2^20) as three gridded Pallas kernels
    over slabs of the (n1, n2) coefficient matrix — the single-chip
    continuation of :class:`PallasFourStep` past the one-block VMEM
    envelope.  API-compatible: ``polymul`` on (batch, n) int32.

    Reference lineage: the same NTTN.v monolithic stage loop at n up to
    2^15 (defines.v:42, NTTN.v:25-27), scaled past VMEM the way the FPGA
    scales past one BRAM bank — by blocking the matrix and streaming
    slabs (NTTN.v:94-117), with HBM playing DRAM."""

    def __init__(self, params: NTTParams, n1: int | None = None,
                 tile: int | None = None, interpret: bool = False):
        if not blocked_supported(params, n1):
            raise ValueError(
                f"PallasFourStepBlocked needs odd q < 2^29 and "
                f"2^17 <= n = n1·n2 (got n={params.n}, q={params.q})")
        self.params = params
        p, q = params, params.q
        if n1 is None:
            n1, n2 = _blocked_split(p.n)
        else:
            n2 = p.n // n1
        self.n1, self.n2 = n1, n2
        self.flavor = _flavor(q)
        self.mont = self.flavor == "mont"
        self.tile = 1 if tile is None else tile
        # lane-block width for K1/K3 (columns) and row-block height for K2
        self.L2 = min(256, n2)
        self.S1 = max(8, min(128, (1 << 19) // n2))
        self.interpret = interpret

        om1 = pow(p.omega, n2, q)
        psi1 = pow(p.psi, n2, q) if p.psi else 0
        self.p1 = NTTParams(n=n1, q=q, omega=om1, psi=psi1)
        self.p2 = NTTParams(n=n2, q=q, omega=pow(p.omega, n1, q), psi=0)

        self._ctwf, self._ctwfsh = _packed_stage_tables(
            self.p1, inverse=False, flavor=self.flavor)
        self._ctwi, self._ctwish = _packed_stage_tables(
            self.p1, inverse=True, flavor=self.flavor)
        self._rtwf, self._rtwfsh = _packed_stage_tables(
            self.p2, inverse=False, flavor=self.flavor)
        self._rtwi, self._rtwish = _packed_stage_tables(
            self.p2, inverse=True, flavor=self.flavor)
        PallasFourStep._twist_tables(self)
        # K2 consumes the inverse twist as one packed-order (n1, n2) table
        self._twi_full = np.concatenate([self._twiA, self._twiB], axis=0)
        self._twish_full = np.concatenate([self._twiAsh, self._twiBsh],
                                          axis=0)

    @functools.cached_property
    def _calls(self):
        n1, n2, t = self.n1, self.n2, self.tile
        L2, S1 = self.L2, self.S1
        k1, k2, k3 = _make_blocked_kernels(self.p1, self.p2, self.params.q)
        interp = self.interpret

        def tab(a):
            shape = a.shape
            return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        col_spec = pl.BlockSpec((t, n1, L2), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)
        twcol = pl.BlockSpec((n1 // 2, L2), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)
        row_spec = pl.BlockSpec((t, S1, n2), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
        twrow = pl.BlockSpec((S1, n2), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM)

        def call_k1(x, *tabs):
            return pl.pallas_call(
                k1, grid=(x.shape[0] // t, n2 // L2),
                in_specs=[col_spec, tab(tabs[0]), tab(tabs[1]),
                          twcol, twcol, twcol, twcol],
                out_specs=col_spec,
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel")),
                interpret=interp)(x, *tabs)

        def call_k2(fa, fb, *tabs):
            return pl.pallas_call(
                k2, grid=(fa.shape[0] // t, n1 // S1),
                in_specs=[row_spec, row_spec] + [tab(a) for a in tabs[:4]]
                + [twrow, twrow],
                out_specs=row_spec,
                out_shape=jax.ShapeDtypeStruct(fa.shape, jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel")),
                interpret=interp)(fa, fb, *tabs)

        def call_k3(c, *tabs):
            return pl.pallas_call(
                k3, grid=(c.shape[0] // t, n2 // L2),
                in_specs=[col_spec, tab(tabs[0]), tab(tabs[1])],
                out_specs=col_spec,
                out_shape=jax.ShapeDtypeStruct(c.shape, jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel")),
                interpret=interp)(c, *tabs)

        return call_k1, call_k2, call_k3

    @functools.cached_property
    def _full(self):
        n, n1, n2, t = self.params.n, self.n1, self.n2, self.tile
        call_k1, call_k2, call_k3 = self._calls
        k1tabs = (self._ctwf, self._ctwfsh, self._twfA, self._twfAsh,
                  self._twfB, self._twfBsh)
        k2tabs = (self._rtwf, self._rtwfsh, self._rtwi, self._rtwish,
                  self._twi_full, self._twish_full)
        k3tabs = (self._ctwi, self._ctwish)

        def full(a, b):
            lead = a.shape[:-1]
            a = a.astype(jnp.int32).reshape(-1, n1, n2)
            b = b.astype(jnp.int32).reshape(-1, n1, n2)
            batch = a.shape[0]
            pad = (-batch) % t
            if pad:
                a = jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
                b = jnp.pad(b, ((0, pad), (0, 0), (0, 0)))
            fa = call_k1(a, *k1tabs)
            fb = call_k1(b, *k1tabs)
            c = call_k2(fa, fb, *k2tabs)
            out = call_k3(c, *k3tabs)
            return out[:batch].reshape(*lead, n)

        return jax.jit(full)

    def polymul(self, a, b):
        """Negacyclic (psi set) or cyclic product; canonical in/out."""
        return self._full(jnp.asarray(a), jnp.asarray(b))
