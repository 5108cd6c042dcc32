"""Large-modulus polynomial multiplication via RNS channels + CRT.

The reference claims parametric support up to K=64-bit coefficients
(``defines.v:42``) by making every datapath wire wider — viable in silicon,
hostile on TPU (int32 lanes, no 64-bit multiply).  The TPU-native design
instead computes the *integer* negacyclic convolution through several
NTT-friendly ~28-bit RNS channels — each one a fast int32 transform from
transform.py/parallel/sharded.py — and reconstructs mod the big q with a
signed Garner CRT (native __int128 code, csrc/nttcore.cpp), exactly the
structure of production RNS/FHE libraries.

Correctness: channel products equal the integer negacyclic product mod
p_i; with  Π p_i > 2·n·(q-1)²  the signed coefficients (range ±n·q²) are
recovered exactly, then reduced mod q.

Covers BASELINE config 4: single transforms n=2^16..2^20 with 62-bit
primes, single-host sharded (channels run through ShardedPlan when a mesh
is given).
"""

from __future__ import annotations

import functools

import numpy as np

from .params import NTTParams, is_prime, make_params
from .transform import Plan

__all__ = ["BigQPlan", "select_rns_primes"]


def select_rns_primes(n: int, min_product_bits: int,
                      limit: int = 1 << 29) -> list[int]:
    """NTT-friendly channel primes p ≡ 1 (mod 2n), p < 2^29 (MontArith
    range), largest first, until Π p exceeds 2^min_product_bits."""
    step = 2 * n
    p = (limit - 1) // step * step + 1
    out, bits = [], 0.0
    while p > step and bits < min_product_bits:
        if is_prime(p):
            out.append(p)
            bits += np.log2(p)
        p -= step
    if bits < min_product_bits:
        raise ValueError(
            f"not enough NTT-friendly channel primes for n={n}: "
            f"got {bits:.0f} of {min_product_bits} bits")
    return out


class BigQPlan:
    """Polynomial products in Z_q[x]/(x^n+1) for big q (up to ~2^62).

    API: ``polymul(a, b)`` on (batch, n) uint64 host arrays.  The channel
    transforms run on device (single chip or sharded over ``mesh``); RNS
    split and Garner reconstruction run in the native host core when
    available, else a NumPy/Python fallback.
    """

    def __init__(self, params: NTTParams, mesh=None, primes=None):
        if params.q.bit_length() > 62:
            raise ValueError("q must fit in 62 bits")
        self.params = params
        n, q = params.n, params.q
        need = 1 + params.log2n + 2 * q.bit_length() + 1   # 2·n·q² headroom
        self.primes = list(primes) if primes else select_rns_primes(n, need)
        self.M = 1
        for p in self.primes:
            self.M *= p
        assert self.M > 2 * n * (q - 1) ** 2
        self.mesh = mesh
        if mesh is None:
            self.channel_plans = [Plan(make_params(n, p))
                                  for p in self.primes]
        else:
            from .parallel.sharded import ShardedPlan
            self.channel_plans = [ShardedPlan(make_params(n, p), mesh)
                                  for p in self.primes]

    # ------------------------------------------------------------------

    @functools.cached_property
    def _native(self):
        from .runtime.native import load
        return load()

    def _split(self, a: np.ndarray) -> np.ndarray:
        """(B, n) uint64 -> (k, B, n) int32 residues."""
        flat = np.ascontiguousarray(a, dtype=np.uint64).reshape(-1)
        if self._native is not None:
            res = self._native.rns_split(flat, self.primes)
        else:
            res = np.stack([(flat % np.uint64(p)).astype(np.int32)
                            for p in self.primes])
        return res.reshape(len(self.primes), *a.shape)

    def _reconstruct(self, residues: np.ndarray) -> np.ndarray:
        """(k, B, n) int32 channel products -> (B, n) uint64 mod q."""
        k = len(self.primes)
        flat = np.ascontiguousarray(residues, dtype=np.int32).reshape(k, -1)
        if self._native is not None:
            out = self._native.crt_garner(flat, self.primes, self.params.q)
        else:
            out = self._crt_python(flat)
        return out.reshape(residues.shape[1:])

    def _crt_python(self, flat: np.ndarray) -> np.ndarray:
        """Slow exact fallback (python ints)."""
        q, M = self.params.q, self.M
        coeffs = []
        for p in self.primes:
            Mi = M // p
            coeffs.append((Mi, pow(Mi, -1, p)))
        out = np.zeros(flat.shape[1], dtype=np.uint64)
        for j in range(flat.shape[1]):
            x = 0
            for i, p in enumerate(self.primes):
                Mi, MiInv = coeffs[i]
                x += Mi * (int(flat[i, j]) * MiInv % p)
            x %= M
            if x > (M - 1) // 2:
                x -= M
            out[j] = x % q
        return out

    # ------------------------------------------------------------------

    def polymul(self, a, b) -> np.ndarray:
        """Negacyclic product of (batch, n) uint64 arrays, mod big q."""
        a = np.atleast_2d(np.asarray(a, dtype=np.uint64))
        b = np.atleast_2d(np.asarray(b, dtype=np.uint64))
        ra, rb = self._split(a), self._split(b)
        outs = []
        for i, plan in enumerate(self.channel_plans):
            if self.mesh is None:
                ci = np.asarray(plan.polymul_jit(ra[i], rb[i]))
            else:
                ci = plan.unshard(plan.polymul_jit(
                    plan.shard_coeffs(ra[i]), plan.shard_coeffs(rb[i])))
            outs.append(ci.astype(np.int32))
        return self._reconstruct(np.stack(outs))
