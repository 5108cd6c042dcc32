"""Multi-limb (q < 2^62) lane arithmetic + device-side CRT tests.

Oracle: python big ints — fully independent of the code under test.
"""

import numpy as np
import pytest

from tpu_ntt.bigq import DeviceCRT, select_rns_primes
from tpu_ntt.ops.limb import (LimbArith, pack_u64_planes,
                              unpack_u64_planes)


@pytest.mark.parametrize("qbits", [17, 41, 59, 62])
def test_limb_accumulate_finalize_exact(rng, qbits):
    from tpu_ntt.params import find_ntt_prime
    q = find_ntt_prime(qbits, 256)
    la = LimbArith(q)
    shape = (3, 7)
    n_terms = 11
    vs = rng.integers(0, 1 << 15, (n_terms, *shape)).astype(np.int32)
    cs = [int(rng.integers(0, q)) for _ in range(n_terms)]
    acc = la.zero_acc(shape, la.L + 2)
    for v, c in zip(vs, cs):
        la.acc_mul_const(acc, v, c)
    limbs = [np.asarray(p) for p in la.finalize(acc, n_terms)]
    # reconstruct and compare against python-int ground truth
    got = np.zeros(shape, dtype=object)
    for j, p in enumerate(limbs):
        got += p.astype(object) << (15 * j)
    want = np.zeros(shape, dtype=object)
    for v, c in zip(vs, cs):
        want += v.astype(object) * c
    assert np.array_equal(got, want % q)


def test_limb_acc_overflow_guard():
    la = LimbArith((1 << 29) + 11)            # not prime; irrelevant here
    acc = la.zero_acc((2,), la.L)             # no headroom planes
    la.acc_mul_const(acc, np.ones(2, np.int32), la.q - 1)
    with pytest.raises(ValueError):
        la.finalize(acc, 1 << 40)             # claimed bound can't fit


def test_pack_unpack_roundtrip(rng):
    x = rng.integers(0, 1 << 62, 100, dtype=np.uint64)
    lo, hi = pack_u64_planes(x)
    assert lo.dtype == np.int32 and lo.min() >= 0
    assert np.array_equal(unpack_u64_planes(lo, hi), x)


def test_planes_to_16bit_chunks(rng):
    la = LimbArith((1 << 62) - 57)
    x = rng.integers(0, 1 << 62, 64, dtype=np.uint64)
    lo, hi = pack_u64_planes(x)
    c0, c1, c2, c3 = (np.asarray(c) for c in la.planes_to_16bit(
        np.asarray(lo), np.asarray(hi)))
    back = (c0.astype(object) + (c1.astype(object) << 16)
            + (c2.astype(object) << 31) + (c3.astype(object) << 47))
    assert np.array_equal(back, x.astype(object))
    assert max(c0.max(), c2.max()) < (1 << 16)
    assert max(c1.max(), c3.max()) < (1 << 15)


# ---------------------------------------------------------------------------
# device-side CRT
# ---------------------------------------------------------------------------

def _mk(rng, n=256, qbits=62):
    from tpu_ntt.params import find_ntt_prime
    q = find_ntt_prime(qbits, n)
    need = 1 + 8 + 2 * qbits + 1
    primes = select_rns_primes(n, need)
    return q, primes, DeviceCRT(primes, q)


def test_device_split_matches_mod(rng):
    q, primes, dcrt = _mk(rng)
    x = rng.integers(0, 1 << 62, (4, 16), dtype=np.uint64)
    lo, hi = pack_u64_planes(x)
    res = np.asarray(dcrt.split(np.asarray(lo), np.asarray(hi)))
    for i, p in enumerate(primes):
        assert np.array_equal(res[i].astype(np.uint64), x % np.uint64(p)), i


def test_device_garner_signed_exact(rng):
    """Random signed values in (-M/2, M/2): residues -> value mod q."""
    q, primes, dcrt = _mk(rng)
    M = 1
    for p in primes:
        M *= p
    vals = [int(rng.integers(-(2 ** 62), 2 ** 62)) * int(rng.integers(1, 2 ** 60))
            for _ in range(32)]
    vals += [0, 1, -1, (M - 1) // 2, -(M - 1) // 2]
    assert all(abs(v) <= (M - 1) // 2 for v in vals)
    res = np.stack([
        np.array([v % p for v in vals], dtype=np.int64).astype(np.int32)
        for p in primes])
    lo, hi = (np.asarray(t) for t in dcrt.reconstruct(res))
    got = unpack_u64_planes(lo, hi)
    want = np.array([v % q for v in vals], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_bigq_device_crt_end_to_end(rng):
    """BigQPlan (CPU stacked channels + DeviceCRT) vs schoolbook."""
    from tpu_ntt import ref
    from tpu_ntt.bigq import BigQPlan
    from tpu_ntt.params import find_params
    p = find_params(256, 62)
    plan = BigQPlan(p)
    assert plan.dcrt is not None
    a = rng.integers(0, p.q, (2, 256)).astype(np.uint64)
    b = rng.integers(0, p.q, (2, 256)).astype(np.uint64)
    c = plan.polymul(a, b)
    for i in range(2):
        want = ref.schoolbook_negacyclic(a[i].astype(object),
                                         b[i].astype(object), p.q)
        np.testing.assert_array_equal(c[i].astype(object),
                                      want.astype(object))


def test_limb_fuzz_random_moduli(rng):
    """Fuzz: random q of every width 17..62, random term counts, plus the
    adversarial all-max accumulation — exact vs python ints."""
    from tpu_ntt.params import find_ntt_prime
    for trial in range(20):
        qbits = int(rng.integers(17, 63))
        q = find_ntt_prime(qbits, 64)
        la = LimbArith(q)
        n_terms = int(rng.integers(1, 24))
        shape = (4,)
        if trial % 4 == 0:
            vs = np.full((n_terms, *shape), (1 << 15) - 1, dtype=np.int32)
            cs = [q - 1] * n_terms
        else:
            vs = rng.integers(0, 1 << 15, (n_terms, *shape)).astype(np.int32)
            cs = [int(rng.integers(0, q)) for _ in range(n_terms)]
        acc = la.zero_acc(shape, la.L + 2)
        for v, c in zip(vs, cs):
            la.acc_mul_const(acc, v, c)
        limbs = [np.asarray(p) for p in la.finalize(acc, n_terms)]
        got = np.zeros(shape, dtype=object)
        for j, p in enumerate(limbs):
            got += p.astype(object) << (15 * j)
        want = np.zeros(shape, dtype=object)
        for v, c in zip(vs, cs):
            want += v.astype(object) * c
        assert np.array_equal(got, want % q), (trial, qbits, q, n_terms)


def test_wide_pack_roundtrip_and_chunks(rng):
    """Wide (true 32-bit halves) packing covers the full u64 range; the
    16-bit chunk extraction reassembles every value exactly even with
    the int32 sign bit set."""
    import jax
    import jax.numpy as jnp
    x = rng.integers(0, 1 << 63, 4096, dtype=np.uint64) * 2 + 1
    x[:4] = [0, (1 << 64) - 1, 0xFFFFFFFF00000000, 0x00000000FFFFFFFF]
    lo, hi = pack_u64_planes(x, wide=True)
    assert lo.dtype == np.int32 and hi.dtype == np.int32
    np.testing.assert_array_equal(unpack_u64_planes(lo, hi, wide=True), x)
    la = LimbArith((1 << 64) - 59)        # 64-bit modulus -> wide
    assert la.wide and la.chunk_shifts == (16, 32, 48)
    c0, c1, c2, c3 = jax.jit(la.planes_to_16bit)(jnp.asarray(lo),
                                                 jnp.asarray(hi))
    got = (np.asarray(c0).astype(object)
           + (np.asarray(c1).astype(object) << 16)
           + (np.asarray(c2).astype(object) << 32)
           + (np.asarray(c3).astype(object) << 48))
    np.testing.assert_array_equal(got, x.astype(object))


def test_wide_limbs_to_planes_roundtrip(rng):
    """limbs_to_planes in wide mode inverts the 15-bit decomposition for
    values up to 2^64 - 1."""
    import jax.numpy as jnp
    q = (1 << 64) - 59
    la = LimbArith(q)
    vals = rng.integers(0, 1 << 63, 512, dtype=np.uint64) * 2 + 1
    vals[:2] = [q - 1, 0]
    limbs = [jnp.asarray(((vals >> np.uint64(15 * j))
                          & np.uint64(0x7FFF)).astype(np.int32))
             for j in range(la.L)]
    lo, hi = la.limbs_to_planes(limbs)
    back = unpack_u64_planes(np.asarray(lo), np.asarray(hi), wide=True)
    np.testing.assert_array_equal(back, vals)


def test_limb_rejects_past_64_bits():
    with pytest.raises(ValueError):
        LimbArith(1 << 65)
