"""Native host core (csrc/libnttcore.so) tests — built on demand; skipped
when no C++ toolchain is present."""

import numpy as np
import pytest

from tpu_ntt.params import find_params, modinv
from tpu_ntt import ref


@pytest.fixture(scope="module")
def nc():
    from tpu_ntt.runtime.native import load
    core = load()
    if core is None:
        pytest.skip("native core unavailable (no C++ toolchain)")
    return core


def test_mulmod64(nc, rng):
    q = find_params(256, 62).q
    a = rng.integers(0, q, 2000)
    b = rng.integers(0, q, 2000)
    for x, y in zip(a[:200].tolist(), b[:200].tolist()):
        assert nc.mulmod(x, y, q) == x * y % q
    assert nc.mulmod(q - 1, q - 1, q) == (q - 1) * (q - 1) % q
    assert nc.invmod(12345, q) == modinv(12345, q)
    assert nc.powmod(3, q - 1, q) == 1


def test_polymul64_vs_schoolbook(nc, rng):
    p = find_params(128, 62)
    a = rng.integers(0, p.q, 128).astype(np.uint64)
    b = rng.integers(0, p.q, 128).astype(np.uint64)
    got = nc.polymul64(a, b, p.q, p.psi)
    want = ref.schoolbook_negacyclic(a.astype(object), b.astype(object), p.q)
    np.testing.assert_array_equal(got.astype(object), want.astype(object))


def test_native_schoolbook_matches_python(nc, rng):
    p = find_params(64, 40)
    a = rng.integers(0, p.q, 64).astype(np.uint64)
    b = rng.integers(0, p.q, 64).astype(np.uint64)
    got = nc.schoolbook_negacyclic64(a, b, p.q)
    want = ref.schoolbook_negacyclic(a.astype(object), b.astype(object), p.q)
    np.testing.assert_array_equal(got.astype(object), want.astype(object))


def test_rns_split_garner_roundtrip(nc, rng):
    primes = [469762049, 167772161, 754974721, 536870401]
    M = int(np.prod([int(p) for p in primes], dtype=object))
    q = find_params(256, 62).q
    import random
    rnd = random.Random(7)
    vals = [rnd.randrange(-(M // 2) + 1, M // 2) for _ in range(300)]
    vals += [0, 1, -1, M // 2, -(M // 2) + 1]          # corners
    res = np.stack([np.array([v % p for v in vals], dtype=np.int32)
                    for p in primes])
    out = nc.crt_garner(res, np.array(primes, dtype=np.uint64), q)
    want = np.array([v % q for v in vals], dtype=np.uint64)
    np.testing.assert_array_equal(out, want)


def test_rns_split_matches_numpy(nc, rng):
    a = rng.integers(0, 1 << 62, 1000).astype(np.uint64)
    primes = np.array([469762049, 167772161], dtype=np.uint64)
    got = nc.rns_split(a, primes)
    for i, p in enumerate(primes):
        np.testing.assert_array_equal(got[i], (a % p).astype(np.int32))
