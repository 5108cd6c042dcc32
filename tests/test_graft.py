"""Driver entry-point regression tests (__graft_entry__)."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape == (1024, 256)
    from tpu_ntt import ref
    want = ref.schoolbook_negacyclic(args[0][0], args[1][0], 12289)
    np.testing.assert_array_equal(out[0], want)


@pytest.mark.parametrize("d", [1, 2, 3, 8])
def test_dryrun_multichip(d):
    if d > len(jax.devices()):
        pytest.skip("not enough devices")
    graft.dryrun_multichip(d)


def test_ring_api(rng):
    from tpu_ntt.ring import Ring
    R = Ring(256, 12289)
    a = R.random(256, rng)
    b = R.random(256, rng)
    c = R.mul(a, b)
    from tpu_ntt import ref
    np.testing.assert_array_equal(c, ref.schoolbook_negacyclic(a, b, 12289))
    # transform-domain pointwise equals mul
    fa, fb = R.ntt(a[None]), R.ntt(b[None])
    c2 = R.intt(R.pointwise(fa, fb))[0]
    np.testing.assert_array_equal(c2, c)
    # cyclic ring
    Rc = Ring(256, 3329, negacyclic=False)
    cc = Rc.mul(a % 3329, b % 3329)
    np.testing.assert_array_equal(
        cc, ref.schoolbook_cyclic(a % 3329, b % 3329, 3329))
    # kyber ring auto-dispatch
    Rk = Ring(256, 3329)
    ck = Rk.mul(a % 3329, b % 3329)
    np.testing.assert_array_equal(
        ck, ref.schoolbook_negacyclic(a % 3329, b % 3329, 3329))
    assert "incomplete" in repr(Rk)


def test_ring_api_montgomery_point(rng):
    """Transform-domain identities hold for fix != 1 arithmetic too
    (Dilithium q needs MontArith: pointwise corrects the stray R^-1)."""
    from tpu_ntt.ring import Ring
    from tpu_ntt import ref
    q = 8380417
    R = Ring(256, q)
    a = R.random(256, rng) % q
    b = R.random(256, rng) % q
    c = R.mul(a, b)
    np.testing.assert_array_equal(c, ref.schoolbook_negacyclic(a, b, q))
    fa, fb = R.ntt(a[None]), R.ntt(b[None])
    np.testing.assert_array_equal(R.intt(R.pointwise(fa, fb))[0], c)
    np.testing.assert_array_equal(R.intt(R.ntt(a[None]))[0], a)


def test_ring_api_incomplete_transform_domain(rng):
    """Kyber ring transform-domain path: ntt -> pointwise (base-case
    products) -> intt equals mul."""
    from tpu_ntt.ring import Ring
    from tpu_ntt import ref
    R = Ring(256, 3329)
    assert "incomplete" in repr(R)
    a = R.random(256, rng) % 3329
    b = R.random(256, rng) % 3329
    c = R.mul(a, b)
    np.testing.assert_array_equal(c, ref.schoolbook_negacyclic(a, b, 3329))
    fa, fb = R.ntt(a[None]), R.ntt(b[None])
    np.testing.assert_array_equal(R.intt(R.pointwise(fa, fb))[0], c)
