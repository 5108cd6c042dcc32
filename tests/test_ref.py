"""NumPy-oracle tests: golden vectors, schoolbook cross-checks, and the exact
reference C product pipelines (test pyramid layer (b)/(c) of SURVEY.md §4)."""

import numpy as np
import pytest

from tpu_ntt import ref
from tpu_ntt.params import hw_twiddle_stream, make_params, preset
from tpu_ntt.utils.bitrev import (bit_reverse_indices, bit_reverse_int,
                                  bit_reverse_permute)

from conftest import read_hex_vectors


# ---------------------------------------------------------------------------
# bit reversal
# ---------------------------------------------------------------------------

def test_bit_reverse_int():
    assert bit_reverse_int(0b0001, 4) == 0b1000
    assert bit_reverse_int(0b1101, 4) == 0b1011
    assert bit_reverse_int(5, 3) == 5


def test_bit_reverse_involution():
    idx = bit_reverse_indices(256)
    assert np.array_equal(idx[idx], np.arange(256))
    a = np.arange(256)
    assert np.array_equal(bit_reverse_permute(bit_reverse_permute(a)), a)


# ---------------------------------------------------------------------------
# schoolbook golden models
# ---------------------------------------------------------------------------

def test_schoolbook_small():
    # (1+2x+3x^2)(2+2x) = 2+6x+10x^2+6x^3 — NTT_PolyMul_test.v:165-196
    a = np.array([1, 2, 3, 0])
    b = np.array([2, 2, 0, 0])
    np.testing.assert_array_equal(
        ref.schoolbook_cyclic(a, b, 7681), [2, 6, 10, 6])
    np.testing.assert_array_equal(
        ref.schoolbook_negacyclic(a, b, 7681), [2, 6, 10, 6])


def test_schoolbook_wraparound():
    # x^(n-1) * x = x^n -> -1 negacyclic, +1 cyclic
    n, q = 8, 12289
    a = np.zeros(n, dtype=np.int64)
    b = np.zeros(n, dtype=np.int64)
    a[n - 1] = 1
    b[1] = 1
    neg = ref.schoolbook_negacyclic(a, b, q)
    cyc = ref.schoolbook_cyclic(a, b, q)
    assert neg[0] == q - 1 and cyc[0] == 1


# ---------------------------------------------------------------------------
# the eight plain variants: forward/inverse relations
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sw():
    return preset("sw256")


def test_variant_order_relations(sw, rng):
    x = rng.integers(0, sw.q, sw.n)
    f_std2rev_ct = ref.ntt(x, sw, "ct", "std2rev")
    f_std2rev_gs = ref.ntt(x, sw, "gs", "std2rev")
    # both produce the same bit-reversed spectrum
    np.testing.assert_array_equal(f_std2rev_ct, f_std2rev_gs)
    # rev2std variants applied to a bit-reversed input give the standard-order
    # spectrum equal to un-reversing the std2rev output
    xr = bit_reverse_permute(x)
    f_rev2std = ref.ntt(xr, sw, "ct", "rev2std")
    np.testing.assert_array_equal(f_rev2std, bit_reverse_permute(f_std2rev_ct))
    np.testing.assert_array_equal(
        ref.ntt(xr, sw, "gs", "rev2std"), f_rev2std)


def test_ntt_ct_rev2std_v1(sw, rng):
    """The ninth plain variant (ntt.C:168): psi-power table indexing
    p[j*l] computes the same transform as the compact-table version 2,
    forward and inverse."""
    x = rng.integers(0, sw.q, sw.n)
    np.testing.assert_array_equal(
        ref.ntt_ct_rev2std_v1(x, sw),
        ref.ntt(x, sw, "ct", "rev2std"))
    np.testing.assert_array_equal(
        ref.ntt_ct_rev2std_v1(x, sw, inverse=True),
        ref.ntt(x, sw, "ct", "rev2std", inverse=True))
    # direct indexing semantics: stage t reads psi_pow[j * (n//t)]
    from tpu_ntt.params import tables
    psi_pow = tables(sw)["psi_powers"].astype(np.int64)
    t = 4
    l = sw.n // t
    want_tw = psi_pow[(np.arange(t) * l) % sw.n]
    # psi^(l*j) == omega^((n/2t)*j): the v2 compact table entry
    omega_tw = np.array([pow(sw.omega, (sw.n // (2 * t)) * j, sw.q)
                         for j in range(t)])
    np.testing.assert_array_equal(want_tw, omega_tw)


def test_variant_roundtrips(sw, rng):
    x = rng.integers(0, sw.q, sw.n)
    for fwd_kind in ("ct", "gs"):
        for inv_kind in ("ct", "gs"):
            f = ref.ntt(x, sw, fwd_kind, "std2rev")
            g = ref.ntt(f, sw, inv_kind, "rev2std", inverse=True)
            g = g * sw.n_inv % sw.q
            np.testing.assert_array_equal(g, x, err_msg=f"{fwd_kind}->{inv_kind}")


def test_mixed_variant_equals_twist_then_ntt(sw, rng):
    """mulntt_* == psi-twist followed by plain NTT (ntt.h:246-278)."""
    x = rng.integers(0, sw.q, sw.n)
    from tpu_ntt.params import psi_powers
    tw = x * psi_powers(sw) % sw.q
    np.testing.assert_array_equal(
        ref.ntt(x, sw, "ct", "std2rev", mixed=True),
        ref.ntt(tw, sw, "ct", "std2rev"))


def test_ntt_matches_dft_definition(rng):
    """Spectrum[k] = sum a[i] omega^(ik) — definition-level check at n=16."""
    p = make_params(16, 12289)
    a = rng.integers(0, p.q, p.n)
    f = ref.ntt(a, p, "ct", "std2rev")
    f_std = bit_reverse_permute(f)
    for k in range(p.n):
        want = sum(int(a[j]) * pow(p.omega, j * k, p.q)
                   for j in range(p.n)) % p.q
        assert f_std[k] == want


# ---------------------------------------------------------------------------
# Longa–Naehrig arithmetic
# ---------------------------------------------------------------------------

def test_red_bounds_and_congruence(sw, rng):
    x = rng.integers(-(2 ** 31) // 2, 2 ** 31 // 2, 10000)
    r = ref.red(x, sw)
    assert np.all((r.astype(np.int64) - 3 * x) % sw.q == 0)
    # documented range for |x| < 2^30 inputs (ntt_red.h:86-98)
    x2 = rng.integers(-524288, 524288, 10000) * 1024
    r2 = ref.red(x2, sw)
    assert r2.min() >= -524287 - 1 and r2.max() <= 536573 + 1


def test_mul_red_congruence(sw, rng):
    x = rng.integers(-21499, 21500, 10000)
    y = rng.integers(-6144, 6145, 10000)
    r = ref.mul_red(x, y, sw)
    assert np.all((r.astype(np.int64) - 3 * x * y) % sw.q == 0)


def test_correct_range(sw):
    x = np.arange(-sw.q, 2 * sw.q, dtype=np.int32)
    c = ref.correct(x, sw)
    assert c.min() >= 0 and c.max() < sw.q
    assert np.all((c - x) % sw.q == 0)


def test_red_ntt_congruent_to_plain(sw, rng):
    """ntt_red variants equal plain NTT modulo q (the ×k factors cancel
    against the k^-1 baked into the tables)."""
    x = rng.integers(0, sw.q, sw.n)
    xs = ref.shift(x, sw)
    f_red = ref.ntt_red(xs, sw, "ct", "std2rev")
    f_plain = ref.ntt(x, sw, "ct", "std2rev")
    np.testing.assert_array_equal(f_red % sw.q, f_plain)


# ---------------------------------------------------------------------------
# full products vs schoolbook
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["ct", "gs"])
def test_product_red_random(sw, rng, kind):
    a = rng.integers(0, sw.q, sw.n)
    b = rng.integers(0, sw.q, sw.n)
    got = ref.product_red(a, b, sw, kind)
    np.testing.assert_array_equal(got, ref.schoolbook_negacyclic(a, b, sw.q))


@pytest.mark.parametrize("kind", ["ct", "gs"])
def test_product_plain_random(sw, rng, kind):
    a = rng.integers(0, sw.q, sw.n)
    b = rng.integers(0, sw.q, sw.n)
    got = ref.product_plain(a, b, sw, kind)
    np.testing.assert_array_equal(got, ref.schoolbook_negacyclic(a, b, sw.q))


def test_product_smoke_vs_c_main(sw):
    """A=1+2x, B=3 -> C=3+6x — test_prod_nttred256.c:47-61."""
    a = np.zeros(256, dtype=np.int64)
    b = np.zeros(256, dtype=np.int64)
    a[0], a[1], b[0] = 1, 2, 3
    c = ref.product_red(a, b, sw, "ct")
    assert c[0] == 3 and c[1] == 6 and not c[2:].any()


def test_product_other_params(rng):
    """Products generalise beyond q=12289 (Dilithium point, q=2^13*1023+1)."""
    p = preset("dilithium256")
    a = rng.integers(0, p.q, p.n)
    b = rng.integers(0, p.q, p.n)
    got = ref.product_plain(a, b, p, "gs")
    np.testing.assert_array_equal(got, ref.schoolbook_negacyclic(a, b, p.q))


# ---------------------------------------------------------------------------
# hardware flow vs ModelSim golden vectors
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hw():
    return preset("hw256")


def test_hw_ntt_golden(hw, reference_dir):
    base = reference_dir / "Hardware_Multiplier/simulation/modelsim/test"
    din = read_hex_vectors(base / "NTT_DIN.txt")
    dout = read_hex_vectors(base / "NTT_DOUT.txt")
    np.testing.assert_array_equal(ref.hw_ntt(din, hw), dout)


def test_hw_intt_golden(hw, reference_dir):
    base = reference_dir / "Hardware_Multiplier/simulation/modelsim/test"
    idin = read_hex_vectors(base / "INTT_DIN.txt")
    idout = read_hex_vectors(base / "INTT_DOUT.txt")
    np.testing.assert_array_equal(ref.hw_intt(idin, hw), idout)


def test_hw_roundtrip(hw, rng):
    """NTT -> bitrev -> INTT -> bitrev == identity (test_generator.py:157-170)."""
    a = rng.integers(0, hw.q, hw.n)
    f = ref.hw_ntt(a, hw)
    g = ref.hw_intt(bit_reverse_permute(f), hw)
    np.testing.assert_array_equal(bit_reverse_permute(g), a)


def test_hw_polymul_is_cyclic(hw, rng):
    a = rng.integers(0, hw.q, hw.n)
    b = rng.integers(0, hw.q, hw.n)
    np.testing.assert_array_equal(
        ref.hw_polymul(a, b, hw), ref.schoolbook_cyclic(a, b, hw.q))


def test_hw_polymul_testbench_case(hw):
    """(1+2x+3x^2)(2+2x) — the RTL integration testbench product
    (NTT_PolyMul_test.v:165-196)."""
    a = np.zeros(256, dtype=np.int64)
    b = np.zeros(256, dtype=np.int64)
    a[:3] = [1, 2, 3]
    b[:2] = [2, 2]
    c = ref.hw_polymul(a, b, hw)
    np.testing.assert_array_equal(c[:4], [2, 6, 10, 6])
    assert not c[4:].any()
