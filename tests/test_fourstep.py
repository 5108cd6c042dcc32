"""Fused four-step Pallas kernel tests (interpret mode on CPU; real-TPU
execution is covered by bench.py's large config)."""

import numpy as np
import pytest

from tpu_ntt.ops.fourstep import PallasFourStep, supported
from tpu_ntt.params import find_params, make_params
from tpu_ntt.transform import Plan


def test_fourstep_mont_bit_exact(rng):
    """28-bit prime (large-config class): fused kernel == flat XLA Plan,
    including all-(q-1) lazy-bound rows."""
    p = find_params(4096, 28)
    fs = PallasFourStep(p, tile=1, interpret=True)
    assert fs.mont and fs.n1 * fs.n2 == 4096
    a = rng.integers(0, p.q, (3, 4096)).astype(np.int32)
    b = rng.integers(0, p.q, (3, 4096)).astype(np.int32)
    a[1] = p.q - 1
    b[1] = p.q - 1
    np.testing.assert_array_equal(np.asarray(fs.polymul(a, b)),
                                  np.asarray(Plan(p).polymul_jit(a, b)))


def test_fourstep_shoup_bit_exact(rng):
    """Reference SW modulus q=12289 at n=4096 through the lazy flavor."""
    p = make_params(4096, 12289)
    fs = PallasFourStep(p, tile=2, interpret=True)
    assert not fs.mont
    a = rng.integers(0, p.q, (3, 4096)).astype(np.int32)
    b = rng.integers(0, p.q, (3, 4096)).astype(np.int32)
    a[0] = p.q - 1
    b[0] = p.q - 1
    np.testing.assert_array_equal(np.asarray(fs.polymul(a, b)),
                                  np.asarray(Plan(p).polymul_jit(a, b)))


def test_fourstep_cyclic(rng):
    """x^n - 1 ring (psi=0) — the FPGA hardware-flow semantics."""
    p = make_params(4096, 12289, negacyclic=False)
    fs = PallasFourStep(p, tile=1, interpret=True)
    a = rng.integers(0, p.q, (2, 4096)).astype(np.int32)
    b = rng.integers(0, p.q, (2, 4096)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(fs.polymul(a, b)),
                                  np.asarray(Plan(p).polymul_jit(a, b)))


def test_fourstep_batch_padding(rng):
    p = make_params(4096, 12289)
    fs = PallasFourStep(p, tile=2, interpret=True)
    a = rng.integers(0, p.q, (3, 4096)).astype(np.int32)   # 3 % 2 != 0
    b = rng.integers(0, p.q, (3, 4096)).astype(np.int32)
    c = np.asarray(fs.polymul(a, b))
    assert c.shape == (3, 4096)
    np.testing.assert_array_equal(
        c[2], np.asarray(Plan(p).polymul_jit(a[2:], b[2:]))[0])


def test_fourstep_explicit_split(rng):
    p = make_params(4096, 12289)
    fs = PallasFourStep(p, n1=16, tile=1, interpret=True)
    assert (fs.n1, fs.n2) == (16, 256)
    a = rng.integers(0, p.q, (2, 4096)).astype(np.int32)
    b = rng.integers(0, p.q, (2, 4096)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(fs.polymul(a, b)),
                                  np.asarray(Plan(p).polymul_jit(a, b)))


def test_fourstep_supported_gate():
    assert not supported(make_params(256, 12289))       # too small
    assert supported(find_params(1 << 16, 28))
    big = find_params(4096, 30)
    assert not supported(big)                            # q >= 2^29
    with pytest.raises(ValueError):
        PallasFourStep(make_params(256, 12289))


def test_fourstep_f32_bit_exact(rng):
    """Float-assisted-Barrett flavor (2^14 <= q < 2^23) at n=4096,
    including all-(q-1) rows at the lazy bound."""
    from tpu_ntt.params import find_ntt_prime
    q = find_ntt_prime(22, 4096)
    p = make_params(4096, q)
    fs = PallasFourStep(p, tile=1, interpret=True)
    assert fs.flavor == "f32" and not fs.mont
    a = rng.integers(0, q, (2, 4096)).astype(np.int32)
    b = rng.integers(0, q, (2, 4096)).astype(np.int32)
    a[1] = q - 1
    b[1] = q - 1
    np.testing.assert_array_equal(np.asarray(fs.polymul(a, b)),
                                  np.asarray(Plan(p).polymul_jit(a, b)))


def test_blocked_fourstep_sparse_exact(rng):
    """PallasFourStepBlocked (n=2^17, interpret): sparse operands give an
    exact hand-computable negacyclic oracle; also cross-check a dense
    random row against the independently-tested XLA ShardedPlan."""
    from tpu_ntt.ops.fourstep import PallasFourStepBlocked, blocked_supported
    from tpu_ntt.params import find_params

    n = 1 << 17
    p = find_params(n, 28)
    assert blocked_supported(p)
    plan = PallasFourStepBlocked(p, interpret=True)

    # sparse: a = 3 + 5·x^(n-1), b = 7 + 2·x^2
    a = np.zeros((1, n), np.int64)
    b = np.zeros((1, n), np.int64)
    a[0, 0], a[0, n - 1] = 3, 5
    b[0, 0], b[0, 2] = 7, 2
    want = np.zeros(n, np.int64)
    want[0] = 3 * 7
    want[2] = 3 * 2
    want[n - 1] = 5 * 7
    want[1] = (-5 * 2) % p.q                 # x^(n+1) wraps to -x^1
    out = np.asarray(plan.polymul(a, b))[0]
    np.testing.assert_array_equal(out, want % p.q)

    # dense cross-check vs the XLA four-step (one row)
    from tpu_ntt.parallel.sharded import ShardedPlan, make_mesh
    sp = ShardedPlan(p, make_mesh(1))
    ad = rng.integers(0, p.q, (1, n))
    bd = rng.integers(0, p.q, (1, n))
    got = np.asarray(plan.polymul(ad, bd))
    ref_out = sp.unshard(sp.polymul_jit(sp.shard_coeffs(ad),
                                        sp.shard_coeffs(bd)))
    np.testing.assert_array_equal(got, np.asarray(ref_out))
