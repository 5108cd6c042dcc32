"""Transform/Plan tests: the XLA path is bit-exact against the NumPy oracle
(and hence against the reference C multipliers and golden vectors) — test
pyramid layer (d) of SURVEY.md §4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ntt import ref
from tpu_ntt.params import make_params, preset
from tpu_ntt.transform import Plan, intt, ntt, polymul

PRESET_NAMES = ["sw256", "hw256", "kyber128", "dilithium256"]


@pytest.fixture(scope="module", params=PRESET_NAMES)
def plan(request):
    return Plan(preset(request.param))


def _rand(rng, p, batch=4):
    return rng.integers(0, p.q, (batch, p.n)).astype(np.int32)


# ---------------------------------------------------------------------------
# all eight variants match the oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["ct", "gs"])
@pytest.mark.parametrize("order", ["std2rev", "rev2std"])
@pytest.mark.parametrize("inverse", [False, True])
def test_variant_vs_oracle(plan, rng, kind, order, inverse):
    p = plan.params
    x = _rand(rng, p, 2)
    got = np.asarray(plan.ntt(x, kind, order, inverse=inverse))
    for i in range(2):
        want = ref.ntt(x[i], p, kind, order, inverse=inverse)
        np.testing.assert_array_equal(got[i], want)


def test_mixed_variants_vs_oracle(plan, rng):
    p = plan.params
    if not p.negacyclic:
        pytest.skip("cyclic params")
    x = _rand(rng, p, 2)
    got_f = np.asarray(plan.ntt(x, "ct", "std2rev", mixed=True))
    got_i = np.asarray(plan.ntt(x, "gs", "rev2std", inverse=True, mixed=True))
    for i in range(2):
        np.testing.assert_array_equal(
            got_f[i], ref.ntt(x[i], p, "ct", "std2rev", mixed=True))
        np.testing.assert_array_equal(
            got_i[i], ref.ntt(x[i], p, "gs", "rev2std", inverse=True,
                              mixed=True))


# ---------------------------------------------------------------------------
# flagship pipeline
# ---------------------------------------------------------------------------

def test_forward_inverse_roundtrip(plan, rng):
    x = _rand(rng, plan.params)
    f = plan.forward_jit(x)
    g = np.asarray(plan.inverse_jit(f))
    # inverse() folds pointwise_fix; for the roundtrip (no pointwise), that
    # scale must be cancelled manually when arith has one
    fix = plan.arith.pointwise_fix
    if fix != 1:
        g = g.astype(np.int64) * pow(fix, -1, plan.params.q) % plan.params.q
    np.testing.assert_array_equal(g, x)


def test_polymul_vs_schoolbook(plan, rng):
    p = plan.params
    a, b = _rand(rng, p), _rand(rng, p)
    got = np.asarray(plan.polymul_jit(a, b))
    oracle = (ref.schoolbook_negacyclic if p.negacyclic
              else ref.schoolbook_cyclic)
    for i in range(a.shape[0]):
        np.testing.assert_array_equal(got[i], oracle(a[i], b[i], p.q))


def test_polymul_matches_c_product_pipeline(rng):
    """Bit-exact parity with ntt_red256_product1/4 outputs (which equal the
    schoolbook negacyclic product in canonical form)."""
    p = preset("sw256")
    plan = Plan(p)
    a, b = _rand(rng, p, 2), _rand(rng, p, 2)
    got = np.asarray(plan.polymul_jit(a, b))
    for i in range(2):
        np.testing.assert_array_equal(
            got[i], ref.product_red(a[i].copy(), b[i].copy(), p, "ct"))
        np.testing.assert_array_equal(
            got[i], ref.product_red(a[i].copy(), b[i].copy(), p, "gs"))


def test_batched_shapes(plan, rng):
    p = plan.params
    for shape in [(p.n,), (3, p.n), (2, 5, p.n)]:
        x = rng.integers(0, p.q, shape).astype(np.int32)
        f = np.asarray(plan.forward(x))
        assert f.shape == shape


def test_hw_polymul_bit_exact(rng):
    """GO-pipeline twin matches the RTL-flow oracle on the q=7681 point."""
    p = preset("hw256")
    plan = Plan(p)
    a, b = _rand(rng, p, 3), _rand(rng, p, 3)
    got = np.asarray(jax.jit(plan.hw_polymul)(a, b))
    for i in range(3):
        np.testing.assert_array_equal(got[i], ref.hw_polymul(a[i], b[i], p))


def test_hw_polymul_testbench_vector():
    p = preset("hw256")
    plan = Plan(p)
    a = np.zeros((1, 256), dtype=np.int32)
    b = np.zeros((1, 256), dtype=np.int32)
    a[0, :3] = [1, 2, 3]
    b[0, :2] = [2, 2]
    c = np.asarray(plan.hw_polymul(a, b))[0]
    np.testing.assert_array_equal(c[:4], [2, 6, 10, 6])   # NTT_PolyMul_test.v
    assert not c[4:].any()


def test_module_level_api(rng):
    p = preset("sw256")
    a, b = _rand(rng, p, 2), _rand(rng, p, 2)
    c = np.asarray(polymul(a, b, p))
    np.testing.assert_array_equal(
        c[0], ref.schoolbook_negacyclic(a[0], b[0], p.q))
    f = ntt(a, p)
    g = np.asarray(intt(f, p))
    fix = pow(Plan(p).arith.pointwise_fix, -1, p.q)
    np.testing.assert_array_equal(g * fix % p.q, a)


def test_other_sizes(rng):
    """n=512/1024 at a 14-bit and a 23-bit prime exercise non-256 geometry."""
    for n, q in [(512, 12289), (1024, 12289), (512, 8380417)]:
        p = make_params(n, q)
        plan = Plan(p)
        a = rng.integers(0, q, (2, n)).astype(np.int32)
        b = rng.integers(0, q, (2, n)).astype(np.int32)
        got = np.asarray(plan.polymul_jit(a, b))
        np.testing.assert_array_equal(
            got[0], ref.schoolbook_negacyclic(a[0], b[0], q),
            err_msg=f"n={n} q={q}")


def test_values_stay_canonical(plan, rng):
    p = plan.params
    x = _rand(rng, p)
    f = np.asarray(plan.forward_jit(x))
    assert f.min() >= 0 and f.max() < p.q
    c = np.asarray(plan.polymul_jit(x, x))
    assert c.min() >= 0 and c.max() < p.q


def test_cyclic_ring_polymul(rng):
    """A cyclic-only parameter point (psi=0): Plan computes the product in
    Z_q[x]/(x^n - 1)."""
    from tpu_ntt.params import make_params
    p = make_params(256, 3329, negacyclic=False)   # 2-power part of q-1 is 256
    assert not p.negacyclic
    plan = Plan(p)
    a = rng.integers(0, p.q, (2, 256)).astype(np.int32)
    b = rng.integers(0, p.q, (2, 256)).astype(np.int32)
    c = np.asarray(plan.polymul_jit(a, b))
    for i in range(2):
        np.testing.assert_array_equal(
            c[i], ref.schoolbook_cyclic(a[i], b[i], p.q))
