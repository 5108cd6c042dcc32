"""Big-modulus (RNS/CRT) polynomial product tests — BASELINE config 4."""

import numpy as np
import pytest

from tpu_ntt import ref
from tpu_ntt.bigq import BigQPlan, select_rns_primes
from tpu_ntt.params import find_params, is_prime


def test_select_rns_primes():
    primes = select_rns_primes(1024, 130)
    assert all(is_prime(p) and p % 2048 == 1 and p < (1 << 29)
               for p in primes)
    assert len(set(primes)) == len(primes)
    prod_bits = sum(int(p).bit_length() for p in primes)
    assert prod_bits >= 130


def test_bigq_polymul_vs_schoolbook(rng):
    p = find_params(256, 62)
    plan = BigQPlan(p)
    a = rng.integers(0, p.q, (2, 256)).astype(np.uint64)
    b = rng.integers(0, p.q, (2, 256)).astype(np.uint64)
    c = plan.polymul(a, b)
    for i in range(2):
        want = ref.schoolbook_negacyclic(a[i].astype(object),
                                         b[i].astype(object), p.q)
        np.testing.assert_array_equal(c[i].astype(object),
                                      want.astype(object))


def test_bigq_41bit(rng):
    """Non-62-bit big q also works (fewer channels selected)."""
    p = find_params(512, 41)
    plan = BigQPlan(p)
    a = rng.integers(0, p.q, (1, 512)).astype(np.uint64)
    b = rng.integers(0, p.q, (1, 512)).astype(np.uint64)
    c = plan.polymul(a, b)
    want = ref.schoolbook_negacyclic(a[0].astype(object),
                                     b[0].astype(object), p.q)
    np.testing.assert_array_equal(c[0].astype(object), want.astype(object))


def test_bigq_sharded_channels(rng):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from tpu_ntt.parallel.sharded import make_mesh
    p = find_params(4096, 62)
    plan = BigQPlan(p, mesh=make_mesh(8))
    a = rng.integers(0, p.q, (1, 4096)).astype(np.uint64)
    b = rng.integers(0, p.q, (1, 4096)).astype(np.uint64)
    c = plan.polymul(a, b)
    # independent oracle: the native uint64 NTT (or single-chip BigQPlan)
    from tpu_ntt.runtime.native import load
    nc = load()
    if nc is not None:
        want = nc.polymul64(a[0], b[0], p.q, p.psi)
        np.testing.assert_array_equal(c[0], want)
    else:
        want = BigQPlan(p).polymul(a, b)
        np.testing.assert_array_equal(c, want)


def test_bigq_rejects_oversize_q():
    p = find_params(256, 62)
    object.__setattr__(p, "q", 1 << 65)  # forged — constructor must reject
    with pytest.raises(ValueError):
        BigQPlan(p)


def test_python_crt_fallback_matches_native(rng):
    p = find_params(256, 50)
    plan = BigQPlan(p)
    a = rng.integers(0, p.q, (1, 256)).astype(np.uint64)
    b = rng.integers(0, p.q, (1, 256)).astype(np.uint64)
    ra, rb = plan._split(a), plan._split(b)
    prods = np.asarray(plan.stacked.polymul_jit(ra, rb)).astype(np.int32)
    via_python = plan._crt_python(prods.reshape(len(plan.primes), -1))
    if plan._native is not None:
        via_native = plan._native.crt_garner(
            prods.reshape(len(plan.primes), -1), plan.primes, p.q)
        np.testing.assert_array_equal(via_python, via_native)


def test_pallas_channel_plan_matches_stacked(rng):
    """The fused-Pallas channel backend is bit-identical to the jnp
    stacked backend (per-channel products, pre-CRT)."""
    from tpu_ntt.bigq import PallasChannelPlan, StackedChannelPlan
    n = 256
    primes = select_rns_primes(n, 60)[:2]
    pk = PallasChannelPlan(n, primes, interpret=True)
    st = StackedChannelPlan(n, primes)
    ra = np.stack([rng.integers(0, p, (4, n)).astype(np.int32)
                   for p in primes])
    rb = np.stack([rng.integers(0, p, (4, n)).astype(np.int32)
                   for p in primes])
    np.testing.assert_array_equal(np.asarray(pk.polymul_jit(ra, rb)),
                                  np.asarray(st.polymul_jit(ra, rb)))


def test_bigq_pallas_backend_end_to_end(rng):
    """BigQPlan with the Pallas channel backend (interpret on CPU) is
    exact vs schoolbook."""
    from tpu_ntt.bigq import PallasChannelPlan
    p = find_params(256, 45)
    plan = BigQPlan(p, backend="xla")
    plan.stacked = PallasChannelPlan(256, plan.primes, interpret=True)
    a = rng.integers(0, p.q, (1, 256)).astype(np.uint64)
    b = rng.integers(0, p.q, (1, 256)).astype(np.uint64)
    c = plan.polymul(a, b)
    want = ref.schoolbook_negacyclic(a[0].astype(object),
                                     b[0].astype(object), p.q)
    np.testing.assert_array_equal(c[0].astype(object), want.astype(object))


def test_bigq_large_n_four_step_channels(rng):
    """n > 8192 routes channels through four-step plans (single-device
    mesh).  Sparse operands give an exact hand-computable oracle without
    an O(n^2) schoolbook."""
    from tpu_ntt.params import find_params
    n = 16384
    p = find_params(n, 45)
    plan = BigQPlan(p)
    assert plan.stacked is None and len(plan.channel_plans) >= 1
    a = np.zeros((1, n), dtype=np.uint64)
    b = np.zeros((1, n), dtype=np.uint64)
    ia, ib = [3, n - 2], [7, n - 1]
    va = [int(rng.integers(1, p.q)) for _ in ia]
    vb = [int(rng.integers(1, p.q)) for _ in ib]
    for i, v in zip(ia, va):
        a[0, i] = v
    for i, v in zip(ib, vb):
        b[0, i] = v
    c = plan.polymul(a, b)
    want = {}
    for i, v in zip(ia, va):
        for j, w in zip(ib, vb):
            k, s = i + j, 1
            if k >= n:
                k, s = k - n, -1
            want[k] = (want.get(k, 0) + s * v * w) % p.q
    got = {k: int(c[0, k]) for k in range(n) if c[0, k]}
    assert got == {k: v for k, v in want.items() if v}


def test_bigq_fused_sharded_on_mesh(rng):
    """Explicit multi-device mesh: the whole big-q product (split +
    four-step channels + Garner) runs in one shard_map graph."""
    from tpu_ntt.params import find_params
    from tpu_ntt.parallel.sharded import make_mesh
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    p = find_params(4096, 45)
    plan = BigQPlan(p, mesh=make_mesh(8))
    assert plan.dcrt is not None and plan.stacked is None
    n = p.n
    a = np.zeros((2, n), dtype=np.uint64)
    b = np.zeros((2, n), dtype=np.uint64)
    a[:, 1] = 7
    a[1, n - 1] = int(rng.integers(1, p.q))
    b[:, 2] = int(rng.integers(1, p.q))
    c = plan.polymul(a, b)
    for r in range(2):
        want = {}
        for i in np.nonzero(a[r])[0]:
            for j in np.nonzero(b[r])[0]:
                k, s = int(i + j), 1
                if k >= n:
                    k, s = k - n, -1
                want[k] = (want.get(k, 0)
                           + s * int(a[r, i]) * int(b[r, j])) % p.q
        got = {int(k): int(c[r, k]) for k in np.nonzero(c[r])[0]}
        assert got == {k: v for k, v in want.items() if v}, r


def test_fourstep_channel_plan_matches_stacked(rng):
    """FourStepChannelPlan (interpret) == StackedChannelPlan on the same
    residues — the large-n fused channel backend's exactness anchor."""
    from tpu_ntt.bigq import FourStepChannelPlan, StackedChannelPlan
    n = 16384
    p = find_params(n, 45)
    plan = BigQPlan(p)                    # CPU default: sharded channels
    primes = plan.primes[:2]              # 2 channels keep interpret fast
    assert FourStepChannelPlan.supported(n, primes)
    fs = FourStepChannelPlan(n, primes, interpret=True)
    st = StackedChannelPlan(n, primes)
    ra = np.stack([rng.integers(0, pi, (1, n)).astype(np.int32)
                   for pi in primes])
    rb = np.stack([rng.integers(0, pi, (1, n)).astype(np.int32)
                   for pi in primes])
    np.testing.assert_array_equal(np.asarray(fs.polymul_jit(ra, rb)),
                                  np.asarray(st.polymul_jit(ra, rb)))


def test_bigq_pallas_backend_routes_large_n_to_fourstep():
    """backend='pallas' at n>8192 picks the fused four-step channel plan
    (construction-level routing check; kernels not executed on CPU)."""
    from tpu_ntt.bigq import FourStepChannelPlan
    p = find_params(16384, 45)
    plan = BigQPlan(p, backend="pallas")
    assert isinstance(plan.stacked, FourStepChannelPlan)
    assert plan.dcrt is not None and plan.channel_plans == []


def test_fused_bigq_kernel_bit_exact(rng):
    """The fully-fused PallasBigQ kernel (split + channels + Garner CRT in
    one kernel) is bit-exact vs the schoolbook oracle, including padding
    (batch not a multiple of the tile)."""
    from tpu_ntt.ops.bigq_kernel import PallasBigQ, supported

    p = find_params(256, 40)
    primes = select_rns_primes(256, 1 + p.log2n + 2 * 40 + 1)
    assert supported(256, primes, p.q)
    kb = PallasBigQ(256, primes, p.q, tile=8, interpret=True)
    a = rng.integers(0, p.q, (3, 256)).astype(np.uint64)
    b = rng.integers(0, p.q, (3, 256)).astype(np.uint64)
    c = kb.polymul(a, b)
    for i in range(3):
        want = ref.schoolbook_negacyclic(a[i].astype(object),
                                         b[i].astype(object), p.q)
        np.testing.assert_array_equal(c[i].astype(object),
                                      want.astype(object))


def test_fused_bigq_kernel_62bit_matches_plan(rng):
    """Full 62-bit modulus class through the fused kernel matches the
    (independently tested) unfused BigQPlan pipeline."""
    from tpu_ntt.ops.bigq_kernel import PallasBigQ, supported

    p = find_params(512, 62)
    plan = BigQPlan(p, backend="xla")        # oracle pipeline
    assert supported(512, plan.primes, p.q)
    kb = PallasBigQ(512, plan.primes, p.q, tile=8, interpret=True)
    a = rng.integers(0, p.q, (2, 512)).astype(np.uint64)
    b = rng.integers(0, p.q, (2, 512)).astype(np.uint64)
    np.testing.assert_array_equal(kb.polymul(a, b), plan.polymul(a, b))


def test_fused_bigq_kernel_adversarial_extremes():
    """Coefficients at the domain extremes (0 and q-1 everywhere) stress
    the Garner sign compare and the shift-subtract ladder."""
    from tpu_ntt.ops.bigq_kernel import PallasBigQ

    p = find_params(256, 61)
    primes = select_rns_primes(256, 1 + p.log2n + 2 * 61 + 1)
    kb = PallasBigQ(256, primes, p.q, tile=8, interpret=True)
    a = np.full((1, 256), p.q - 1, dtype=np.uint64)
    b = np.full((1, 256), p.q - 1, dtype=np.uint64)
    c = kb.polymul(a, b)
    want = ref.schoolbook_negacyclic(a[0].astype(object),
                                     b[0].astype(object), p.q)
    np.testing.assert_array_equal(c[0].astype(object), want.astype(object))
    z = np.zeros((1, 256), dtype=np.uint64)
    np.testing.assert_array_equal(kb.polymul(a, z), z)


def test_fused_bigq_fourstep_kernel_bit_exact(rng):
    """The four-step fused big-q kernel (split + four-step channel NTTs +
    Garner CRT in one kernel) is bit-exact vs the schoolbook oracle,
    including padding (batch not a multiple of the tile)."""
    from tpu_ntt.ops import bigq_fourstep

    n = 2048
    p = find_params(n, 40)
    primes = select_rns_primes(n, 1 + p.log2n + 2 * 40 + 1)
    assert bigq_fourstep.supported(n, primes, p.q)
    kb = bigq_fourstep.PallasBigQFourStep(n, primes, p.q, tile=2,
                                          interpret=True)
    a = rng.integers(0, p.q, (3, n)).astype(np.uint64)
    b = rng.integers(0, p.q, (3, n)).astype(np.uint64)
    c = kb.polymul(a, b)
    for i in range(3):
        want = ref.schoolbook_negacyclic(a[i].astype(object),
                                         b[i].astype(object), p.q)
        np.testing.assert_array_equal(c[i].astype(object),
                                      want.astype(object))


def test_fused_bigq_fourstep_62bit_extremes(rng):
    """62-bit modulus class + domain-extreme coefficients through the
    four-step fused kernel (stresses Garner sign compare / ladder)."""
    from tpu_ntt.ops import bigq_fourstep

    n = 2048
    p = find_params(n, 62)
    primes = select_rns_primes(n, 1 + p.log2n + 2 * 62 + 1)
    kb = bigq_fourstep.PallasBigQFourStep(n, primes, p.q, tile=1,
                                          interpret=True)
    a = np.full((1, n), p.q - 1, dtype=np.uint64)
    b = np.full((1, n), p.q - 1, dtype=np.uint64)
    c = kb.polymul(a, b)
    want = ref.schoolbook_negacyclic(a[0].astype(object),
                                     b[0].astype(object), p.q)
    np.testing.assert_array_equal(c[0].astype(object), want.astype(object))


def test_pallas_split_garner_kernels_match_devicecrt(rng):
    """The standalone split/Garner Pallas kernels are bit-exact twins of
    DeviceCRT (the XLA composition they replace on TPU)."""
    from tpu_ntt.bigq import DeviceCRT
    from tpu_ntt.ops.bigq_kernel import PallasGarner, PallasRNSSplit
    from tpu_ntt.ops.limb import pack_u64_planes, unpack_u64_planes

    n = 4096
    p = find_params(n, 50)
    primes = select_rns_primes(n, 1 + p.log2n + 2 * 50 + 1)
    dcrt = DeviceCRT(primes, p.q)
    vals = rng.integers(0, p.q, (1, n)).astype(np.uint64)
    lo, hi = (np.asarray(t) for t in pack_u64_planes(vals))

    sp = PallasRNSSplit(primes, interpret=True)
    res = np.asarray(sp.split_planes(lo, hi))
    np.testing.assert_array_equal(res, np.asarray(dcrt.split(lo, hi)))

    g = PallasGarner(primes, p.q, interpret=True)
    glo, ghi = g.garner_planes(res)
    wlo, whi = dcrt.reconstruct(res)
    np.testing.assert_array_equal(np.asarray(glo), np.asarray(wlo))
    np.testing.assert_array_equal(np.asarray(ghi), np.asarray(whi))
    # and the round trip recovers the values (all residues agree -> the
    # CRT value is the original, already < q)
    back = unpack_u64_planes(np.asarray(glo), np.asarray(ghi))
    np.testing.assert_array_equal(back, vals)


def test_pallas_bigq_blocked_end_to_end(rng):
    """PallasBigQBlocked (split kernel -> blocked four-step channels ->
    Garner kernel, one jit) vs the schoolbook oracle at n = 2^17."""
    from tpu_ntt.bigq import PallasBigQBlocked

    n = 1 << 17
    p = find_params(n, 40)
    primes = select_rns_primes(n, 1 + p.log2n + 2 * 40 + 1)
    assert PallasBigQBlocked.supported(n, primes, p.q)
    kb = PallasBigQBlocked(n, primes, p.q, interpret=True)
    a = np.zeros((1, n), dtype=np.uint64)
    b = np.zeros((1, n), dtype=np.uint64)
    nz = rng.integers(0, n, 40)
    a[0, nz] = rng.integers(0, p.q, 40).astype(np.uint64)
    nzb = rng.integers(0, n, 40)
    b[0, nzb] = rng.integers(0, p.q, 40).astype(np.uint64)
    c = kb.polymul(a, b)
    # sparse oracle: exact negacyclic product of the nonzero terms
    want = np.zeros(n, dtype=object)
    for i in np.unique(nz):
        for j in np.unique(nzb):
            t = int(a[0, i]) * int(b[0, j])
            if i + j < n:
                want[i + j] = (want[i + j] + t) % p.q
            else:
                want[i + j - n] = (want[i + j - n] - t) % p.q
    np.testing.assert_array_equal(c[0].astype(object), want)


def test_bigq_plan_prefers_fused_kernel_when_supported(monkeypatch):
    """backend='pallas' wires the right fused kernel per ring size:
    ONE-kernel PallasBigQ below 4096, the composed all-Pallas blocked
    pipeline from 4096 up (incl. past the one-block VMEM envelope)."""
    from tpu_ntt.bigq import PallasBigQBlocked
    from tpu_ntt.ops.bigq_kernel import PallasBigQ
    p = find_params(256, 45)
    plan = BigQPlan(p, backend="pallas")
    assert isinstance(plan.fused_kernel, PallasBigQ)
    p2 = find_params(1 << 14, 45)
    plan2 = BigQPlan(p2, backend="pallas")
    assert isinstance(plan2.fused_kernel, PallasBigQBlocked)


# ---------------------------------------------------------------------------
# 64-bit q (the full K<=64 claim of defines.v:42) — VERDICT r4 missing #1
# ---------------------------------------------------------------------------

GOLDILOCKS = 0xFFFFFFFF00000001          # 2^64 - 2^32 + 1, q-1 = 2^32·(2^32-1)


def test_bigq_64bit_goldilocks_vs_schoolbook(rng):
    """Full 64-bit NTT prime through BigQPlan: wide (true 32-bit halves)
    plane packing, one more RNS channel from the re-derived signed-Garner
    headroom, bit-exact vs the schoolbook at the extreme corners."""
    from tpu_ntt.params import make_params
    q = GOLDILOCKS
    assert q.bit_length() == 64
    p = make_params(256, q)
    plan = BigQPlan(p, backend="xla")
    assert plan.wide and plan.dcrt is not None and plan.dcrt.limb.wide
    a = rng.integers(0, q, (2, 256), dtype=np.uint64)
    b = rng.integers(0, q, (2, 256), dtype=np.uint64)
    a[0, 0] = q - 1
    b[0, 0] = q - 1                       # worst-case signed magnitude
    c = plan.polymul(a, b)
    for i in range(2):
        want = ref.schoolbook_negacyclic(a[i].astype(object),
                                         b[i].astype(object), q)
        np.testing.assert_array_equal(c[i].astype(object),
                                      want.astype(object))


def test_bigq_64bit_native_oracle_agrees(rng):
    """The csrc u64 NTT oracle (__int128 arithmetic, wrap-aware
    butterflies) and the native Garner CRT agree with the device pipeline
    at a 64-bit q — three independent implementations, one answer."""
    from tpu_ntt.params import make_params
    from tpu_ntt.runtime.native import load
    nat = load()
    if nat is None:
        pytest.skip("native core not built")
    q = GOLDILOCKS
    p = make_params(256, q)
    plan = BigQPlan(p, backend="xla")
    a = rng.integers(0, q, (1, 256), dtype=np.uint64)
    b = rng.integers(0, q, (1, 256), dtype=np.uint64)
    a[0, 0] = q - 1
    want = plan.polymul(a, b)
    got = nat.polymul64(a[0], b[0], q, p.psi)
    np.testing.assert_array_equal(got, np.asarray(want[0]))
    # host-CRT path (native __int128 Garner, the u64-overflow-safe
    # signed centering)
    ra, rb = plan._split(a), plan._split(b)
    prods = np.asarray(plan.stacked.polymul_jit(ra, rb))
    np.testing.assert_array_equal(plan._reconstruct(prods), want)


def test_fused_bigq_kernel_64bit_matches_plan(rng):
    """The ONE-kernel PallasBigQ at a 64-bit q (wide chunk weights
    2^16/2^32/2^48, wide Garner output packing) matches the XLA
    pipeline."""
    from tpu_ntt.ops.bigq_kernel import PallasBigQ, supported
    q = GOLDILOCKS
    from tpu_ntt.params import make_params
    p = make_params(256, q)
    plan = BigQPlan(p, backend="xla")
    assert supported(256, plan.primes, q)
    kb = PallasBigQ(256, plan.primes, q, tile=8, interpret=True)
    assert kb.wide
    a = rng.integers(0, q, (2, 256), dtype=np.uint64)
    b = rng.integers(0, q, (2, 256), dtype=np.uint64)
    a[0, 0] = q - 1
    b[0, 0] = q - 1
    np.testing.assert_array_equal(kb.polymul(a, b), plan.polymul(a, b))


def test_pallas_split_garner_kernels_wide(rng):
    """The standalone split/Garner kernels in wide mode are bit-exact
    twins of the wide DeviceCRT (the blocked large-n 64-bit path)."""
    from tpu_ntt.bigq import DeviceCRT, select_rns_primes
    from tpu_ntt.ops.bigq_kernel import PallasGarner, PallasRNSSplit
    from tpu_ntt.ops.limb import pack_u64_planes, unpack_u64_planes
    q = GOLDILOCKS
    n = 4096
    primes = select_rns_primes(n, 1 + 12 + 2 * 64 + 1)
    dcrt = DeviceCRT(primes, q)
    assert dcrt.limb.wide
    vals = rng.integers(0, q, (1, n), dtype=np.uint64)
    vals[0, 0] = q - 1
    lo, hi = (np.asarray(t) for t in pack_u64_planes(vals, wide=True))
    sp = PallasRNSSplit(primes, interpret=True, wide=True)
    res = np.asarray(sp.split_planes(lo, hi))
    np.testing.assert_array_equal(res, np.asarray(dcrt.split(lo, hi)))
    g = PallasGarner(primes, q, interpret=True)
    glo, ghi = g.garner_planes(res)
    wlo, whi = dcrt.reconstruct(res)
    np.testing.assert_array_equal(np.asarray(glo), np.asarray(wlo))
    np.testing.assert_array_equal(np.asarray(ghi), np.asarray(whi))
    back = unpack_u64_planes(np.asarray(glo), np.asarray(ghi), wide=True)
    np.testing.assert_array_equal(back, vals)



def test_bigq_on_hierarchical_mesh(rng):
    """Big-q channels run on a hierarchical (sp1, sp2) mesh — the fused
    sharded pipeline composes with the per-axis exchange."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from tpu_ntt.parallel.sharded import make_mesh_hier
    p = find_params(1 << 12, 40)
    plan = BigQPlan(p, mesh=make_mesh_hier(2, 4))
    assert plan.channel_plans[0].axes == ("sp1", "sp2")
    a = rng.integers(0, p.q, (1, p.n)).astype(np.uint64)
    b = rng.integers(0, p.q, (1, p.n)).astype(np.uint64)
    c = plan.polymul(a, b)
    want = BigQPlan(p, backend="xla").polymul(a, b)
    np.testing.assert_array_equal(c, want)
