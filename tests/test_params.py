"""Parameter/table generation tests.

Pins the rebuild's parameter system to the reference's three generators:
the Python test generator (Hardware_Multiplier/test_generator/), the C
generator (NTT_Software/Generator_Params/) and the C table headers
(NTT-RED/ntt_red256_tables.h, NTT/ntt256_tables.h).
"""

import re

import numpy as np
import pytest

from tpu_ntt.params import (
    NTTParams, PRESETS, find_params, find_root_of_order, hw_twiddle_stream,
    is_prime, make_params, modinv, preset, psi_powers, stage_powers, tables,
)


def test_modinv_and_prime():
    assert modinv(3, 12289) == 8193          # ntt_red256_tables.h:27
    assert modinv(256, 12289) == 12241       # inverse of n
    assert is_prime(12289) and is_prime(7681) and is_prime(8380417)
    assert not is_prime(12288) and not is_prime(1)
    assert is_prime(36028797009985537)       # the n=32768 K=55 menu prime


def test_sw256_params():
    p = preset("sw256")
    # ntt_red256_tables.h:1-12 parameter block
    assert (p.n, p.q, p.psi, p.omega) == (256, 12289, 1002, 8595)
    assert p.psi_inv == 10805 and p.omega_inv == 2525 and p.n_inv == 12241
    assert (p.ln_m, p.ln_k, p.k_inv) == (12, 3, 8193)
    assert p.k_bits == 14


def test_hw256_params():
    p = preset("hw256")
    # simulation/modelsim/test/PARAM.txt: 100,1e01,f04,19b8,3e,45b,400,40000
    assert (p.n, p.q, p.psi, p.omega) == (256, 7681, 62, 3844)
    assert p.omega_inv == 0x19B8 and p.psi_inv == 0x45B
    assert p.n_inv * p.R % p.q == 0x400
    assert p.R == 0x40000                    # 2^(9*2), defines.v:44-59
    assert p.k_bits == 13                    # defines.v:25


def test_hw_param_txt_verbatim(reference_dir):
    lines = []
    path = (reference_dir / "Hardware_Multiplier/simulation/modelsim/test/"
            "PARAM.txt")
    for line in open(path):
        line = line.split("//")[0].strip()
        if line:
            lines.append(int(line, 16))
    p = preset("hw256")
    assert lines == [p.n, p.q, p.omega, p.omega_inv, p.psi, p.psi_inv,
                     p.n_inv * p.R % p.q, p.R]


def test_root_orders():
    for name in ("sw256", "hw256", "dilithium256", "kyber128"):
        p = preset(name)
        assert pow(p.omega, p.n, p.q) == 1
        assert pow(p.omega, p.n // 2, p.q) == p.q - 1    # exact order n
        if p.psi:
            assert pow(p.psi, 2, p.q) == p.omega
            assert pow(p.psi, p.n, p.q) == p.q - 1       # exact order 2n


def test_find_params_properties():
    p = find_params(512, 14)
    assert is_prime(p.q) and (p.q - 1) % 1024 == 0
    assert pow(p.psi, 512, p.q) == p.q - 1
    q2 = find_params(512, 14).q
    assert p.q == q2                          # deterministic


@pytest.mark.parametrize("name", [n for n in PRESETS if "1048576" not in n
                                  and "65536" not in n])
def test_all_presets_valid(name):
    p = preset(name)
    assert is_prime(p.q)
    assert pow(p.omega, p.n, p.q) == 1


def _parse_c_table(src: str, name: str) -> np.ndarray:
    m = re.search(rf"{name}\[256\] = \{{(.*?)\}};", src, re.S)
    return np.array([int(x) for x in m.group(1).replace("\n", " ").split(",")
                     if x.strip()], dtype=np.int64)


RED_TABLE_NAMES = [
    "psi_powers", "inv_psi_powers", "scaled_inv_psi_powers",
    "omega_powers", "omega_powers_rev",
    "inv_omega_powers", "inv_omega_powers_rev",
    "mixed_powers", "mixed_powers_rev",
    "inv_mixed_powers", "inv_mixed_powers_rev",
]


def test_red_tables_verbatim(reference_dir):
    """Every generated Longa–Naehrig table matches ntt_red256_tables.c."""
    src = open(reference_dir / "NTT_Software/NTT_Software_Evaluations/"
               "NTT-256/NTT-RED/ntt_red256_tables.c").read()
    t = tables(preset("sw256"), red=True)
    for name in RED_TABLE_NAMES:
        want = _parse_c_table(src, "ntt_red256_" + name)
        np.testing.assert_array_equal(t[name], want, err_msg=name)


def test_plain_tables_verbatim(reference_dir):
    """Generated canonical tables match NTT/ntt256_tables.C."""
    src = open(reference_dir / "NTT_Software/NTT_Software_Evaluations/"
               "NTT-256/NTT/ntt256_tables.C").read()
    t = tables(preset("sw256"), red=False)
    for cname, mine in [("ntt256_psi_powers", "psi_powers"),
                        ("ntt256_omega_powers", "omega_powers"),
                        ("ntt256_omega_powers_rev", "omega_powers_rev"),
                        ("ntt256_inv_omega_powers", "inv_omega_powers"),
                        ("ntt256_inv_omega_powers_rev", "inv_omega_powers_rev")]:
        m = re.search(rf"{cname}\[256\] = \{{(.*?)\}};", src, re.S)
        if m is None:
            continue
        want = np.array([int(x) for x in m.group(1).replace("\n", " ")
                        .split(",") if x.strip()], dtype=np.int64)
        np.testing.assert_array_equal(t[mine] % preset("sw256").q, want % preset("sw256").q,
                                      err_msg=cname)


def test_hw_twiddle_stream_verbatim(reference_dir):
    """Mode-0 W/WINV streams match the checked-in ModelSim vectors
    (test_generator.py:183-189 schedule, R-scaled)."""
    base = reference_dir / "Hardware_Multiplier/simulation/modelsim/test"
    p = preset("hw256")

    def rd(f):
        return np.array([int(x, 16) for x in
                         (line.split("//")[0].strip() for line in open(base / f))
                         if x], dtype=np.int64)

    w = hw_twiddle_stream(p, pe=8)
    winv = hw_twiddle_stream(p, pe=8, inverse=True)
    assert len(w) == 272                     # NTT_PCIECommunicationv2.c:33
    np.testing.assert_array_equal(w, rd("W.txt"))
    np.testing.assert_array_equal(winv, rd("WINV.txt"))


def test_stage_table_structure():
    p = preset("sw256")
    t = stage_powers(p)
    # p[t] = 1 for every stage (j=0 entry, scale 1)
    for s in range(8):
        assert t[1 << s] == 1
    # p[2+1] = omega^(n/4)
    assert t[3] == pow(p.omega, p.n // 4, p.q)


def test_config_single_source_of_truth():
    """Derived widths agree with defines.v macro arithmetic for the HW point."""
    p = preset("hw256")
    assert p.w_size == 9                     # log2(256)+1, defines.v:45
    assert p.l_size == 2                     # ceil(13/9), defines.v:46
