"""Coefficient/vector file IO — parity with the reference's file formats.

Readers/writers for:

- space-separated coefficient files (``coeficientes_a.txt`` format read by
  ``time_testing256.c:17-44`` and ``colab_programs/schoolbook.py:8-15``),
- ``$readmemh``-style one-hex-per-line vector files (PARAM/W/WINV/
  NTT_DIN/NTT_DOUT/INTT_DIN/INTT_DOUT produced by
  ``test_generator/test_generator.py:131-189`` and consumed by the RTL
  testbenches via ``NTTN_test.v:47-56``),
- the full test-vector bundle generator (our twin of test_generator.py,
  producing bit-identical files for the same parameters).
"""

from __future__ import annotations

import pathlib

import numpy as np

from .params import NTTParams, hw_twiddle_stream
from .utils.bitrev import bit_reverse_permute

__all__ = [
    "read_coefficients", "write_coefficients",
    "read_hex_vectors", "write_hex_vectors",
    "write_test_vectors",
]


def read_coefficients(path) -> np.ndarray:
    """Space-separated decimal ints, any line structure (schoolbook.py:8-15)."""
    vals = []
    for line in open(path):
        vals.extend(int(x) for x in line.split())
    return np.array(vals, dtype=np.int64)


def write_coefficients(path, coeffs, per_line: int = 10) -> None:
    coeffs = np.asarray(coeffs).reshape(-1)
    with open(path, "w") as f:
        for i in range(0, len(coeffs), per_line):
            f.write(" ".join(str(int(c))
                             for c in coeffs[i:i + per_line]) + "\n")


def read_hex_vectors(path) -> np.ndarray:
    """One hex value per line, // comments allowed ($readmemh format)."""
    vals = []
    for line in open(path):
        line = line.split("//")[0].strip()
        if line:
            vals.append(int(line, 16))
    return np.array(vals, dtype=np.int64)


def write_hex_vectors(path, values) -> None:
    with open(path, "w") as f:
        for v in np.asarray(values).reshape(-1):
            f.write(format(int(v), "x") + "\n")


def write_test_vectors(params: NTTParams, out_dir, pe: int = 8,
                       seed: int = 0) -> dict[str, pathlib.Path]:
    """Emit the full hardware test-vector bundle for (params, pe) — the
    twin of test_generator.py's outputs, using the same cyclic GS flow
    (natural-order NTT_DIN, bit-reversed NTT_DOUT, INTT_DIN = bitrev of
    NTT output, R-scaled W/WINV streams, PARAM in the v2 order)."""
    from . import ref
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    p = params
    rng = np.random.default_rng(seed)

    a = rng.integers(0, p.q, p.n)
    poly_a = rng.integers(0, p.q, p.n)
    poly_b = rng.integers(0, p.q, p.n)
    a_ntt = ref.hw_ntt(a, p)
    a_rev = bit_reverse_permute(a_ntt)
    a_rec = ref.hw_intt(a_rev, p)
    assert np.array_equal(bit_reverse_permute(a_rec), a), \
        "round-trip sanity check failed (test_generator.py:166-170 analog)"

    files = {}

    def emit(name, vals):
        path = out / f"{name}.txt"
        write_hex_vectors(path, vals)
        files[name] = path

    emit("PARAM", [p.n, p.q, p.omega, p.omega_inv, p.psi, p.psi_inv,
                   p.n_inv * p.R % p.q, p.R])
    emit("NTT_DIN", a)
    emit("NTT_DOUT", a_ntt)
    emit("INTT_DIN", a_rev)
    emit("INTT_DOUT", a_rec)
    emit("POLY_A_HEX", poly_a)
    emit("POLY_B_HEX", poly_b)
    emit("W", hw_twiddle_stream(p, pe))
    emit("WINV", hw_twiddle_stream(p, pe, inverse=True))
    return files
