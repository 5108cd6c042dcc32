"""ctypes bindings for the native host runtime (csrc/libnttcore.so).

The dlopen-and-bind pattern of the reference's driver loader
(``linux_app/PCIE.c:59-103``), applied to our own C++ core: 64-bit modular
arithmetic (__int128), RNS residue splitting, Garner CRT reconstruction
with signed centering, and an independent uint64 NTT/schoolbook oracle.

The library is built on demand (``make -C csrc``) and cached; every entry
point has a NumPy fallback path in callers, so the package works without a
C++ toolchain (slower big-q reconstruction only).
"""

from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess

import numpy as np

__all__ = ["load", "NativeCore", "available"]

_CSRC = pathlib.Path(__file__).resolve().parents[2] / "csrc"
_U64P = ctypes.POINTER(ctypes.c_uint64)
_I32P = ctypes.POINTER(ctypes.c_int32)


def _build() -> pathlib.Path | None:
    so = _CSRC / "libnttcore.so"
    src = _CSRC / "nttcore.cpp"
    if not src.exists():
        return so if so.exists() else None
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    try:
        subprocess.run(["make", "-C", str(_CSRC)], capture_output=True,
                       check=True, text=True)
    except (OSError, subprocess.CalledProcessError):
        return so if so.exists() else None
    return so


class NativeCore:
    """Typed wrapper over libnttcore.so."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.ntt_mulmod64.restype = ctypes.c_uint64
        lib.ntt_mulmod64.argtypes = [ctypes.c_uint64] * 3
        lib.ntt_powmod64.restype = ctypes.c_uint64
        lib.ntt_powmod64.argtypes = [ctypes.c_uint64] * 3
        lib.ntt_invmod64.restype = ctypes.c_uint64
        lib.ntt_invmod64.argtypes = [ctypes.c_uint64] * 2
        lib.ntt_polymul64.restype = ctypes.c_int
        lib.ntt_polymul64.argtypes = [_U64P, _U64P, _U64P, ctypes.c_size_t,
                                      ctypes.c_uint64, ctypes.c_uint64]
        lib.ntt_rns_split.restype = None
        lib.ntt_rns_split.argtypes = [_U64P, ctypes.c_size_t, _U64P,
                                      ctypes.c_int, _I32P]
        lib.ntt_crt_garner.restype = None
        lib.ntt_crt_garner.argtypes = [_I32P, ctypes.c_int, ctypes.c_size_t,
                                       _U64P, ctypes.c_uint64, _U64P]
        lib.ntt_schoolbook_negacyclic64.restype = None
        lib.ntt_schoolbook_negacyclic64.argtypes = [
            _U64P, _U64P, ctypes.c_size_t, ctypes.c_uint64, _U64P]

    # -- scalars --
    def mulmod(self, a: int, b: int, q: int) -> int:
        return self._lib.ntt_mulmod64(a, b, q)

    def powmod(self, b: int, e: int, q: int) -> int:
        return self._lib.ntt_powmod64(b, e, q)

    def invmod(self, a: int, q: int) -> int:
        return self._lib.ntt_invmod64(a, q)

    # -- arrays --
    def polymul64(self, a: np.ndarray, b: np.ndarray, q: int,
                  psi: int) -> np.ndarray:
        a = np.ascontiguousarray(a, dtype=np.uint64)
        b = np.ascontiguousarray(b, dtype=np.uint64)
        c = np.zeros_like(a)
        rc = self._lib.ntt_polymul64(
            c.ctypes.data_as(_U64P), a.ctypes.data_as(_U64P),
            b.ctypes.data_as(_U64P), a.size, q, psi)
        if rc != 0:
            raise ValueError(f"ntt_polymul64 failed with {rc}")
        return c

    def rns_split(self, a: np.ndarray, primes) -> np.ndarray:
        a = np.ascontiguousarray(a, dtype=np.uint64)
        pr = np.ascontiguousarray(primes, dtype=np.uint64)
        out = np.zeros((len(pr), a.size), dtype=np.int32)
        self._lib.ntt_rns_split(a.ctypes.data_as(_U64P), a.size,
                                pr.ctypes.data_as(_U64P), len(pr),
                                out.ctypes.data_as(_I32P))
        return out

    def crt_garner(self, residues: np.ndarray, primes, q: int) -> np.ndarray:
        residues = np.ascontiguousarray(residues, dtype=np.int32)
        k, n = residues.shape
        pr = np.ascontiguousarray(primes, dtype=np.uint64)
        out = np.zeros(n, dtype=np.uint64)
        self._lib.ntt_crt_garner(residues.ctypes.data_as(_I32P), k, n,
                                 pr.ctypes.data_as(_U64P), q,
                                 out.ctypes.data_as(_U64P))
        return out

    def schoolbook_negacyclic64(self, a, b, q: int) -> np.ndarray:
        a = np.ascontiguousarray(a, dtype=np.uint64)
        b = np.ascontiguousarray(b, dtype=np.uint64)
        c = np.zeros_like(a)
        self._lib.ntt_schoolbook_negacyclic64(
            a.ctypes.data_as(_U64P), b.ctypes.data_as(_U64P), a.size, q,
            c.ctypes.data_as(_U64P))
        return c


@functools.lru_cache(maxsize=1)
def load() -> NativeCore | None:
    """Build (if needed) and load the native core; None if unavailable."""
    so = _build()
    if so is None or not so.exists():
        return None
    try:
        return NativeCore(ctypes.CDLL(str(so)))
    except OSError:
        return None


def available() -> bool:
    return load() is not None
