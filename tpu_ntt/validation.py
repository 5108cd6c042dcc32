"""Opt-in input-domain validation at plan boundaries.

Every transform backend assumes canonical inputs in [0, q); out-of-range
coefficients silently produce garbage (the reference C has the same
contract — and the same flaw: its range discipline lives in asserts
compiled out of release builds, ntt_red.c:42,79).  The rebuild does
better: ``set_validation(True)`` (or the ``TPU_NTT_VALIDATE=1`` env var)
makes every host-boundary entry point check its operands and raise a
``DomainError`` naming the offender, before anything is dispatched.

Off by default: validation reads every input coefficient on the host, so
it costs a host pass (and a device→host transfer for device-resident
arrays) per call — a debug/bring-up tool, not a hot-path feature.
"""

from __future__ import annotations

import contextlib
import os

import numpy as np

__all__ = ["DomainError", "set_validation", "validation_enabled",
           "validated", "check_domain"]

_ENABLED = os.environ.get("TPU_NTT_VALIDATE", "") not in ("", "0", "false")


class DomainError(ValueError):
    """An input coefficient lies outside the canonical domain [0, q)."""


def set_validation(on: bool) -> None:
    """Globally enable/disable boundary validation."""
    global _ENABLED
    _ENABLED = bool(on)


def validation_enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def validated(on: bool = True):
    """Context manager: enable validation within the block."""
    global _ENABLED
    old = _ENABLED
    _ENABLED = bool(on)
    try:
        yield
    finally:
        _ENABLED = old


def check_domain(x, q: int, where: str = "input") -> None:
    """Raise DomainError unless every coefficient of ``x`` is in [0, q).
    No-op when validation is disabled, and skipped for traced values
    (entry points stay jit-composable; validation sees only concrete
    host-boundary arrays)."""
    if not _ENABLED:
        return
    import jax
    if isinstance(x, jax.core.Tracer):
        return
    a = np.asarray(x)
    if a.size == 0:
        return
    # compare as python ints: numpy would route uint64-vs-big-int
    # comparisons through float64, which cannot represent q near 2^64
    lo = int(a.min())
    hi = int(a.max())
    if lo < 0 or hi >= q:
        bad = int(lo) if lo < 0 else int(hi)
        raise DomainError(
            f"{where}: coefficient {bad} outside canonical domain "
            f"[0, {q}) — reduce inputs mod q first (validation is "
            f"opt-in; disable with set_validation(False))")
