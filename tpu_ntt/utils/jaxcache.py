"""Persistent XLA compilation cache.

TPU compiles on this stack go through a remote-compile service and can
take minutes per graph; host processes (CLI, bench, tests-on-TPU) would
otherwise pay that on every launch.  One call installs an on-disk cache
shared across processes — the moral equivalent of the reference shipping
pre-synthesized bitstreams instead of re-running Quartus per boot.
"""

from __future__ import annotations

import os
import pathlib

_DONE = False


def enable_compile_cache(path: str | None = None) -> None:
    """Idempotently point JAX at a persistent compilation cache dir."""
    global _DONE
    if _DONE:
        return
    import jax
    cache = path or os.environ.get(
        "TPU_NTT_JAX_CACHE",
        str(pathlib.Path.home() / ".cache" / "tpu_ntt_jax"))
    pathlib.Path(cache).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except (AttributeError, ValueError):
        pass                                   # older jax: silently skip
    _DONE = True
