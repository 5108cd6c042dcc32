"""Host-side runtime: native core bindings and the engine/CLI layer."""

from . import native

__all__ = ["native"]
