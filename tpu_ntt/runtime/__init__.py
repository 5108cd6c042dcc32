"""Host-side runtime: native core bindings and the engine/CLI layer."""

from . import native

__all__ = ["native", "StagedSession"]


def __getattr__(name):
    if name == "StagedSession":
        from .staged import StagedSession
        return StagedSession
    raise AttributeError(name)
