"""Multi-chip parallelism: mesh-sharded transforms and multi-host setup."""

from .sharded import ShardedPlan, make_mesh

__all__ = ["ShardedPlan", "make_mesh"]
