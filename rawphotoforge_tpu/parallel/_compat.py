"""jax version compatibility for the parallel layer (single copy)."""

from __future__ import annotations

try:  # jax >= 0.8: top-level shard_map (check_vma kwarg)
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax (check_rep kwarg)
    from jax.experimental.shard_map import shard_map as _old_shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_vma=True):
        return _old_shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=check_vma)
