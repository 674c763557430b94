"""Multi-chip sharding of the interpolation step (jax.sharding / shard_map)."""
