"""Multi-chip scaling: device mesh + pixel-space sharding."""
