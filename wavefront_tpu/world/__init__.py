"""Game/world layer: blocks, worldgen, chunk streaming, physics, controls."""
