"""Core utilities: configuration, stateless RNG, morton codes, cameras."""
