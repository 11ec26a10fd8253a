"""Application entry points (reference src/main.rs)."""
