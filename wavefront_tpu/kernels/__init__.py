"""Device kernels: sorting/compaction and Pallas TPU kernels."""
