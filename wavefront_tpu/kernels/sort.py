"""Key / key-value sorting for inter-bounce ray coherence.

The reference ships a 4-pass LSD radix sorter (RADIX=256, 4096-element
partitions, upsweep/spine/downsweep GLSL kernels; reference
src/render_system/radix_sort/mod.rs:29-38 and shader/*.rs), a port of
jaesung-cs/vulkan_radix_sort, invoked between bounces as
`Sorter::sort_key_value` (interactive_rendering.rs:1095-1116).

On TPU the baseline implementation delegates to `jax.lax.sort`, which XLA
lowers to an efficient on-device bitonic/merge network — there is no
cross-workgroup atomic machinery to hand-roll because XLA owns scheduling.
The API mirrors the reference sorter's (sort / sort_key_value), operating on
uint32 keys.

`segmented_histogram` and `exclusive_scan` below are the building blocks of
the radix pipeline kept as public utilities (and exercised by tests); a
hand-tiled Pallas radix sort can slot in behind the same API if profiling
shows lax.sort on the critical path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sort_keys(keys: jax.Array) -> jax.Array:
    """Ascending sort of uint32 keys (reference radix_sort/mod.rs:166-204)."""
    return jax.lax.sort(keys)


def sort_key_value(keys: jax.Array, values: jax.Array):
    """Ascending stable key-value sort (reference radix_sort/mod.rs:206-228).

    Returns (sorted_keys, permuted_values).
    """
    return jax.lax.sort((keys, values), num_keys=1, is_stable=True)


def sort_permutation(keys: jax.Array) -> jax.Array:
    """The permutation that stably sorts `keys` ascending: an index array p
    with sorted[i] = input[p[i]].  Used to permute whole ray SoA batches by
    a single shared key."""
    n = keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.uint32)
    _, perm = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
    return perm


def invert_permutation(perm: jax.Array) -> jax.Array:
    """inv with inv[perm[i]] = i (scatter of iota)."""
    n = perm.shape[0]
    iota = jnp.arange(n, dtype=perm.dtype)
    return jnp.zeros((n,), dtype=perm.dtype).at[perm].set(iota)


def exclusive_scan(x: jax.Array, axis: int = -1) -> jax.Array:
    """Exclusive prefix sum (the reference spine kernel's subgroup scan,
    radix_sort/shader/spine.rs:46-112)."""
    c = jnp.cumsum(x, axis=axis)
    return c - x


def segmented_histogram(keys: jax.Array, partition: int, radix_bits: int, shift: int):
    """Per-partition digit histograms (the reference upsweep kernel,
    radix_sort/shader/upsweep.rs:45-81).

    keys: (N,) uint32, N divisible by `partition`.
    Returns (num_partitions, 2**radix_bits) int32 counts of digit
    (key >> shift) & (2**radix_bits - 1) per partition.
    """
    radix = 1 << radix_bits
    digits = ((keys >> jnp.uint32(shift)) & jnp.uint32(radix - 1)).astype(jnp.int32)
    parts = digits.reshape(-1, partition)
    onehot = jax.nn.one_hot(parts, radix, dtype=jnp.int32)
    return onehot.sum(axis=1)
