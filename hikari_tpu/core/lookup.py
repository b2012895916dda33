"""Per-lane table lookups tuned for the TPU backend.

XLA's TPU backend emits any fusion that contains a gather as a scalar
element loop (~3 ns/element vs ~0.001 ns/element for vectorized selects),
so per-lane reads from *small* banks — material parameters, light banks,
medium parameters — are unrolled into a `where` chain over the bank rows,
which stays fully vectorized. Large tables (per-triangle attributes,
texture atlases) keep the gather: an N-way unroll would cost more than the
scalar loop.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_UNROLL = 16


def bank_lookup(arr, idx, max_unroll: int = MAX_UNROLL):
    """arr[idx] with tiny-bank select-chain unrolling.

    arr: (M, ...) bank; idx: (...,) int32 lane indices. Returns
    (..., bank trailing dims)."""
    m = arr.shape[0]
    if m == 1:
        return jnp.broadcast_to(arr[0], idx.shape + arr.shape[1:])
    if m <= max_unroll:
        extra = (1,) * (arr.ndim - 1)
        idxe = idx.reshape(idx.shape + extra) if arr.ndim > 1 else idx
        out = jnp.broadcast_to(arr[0], idx.shape + arr.shape[1:])
        for j in range(1, m):
            out = jnp.where(idxe == j, arr[j], out)
        return out
    return arr[idx]
