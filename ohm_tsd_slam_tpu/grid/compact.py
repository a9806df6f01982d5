"""Scatter-free mask compaction for TPU.

``jnp.nonzero(mask, size=K)`` lowers to a full-length scatter, which XLA
executes serially (~11 ns/element) — 21 ms for the 2M-cell crossing mask
of a 1024^2 grid, dwarfing the raycast itself.  This module compacts a
boolean mask into the first-K true indices using only dense vector ops
and O(K) gathers:

  1. reshape the flat mask into [C, W] chunks;
  2. per-chunk stable argsort on the inverted mask (a W-wide bitonic
     sort vectorized over chunks) moves true columns to the front while
     keeping ascending order;
  3. exclusive-scan the per-chunk counts (tiny, length C);
  4. output slot j maps to chunk c = searchsorted(offsets, j) and rank
     r = j - offsets[c]; its column is order[c, r] — one O(K) gather.

The result is ordered by flat index, matching jnp.nonzero.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

CHUNK = 128


def compact_mask(mask: jnp.ndarray, size: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First-`size` indices of True entries of a flat boolean mask.

    Args:
      mask: 1D bool array; length must be a multiple of 128.
      size: static output length K.
    Returns:
      (idx [K] int32 — flat indices, ascending; arbitrary clipped values
      in invalid slots), (valid [K] bool).
    """
    n = mask.shape[0]
    assert n % CHUNK == 0, n
    m2 = mask.reshape(-1, CHUNK)                          # [C, W]
    c_chunks = m2.shape[0]

    # events-first stable ordering within each chunk
    order = jnp.argsort(~m2, axis=1, stable=True)         # [C, W] int
    counts = jnp.sum(m2, axis=1, dtype=jnp.int32)         # [C]
    offsets = jnp.cumsum(counts) - counts                 # exclusive
    total = offsets[-1] + counts[-1]

    j = jnp.arange(size, dtype=jnp.int32)
    valid = j < total

    # Slot -> owning chunk, without a per-slot binary search (searchsorted
    # costs ~14 gather rounds = ~3 ms here): run-length decode.  Scatter a
    # 1 at each nonempty chunk's start offset (O(C) scatter, C << n),
    # cumsum to get each slot's rank among nonempty chunks, and look the
    # chunk id up in the compacted nonempty-chunk list.
    nz = counts > 0
    starts = jnp.clip(offsets, 0, size)                   # [C]
    mark = jnp.zeros((size + 1,), jnp.int32).at[starts].add(
        nz.astype(jnp.int32), mode="drop")
    rank = jnp.cumsum(mark[:size]) - 1                    # [K]
    ids = jnp.nonzero(nz, size=c_chunks, fill_value=0)[0].astype(jnp.int32)
    c = ids[jnp.clip(rank, 0, c_chunks - 1)]
    r = jnp.clip(j - offsets[c], 0, CHUNK - 1)
    col = order[c, r].astype(jnp.int32)
    idx = c * CHUNK + col
    return jnp.where(valid, idx, 0), valid
