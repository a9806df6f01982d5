"""Scatter-free mask compaction for TPU.

``jnp.nonzero(mask, size=K)`` lowers to a full-length scatter, which XLA
executes serially (~11 ns/element) — 21 ms for the 2M-cell crossing mask
of a 1024^2 grid, dwarfing the raycast itself.  This module compacts a
boolean mask into the first-K true indices using only dense vector ops
and O(K) gathers:

  1. reshape the flat mask into [C, 128] chunks;
  2. per-chunk **butterfly compaction**: every true element must move
     left by ``dist = #falses strictly before it``, which is
     non-decreasing along the row, so moving each element left by the
     set bits of its own distance (7 masked lane-rolls, LSB->MSB) can
     never collide — O(log 128) dense passes instead of the O(log^2)
     bitonic stages of ``argsort`` (measured 7x cheaper on a 1024^2
     grid's 16k x 128 mask);
  3. exclusive-scan the per-chunk counts (tiny, length C);
  4. output slot j maps to chunk c via a run-length decode (scatter of
     C chunk starts + cumsum) and rank r = j - offsets[c]; its column
     is cols[c, r] — one O(K) gather.

A value channel can ride along through the butterfly
(:func:`compact_mask_values`) so callers avoid a second full-size
gather against the original array.

The result is ordered by flat index, matching jnp.nonzero.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

CHUNK = 128
_BITS = 7  # log2(CHUNK)

# compact_mask_values slot-pick strategy: None = auto (one-hot matmul
# pick on TPU when K*C stays small); tests force True/False
FORCE_ONEHOT_PICK = None


def _use_onehot_pick(k: int, c_chunks: int) -> bool:
    if FORCE_ONEHOT_PICK is not None:
        return bool(FORCE_ONEHOT_PICK)
    try:
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        on_tpu = False
    return on_tpu and k * c_chunks <= 2_000_000


def _shift_left(x: jnp.ndarray, step: int) -> jnp.ndarray:
    """Shift lanes left by `step` along axis 1 (wraparound garbage kept;
    callers mask it via the shifted validity channel)."""
    return jnp.roll(x, -step, axis=1)


def _butterfly(m2: jnp.ndarray, channels):
    """Compact true lanes of each row to the front, carrying channels.

    Returns (front_valid [C, 128] bool, compacted channels).  Valid lanes
    of row c are exactly the first counts[c] columns.
    """
    c_chunks = m2.shape[0]
    col = jnp.broadcast_to(
        jnp.arange(CHUNK, dtype=jnp.int32)[None, :], (c_chunks, CHUNK))
    # falses strictly before each column
    dist = jnp.cumsum((~m2).astype(jnp.int32), axis=1) - (~m2)
    valid = m2
    chans = list(channels)
    for b in range(_BITS):
        step = 1 << b
        src = valid & ((dist & step) != 0)
        inc = _shift_left(src, step)
        # no incoming from wraparound
        inc = inc & (col < CHUNK - step)
        valid = (valid & ~src) | inc
        dist = jnp.where(inc, _shift_left(dist, step), dist)
        chans = [jnp.where(inc, _shift_left(ch, step), ch) for ch in chans]
    return valid, chans


def _assemble(counts: jnp.ndarray, size: int):
    """Map output slot j -> (owning chunk c, rank r) via run-length decode."""
    c_chunks = counts.shape[0]
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
    return c, r, valid


def compact_mask_values(mask: jnp.ndarray, values, size: int):
    """First-`size` true entries of a flat boolean mask, with values.

    Args:
      mask: 1D bool array; length must be a multiple of 128.
      values: optional 1D array like mask — compacted alongside — or a
        tuple/list of such arrays (all compacted through one butterfly).
      size: static output length K.
    Returns:
      (idx [K] int32 flat indices, ascending; 0 in invalid slots),
      (vals [K], tuple of [K], or None — matching the input shape),
      (valid [K] bool).
    """
    n = mask.shape[0]
    assert n % CHUNK == 0, n
    m2 = mask.reshape(-1, CHUNK)                          # [C, 128]

    multi = isinstance(values, (tuple, list))
    value_list = list(values) if multi else (
        [] if values is None else [values])

    col = jnp.broadcast_to(
        jnp.arange(CHUNK, dtype=jnp.int32)[None, :], m2.shape)
    chans = [col] + [v.reshape(m2.shape) for v in value_list]
    _, chans = _butterfly(m2, chans)
    cols = chans[0]

    counts = jnp.sum(m2, axis=1, dtype=jnp.int32)         # [C]
    c_chunks = m2.shape[0]
    c, r, valid = _assemble(counts, size)

    if _use_onehot_pick(size, c_chunks):
        # TPU: the [K]-slot `M[c, r]` gathers lower to a serial path
        # (~30 ns/slot — 0.12 ms at the extraction row-prefilter's
        # 4096 slots); pick through an exact one-hot contraction
        # instead: rows = onehot(c) @ M selects chunk rows on the MXU
        # (unit coefficients, HIGHEST precision — bit-exact), then a
        # masked lane reduction selects r.  Gated by K*C so the [K, C]
        # one-hot never outgrows the serial gather it replaces.
        A = (jnp.arange(c_chunks, dtype=jnp.int32)[None, :]
             == c[:, None])
        oh_r = (jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
                == r[:, None])

        def pick(M):
            rows = jax.lax.dot(A.astype(M.dtype), M,
                               precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(jnp.where(oh_r, rows, 0), axis=1)

        idx = c * CHUNK + pick(cols.astype(jnp.float32)).astype(jnp.int32)
        out_vals = [pick(ch) for ch in chans[1:]]
    else:
        idx = c * CHUNK + cols[c, r].astype(jnp.int32)
        out_vals = [ch[c, r] for ch in chans[1:]]
    if multi:
        vals = tuple(out_vals)
    else:
        vals = out_vals[0] if out_vals else None
    return jnp.where(valid, idx, 0), vals, valid


def compact_mask(mask: jnp.ndarray, size: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First-`size` indices of True entries of a flat boolean mask.

    Returns (idx [K] int32, ascending; 0 in invalid slots), (valid [K]).
    """
    idx, _, valid = compact_mask_values(mask, None, size)
    return idx, valid


def pack_channels_rows(mask: jnp.ndarray, channels, size: int):
    """Order-preserving channel pack, fully vectorized (no serial
    append): bit-identical to
    ops/compact_pallas.py::compact_channels_pallas's output layout.

    Steps: per-row butterfly front-compaction (_butterfly), exclusive
    cumsum of row counts for each row's output offset, a per-row
    dynamic right-roll into a [*, 256] staging strip via 7 masked
    static rolls (a row's lanes then sit at [dest % 128, ...)), and
    one-hot [NB, R] MXU matmuls that sum each output 128-block's
    contributions (collision-free: every output lane is owned by
    exactly one row; precision=HIGHEST so x*1.0 passes through f32
    exactly).  Replaces the sequential-append Pallas kernel's
    ~0.6 ms/extraction row loop with ~0.1 ms of dense VPU/MXU work.

    Args:
      mask: flat bool/f32, length % 128 == 0.
      channels: tuple of flat f32 arrays like mask.
      size: static output capacity (multiple of 128).
    Returns:
      (packed [n_chan + 1, size + 128] f32 — rows = channels then a
      1.0/0.0 validity row; count i32 = total true lanes, possibly
      > size; entries beyond `size` are dropped).
    """
    n = mask.shape[0]
    assert n % CHUNK == 0, n
    assert size % CHUNK == 0, size
    m2 = mask.reshape(-1, CHUNK) > 0
    R = m2.shape[0]
    nc = len(channels) + 1

    valid, chans = _butterfly(
        m2, [c.reshape(-1, CHUNK) for c in channels])
    counts = jnp.sum(m2, axis=1, dtype=jnp.int32)          # [R]
    dest = jnp.cumsum(counts) - counts                     # exclusive
    total = jnp.sum(counts)

    f32 = jnp.float32
    stk = jnp.stack(
        [jnp.where(valid, ch, 0.0).astype(f32) for ch in chans]
        + [valid.astype(f32)], axis=1)                     # [R, nc, 128]
    stg = jnp.pad(stk, ((0, 0), (0, 0), (0, CHUNK)))       # [R, nc, 256]
    sh = dest % CHUNK
    for b in range(_BITS):
        step = 1 << b
        take = (((sh >> b) & 1) > 0)[:, None, None]
        stg = jnp.where(take, jnp.roll(stg, step, axis=2), stg)

    lo = stg[:, :, :CHUNK].reshape(R, nc * CHUNK)
    hi = stg[:, :, CHUNK:].reshape(R, nc * CHUNK)
    NB = size // CHUNK + 1
    b0 = dest // CHUNK
    blocks = jnp.arange(NB, dtype=jnp.int32)
    A0 = (blocks[:, None] == b0[None, :]).astype(f32)      # [NB, R]
    A1 = (blocks[:, None] == (b0[None, :] + 1)).astype(f32)
    outb = (jnp.dot(A0, lo, precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(A1, hi, precision=jax.lax.Precision.HIGHEST))
    packed = outb.reshape(NB, nc, CHUNK).transpose(1, 0, 2).reshape(
        nc, NB * CHUNK)
    return packed, total
