"""Pallas TPU kernel for the order-preserving channel pack (v2).

Replaces grid/compact.py::pack_channels_rows on the extraction hot path
(VERDICT r4 #5: the XLA version's staged rolls stream the FULL
ROW_CAP-row capacity through HBM — ~0.38 ms per map update while only a
few hundred rows are real).  Design:

  * grid walks 128-row blocks of the prefiltered row stack; a block
    whose rows are all empty skips everything but its DMA;
  * per block: the butterfly front-compaction (shared code with
    ops/compact_pallas.py) runs on VMEM vregs; each row's lanes are
    rolled right by its global output offset % 128 (7 masked static
    rolls — Mosaic has no dynamic roll) into [*, 256] lo/hi halves;
  * one one-hot [NB_OUT, 128] @ [128, nc*128] MXU matmul per half
    accumulates every row into its output 128-block — collision-free
    (each output lane is owned by exactly one row), so the accumulation
    order across blocks is irrelevant and values pass through exactly
    (unit coefficients, HIGHEST precision);
  * the whole [NB_OUT, nc*128] output stays VMEM-resident across the
    sequential grid.

Global row offsets (exclusive cumsum of per-row counts) are computed by
the caller in XLA — a [ROW_CAP] cumsum is trivial there and Mosaic has
no cross-block scan.

Bit-identical to pack_channels_rows (asserted in tests/test_compact.py)
— same output layout [n_chan + 1, size + 128], entries beyond `size`
dropped, count = total true lanes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ohm_tsd_slam_tpu.ops.compact_pallas import CHUNK, _butterfly_block

R_BLK2 = 128     # rows per program


def _kernel(n_chan: int, nb_out: int, mask_ref, dest_ref, *refs):
    nc = n_chan + 1
    chan_refs = refs[:n_chan]
    out_ref = refs[n_chan]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    m2f = mask_ref[:]                          # [R_BLK2, 128] f32 0/1

    @pl.when(jnp.sum(m2f) > 0.0)
    def _():
        chans = [r[:] for r in chan_refs]
        valid, comp = _butterfly_block(m2f, chans)
        comp = [jnp.where(valid > 0.0, ch, 0.0) for ch in comp]
        comp.append(valid)

        dest_row = dest_ref[0, 0:1, :]         # [1, R_BLK2] f32
        dest_col = dest_row.T                  # [R_BLK2, 1]
        b0_col = jnp.floor(dest_col / CHUNK)
        sh_col = (dest_col - b0_col * CHUNK).astype(jnp.int32)

        los = []
        his = []
        for ch in comp:
            x = jnp.concatenate(
                [ch, jnp.zeros((R_BLK2, CHUNK), jnp.float32)], axis=1)
            for b in range(7):
                step = 1 << b
                take = ((sh_col >> b) & 1) > 0
                x = jnp.where(take, pltpu.roll(x, step, axis=1), x)
            los.append(x[:, :CHUNK])
            his.append(x[:, CHUNK:])
        lo = jnp.concatenate(los, axis=1)      # [R_BLK2, nc*128]
        hi = jnp.concatenate(his, axis=1)

        iob = jax.lax.broadcasted_iota(jnp.int32, (nb_out, R_BLK2), 0)
        b0_row = b0_col.T.astype(jnp.int32)    # [1, R_BLK2]
        A0 = (iob == b0_row).astype(jnp.float32)
        A1 = (iob == (b0_row + 1)).astype(jnp.float32)
        contrib = (jax.lax.dot(A0, lo,
                               preferred_element_type=jnp.float32)
                   + jax.lax.dot(A1, hi,
                                 preferred_element_type=jnp.float32))
        out_ref[:] = out_ref[:] + contrib


@partial(jax.jit, static_argnames=("size", "interpret"))
def pack_channels_rows_pallas(mask: jnp.ndarray, channels, size: int,
                              interpret: bool = False):
    """Drop-in for grid/compact.py::pack_channels_rows (see module
    docstring).  mask: flat bool/f32 (length % 128 == 0, rows % R_BLK2
    == 0); channels: tuple of flat f32 like mask; size: output capacity
    (multiple of 128).  Returns (packed [n_chan+1, size+128] f32,
    count i32)."""
    n = mask.shape[0]
    assert n % (R_BLK2 * CHUNK) == 0, n
    assert size % CHUNK == 0, size
    n_chan = len(channels)
    m2 = (mask.reshape(-1, CHUNK) > 0).astype(jnp.float32)
    rows = m2.shape[0]
    grid = rows // R_BLK2

    counts = jnp.sum(m2, axis=1, dtype=jnp.int32)          # [rows]
    dest = jnp.cumsum(counts) - counts                     # exclusive
    total = jnp.sum(counts)
    # f32 offsets (exact below 2^24; capacities are <= 32768+128).
    # Overflow rows keep their true dest — their one-hot matches no
    # output block, so they are dropped exactly like the XLA version.
    # [grid, 8, 128] with the row offsets in sublane 0 (a (1, 128)
    # block violates the (8, 128) divisibility rule)
    dest_f = jnp.pad(
        dest.astype(jnp.float32).reshape(grid, 1, R_BLK2),
        ((0, 0), (0, 7), (0, 0)))

    nb = size // CHUNK + 1
    nb_pad = -(-nb // 8) * 8
    kern = partial(_kernel, n_chan, nb_pad)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((R_BLK2, CHUNK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, R_BLK2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((R_BLK2, CHUNK), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)] * n_chan,
        out_specs=pl.BlockSpec((nb_pad, (n_chan + 1) * CHUNK),
                               lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb_pad, (n_chan + 1) * CHUNK),
                                       jnp.float32),
        interpret=interpret,
    )(m2, dest_f, *[c.reshape(-1, CHUNK).astype(jnp.float32)
                    for c in channels])
    # [NB, nc, 128] -> [nc, NB*128], then trim to size + 128
    packed = out[:nb].reshape(nb, n_chan + 1, CHUNK).transpose(
        1, 0, 2).reshape(n_chan + 1, nb * CHUNK)
    return packed[:, :size + CHUNK], total
