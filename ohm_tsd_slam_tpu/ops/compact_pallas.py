"""Pallas TPU kernel for mask compaction with value channels.

grid/compact.py's butterfly compaction is already scatter-free, but in
XLA its chunk-offset assembly costs ~6 serial 32k-element gather/scatter
rounds (~2.4 ms on a 1024^2 grid) and the butterfly's 7x5 masked-roll
passes stream ~70 MB through HBM (~2.5 ms).  This kernel does both on
chip memory:

  * the grid walks row blocks sequentially (TPU Pallas grid semantics);
  * each program runs the butterfly on its [R_BLK, 128] block in VMEM;
  * rows append their compacted lanes to the VMEM-resident output at a
    running SMEM offset — the classic sequential-compaction pattern the
    XLA version had to emulate with run-length decodes.  A row writes
    all 128 lanes; the pad lanes are overwritten by the next row's
    append (the output has 128 slack columns), and a per-lane validity
    channel rides along so the final row's pads stay invalid.

Output layout is TRANSPOSED — [n_channels + 1, K + 128] — so the
per-row appends are plain lane-sliced stores (no sublane transposes) and
the raycast candidate kernel can consume it directly as the right-hand
dot operand.

Row blocks whose 128-lane rows are entirely false cost ~a scalar test
(the common case: only ~0.1-1% of a TSD grid's quads carry isocontour
segments).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
_BITS = 7
# rows per program; also the SMEM counts block — XLA lays out s32 SMEM
# operands with a 1024 tile, so this must be a multiple of 1024
R_BLK = 1024
# nonzero-row budget for the caller-side prefilter (grid/raycast_fast):
# rows beyond this are dropped and counted
ROW_CAP = 4096


def _roll(x, shift):
    """Lane roll that lowers on Mosaic (pltpu.roll; jnp.roll lowers to
    concatenates, which fail on i1 vregs and are slower anyway)."""
    return pltpu.roll(x, shift % CHUNK, axis=1)


def _prefix_falses(m2f):
    """Exclusive prefix count of falses along lanes (Mosaic has no
    cumsum lowering; log-step shift-add instead).  m2f: f32 0/1."""
    col = jax.lax.broadcasted_iota(jnp.int32, m2f.shape, 1)
    x = 1.0 - m2f
    ps = x
    for b in range(_BITS):
        step = 1 << b
        ps = ps + jnp.where(col >= step, _roll(ps, step), 0.0)
    return (ps - x).astype(jnp.int32)


def _butterfly_block(m2f, chans):
    """grid/compact.py::_butterfly on a VMEM-resident block.

    All rolled arrays are f32/i32 (bool vregs cannot be rolled on
    Mosaic); m2f holds 0.0/1.0.
    """
    dist = _prefix_falses(m2f)
    col = jax.lax.broadcasted_iota(jnp.int32, m2f.shape, 1)
    valid = m2f
    out = list(chans)
    for b in range(_BITS):
        step = 1 << b
        move = jnp.where((dist & step) != 0, valid, 0.0)
        inc = jnp.where(col < CHUNK - step, _roll(move, -step), 0.0)
        # collision-free (see grid/compact.py): a lane never stays
        # occupied while receiving, so 0/1 arithmetic == the bool or
        valid = valid - move + inc
        took = inc > 0.0
        dist = jnp.where(took, _roll(dist, -step), dist)
        out = [jnp.where(took, _roll(ch, -step), ch) for ch in out]
    return valid, out


def _roll_right_dyn(x, shift):
    """Dynamic right-roll along lanes via bit-decomposed static rolls
    (Mosaic has no dynamic roll; shift < 256 here)."""
    for b in range(8):
        step = 1 << b
        x = jnp.where((shift & step) != 0,
                      pltpu.roll(x, step, axis=1), x)
    return x


def _kernel(n_chan: int, size: int, mask_ref, *refs):
    """Sequential stream compaction with a carry buffer.

    Mosaic only allows dynamic lane offsets that are multiples of 128,
    so rows cannot be appended at arbitrary offsets.  Instead each
    non-empty row's front-compacted lanes are rolled right by the
    current fill level into a [nc, 256] staging register; whenever the
    fill reaches 128 lanes, the aligned left half is flushed to the
    output (off only ever advances by 128) and the right half shifts
    down.  SMEM scalars + VMEM scratch persist across the sequential
    grid, carrying (fill, staging, total) between row blocks.
    """
    nc = n_chan + 1
    counts_ref = refs[0]                   # SMEM [R_BLK] per-row counts
    bound_ref = refs[1]                    # SMEM [grid] last active row + 1
    chan_refs = refs[2:2 + n_chan]
    out_ref, cnt_ref = refs[2 + n_chan:4 + n_chan]
    comp_ref, stage_ref, scal_ref = refs[4 + n_chan:]
    # scal_ref: [0] = flushed offset (multiple of 128), [1] = fill,
    #           [2] = total true lanes seen

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        scal_ref[0] = 0
        scal_ref[1] = 0
        scal_ref[2] = 0
        out_ref[:] = jnp.zeros_like(out_ref)
        stage_ref[:] = jnp.zeros_like(stage_ref)

    m2f = mask_ref[:]                              # [R_BLK, 128] f32 0/1
    block_count = jnp.sum(m2f).astype(jnp.int32)
    scal_ref[2] = scal_ref[2] + block_count

    @pl.when(block_count > 0)
    def _():
        chans = [r[:] for r in chan_refs]
        valid, comp = _butterfly_block(m2f, chans)
        # stage in scratch refs: values can't be dynamically row-indexed
        # inside the loop, refs can
        for ch in range(n_chan):
            comp_ref[ch] = jnp.where(valid > 0.0, comp[ch], 0.0)
        comp_ref[n_chan] = valid

        def row(r, _):
            # per-row counts come precomputed in SMEM: a VMEM scalar
            # read per (mostly empty) row iteration dominated the kernel
            c = counts_ref[r]

            @pl.when(c > 0)
            def _():
                fill = scal_ref[1]
                row_all = comp_ref[:, pl.ds(r, 1), :]  # [nc, 1, 128]
                padded = jnp.concatenate(
                    [row_all[:, 0, :],
                     jnp.zeros((nc, CHUNK), jnp.float32)], axis=1)
                stage_ref[:] = stage_ref[:] + _roll_right_dyn(padded,
                                                              fill)
                fill = fill + c

                @pl.when(fill >= CHUNK)
                def _():
                    off = pl.multiple_of(scal_ref[0], CHUNK)

                    # blocks past capacity are dropped (total keeps
                    # counting so the caller can report the overflow)
                    @pl.when(off <= size)
                    def _():
                        out_ref[:, pl.ds(off, CHUNK)] = \
                            stage_ref[:, 0:CHUNK]

                    stage_ref[:, 0:CHUNK] = stage_ref[:, CHUNK:2 * CHUNK]
                    stage_ref[:, CHUNK:2 * CHUNK] = jnp.zeros(
                        (nc, CHUNK), jnp.float32)
                    scal_ref[0] = off + CHUNK
                    scal_ref[1] = fill - CHUNK

                @pl.when(fill < CHUNK)
                def _():
                    scal_ref[1] = fill

            return 0

        # only loop the block's active span: empty-tail rows (the common
        # case after the caller's nonzero-row prefilter packs actives to
        # the front) cost nothing instead of a branch test each
        jax.lax.fori_loop(0, bound_ref[i], row, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        # final partial flush (staging lanes past fill are zeros, so the
        # validity channel stays 0 there)
        @pl.when((scal_ref[1] > 0) & (scal_ref[0] <= size))
        def _():
            off = pl.multiple_of(scal_ref[0], CHUNK)
            out_ref[:, pl.ds(off, CHUNK)] = stage_ref[:, 0:CHUNK]

        cnt_ref[0, 0] = scal_ref[2]


@partial(jax.jit, static_argnames=("size", "interpret"))
def compact_channels_pallas(mask: jnp.ndarray, channels, size: int,
                            interpret: bool = False):
    """Compact `channels` at the true lanes of `mask` into the first
    `count` columns of a [n_chan + 1, size + 128] array (last row =
    per-slot validity, 1.0/0.0).

    Args:
      mask: flat bool, length % 128 == 0.
      channels: tuple of flat f32 arrays like mask.
      size: static output capacity (multiple of 128).
    Returns:
      (packed [n_chan + 1, size + 128] f32, count i32 — number of true
      lanes, possibly > size; entries beyond `size` are dropped).
    """
    n = mask.shape[0]
    assert n % (R_BLK * CHUNK) == 0, n
    assert size % CHUNK == 0, size
    n_chan = len(channels)
    # f32 0/1 mask: bool (i1) vregs cannot be rolled/cast on Mosaic
    m2 = mask.reshape(-1, CHUNK).astype(jnp.float32)
    rows = m2.shape[0]
    grid = rows // R_BLK

    counts = jnp.sum(m2, axis=1).astype(jnp.int32)         # [rows]
    # per-block row-loop bound: index of the block's last nonzero row + 1
    # (0 for an all-empty block) — the kernel skips the empty tail
    nz = (counts > 0).reshape(grid, R_BLK)
    last = R_BLK - 1 - jnp.argmax(nz[:, ::-1], axis=1)
    bounds = jnp.where(jnp.any(nz, axis=1), last + 1, 0).astype(jnp.int32)

    kern = partial(_kernel, n_chan, size)
    out, cnt = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((R_BLK, CHUNK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_BLK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((grid,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec((R_BLK, CHUNK), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)] * n_chan,
        out_specs=[
            pl.BlockSpec((n_chan + 1, size + CHUNK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chan + 1, size + CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_chan + 1, R_BLK, CHUNK), jnp.float32),
            pltpu.VMEM((n_chan + 1, 2 * CHUNK), jnp.float32),
            pltpu.SMEM((3,), jnp.int32),
        ],
        interpret=interpret,
    )(m2, counts, bounds, *[c.reshape(-1, CHUNK) for c in channels])
    return out, cnt[0, 0]
