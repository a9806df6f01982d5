"""Pallas TPU kernel for the marching-squares segment layers (the
dense, pose-independent front of grid/raycast_fast.py::_segment_layers).

The XLA version of _segment_layers spends ~2.4 ms/extraction on a
1024^2 grid — not on arithmetic (~0.15 ms of VPU work) but on
materializing the ~20 intermediate [H, W] arrays its slice/pad/stack
structure keeps spilling to HBM.  This kernel computes each output
block in VMEM straight from the (VMEM-resident) TSD field and writes
ONLY the [4*H, W] layer mask (flat layer-major order, exactly as
_segment_layers produces) plus the per-128-lane-row counts the
caller's nonzero-row prefilter needs (replacing its [rows, 128] @
ones matvec).  Endpoint CHANNELS are not written at all: only ~0.1%
of mask rows are nonzero, so the caller recomputes endpoints for just
the selected rows (grid/raycast_fast.py::_channels_for_rows) instead
of this kernel writing — and the compaction re-reading — four dense
[4*H, W] channel arrays.

Grid: (H // QR row blocks,); each program computes ALL FOUR layers of
its QR quad rows from ONE shared quad evaluation (crossing flags,
corner values, clean masks — the r4 v1 kernel ran one layer per
program and re-derived the quad machinery ~7x per row block):
  0: marching-squares segment 1 (two-crossing join / saddle B-R|B-L),
  1: segment 2 (saddle T-L|T-R),
  2: virtual h-edge segments (NaN-adjacent crossings),
  3: virtual v-edge segments,
replicating the jnp MASK formulas verbatim (crossing tests, crossing
counts, the clean-quad suppression of virtual edges).  Layer 2
additionally evaluates the row-above
quads' clean mask from the same TSD rows instead of reading layer 0's
output — cheap VPU work against an extra HBM round-trip.

Built (and tested in interpret mode) against
grid/raycast_fast.py::_segment_layers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QR = 32           # quad rows per program (fewer, larger
                  # programs: per-program overhead dominated
                  # an 8-row version)
CHUNK = 128       # prefilter row width (ops/compact_pallas.py::CHUNK)


def supports_segment_kernel(grid) -> bool:
    H, W = grid.tsd.shape
    return (grid.tsd.dtype == jnp.float32
            and H * W * 4 <= 8 * 1024 * 1024
            and H % QR == 0 and W % CHUNK == 0 and H >= 3 * QR)


def _crossing(a, b):
    return ((a > 0) & (b < 0)) | ((a < 0) & (b > 0))


def _roll_l(x):
    """x shifted left by one lane (lane i takes lane i+1)."""
    return pltpu.roll(x, x.shape[-1] - 1, 1)


def _quad_parts(vtop, vbot):
    """Shared quad machinery for an [R, W] block of quad rows.

    vtop/vbot: tsd rows y / y+1.  Lane x is quad (y, x); lane W-1 is
    not a real quad (masked by the caller via the lane iota).
    Returns (quad_ok, cb, cr, ct, cl, v00, v01, v10, v11).
    """
    v00 = vtop
    v01 = _roll_l(vtop)
    v10 = vbot
    v11 = _roll_l(vbot)
    quad_ok = ~(jnp.isnan(v00) | jnp.isnan(v01)
                | jnp.isnan(v11) | jnp.isnan(v10))
    cb = _crossing(v00, v01)
    cr = _crossing(v01, v11)
    ct = _crossing(v10, v11)
    cl = _crossing(v00, v10)
    return quad_ok, cb, cr, ct, cl, v00, v01, v10, v11


def _clean_mask(vtop, vbot, lane_ok):
    """s1_mask (= "clean" quad: 2 or 4 crossings, all corners finite)
    for an [R, W] block — the suppression test of the virtual-edge
    layers (grid/raycast_fast.py::_segment_layers `clean`)."""
    quad_ok, cb, cr, ct, cl, *_ = _quad_parts(vtop, vbot)
    n = (cb.astype(jnp.int32) + cr.astype(jnp.int32)
         + ct.astype(jnp.int32) + cl.astype(jnp.int32))
    return quad_ok & ((n == 2) | (n == 4)) & lane_ok


def _kernel(H: int, W: int,
            tsd_ref, mask_ref, cnt_ref=None):
    g = pl.program_id(0)
    y0 = g * QR

    cur = tsd_ref[pl.ds(pl.multiple_of(y0, 8), QR), :]       # rows y0..
    nxt_base = jnp.minimum(y0 + QR, H - 8)
    nxt = tsd_ref[pl.ds(pl.multiple_of(nxt_base, 8), 8), :]  # row y0+QR
    prv_base = jnp.maximum(y0 - 8, 0)
    prv = tsd_ref[pl.ds(pl.multiple_of(prv_base, 8), 8), :]  # row y0-1

    # row j+1 for j in 0..QR-1: rows 1..QR-1 of cur + row 0 of nxt
    vbot = jnp.concatenate([cur[1:QR, :], nxt[0:1, :]], axis=0)
    # row j-1: last row of prv + rows 0..QR-2 of cur
    vtopm1 = jnp.concatenate([prv[7:8, :], cur[0:QR - 1, :]], axis=0)

    iox = jax.lax.broadcasted_iota(jnp.int32, (QR, W), 1)
    ioy = jax.lax.broadcasted_iota(jnp.int32, (QR, W), 0) + y0
    # quad lanes: x < W-1; quad rows: y < H-1
    quad_lane = (iox < W - 1) & (ioy < H - 1)

    # ---- shared quad machinery: ONE evaluation for quads (y, x) and
    # one for quads (y-1, x); every layer below derives from these ----
    quad_ok, cb, cr, ct, cl, v00, v01, v10, v11 = _quad_parts(cur, vbot)
    n_all = (cb.astype(jnp.int32) + cr.astype(jnp.int32)
             + ct.astype(jnp.int32) + cl.astype(jnp.int32))
    n_crossed = ((cb & quad_ok).astype(jnp.int32)
                 + (cr & quad_ok).astype(jnp.int32)
                 + (ct & quad_ok).astype(jnp.int32)
                 + (cl & quad_ok).astype(jnp.int32))
    # "clean" quad (the virtual-edge suppression test), pre-lane-mask
    clean_q = quad_ok & ((n_all == 2) | (n_all == 4))

    two = quad_ok & (n_crossed == 2)
    four = quad_ok & (n_crossed == 4)
    clean_here = clean_q & quad_lane                        # quad (y, x)

    def layer0():
        return (two | four) & quad_lane

    def layer1():
        return four & quad_lane

    def layer2():
        """Virtual h-edge (y, x): crossing along row y between x, x+1;
        suppressed when quad (y, x) or (y-1, x) is clean."""
        ev = cb & (iox < W - 1)                             # [QR, W]
        lane_up = (iox < W - 1) & ((ioy - 1) >= 0) & ((ioy - 1) < H - 1)
        clean_up = _clean_mask(vtopm1, cur, lane_up)        # quad (y-1, x)
        # clean_here rows beyond quad range are already masked via
        # quad_lane (h-edge rows run to H-1, quads to H-2)
        return ev & ~(clean_here | clean_up)

    def layer3():
        """Virtual v-edge (y, x): crossing along column x between rows
        y, y+1; suppressed when quad (y, x) or (y, x-1) is clean."""
        ev = cl & (ioy < H - 1)                             # [QR, W]
        # quad (y, x-1): shift the clean mask right by one lane
        clean_left = pltpu.roll(clean_here.astype(jnp.float32), 1,
                                1) > 0.5
        clean_left = clean_left & (iox >= 1)
        return ev & ~(clean_here | clean_left)

    nck = W // CHUNK
    iol = jax.lax.broadcasted_iota(jnp.int32, (QR, W), 1) // CHUNK
    iok = jax.lax.broadcasted_iota(jnp.int32, (QR, nck), 1)

    for k, fn in enumerate((layer0, layer1, layer2, layer3)):
        mf = fn().astype(jnp.float32)
        mask_ref[k, :, :] = mf

        if cnt_ref is not None:
            # per-CHUNK-lane-row counts for the caller's nonzero-row
            # prefilter
            cnt = jnp.zeros((QR, nck), jnp.float32)
            for c in range(nck):
                cc = jnp.sum(jnp.where(iol == c, mf, 0.0), axis=1,
                             keepdims=True)
                cnt = jnp.where(iok == c, cc, cnt)
            cnt_ref[k, :, :] = cnt.astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret", "emit_cnt"))
def segment_layers_pallas(tsd: jnp.ndarray, interpret: bool = False,
                          emit_cnt: bool = True):
    """Marching-squares layer MASKS straight from the TSD field.

    Returns (mask [4*H*W] f32 0/1, row_cnt [4*H*W/128] i32 or None) in
    _segment_layers' flat layer order.  Endpoint channels are NOT
    produced — the caller recomputes them for the handful of selected
    nonzero rows (grid/raycast_fast.py::_channels_for_rows), which cuts
    this kernel's HBM writes 5x and its VPU work ~3x (no edge
    interpolation, saddle decider, or first/last-edge selection here).
    emit_cnt=False also skips the in-kernel per-chunk counts (the
    caller then derives row counts with its MXU matvec).
    """
    H, W = tsd.shape
    NBY = H // QR
    kern = partial(_kernel, H, W)
    out_specs = [pl.BlockSpec((4, QR, W), lambda g: (0, g, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((4, H, W), jnp.float32)]
    if emit_cnt:
        out_specs.append(pl.BlockSpec((4, QR, W // CHUNK),
                                      lambda g: (0, g, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((4, H, W // CHUNK), jnp.int32))
    outs = pl.pallas_call(
        kern,
        grid=(NBY,),
        in_specs=[pl.BlockSpec((H, W), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(tsd)
    if emit_cnt:
        mask, cnt = outs
        return mask.reshape(-1), cnt.reshape(-1)
    return outs[0].reshape(-1), None
