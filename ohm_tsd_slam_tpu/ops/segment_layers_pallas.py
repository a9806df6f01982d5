"""Pallas TPU kernel for the marching-squares segment layers (the
dense, pose-independent front of grid/raycast_fast.py::_segment_layers).

The XLA version of _segment_layers spends ~2.4 ms/extraction on a
1024^2 grid — not on arithmetic (~0.15 ms of VPU work) but on
materializing the ~20 intermediate [H, W] arrays its slice/pad/stack
structure keeps spilling to HBM.  This kernel computes each output
block in VMEM straight from the (VMEM-resident) TSD field and writes
ONLY the five [4*H, W] layer outputs (mask + 4 endpoint channels, in
exactly the flat layer-major order _segment_layers produces) plus the
per-128-lane-row counts the caller's nonzero-row prefilter needs
(replacing its [rows, 128] @ ones matvec).

Grid: (4 layers, H // QR row blocks); each program computes one
layer's QR quad rows via lax.switch:
  0: marching-squares segment 1 (two-crossing join / saddle B-R|B-L),
  1: segment 2 (saddle T-L|T-R),
  2: virtual h-edge segments (NaN-adjacent crossings),
  3: virtual v-edge segments,
replicating the jnp formulas verbatim (crossing tests, a/(a-b) edge
interpolation, the bilinear saddle decider, the clean-quad suppression
of virtual edges).  Layers 2/3 recompute their neighbouring quads'
"clean" masks from the same TSD rows instead of reading layer 0's
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


def _frac(a, b):
    return a / (a - b)


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


def _kernel(H: int, W: int, s: float,
            tsd_ref, mask_ref, p0x_ref, p0y_ref, p1x_ref, p1y_ref,
            cnt_ref):
    l = pl.program_id(0)
    g = pl.program_id(1)
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
    xf = iox.astype(jnp.float32)
    yf = ioy.astype(jnp.float32)
    # quad lanes: x < W-1; quad rows: y < H-1
    quad_lane = (iox < W - 1) & (ioy < H - 1)

    def ms_full():
        """Segments 1/2: full marching squares on quad rows y0..y0+7."""
        quad_ok, cb, cr, ct, cl, v00, v01, v10, v11 = _quad_parts(
            cur, vbot)
        F = [cb & quad_ok, cr & quad_ok, ct & quad_ok, cl & quad_ok]
        n_crossed = sum(f.astype(jnp.int32) for f in F)

        Bx = (xf + 0.5 + _frac(v00, v01)) * s
        By = (yf + 0.5) * s
        Rx = (xf + 1.5) * s
        Ry = (yf + 0.5 + _frac(v01, v11)) * s
        Tx = (xf + 0.5 + _frac(v10, v11)) * s
        Ty = (yf + 1.5) * s
        Lx = (xf + 0.5) * s
        Ly = (yf + 0.5 + _frac(v00, v10)) * s
        Px = [Bx, Rx, Tx, Lx]
        Py = [By, Ry, Ty, Ly]

        # first/last crossed edge in B,R,T,L order (jnp argmax semantics)
        first = jnp.where(F[0], 0, jnp.where(F[1], 1,
                jnp.where(F[2], 2, jnp.where(F[3], 3, 0))))
        last = jnp.where(F[3], 3, jnp.where(F[2], 2,
               jnp.where(F[1], 1, jnp.where(F[0], 0, 3))))

        def pick(P, idx):
            out = P[0]
            for k in (1, 2, 3):
                out = jnp.where(idx == k, P[k], out)
            return out

        two = quad_ok & (n_crossed == 2)
        four = quad_ok & (n_crossed == 4)
        den = v00 + v11 - v01 - v10
        saddle = jnp.where(jnp.abs(den) > 0, (v00 * v11 - v01 * v10)
                           / jnp.where(den == 0.0, 1.0, den), 0.0)
        same00 = (saddle > 0) == (v00 > 0)
        return (two, four, same00, Px, Py, pick, first, last)

    def layer0():
        two, four, same00, Px, Py, pick, first, last = ms_full()
        m = (two | four) & quad_lane
        p0x = jnp.where(four, Px[0], pick(Px, first))
        p0y = jnp.where(four, Py[0], pick(Py, first))
        p1x = jnp.where(four, jnp.where(same00, Px[1], Px[3]),
                        pick(Px, last))
        p1y = jnp.where(four, jnp.where(same00, Py[1], Py[3]),
                        pick(Py, last))
        return m, p0x, p0y, p1x, p1y

    def layer1():
        two, four, same00, Px, Py, pick, first, last = ms_full()
        m = four & quad_lane
        p1x = jnp.where(same00, Px[3], Px[1])
        p1y = jnp.where(same00, Py[3], Py[1])
        return m, Px[2], Py[2], p1x, p1y

    def layer2():
        """Virtual h-edge (y, x): crossing along row y between x, x+1;
        suppressed when quad (y, x) or (y-1, x) is clean."""
        VIRT = jnp.float32(0.9 * s)
        ev = _crossing(cur, _roll_l(cur)) & (iox < W - 1)   # [QR, W]
        lane_ok = (iox < W - 1) & ((ioy - 0) < H - 1)
        clean_here = _clean_mask(cur, vbot, lane_ok)        # quad (y, x)
        lane_up = (iox < W - 1) & ((ioy - 1) >= 0) & ((ioy - 1) < H - 1)
        clean_up = _clean_mask(vtopm1, cur, lane_up)        # quad (y-1, x)
        # clean_here rows beyond quad range are already masked via
        # lane_ok (h-edge rows run to H-1, quads to H-2)
        m = ev & ~(clean_here | clean_up)
        fh = _frac(cur, _roll_l(cur))
        hx = (xf + 0.5 + fh) * s
        hy = (yf + 0.5) * s
        return m, hx, hy - VIRT, hx, hy + VIRT

    def layer3():
        """Virtual v-edge (y, x): crossing along column x between rows
        y, y+1; suppressed when quad (y, x) or (y, x-1) is clean."""
        VIRT = jnp.float32(0.9 * s)
        ev = _crossing(cur, vbot) & (ioy < H - 1)           # [QR, W]
        lane_ok = (iox < W - 1) & (ioy < H - 1)
        clean_here = _clean_mask(cur, vbot, lane_ok)        # quad (y, x)
        # quad (y, x-1): shift the clean mask right by one lane
        clean_left = pltpu.roll(clean_here.astype(jnp.float32), 1,
                                1) > 0.5
        clean_left = clean_left & (iox >= 1)
        m = ev & ~(clean_here | clean_left)
        fv = _frac(cur, vbot)
        vy = (yf + 0.5 + fv) * s
        vx = (xf + 0.5) * s
        return m, vx - VIRT, vy, vx + VIRT, vy

    def emit(layer_fn):
        m, p0x, p0y, p1x, p1y = layer_fn()
        mf = m.astype(jnp.float32)
        mask_ref[:, :] = mf
        p0x_ref[:, :] = p0x
        p0y_ref[:, :] = p0y
        p1x_ref[:, :] = p1x
        p1y_ref[:, :] = p1y

        # per-CHUNK-lane-row counts for the caller's nonzero-row
        # prefilter
        nck = W // CHUNK
        iol = jax.lax.broadcasted_iota(jnp.int32, (QR, W), 1) // CHUNK
        cnt = jnp.zeros((QR, nck), jnp.float32)
        iok = jax.lax.broadcasted_iota(jnp.int32, (QR, nck), 1)
        for c in range(nck):
            cc = jnp.sum(jnp.where(iol == c, mf, 0.0), axis=1,
                         keepdims=True)
            cnt = jnp.where(iok == c, cc, cnt)
        cnt_ref[:, :] = cnt.astype(jnp.int32)

    # Mosaic cannot legalize value-returning conditionals (scf.if over
    # vectors), so each layer is a predicated compute+store block
    for k, fn in enumerate((layer0, layer1, layer2, layer3)):
        @pl.when(l == k)
        def _(fn=fn):
            emit(fn)


@partial(jax.jit, static_argnames=("cell_size", "interpret"))
def segment_layers_pallas(tsd: jnp.ndarray, cell_size,
                          interpret: bool = False):
    """Marching-squares layer stacks straight from the TSD field.

    Returns (mask [4*H*W] f32 0/1, (p0x, p0y, p1x, p1y) flat f32,
    row_cnt [4*H*W/128] i32) in _segment_layers' flat layer order.
    """
    H, W = tsd.shape
    NBY = H // QR
    kern = partial(_kernel, H, W, float(cell_size))
    outs = pl.pallas_call(
        kern,
        grid=(4, NBY),
        in_specs=[pl.BlockSpec((H, W), lambda l, g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((QR, W), lambda l, g: (l * NBY + g, 0),
                                memory_space=pltpu.VMEM)] * 5 + [
            pl.BlockSpec((QR, W // CHUNK),
                         lambda l, g: (l * NBY + g, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((4 * H, W), jnp.float32)] * 5
        + [jax.ShapeDtypeStruct((4 * H, W // CHUNK), jnp.int32)],
        interpret=interpret,
    )(tsd)
    mask, p0x, p0y, p1x, p1y, cnt = outs
    flat = lambda a: a.reshape(-1)
    return (flat(mask), (flat(p0x), flat(p0y), flat(p1x), flat(p1y)),
            cnt.reshape(-1))
