"""Pallas TPU kernel for the exact-march window replay + surface
normals (the gather-bound tail of grid/raycast_fast.py).

STATUS: correct but currently SLOWER than the XLA path it replaces —
on-chip it reproduces the jnp replay exactly (bench-validated: 0
differing beams), but at ~6.5 ms/scan vs 2.6 ms, because the per-beam
one-hot tap extraction (12 samples x 4 corners x two [NTAP, PATCH]
masked dots, sequential over 1081 beams) costs more than the serial XLA
gathers it was built to avoid.  It is gated OFF in production
(grid/raycast_fast.py::USE_WINDOW_KERNEL) and kept as a validated
building block: the patch-resident access pattern is the right shape
for a future multi-beam-vectorized revision.

XLA lowers the replay's random bilinear taps (WINDOW samples x 4 corners
per beam, plus 16 normal taps) to serial per-element gathers at ~45-65
ns/element — ~2.3 ms of the per-scan raycast.  This kernel keeps the
whole TSD grid VMEM-resident and, per beam:

  1. loads ONE [PATCH_R, PATCH_C] patch covering the beam's whole window
     (consecutive march samples advance <= 1 cell/step, so the window's
     bounding box is tiny; the patch base row is dynamic, the base
     column is dynamic but 128-aligned — both Mosaic-legal);
  2. extracts all sample corner taps with one one-hot matmul per corner
     (RowSel [N, PATCH_R] @ patch, then a column one-hot mask-reduce) —
     index arithmetic stays fully vectorized on lanes, no per-sample
     scalar loops;
  3. replays the exact-march event scan (RayCastPolar2D.cpp:237-270
     semantics: +to- hit, -to+ back-face reject, NaN-invalid samples) on
     [1, WINDOW] vectors;
  4. computes the crossing position and the reference's central-
     difference surface normal (TsdGrid.cpp:517-546) from 4 more
     bilinear samples out of the same patch.

Bilinear semantics replicate grid/interpolate.py::interpolate_bilinear
exactly: out-of-bounds corner taps read NaN, a sample is SUCCESS iff its
base cell is in bounds, its owning tile is initialized, and the blended
value is non-NaN.

Per-beam attributes ride in SMEM (scalar-indexed reads; a VMEM row would
need dynamic lane indexing, which Mosaic forbids).  The grid must fit
VMEM: gated by supports_window_kernel() (f32, H*W*4 <= 8 MB — the
1024^2 reference default is 4 MB).

Built (and tested in interpret mode) against
grid/raycast_fast.py::_window_events + grid/interpolate.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_BLK = 128
# patch rows: window extent (<= WINDOW + normal margin ~13) + up to 7
# rows of sublane alignment (Mosaic requires dynamic VMEM sublane
# offsets to be provable multiples of 8)
PATCH_R = 24
PATCH_C = 256
NTAP = 8          # tap-batch width (>= window and >= 4, multiple of 8)


def supports_window_kernel(grid) -> bool:
    H, W = grid.tsd.shape
    # The patch base is aligned DOWN after clipping to H-PATCH_R /
    # W-PATCH_C, so those clip limits must themselves be sublane/lane
    # aligned or a window near the top/right edge can lose up to 7 rows
    # / 127 cols of coverage (out-of-patch taps silently read 0.0).
    return (grid.tsd.dtype == jnp.float32
            and H * W * 4 <= 8 * 1024 * 1024
            and W >= PATCH_C and H >= PATCH_R
            and (H - PATCH_R) % 8 == 0 and (W - PATCH_C) % 128 == 0)


def _kernel(window: int, s: float, H: int, W: int, tiles_x: int,
            tiles_y: int, tile_dim: int,
            twp_ref, rayx_ref, rayy_ref, idxmax_ref, has_ref,
            trx_ref, try_ref,
            tsd_ref, tile_ref, out_ref, patch_ref, nanp_ref):
    """One program per beam block; per-beam sequential replay.

    SMEM rows (length B): twp (window start t), rayx/rayy (step vector),
    idxmax, has (1.0 = candidate present), trx/try (sensor origin).
    tsd_ref: [H, W] VMEM.  tile_ref: [1, TY*TX] SMEM (1.0 = initialized).
    out_ref: [B_BLK, 8] — hit, any_ev, posx, posy, interp, nx, ny, n_ok.
    patch_ref/nanp_ref: [PATCH_R, PATCH_C] VMEM scratch — the patch is
    stored NaN-SANITIZED (NaN -> 0) with the NaN-ness in a parallel 0/1
    mask: the one-hot dot extraction would otherwise poison every tap
    with 0 * NaN = NaN from unrelated patch cells.
    """
    assert window <= NTAP
    b0 = pl.program_id(0) * B_BLK

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, NTAP), 1)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (NTAP, PATCH_C), 1)
    iota_row = jax.lax.broadcasted_iota(jnp.int32, (NTAP, PATCH_R), 1)

    def tap_batch(pxs, pys, live, row_base, col_base):
        """Bilinear values for NTAP sample positions ([1, NTAP] lane
        vectors; `live` masks real samples).  Returns [1, NTAP] values
        (NaN = invalid sample, matching interpolate_bilinear)."""
        u = pxs / s - 0.5
        v = pys / s - 0.5
        ixf = jnp.floor(u)
        iyf = jnp.floor(v)
        wx = u - ixf
        wy = v - iyf
        ix = ixf.astype(jnp.int32)
        iy = iyf.astype(jnp.int32)
        valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H))
        tx = jnp.clip(ix // tile_dim, 0, tiles_x - 1)
        ty = jnp.clip(iy // tile_dim, 0, tiles_y - 1)
        tflat = ty * tiles_x + tx                      # [1, NTAP] i32

        # tile-init lookup: scalar SMEM reads, lane j extracted/written
        # via one-hot compares (values cannot be dynamically indexed)
        def tile_one(j, tok):
            idx = jnp.sum(jnp.where(iota_n == j, tflat, 0))
            t = tile_ref[0, idx]
            return jnp.where(iota_n == j, t, tok)

        tok = jax.lax.fori_loop(0, NTAP, tile_one,
                                jnp.zeros((1, NTAP), jnp.float32))
        tile_ok = tok > 0.0

        r0 = iy - row_base
        c0 = ix - col_base

        def corner(dr, dc):
            rr = iy + dr
            cc = ix + dc
            oob = (rr < 0) | (rr >= H) | (cc < 0) | (cc >= W)
            rowsel = (iota_row
                      == (r0 + dr).reshape(NTAP, 1)).astype(jnp.float32)
            coloh = (iota_col
                     == (c0 + dc).reshape(NTAP, 1)).astype(jnp.float32)
            rows = jax.lax.dot(rowsel, patch_ref[:, :],
                               preferred_element_type=jnp.float32)
            tap = jnp.sum(rows * coloh, axis=1, keepdims=True).T
            nrows = jax.lax.dot(rowsel, nanp_ref[:, :],
                                preferred_element_type=jnp.float32)
            tap_nan = jnp.sum(nrows * coloh, axis=1, keepdims=True).T
            return jnp.where(oob | (tap_nan > 0.5), jnp.nan,
                             tap)                     # [1, NTAP]

        t00 = corner(0, 0)
        t01 = corner(0, 1)
        t10 = corner(1, 0)
        t11 = corner(1, 1)
        # exact tap ordering/weights of TsdGridPartition::
        # interpolateBilinear (TsdGridPartition.h:214-221)
        val = (t00 * (1.0 - wy) * (1.0 - wx)
               + t10 * wy * (1.0 - wx)
               + t01 * (1.0 - wy) * wx
               + t11 * wy * wx)
        ok = valid & tile_ok & ~jnp.isnan(val) & live
        return jnp.where(ok, val, jnp.nan)

    def beam(r, _):
        b = b0 + r
        twp = twp_ref[0, b]
        rayx = rayx_ref[0, b]
        rayy = rayy_ref[0, b]
        idx_max = idxmax_ref[0, b]
        has = has_ref[0, b]
        trx = trx_ref[0, b]
        try_ = try_ref[0, b]

        live_w = iota_n < window
        t_w = twp + iota_n.astype(jnp.float32)          # [1, NTAP]
        pxs = trx + t_w * rayx
        pys = try_ + t_w * rayy

        # one patch covers window + normal stencil (extent <= window
        # cells + 2-cell margin; PATCH 16x256 with 128-aligned columns)
        u0 = trx + twp * rayx
        u1 = trx + (twp + (window - 1)) * rayx
        v0 = try_ + twp * rayy
        v1 = try_ + (twp + (window - 1)) * rayy
        r_min = jnp.floor(jnp.minimum(v0, v1) / s - 0.5)
        c_min = jnp.floor(jnp.minimum(u0, u1) / s - 0.5)
        row_raw = jnp.clip(r_min.astype(jnp.int32) - 2, 0, H - PATCH_R)
        row_base = pl.multiple_of((row_raw // 8) * 8, 8)
        col_raw = jnp.clip(c_min.astype(jnp.int32) - 2, 0, W - PATCH_C)
        col_base = pl.multiple_of((col_raw // 128) * 128, 128)
        raw = tsd_ref[pl.ds(row_base, PATCH_R), pl.ds(col_base, PATCH_C)]
        is_nan = jnp.isnan(raw)
        patch_ref[:, :] = jnp.where(is_nan, 0.0, raw)
        nanp_ref[:, :] = jnp.where(is_nan, 1.0, 0.0)

        v = tap_batch(pxs, pys, live_w, row_base, col_base)

        # event scan (grid/raycast_fast.py::_window_events) on the first
        # `window` lanes
        v_prev = v[:, :NTAP - 1]
        v_cur = v[:, 1:]
        iota_e = jax.lax.broadcasted_iota(jnp.int32, (1, NTAP - 1), 1)
        in_win = iota_e < (window - 1)
        sample_ok = ((t_w[:, 1:] - 1.0) <= idx_max) & in_win
        ev_pos = (v_prev > 0) & (v_cur < 0) & sample_ok
        ev_neg = (v_prev < 0) & (v_cur > 0) & sample_ok
        ev = ev_pos | ev_neg
        any_ev = jnp.any(ev) & (has > 0.0)
        k_ev = jnp.min(jnp.where(ev, iota_e, jnp.int32(NTAP)))
        k_ev = jnp.minimum(k_ev, window - 2)
        oh_k = (iota_e == k_ev)
        hit = any_ev & (jnp.sum(jnp.where(ev_pos & oh_k, 1.0, 0.0)) > 0)
        vp = jnp.sum(jnp.where(oh_k, v_prev, 0.0))
        vc = jnp.sum(jnp.where(oh_k, v_cur, 0.0))
        interp = vp / (vp - vc)
        t_ev = twp + (k_ev + 1).astype(jnp.float32)
        pos_x = trx + t_ev * rayx
        pos_y = try_ + t_ev * rayy

        # crossing + central-difference normal (TsdGrid.cpp:517-546):
        # 4 samples (+x, -x, +y, -y) on lanes 0..3, rest dummies
        cx = pos_x + rayx * (interp - 1.0)
        cy = pos_y + rayy * (interp - 1.0)
        sel = lambda k: (iota_n == k).astype(jnp.float32)
        npx = cx + s * sel(0) - s * sel(1)
        npy = cy + s * sel(2) - s * sel(3)
        live_n = iota_n < 4
        nv = tap_batch(npx, npy, live_n, row_base, col_base)
        nfin = ~jnp.isnan(jnp.where(live_n, nv, 0.0))
        n_ok = jnp.all(nfin)
        xp = jnp.sum(jnp.where(iota_n == 0, nv, 0.0))
        xm = jnp.sum(jnp.where(iota_n == 1, nv, 0.0))
        yp = jnp.sum(jnp.where(iota_n == 2, nv, 0.0))
        ym = jnp.sum(jnp.where(iota_n == 3, nv, 0.0))
        nx = xp - xm
        ny = yp - ym
        norm = jnp.sqrt(nx * nx + ny * ny)
        denom = jnp.where(norm > 0, norm, 1.0)
        n_ok = n_ok & (norm > 0)
        nxn = jnp.where(n_ok, nx / denom, jnp.nan)
        nyn = jnp.where(n_ok, ny / denom, jnp.nan)

        # assemble the row as ONE vector (Mosaic cannot store scalars to
        # VMEM); nested wheres, not one-hot multiplies — a NaN
        # interp/normal times a 0 mask would poison other lanes
        io8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        row = jnp.where(io8 == 0, jnp.where(hit, 1.0, 0.0),
              jnp.where(io8 == 1, jnp.where(any_ev, 1.0, 0.0),
              jnp.where(io8 == 2, pos_x,
              jnp.where(io8 == 3, pos_y,
              jnp.where(io8 == 4, interp,
              jnp.where(io8 == 5, nxn,
              jnp.where(io8 == 6, nyn,
                        jnp.where(n_ok, 1.0, 0.0))))))))
        return row

    # beams in groups of 8: dynamic VMEM sublane stores must be provable
    # multiples of 8, so each group accumulates its rows in registers
    # and stores one aligned [8, 8] block
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)

    def group(g, _):
        def one(k, acc):
            row = beam(g * 8 + k, 0)
            return jnp.where(sub8 == k, jnp.broadcast_to(row, (8, 8)),
                             acc)

        acc = jax.lax.fori_loop(0, 8, one,
                                jnp.zeros((8, 8), jnp.float32))
        out_ref[pl.ds(pl.multiple_of(g * 8, 8), 8), :] = acc
        return 0

    jax.lax.fori_loop(0, B_BLK // 8, group, 0)


def window_normals_pallas(grid, t_w0, ray, idx_max, has_cand, tr,
                          window: int, interpret: bool = False):
    """Fused window replay + normals.

    Args:
      grid: TsdGrid (f32, VMEM-fitting; see supports_window_kernel).
      t_w0: [B] first window sample t (idx_min + m_start).
      ray: [B, 2] step vectors; idx_max: [B]; has_cand: [B] bool;
      tr: [2] sensor origin.
      window: number of replay samples (raycast_fast.WINDOW, <= NTAP).
    Returns:
      (hit [B] bool, any_ev [B] bool, pos_ev [B,2], interp [B],
       normals [B,2], n_ok [B] bool) — pos_ev/interp as in
       _window_events; normals at the crossing (NaN where not ok).
    """
    B = t_w0.shape[0]
    pad = (-B) % B_BLK
    Bp = B + pad

    def row(v, fill=0.0):
        v = v.astype(jnp.float32)
        if pad:
            v = jnp.pad(v, (0, pad), constant_values=fill)
        return v.reshape(1, Bp)

    attrs = (row(t_w0), row(ray[:, 0]), row(ray[:, 1]),
             row(idx_max, -1.0), row(has_cand.astype(jnp.float32)),
             jnp.broadcast_to(tr[0].astype(jnp.float32), (1, Bp)),
             jnp.broadcast_to(tr[1].astype(jnp.float32), (1, Bp)))

    H, W = grid.tsd.shape
    tiles = grid.tile_init.astype(jnp.float32).reshape(1, -1)
    kern = partial(_kernel, window, float(grid.cell_size), H, W,
                   grid.tiles_x, grid.tiles_y, grid.tile_dim)
    out = pl.pallas_call(
        kern,
        grid=(Bp // B_BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 7 + [
            pl.BlockSpec((H, W), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((B_BLK, 8), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((PATCH_R, PATCH_C), jnp.float32),
                        pltpu.VMEM((PATCH_R, PATCH_C), jnp.float32)],
        interpret=interpret,
    )(*attrs, grid.tsd, tiles)

    out = out[:B]
    hit = out[:, 0] > 0
    any_ev = out[:, 1] > 0
    pos_ev = out[:, 2:4]
    interp = out[:, 4]
    normals = out[:, 5:7]
    n_ok = out[:, 7] > 0
    return hit, any_ev, pos_ev, interp, normals, n_ok
