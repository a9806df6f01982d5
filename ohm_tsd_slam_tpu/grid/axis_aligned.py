"""Axis-aligned surface extraction → occupancy grid.

TPU-native redesign of RayCastAxisAligned2D::calcCoords
(src/obvision/reconstruct/grid/RayCastAxisAligned2D.cpp:13-105) plus the
occupancy-grid assembly of ThreadGrid::eventLoop
(src/ThreadGrid.cpp:72-133).

The reference walks partitions (skipping the outer ring), scanning rows
then columns for TSD sign changes and filling a char buffer with
free(0)/unknown(-1); ThreadGrid then stamps occupied(100) at the rounded
crossing coordinates, optionally inflating.  Here the whole map is
evaluated as dense [H, W] comparisons of adjacent cells — one fused
vectorized kernel, no per-partition loops.  The reference's
half-cell-offset crossing coordinates (it omits the +0.5·cellSize cell
center shift, RayCastAxisAligned2D.cpp:54-55) are replicated so occupancy
indices bit-match.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ohm_tsd_slam_tpu.grid.state import TsdGrid


class OccupancyResult(NamedTuple):
    occupancy: jnp.ndarray  # [H, W] int8: -1 unknown, 0 free, 100 occupied
    n_surface: jnp.ndarray  # number of surface crossings found


def _interior_cell_mask(grid: TsdGrid) -> jnp.ndarray:
    """Cells belonging to tiles outside the outer tile ring
    (RayCastAxisAligned2D.cpp:25-27 skips y,x in {0, T-1})."""
    p = grid.tile_dim
    iy = jnp.arange(grid.cells_y) // p
    ix = jnp.arange(grid.cells_x) // p
    ok_y = (iy >= 1) & (iy <= grid.tiles_y - 2)
    ok_x = (ix >= 1) & (ix <= grid.tiles_x - 2)
    return ok_y[:, None] & ok_x[None, :]


def occupancy_grid(grid: TsdGrid, use_inflation: bool = False,
                   inflation_factor: int = 2) -> OccupancyResult:
    """Extract the occupancy grid.

    free/unknown chars: cells of initialized interior tiles are 0 where
    tsd > 0 else -1 (RayCastAxisAligned2D.cpp:43-49); cells of
    empty-but-unmaterialized tiles are 0 (:87-101); everything else -1.

    occupied: TSD zero crossings along rows and columns, sub-cell
    interpolated, stamped at round(x/cellSize) with bounds check
    u,v in (0, W)x(0, H) (ThreadGrid.cpp:96-118).
    """
    p = grid.tile_dim
    tsd = grid.tsd
    interior = _interior_cell_mask(grid)

    cell_init = jnp.repeat(jnp.repeat(grid.tile_init, p, 0), p, 1)
    cell_empty = jnp.repeat(
        jnp.repeat(~grid.tile_init & (grid.tile_initw > 0.0), p, 0), p, 1)

    occ = jnp.full(tsd.shape, -1, jnp.int8)
    occ = jnp.where(interior & cell_init & (tsd > 0.0), 0, occ)
    occ = jnp.where(interior & cell_empty, 0, occ)

    # ---- surface crossings --------------------------------------------
    # A pair is scanned when the tile owning its *first* cell is an
    # initialized interior tile (rows incl. the halo are covered by the
    # dense adjacency; duplicates across tile borders collapse).
    def crossings(a, b):
        return (a > 0) & (b < 0) | ((a < 0) & (b > 0))

    s = grid.cell_size

    # horizontal pairs: (gy, gx-1) -> (gy, gx)
    a = tsd[:, :-1]
    b = tsd[:, 1:]
    hmask = crossings(a, b) & interior[:, :-1] & cell_init[:, :-1]
    hinterp = a / (a - b)
    # x = (gx-1 + interp)·s  (reference formula, half-cell quirk);
    # u = round(x/s), v = gy
    gx = jnp.arange(1, tsd.shape[1])
    hu = jnp.floor(gx[None, :] - 1.0 + hinterp + 0.5).astype(jnp.int32)
    hv = jnp.broadcast_to(jnp.arange(tsd.shape[0])[:, None], hu.shape)

    # vertical pairs: (gy-1, gx) -> (gy, gx)
    a2 = tsd[:-1, :]
    b2 = tsd[1:, :]
    vmask = crossings(a2, b2) & interior[:-1, :] & cell_init[:-1, :]
    vinterp = a2 / (a2 - b2)
    gy = jnp.arange(1, tsd.shape[0])
    vv = jnp.floor(gy[:, None] - 1.0 + vinterp + 0.5).astype(jnp.int32)
    vu = jnp.broadcast_to(jnp.arange(tsd.shape[1])[None, :], vv.shape)

    H, W = tsd.shape
    occupied = jnp.zeros((H, W), bool)

    def stamp(occupied, u, v, m):
        ok = m & (u > 0) & (u < W) & (v > 0) & (v < H)
        uc = jnp.clip(u, 0, W - 1)
        vc = jnp.clip(v, 0, H - 1)
        return occupied.at[vc.ravel(), uc.ravel()].max(ok.ravel())

    occupied = stamp(occupied, hu, hv, hmask)
    occupied = stamp(occupied, vu, vv, vmask)

    if use_inflation and inflation_factor > 0:
        # ThreadGrid.cpp:105-114: window [v-f, v+f) x [u-f, u+f)
        f = inflation_factor
        base = occupied
        for dy in range(-f, f):
            for dx in range(-f, f):
                occupied = occupied | jnp.roll(base, (dy, dx), (0, 1))

    occ = jnp.where(occupied, 100, occ).astype(jnp.int8)
    n = jnp.sum(hmask) + jnp.sum(vmask)
    return OccupancyResult(occ, n)


occupancy_grid_jit = jax.jit(occupancy_grid,
                             static_argnames=("use_inflation",
                                              "inflation_factor"))
