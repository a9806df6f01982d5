"""Fast TPU raycast: crossing-splat + MXU presence + exact window refine.

Motivation: XLA lowers random 2D gathers to a ~11 ns/element serial path
on TPU, so the dense [beams x steps] march of grid/raycast.py spends
~60 ms in gathers per 1081-beam scan.  This kernel reformulates the
search so the heavy work runs on dense element-wise ops and one MXU
matmul, leaving only O(beams) gathers:

  1. surface extraction: TSD sign changes between adjacent cells, found
     densely over the whole grid (pure element-wise; every bilinear
     zero-crossing along any ray lies in a cell quad with mixed-sign
     corners, so every possible march event is covered);
  2. butterfly compaction of the ~10-50k crossing pairs to a fixed-size
     list (scatter-free jnp.nonzero replacement; the interpolation
     fraction rides along as a value channel);
  3. per-beam candidate: a masked min-reduction over the
     [crossings, beams] grid picks each beam's earliest in-band,
     in-clip-window crossing (band half-width grows as 1.5 cells /
     range, covering beam quantization near the sensor);
  4. the candidate step seeds a window where
     the EXACT march of RayCastPolar2D.cpp:237-270 (bilinear taps at
     idx_min + integer steps, +→− hit, −→+ back-face reject, NaN skip)
     is then replayed over a ±WINDOW-step window around the candidate —
     only O(beams·window) gathers.

Model points agree with the exact march wherever the first event falls
inside the refined window (validated against grid/raycast.py in tests);
the window can in principle miss events displaced by more than WINDOW
steps from the nearest cell-level crossing, which does not occur for
truncation bands >= 2 cells.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ohm_tsd_slam_tpu.core import se2
from ohm_tsd_slam_tpu.grid.compact import compact_mask_values
from ohm_tsd_slam_tpu.grid.interpolate import (
    INTERPOLATE_SUCCESS,
    interpolate_bilinear,
    interpolate_normal,
)
from ohm_tsd_slam_tpu.grid.raycast import RaycastResult
from ohm_tsd_slam_tpu.grid.state import TsdGrid
from ohm_tsd_slam_tpu.sensor.polar2d import SensorPolar2D

# max crossing pairs kept; crossings beyond this are dropped (a 1024^2
# map of corridors has ~10-30k surface pairs)
MAX_CROSSINGS = 32768
WINDOW = 12          # refine samples; candidate sits ~1/3 in


def _crossing_points(grid: TsdGrid):
    """Dense H/V adjacent-cell sign changes -> compacted world points.

    Returns (points [C,2], valid [C]).
    """
    s = grid.cell_size
    tsd = grid.tsd
    H, W = tsd.shape

    a_h = tsd[:, :-1]
    b_h = tsd[:, 1:]
    ev_h = ((a_h > 0) & (b_h < 0)) | ((a_h < 0) & (b_h > 0))
    interp_h = a_h / (a_h - b_h)

    a_v = tsd[:-1, :]
    b_v = tsd[1:, :]
    ev_v = ((a_v > 0) & (b_v < 0)) | ((a_v < 0) & (b_v > 0))
    interp_v = a_v / (a_v - b_v)

    # pad the pair grids back to [H, W] so one compaction covers both;
    # compact_mask_values is the scatter-free jnp.nonzero replacement
    # (TPU's serial scatter made nonzero cost ~21 ms on a 1024^2 grid);
    # the interpolation fractions ride through the compaction as a value
    # channel, avoiding two more 32k-element gathers afterwards
    ev = jnp.stack([
        jnp.pad(ev_h, ((0, 0), (0, 1))),
        jnp.pad(ev_v, ((0, 1), (0, 0))),
    ])
    interp = jnp.stack([
        jnp.pad(interp_h, ((0, 0), (0, 1))),
        jnp.pad(interp_v, ((0, 1), (0, 0))),
    ])
    flat_idx, f, valid = compact_mask_values(
        ev.reshape(-1), interp.reshape(-1), MAX_CROSSINGS)
    which = flat_idx // (H * W)
    rem = flat_idx - which * (H * W)
    iyc = rem // W
    ixc = rem - iyc * W

    # crossing between cell centers (i+0.5)s and (i+1.5)s
    is_h = which == 0
    f = jnp.where(valid, f, 0.0)
    px = (ixc.astype(tsd.dtype) + 0.5 + jnp.where(is_h, f, 0.0)) * s
    py = (iyc.astype(tsd.dtype) + 0.5 + jnp.where(is_h, 0.0, f)) * s
    return jnp.stack([px, py], axis=-1), valid


def raycast_fast(grid: TsdGrid, geom: SensorPolar2D,
                 pose: jnp.ndarray) -> RaycastResult:
    dtype = grid.tsd.dtype
    s = grid.cell_size
    B = geom.size
    Bp = ((B + 127) // 128) * 128

    rays_local = geom.rays_local(dtype)
    rays_world = se2.rotate_vectors(pose.astype(dtype), rays_local)
    ray = rays_world * s
    tr = se2.translation(pose).astype(dtype)

    # ---- per-beam clipping (identical to grid/raycast.py) --------------
    inside = grid.is_inside(tr)
    big = jnp.asarray(10e9, dtype)
    def_min = jnp.where(inside, -big, big)
    def_max = jnp.where(inside, big, -big)
    xdim = (grid.cells_x - 1) * s
    ydim = (grid.cells_y - 1) * s
    rx, ry = ray[:, 0], ray[:, 1]
    use_x = jnp.abs(rx) > 10e-6
    use_y = jnp.abs(ry) > 10e-6
    xmin = jnp.where(use_x, (jnp.where(rx > 0.0, 0.0, xdim) - tr[0]) / rx, def_min)
    ymin = jnp.where(use_y, (jnp.where(ry > 0.0, 0.0, ydim) - tr[1]) / ry, def_min)
    xmax = jnp.where(use_x, (jnp.where(rx > 0.0, xdim, 0.0) - tr[0]) / rx, def_max)
    ymax = jnp.where(use_y, (jnp.where(ry > 0.0, ydim, 0.0) - tr[1]) / ry, def_max)
    idx_min = jnp.maximum(jnp.maximum(xmin, ymin), 0.0)
    idx_min = jnp.maximum(idx_min, geom.min_range / s)
    idx_max = jnp.minimum(jnp.minimum(xmax, ymax), geom.max_range / s)
    feasible = idx_min < idx_max

    # ---- crossing splat ------------------------------------------------
    points, cvalid = _crossing_points(grid)
    rel = points - tr
    r_c = jnp.linalg.norm(rel, axis=-1)                 # meters
    t_c = r_c / s                                       # steps
    # local beam angle exactly as backProject: atan2 in the sensor frame
    # R^T applied elementwise (exact f32; see se2.transform_points note)
    Rp = pose.astype(dtype)
    rel_local = jnp.stack([Rp[0, 0] * rel[:, 0] + Rp[1, 0] * rel[:, 1],
                           Rp[0, 1] * rel[:, 0] + Rp[1, 1] * rel[:, 1]],
                          axis=-1)
    phi_local = jnp.arctan2(rel_local[:, 1], rel_local[:, 0])
    u = (phi_local - geom.phi_min) / geom.angular_res

    band = jnp.maximum(1.0, 1.5 / jnp.maximum(t_c, 1.0)
                       / geom.angular_res * 1.0)

    # earliest in-band crossing per beam: one masked min-reduction over
    # the [crossings, beams] grid (cheaper and exact, vs the previous
    # banded-one-hot MXU splat which quantized t into unit bins and
    # needed a [C,K] second operand)
    bgrid = jnp.arange(Bp, dtype=dtype)
    pad_b = Bp - B
    lo = jnp.pad(jnp.floor(idx_min) - 1.0, (0, pad_b))
    hi = jnp.pad(jnp.ceil(idx_max) + 1.0, (0, pad_b))
    ok = ((jnp.abs(u[:, None] - bgrid[None, :]) <= band[:, None])
          & cvalid[:, None]
          & (t_c[:, None] >= lo[None, :])
          & (t_c[:, None] <= hi[None, :]))
    big = jnp.asarray(jnp.inf, dtype)
    t_first = jnp.min(jnp.where(ok, t_c[:, None], big), axis=0)[:B]
    has_cand = jnp.isfinite(t_first) & feasible
    k_cand = jnp.where(has_cand, t_first, 0.0)

    # ---- exact window refine (replays RayCastPolar2D.cpp:237-270) ------
    m_start = jnp.maximum(jnp.floor(k_cand - idx_min) - 4.0, 0.0)
    j = jnp.arange(WINDOW, dtype=dtype)
    t_w = idx_min[:, None] + m_start[:, None] + j[None, :]   # [B, W]
    pos = tr + t_w[..., None] * ray[:, None, :]
    tsd_w, code_w = interpolate_bilinear(grid, pos)
    v = jnp.where(code_w == INTERPOLATE_SUCCESS, tsd_w, jnp.nan)

    # loop condition i <= idx_max with i = t - 1 (see raycast.py)
    sample_ok = (t_w[:, 1:] - 1.0) <= idx_max[:, None]
    v_prev = v[:, :-1]
    v_cur = v[:, 1:]
    ev_pos = (v_prev > 0) & (v_cur < 0) & sample_ok
    ev_neg = (v_prev < 0) & (v_cur > 0) & sample_ok
    ev = ev_pos | ev_neg
    any_ev = jnp.any(ev, axis=1)
    k_ev = jnp.argmax(ev, axis=1)
    hit = (any_ev & has_cand
           & jnp.take_along_axis(ev_pos, k_ev[:, None], 1)[:, 0])

    vp = jnp.take_along_axis(v_prev, k_ev[:, None], 1)[:, 0]
    vc = jnp.take_along_axis(v_cur, k_ev[:, None], 1)[:, 0]
    interp = vp / (vp - vc)
    pos_ev = jnp.take_along_axis(pos[:, 1:, :], k_ev[:, None, None], 1)[:, 0]
    coords_w = pos_ev + ray * (interp[:, None] - 1.0)

    normals_w, n_ok = interpolate_normal(grid, coords_w)
    mask = feasible & hit & n_ok

    Tinv = se2.invert(pose.astype(dtype))
    coords_s = se2.transform_points(Tinv, coords_w)
    normals_s = se2.rotate_vectors(Tinv, normals_w)
    zero = jnp.zeros_like(coords_s)
    coords_s = jnp.where(mask[:, None], coords_s, zero)
    normals_s = jnp.where(mask[:, None], normals_s, zero)
    ranges = jnp.linalg.norm(coords_s, axis=-1)
    return RaycastResult(coords_s, normals_s, mask, ranges)


raycast_fast_jit = jax.jit(raycast_fast, static_argnames=("geom",))
