"""Polar ray casting: render a model scan from the TSD grid.

TPU-native redesign of RayCastPolar2D
(src/obvision/reconstruct/grid/RayCastPolar2D.cpp).  The reference marches
each beam with a scalar while-loop (one cell per step, 4-tap bilinear
reads, first +→− sign change wins, −→+ rejected as a back face); here the
march is evaluated as a dense [B, K] tensor program: all beams × all steps
are sampled in one fused XLA computation and the first crossing is found
with an argmax over the step axis.  That trades redundant samples for
complete parallelism — the natural TPU formulation (no data-dependent
loops, static shapes, vectorized gathers).

Semantics replicated (citations inline):
  * rays scaled to one cell per step       (RayCastPolar2D.cpp:36,123)
  * AABB slab clipping + min/max range     (RayCastPolar2D.cpp:205-219)
  * sensor-outside-grid guard              (RayCastPolar2D.cpp:42-60,128-146)
  * coarse skip over empty/invalid tiles
    in partition-size steps                (RayCastPolar2D.cpp:224-235)
  * sub-cell interpolation of the crossing (RayCastPolar2D.cpp:257-262)
  * back-face (−→+) rejection              (RayCastPolar2D.cpp:263-267)
  * central-difference normals; a failed
    normal invalidates the beam            (RayCastPolar2D.cpp:277-280)
  * model points returned in sensor frame  (RayCastPolar2D.cpp:172-177)
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ohm_tsd_slam_tpu.core import se2
from ohm_tsd_slam_tpu.grid.interpolate import (
    INTERPOLATE_EMPTYPARTITION,
    INTERPOLATE_INVALIDINDEX,
    INTERPOLATE_SUCCESS,
    interpolate_bilinear,
    interpolate_normal,
)
from ohm_tsd_slam_tpu.grid.state import TsdGrid
from ohm_tsd_slam_tpu.sensor.polar2d import SensorPolar2D


class RaycastResult(NamedTuple):
    coords: jnp.ndarray    # [B, 2] surface points in the sensor frame
    normals: jnp.ndarray   # [B, 2] surface normals in the sensor frame
    mask: jnp.ndarray      # [B]    beam produced a valid model point
    ranges: jnp.ndarray    # [B]    |coords| — rendered range image (for
                           #        differentiable scan matching; no
                           #        reference analogue)
    # crossings dropped past raycast_fast's MAX_CROSSINGS capacity (0 for
    # the exact march, which has no such cap); nonzero means beams may
    # silently miss hits — use raycast_checked for a guarded fallback
    n_dropped: jnp.ndarray = None


def _num_steps(geom: SensorPolar2D, grid: TsdGrid) -> int:
    return int(math.ceil(geom.max_range / grid.cell_size)) + 2


def raycast(grid: TsdGrid, geom: SensorPolar2D,
            pose: jnp.ndarray) -> RaycastResult:
    """Render the model scan for all beams from `pose`.

    Equivalent of RayCastPolar2D::calcCoordsFromCurrentViewMask
    (RayCastPolar2D.cpp:113-192): beam-aligned outputs plus validity mask.
    """
    dtype = grid.tsd.dtype
    s = grid.cell_size
    B = geom.size

    rays_local = geom.rays_local(dtype)                  # [B, 2] unit
    rays_world = se2.rotate_vectors(pose.astype(dtype), rays_local)
    ray = rays_world * s                                 # 1 cell per step
    tr = se2.translation(pose).astype(dtype)

    # ---- slab clipping (RayCastPolar2D.cpp:200-221) ---------------------
    inside = grid.is_inside(tr)
    # Defaults: inside → (-1e10, +1e10); outside → inverted so idxMin >=
    # idxMax unless both slabs are overridden (RayCastPolar2D.cpp:42-60).
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

    # ---- coarse skip over empty/invalid tiles ---------------------------
    # (RayCastPolar2D.cpp:224-235): advance idx_min in tile-size steps
    # while the interpolation reports EMPTYPARTITION/INVALIDINDEX; the
    # march then starts from the last uninformative coarse sample, which
    # preserves the sampling phase (tile_dim is an integer step count).
    part = float(grid.tile_dim)
    n_coarse = int(math.ceil((_num_steps(geom, grid)) / part)) + 1
    m = jnp.arange(n_coarse, dtype=dtype)
    t_coarse = idx_min[:, None] + m[None, :] * part      # [B, M]
    coarse_valid = t_coarse < idx_max[:, None]
    pos_coarse = tr + t_coarse[..., None] * ray[:, None, :]
    _, code_c = interpolate_bilinear(grid, pos_coarse)
    informative = ((code_c != INTERPOLATE_EMPTYPARTITION)
                   & (code_c != INTERPOLATE_INVALIDINDEX)
                   & coarse_valid)
    any_inf = jnp.any(informative, axis=1)
    first_inf = jnp.argmax(informative, axis=1)          # first True
    # last coarse sample within range
    last_valid = jnp.maximum(jnp.sum(coarse_valid, axis=1) - 1, 0)
    skip = jnp.where(any_inf, jnp.maximum(first_inf - 1, 0), last_valid)
    idx_start = idx_min + skip.astype(dtype) * part

    # ---- fine march (RayCastPolar2D.cpp:237-270) ------------------------
    K = _num_steps(geom, grid)
    k = jnp.arange(K + 1, dtype=dtype)                   # sample 0 = start
    t = idx_start[:, None] + k[None, :]                  # [B, K+1]
    pos = tr + t[..., None] * ray[:, None, :]            # [B, K+1, 2]
    tsd, code = interpolate_bilinear(grid, pos)
    v = jnp.where(code == INTERPOLATE_SUCCESS, tsd, jnp.nan)

    # loop runs while i = idx_start + (k-1) <= idx_max
    step_valid = (t[:, 1:] - 1.0) <= idx_max[:, None]    # [B, K]
    v_prev = v[:, :-1]
    v_cur = v[:, 1:]
    ev_pos = (v_prev > 0) & (v_cur < 0) & step_valid
    ev_neg = (v_prev < 0) & (v_cur > 0) & step_valid
    ev = ev_pos | ev_neg
    any_ev = jnp.any(ev, axis=1)
    k_ev = jnp.argmax(ev, axis=1)                        # first event
    hit = any_ev & jnp.take_along_axis(ev_pos, k_ev[:, None], 1)[:, 0]

    vp = jnp.take_along_axis(v_prev, k_ev[:, None], 1)[:, 0]
    vc = jnp.take_along_axis(v_cur, k_ev[:, None], 1)[:, 0]
    interp = vp / (vp - vc)
    pos_ev = jnp.take_along_axis(
        pos[:, 1:, :], k_ev[:, None, None], 1)[:, 0, :]
    coords_w = pos_ev + ray * (interp[:, None] - 1.0)

    normals_w, n_ok = interpolate_normal(grid, coords_w)
    mask = feasible & hit & n_ok

    # ---- sensor-frame outputs (RayCastPolar2D.cpp:168-177) --------------
    Tinv = se2.invert(pose.astype(dtype))
    coords_s = se2.transform_points(Tinv, coords_w)
    normals_s = se2.rotate_vectors(Tinv, normals_w)
    zero = jnp.zeros_like(coords_s)
    coords_s = jnp.where(mask[:, None], coords_s, zero)
    normals_s = jnp.where(mask[:, None], normals_s, zero)
    ranges = jnp.linalg.norm(coords_s, axis=-1)
    return RaycastResult(coords_s, normals_s, mask, ranges,
                         jnp.asarray(0, jnp.int32))


raycast_jit = jax.jit(raycast, static_argnames=("geom",))
