"""NumPy float64 oracle for the TSD grid, written directly from the
reference C++ structure (partition tiles WITH one-cell halos, halo
propagation, scalar per-beam ray march).

This is deliberately a different design from the production JAX kernels
(dense arrays, vectorized march) so that agreement between the two is a
meaningful check.  Every method cites the reference formula it encodes
(paths relative to /root/reference/src).
"""

from __future__ import annotations

import math

import numpy as np

MAXWEIGHT = 32.0  # obvision/reconstruct/reconstruct_defs.h:4
TSDINC = 1.0

SUCCESS, INVALID, EMPTY, ISNAN = 0, 1, 2, 3


class OracleSensor:
    """SensorPolar2D (obvision/reconstruct/grid/SensorPolar2D.cpp)."""

    def __init__(self, size, angular_res, phi_min, max_range,
                 min_range=0.001, low_reflectivity_range=2.0):
        self.size = size
        self.res = angular_res
        self.phi_min = phi_min
        self.max_range = max_range
        self.min_range = min_range
        self.low_reflectivity_range = low_reflectivity_range
        self.phi_lo = -0.5 * angular_res + phi_min          # :26
        self.phi_hi = phi_min + (size - 0.5) * angular_res  # :30
        phi = phi_min + np.arange(size) * angular_res
        self.rays_local = np.stack([np.cos(phi), np.sin(phi)], axis=1)
        self.T = np.eye(3)
        self.data = np.zeros(size)
        self.mask = np.ones(size, dtype=bool)

    def transform(self, T):
        # Sensor::transform (obvision/reconstruct/Sensor.cpp:50-60)
        self.T = self.T @ T

    def position(self):
        return self.T[:2, 2].copy()

    def set_data(self, ranges):
        self.data = np.asarray(ranges, dtype=np.float64).copy()

    def set_standard_mask(self):
        # SensorPolar2D::setStandardMask (SensorPolar2D.cpp:59-65)
        self.mask = np.ones(self.size, dtype=bool)
        self.mask &= self.data != 0.0                    # maskZeroDepth
        # maskInvalidDepth (Sensor.cpp:258-272)
        self.data[self.data > self.max_range] = np.inf
        nan = np.isnan(self.data)
        self.mask[nan] = False
        self.data[nan] = np.inf
        self._mask_discontinuity(math.radians(3.0))

    def _mask_discontinuity(self, thresh):
        # SensorPolar2D::maskDepthDiscontinuity (SensorPolar2D.cpp:67-98)
        cosphi = math.cos(self.res)
        sinphi = math.sin(self.res)
        for i in range(1, self.size - 1):
            a = self.data[i]
            if math.isinf(a):
                continue
            betamin = math.pi
            for j in (-1, 0, 1):
                b = self.data[i + j]
                if math.isinf(b):
                    continue
                c = math.sqrt(a * a + b * b - 2 * a * b * cosphi)
                if a > b:
                    beta = math.asin(b / c * sinphi)
                    betamin = min(betamin, beta)
            if betamin < thresh:
                self.mask[i] = False

    def back_project_point(self, pt):
        # SensorPolar2D::backProject (SensorPolar2D.cpp:100-115)
        Ti = np.linalg.inv(self.T)
        q = Ti[:2, :2] @ pt + Ti[:2, 2]
        phi = math.atan2(q[1], q[0])
        if phi <= self.phi_lo:
            return -2
        if phi >= self.phi_hi:
            return -1
        # C round(): half away from zero
        return int(math.floor((phi - self.phi_min) / self.res + 0.5))

    def data_to_cartesian_mask(self):
        # Sensor::dataToCartesianVectorMask (Sensor.cpp:168-190)
        valid = self.mask & ~np.isinf(self.data)
        coords = np.where(valid[:, None],
                          self.rays_local * self.data[:, None], 0.0)
        return coords, valid


class _Partition:
    """TsdGridPartition: (P+1)x(P+1) cells with halo
    (TsdGridPartition.cpp)."""

    def __init__(self, x, y, dim, cell_size):
        self.x, self.y, self.dim = x, y, dim
        s = cell_size
        # corners at cell centers (TsdGridPartition.cpp:48-63)
        self.centroid = np.array([(x + (dim + 1) / 2.0) * s,
                                  (y + (dim + 1) / 2.0) * s])
        self.circumradius = math.sqrt(2.0) * dim * s / 2.0
        self.edges = np.array([
            [(x + 0.5) * s, (y + 0.5) * s],
            [(x + dim + 0.5) * s, (y + 0.5) * s],
            [(x + 0.5) * s, (y + dim + 0.5) * s],
            [(x + dim + 0.5) * s, (y + dim + 0.5) * s]])
        self.initialized = False
        self.init_weight = 0.0
        self.tsd = None
        self.weight = None
        self.cell_size = cell_size

    def is_empty(self):
        return (not self.initialized) and self.init_weight > 0.0

    def init(self):
        # TsdGridPartition::init (TsdGridPartition.cpp:88-134)
        if self.initialized:
            return
        n = self.dim + 1
        if self.init_weight > 0.0:
            self.tsd = np.full((n, n), 1.0)
            self.weight = np.full((n, n), self.init_weight)
        else:
            self.tsd = np.full((n, n), np.nan)
            self.weight = np.full((n, n), self.init_weight)
        self.initialized = True

    def add_tsd(self, cx, cy, sd, weight, max_trunc):
        # TsdGridPartition::addTsd (TsdGridPartition.h:170-212)
        if sd >= -max_trunc:
            tsd = min(sd / max_trunc, TSDINC)
            eps = -self.cell_size / 2.0
            w = 0.01
            if abs(sd) < eps:   # dead branch (eps < 0), replicated
                w = 1.0
            w *= weight
            if math.isnan(self.tsd[cy, cx]):
                self.tsd[cy, cx] = tsd
                self.weight[cy, cx] += w
            else:
                W = self.weight[cy, cx]
                self.tsd[cy, cx] = (self.tsd[cy, cx] * W + tsd * w) / (W + w)
                self.weight[cy, cx] = min(W + w, MAXWEIGHT)

    def increase_emptiness(self):
        # TsdGridPartition::increaseEmptiness (TsdGridPartition.cpp:136-164)
        if self.initialized:
            for yy in range(self.dim + 1):
                for xx in range(self.dim + 1):
                    if math.isnan(self.tsd[yy, xx]):
                        self.weight[yy, xx] += 1.0
                        self.tsd[yy, xx] = 1.0
                    else:
                        self.weight[yy, xx] = min(self.weight[yy, xx] + 1,
                                                  MAXWEIGHT)
                        self.tsd[yy, xx] = (
                            self.tsd[yy, xx] * (self.weight[yy, xx] - 1.0)
                            + 1.0) / self.weight[yy, xx]
        else:
            self.init_weight = min(self.init_weight + 1.0, MAXWEIGHT)


class OracleGrid:
    """TsdGrid (obvision/reconstruct/grid/TsdGrid.cpp)."""

    def __init__(self, cell_size, cells_per_side, tile_dim=32,
                 max_truncation=None):
        self.s = cell_size
        self.n = cells_per_side
        self.p = tile_dim
        self.tiles = cells_per_side // tile_dim
        self.max_trunc = max(max_truncation or 3 * cell_size, 2 * cell_size)
        self.parts = [[_Partition(px * tile_dim, py * tile_dim, tile_dim,
                                  cell_size)
                       for px in range(self.tiles)]
                      for py in range(self.tiles)]

    # -- interpolation ----------------------------------------------------
    def coord2cell(self, x, y):
        # TsdGrid::coord2Cell (TsdGrid.h:306-340)
        xi = math.floor(x / self.s)
        yi = math.floor(y / self.s)
        dx = (xi + 0.5) * self.s
        dy = (yi + 0.5) * self.s
        if x < dx:
            xi -= 1
            dx -= self.s
        if y < dy:
            yi -= 1
            dy -= self.s
        if xi >= self.n or xi < 0 or yi >= self.n or yi < 0:
            return None
        wx = abs((x - dx) / self.s)
        wy = abs((y - dy) / self.s)
        return xi, yi, wx, wy

    def interpolate_bilinear(self, x, y):
        # TsdGrid::interpolateBilinear (TsdGrid.h:284-304)
        cc = self.coord2cell(x, y)
        if cc is None:
            return np.nan, INVALID
        xi, yi, wx, wy = cc
        part = self.parts[yi // self.p][xi // self.p]
        if not part.initialized:
            return np.nan, EMPTY
        cx, cy = xi % self.p, yi % self.p
        t = part.tsd
        v = (t[cy, cx] * (1 - wy) * (1 - wx)
             + t[cy + 1, cx] * wy * (1 - wx)
             + t[cy, cx + 1] * (1 - wy) * wx
             + t[cy + 1, cx + 1] * wy * wx)
        if math.isnan(v):
            return np.nan, ISNAN
        return v, SUCCESS

    def interpolate_normal(self, x, y):
        # TsdGrid::interpolateNormal (TsdGrid.cpp:517-546)
        vals = []
        for dx, dy in ((self.s, 0), (-self.s, 0), (0, self.s), (0, -self.s)):
            v, code = self.interpolate_bilinear(x + dx, y + dy)
            if code != SUCCESS:
                return None
            vals.append(v)
        n = np.array([vals[0] - vals[1], vals[2] - vals[3]])
        nn = np.linalg.norm(n)
        if nn > 0:
            n = n / nn
        return n

    # -- push -------------------------------------------------------------
    def _is_in_range(self, part, sensor):
        # TsdGridComponent::isInRange (TsdGridComponent.cpp:43-124)
        pos = sensor.position()
        distance = float(np.linalg.norm(pos - part.centroid))
        closest = distance - part.circumradius - self.max_trunc
        if closest > sensor.max_range:
            return False
        farthest = distance + part.circumradius + self.max_trunc
        if farthest < sensor.min_range:
            return False
        idx = [sensor.back_project_point(e) for e in part.edges]
        any_vis, all_vis = False, True
        for i in range(4):
            if idx[i] == -1:
                idx[i] = sensor.size - 1
                all_vis = False
            elif idx[i] == -2:
                idx[i] = 0
                all_vis = False
            else:
                any_vis = True
        if not any_vis:
            return False
        lo, hi = min(idx), max(idx)
        visible = False
        for j in range(lo, hi + 1):
            visible = visible or (sensor.data[j] > closest
                                  and sensor.mask[j])
        if not visible:
            return False
        if all_vis:
            empty = True
            for j in range(lo, hi + 1):
                if math.isinf(sensor.data[j]):
                    empty = empty and (distance
                                       < sensor.low_reflectivity_range)
                else:
                    empty = empty and (sensor.data[j] > farthest
                                       and sensor.mask[j])
            if empty:
                part.increase_emptiness()
                return False
        return True

    def push(self, sensor):
        # TsdGrid::push (TsdGrid.cpp:217-284)
        pos = sensor.position()
        for py in range(self.tiles):
            for px in range(self.tiles):
                part = self.parts[py][px]
                if not self._is_in_range(part, sensor):
                    continue
                part.init()
                dist_c = float(np.linalg.norm(part.centroid - pos))
                dist_c = min(dist_c, sensor.max_range)
                pw = ((sensor.max_range - dist_c) / sensor.max_range) ** 2
                for cy in range(self.p):
                    for cx in range(self.p):
                        gx = (part.x + cx + 0.5) * self.s
                        gy = (part.y + cy + 0.5) * self.s
                        idx = sensor.back_project_point(np.array([gx, gy]))
                        if idx < 0 or not sensor.mask[idx]:
                            continue
                        dist = math.hypot(gx - pos[0], gy - pos[1])
                        if not math.isinf(sensor.data[idx]):
                            sd = sensor.data[idx] - dist
                            part.add_tsd(cx, cy, sd, pw, self.max_trunc)
                        elif dist < sensor.low_reflectivity_range:
                            part.add_tsd(cx, cy, self.max_trunc, pw,
                                         self.max_trunc)
        self._propagate_borders()

    def _propagate_borders(self):
        # TsdGrid::propagateBorders (TsdGrid.cpp:372-427)
        p = self.p
        for py in range(self.tiles):
            for px in range(self.tiles):
                cur = self.parts[py][px]
                if not cur.initialized:
                    continue
                if px < self.tiles - 1:
                    right = self.parts[py][px + 1]
                    if right.initialized:
                        cur.tsd[:p, p] = right.tsd[:p, 0]
                        cur.weight[:p, p] = right.weight[:p, 0]
                if py < self.tiles - 1:
                    up = self.parts[py + 1][px]
                    if up.initialized:
                        cur.tsd[p, :p] = up.tsd[0, :p]
                        cur.weight[p, :p] = up.weight[0, :p]
                if px < self.tiles - 1 and py < self.tiles - 1:
                    upright = self.parts[py + 1][px + 1]
                    if upright.initialized:
                        cur.tsd[p, p] = upright.tsd[0, 0]
                        cur.weight[p, p] = upright.weight[0, 0]

    # -- dense views for comparison --------------------------------------
    def dense_tsd(self):
        out = np.full((self.n, self.n), np.nan)
        for py in range(self.tiles):
            for px in range(self.tiles):
                part = self.parts[py][px]
                if part.initialized:
                    out[py * self.p:(py + 1) * self.p,
                        px * self.p:(px + 1) * self.p] = part.tsd[:-1, :-1]
        return out

    def dense_weight(self):
        out = np.zeros((self.n, self.n))
        for py in range(self.tiles):
            for px in range(self.tiles):
                part = self.parts[py][px]
                if part.initialized:
                    out[py * self.p:(py + 1) * self.p,
                        px * self.p:(px + 1) * self.p] = part.weight[:-1, :-1]
        return out

    # -- raycast ----------------------------------------------------------
    def raycast_beam(self, sensor, beam):
        """RayCastPolar2D::rayCastFromCurrentView
        (RayCastPolar2D.cpp:194-281).  Returns (coords, normal) in world
        frame or None."""
        pos = sensor.position()
        R = sensor.T[:2, :2]
        ray = R @ sensor.rays_local[beam] * self.s

        inside = (0 < pos[0] < self.n * self.s
                  and 0 < pos[1] < self.n * self.s)
        big = 10e9
        xmin = -big if inside else big
        ymin = -big if inside else big
        xmax = big if inside else -big
        ymax = big if inside else -big
        xdim = (self.n - 1) * self.s
        if abs(ray[0]) > 10e-6:
            xmin = ((0.0 if ray[0] > 0 else xdim) - pos[0]) / ray[0]
            xmax = ((xdim if ray[0] > 0 else 0.0) - pos[0]) / ray[0]
        if abs(ray[1]) > 10e-6:
            ymin = ((0.0 if ray[1] > 0 else xdim) - pos[1]) / ray[1]
            ymax = ((xdim if ray[1] > 0 else 0.0) - pos[1]) / ray[1]
        idx_min = max(max(xmin, ymin), 0.0)
        idx_max = min(xmax, ymax)
        idx_min = max(idx_min, sensor.min_range / self.s)
        idx_max = min(idx_max, sensor.max_range / self.s)
        if idx_min >= idx_max:
            return None

        # coarse skip (RayCastPolar2D.cpp:224-235)
        i = idx_min
        while i < idx_max:
            x = pos[0] + i * ray[0]
            y = pos[1] + i * ray[1]
            _, code = self.interpolate_bilinear(x, y)
            if code != EMPTY and code != INVALID:
                break
            idx_min = i
            i += float(self.p)

        x = pos[0] + idx_min * ray[0]
        y = pos[1] + idx_min * ray[1]
        tsd_prev, code = self.interpolate_bilinear(x, y)
        if code != SUCCESS:
            tsd_prev = np.nan

        found = False
        interp = 0.0
        i = idx_min
        while i <= idx_max:
            x += ray[0]
            y += ray[1]
            tsd, code = self.interpolate_bilinear(x, y)
            if code != SUCCESS:
                tsd_prev = np.nan
                i += 1.0
                continue
            if tsd_prev > 0 and tsd < 0:
                interp = tsd_prev / (tsd_prev - tsd)
                found = True
                break
            if tsd_prev < 0 and tsd > 0:
                break
            tsd_prev = tsd
            i += 1.0
        if not found:
            return None
        cx = x + ray[0] * (interp - 1.0)
        cy = y + ray[1] * (interp - 1.0)
        normal = self.interpolate_normal(cx, cy)
        if normal is None:
            return None
        return np.array([cx, cy]), normal

    def raycast(self, sensor):
        """calcCoordsFromCurrentViewMask (RayCastPolar2D.cpp:113-192):
        beam-aligned sensor-frame coords/normals + mask."""
        Ti = np.linalg.inv(sensor.T)
        B = sensor.size
        coords = np.zeros((B, 2))
        normals = np.zeros((B, 2))
        mask = np.zeros(B, dtype=bool)
        for b in range(B):
            r = self.raycast_beam(sensor, b)
            if r is None:
                continue
            c, n = r
            coords[b] = Ti[:2, :2] @ c + Ti[:2, 2]
            normals[b] = Ti[:2, :2] @ n
            mask[b] = True
        return coords, normals, mask
