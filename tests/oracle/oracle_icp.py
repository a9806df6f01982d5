"""NumPy float64 oracle for the ICP engine, written from
obvision/registration/icp/Icp.cpp, ClosedFormEstimator2D.cpp,
DistanceFilter.cpp, ReciprocalFilter.cpp, OutOfBoundsFilter2D.cpp.

Pair assignment uses exact brute-force 1-NN, which is what the
reference's FLANN kd-tree computes (exact search, SearchParams(-1))."""

from __future__ import annotations

import math

import numpy as np


class OracleIcp:
    def __init__(self, iterations=25, max_rms=0.0, conv_cnt=5,
                 dist_max=1.0, dist_min=0.2, bounds=None, pose=None):
        self.iterations = iterations
        self.max_rms = max_rms
        self.conv_cnt = conv_cnt
        self.dist_max = dist_max
        self.dist_min = dist_min
        self.bounds = bounds          # (x0, x1, y0, y1)
        self.pose = pose if pose is not None else np.eye(3)

    def register(self, model, scene, T_init=None):
        """Returns (T(3,3), rms, pairs, iterations, trace) with trace a
        list of per-iteration (rms, n_pairs)."""
        model = np.asarray(model, dtype=np.float64)
        scene0 = np.asarray(scene, dtype=np.float64)
        Tf = np.eye(3)
        scene_cur = scene0.copy()
        if T_init is not None:
            scene_cur = scene_cur @ T_init[:2, :2].T + T_init[:2, 2]
            Tf = T_init @ Tf

        # DistanceFilter state (DistanceFilter.cpp:11-19)
        it = float(self.iterations - 1) if self.iterations >= 1 else 1.0
        mult = (self.dist_min / self.dist_max) ** (1.0 / it)
        dist_sqr = self.dist_max ** 2

        rms_prev = 10e12
        conv = 0
        rms = rms_prev
        npairs = 0
        trace = []
        iters = 0
        for k in range(self.iterations):
            iters += 1
            # prefilter: OutOfBoundsFilter2D (OutOfBoundsFilter2D.cpp:27-37)
            mask = np.ones(len(scene_cur), dtype=bool)
            if self.bounds is not None:
                w = scene_cur @ self.pose[:2, :2].T + self.pose[:2, 2]
                x0, x1, y0, y1 = self.bounds
                mask &= ((w[:, 0] >= x0) & (w[:, 0] <= x1)
                         & (w[:, 1] >= y0) & (w[:, 1] <= y1))

            # brute-force 1-NN (== FLANN exact search)
            d2 = (np.sum(scene_cur**2, 1)[:, None]
                  + np.sum(model**2, 1)[None, :]
                  - 2.0 * scene_cur @ model.T)
            d2 = np.maximum(d2, 0.0)
            nn = np.argmin(d2, axis=1)
            nnd = d2[np.arange(len(scene_cur)), nn]

            pairs = [(nn[i], i, nnd[i]) for i in range(len(scene_cur))
                     if mask[i]]

            # DistanceFilter (DistanceFilter.cpp:50-63)
            pairs = [p for p in pairs if p[2] <= dist_sqr]
            dist_sqr *= mult
            dist_sqr = max(dist_sqr, self.dist_min ** 2)

            # ReciprocalFilter (ReciprocalFilter.cpp:44-77): sort by
            # (model idx, distance), keep first per model idx
            pairs.sort(key=lambda p: (p[0], p[2]))
            kept = []
            last_m = None
            for p in pairs:
                if p[0] != last_m:
                    kept.append(p)
                    last_m = p[0]
            pairs = kept
            npairs = len(pairs)
            trace.append((None, npairs))

            if npairs <= 2:      # Icp.cpp:421/458
                break

            # ClosedFormEstimator2D (ClosedFormEstimator2D.cpp:36-109)
            mi = np.array([p[0] for p in pairs])
            si = np.array([p[1] for p in pairs])
            pm = model[mi]
            ps = scene_cur[si]
            rms = float(np.mean(np.sum((pm - ps) ** 2, axis=1)))
            cm = pm.mean(axis=0)
            cs = ps.mean(axis=0)
            xf, yf = (pm - cm).T
            xs, ys = (ps - cs).T
            nom = np.sum(yf * xs - xf * ys)
            den = np.sum(xf * xs + yf * ys)
            dth = math.atan2(nom, den)
            c, s = math.cos(dth), math.sin(dth)
            dx = cm[0] - (c * cs[0] - s * cs[1])
            dy = cm[1] - (c * cs[1] + s * cs[0])
            Tl = np.array([[c, -s, dx], [s, c, dy], [0, 0, 1.0]])
            scene_cur = scene_cur @ Tl[:2, :2].T + Tl[:2, 2]
            Tf = Tl @ Tf
            trace[-1] = (rms, npairs)

            # convergence (Icp.cpp:496-507)
            if abs(rms - rms_prev) < 10e-10:
                conv += 1
            else:
                conv = 0
            if rms <= self.max_rms or conv >= self.conv_cnt:
                rms_prev = rms
                break
            rms_prev = rms
        return Tf, rms, npairs, iters, trace
