"""Loader for the golden-file binary format written by golden/harness.cpp
(the compiled, unmodified C++ reference) and the scenario text parser."""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Tuple

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "golden")
ROOM_BIN = os.path.join(GOLDEN_DIR, "data", "room.bin")
ROOM_TXT = os.path.join(GOLDEN_DIR, "data", "room.txt")
ROOM_STORE = os.path.join(GOLDEN_DIR, "data", "room_store.txt")

_DTYPES = {b"f": np.float64, b"i": np.int32, b"b": np.uint8}


def load_golden(path: str = ROOM_BIN) -> Dict[str, np.ndarray]:
    """Parse the tagged-array stream (name, dtype, dims, payload)."""
    arrays: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    n = len(data)
    while off < n:
        (nl,) = struct.unpack_from("<I", data, off)
        off += 4
        name = data[off:off + nl].decode()
        off += nl
        dt = data[off:off + 1]
        off += 1
        (nd,) = struct.unpack_from("<I", data, off)
        off += 4
        dims = struct.unpack_from("<%dI" % nd, data, off)
        off += 4 * nd
        dtype = _DTYPES[dt]
        count = int(np.prod(dims)) if nd else 1
        arr = np.frombuffer(data, dtype=dtype, count=count, offset=off)
        off += count * dtype().itemsize
        arrays[name] = arr.reshape(dims)
    return arrays


class Scenario:
    def __init__(self, path: str = ROOM_TXT):
        with open(path) as f:
            tok = f.read().split()
        i = 0

        def take(k):
            nonlocal i
            assert tok[i] == k, (tok[i], k)
            i += 1

        take("grid")
        self.cellsize = float(tok[i]); i += 1
        self.layout_part = int(tok[i]); i += 1
        self.layout_grid = int(tok[i]); i += 1
        self.max_trunc = float(tok[i]); i += 1
        take("sensor")
        self.size = int(tok[i]); i += 1
        self.angular_res = float(tok[i]); i += 1
        self.phi_min = float(tok[i]); i += 1
        self.max_range = float(tok[i]); i += 1
        self.min_range = float(tok[i]); i += 1
        self.low_reflectivity_range = float(tok[i]); i += 1
        take("footprint")
        if tok[i] == "none":
            self.footprint = None
            i += 1
        else:
            self.footprint = tuple(float(tok[i + k]) for k in range(4))
            i += 4
        take("npush")
        npush = int(tok[i]); i += 1
        self.push_poses: List[np.ndarray] = []
        self.push_ranges: List[np.ndarray] = []
        for _ in range(npush):
            take("pose")
            self.push_poses.append(
                np.array([float(x) for x in tok[i:i + 9]]).reshape(3, 3))
            i += 9
            take("ranges")
            self.push_ranges.append(
                np.array([float(x) for x in tok[i:i + self.size]]))
            i += self.size
        take("nquery")
        nq = int(tok[i]); i += 1
        self.query_poses: List[np.ndarray] = []
        for _ in range(nq):
            take("pose")
            self.query_poses.append(
                np.array([float(x) for x in tok[i:i + 9]]).reshape(3, 3))
            i += 9


# ---------------------------------------------------------------------------
# RANSAC parity helpers (golden/ransac_harness + golden/shim/detrand.h)
# ---------------------------------------------------------------------------

RANSAC_DIR = os.path.join(GOLDEN_DIR, "data", "ransac")


class DetRand:
    """Replays golden/shim/detrand.h's 31-bit LCG exactly."""

    def __init__(self, seed: int):
        self.s = seed & 0xFFFFFFFF

    def rand(self) -> int:
        self.s = (self.s * 1103515245 + 12345) & 0xFFFFFFFF
        return self.s & 0x7FFFFFFF


def replay_subsample(seed: int, mask_s: np.ndarray):
    """Phase 1 of the reference matchers' rand() stream: subsampleMask
    over the raw scene mask (one draw per point regardless of validity,
    RandomMatching.cpp:171-183, gated by probability < 0.99).  Returns
    (post-subsample mask, DetRand carrying the stream state)."""
    n = mask_s.shape[0]
    dr = DetRand(seed)
    valid_points = int(mask_s.sum())
    prob = 180.0 / max(valid_points, 1)
    sub = np.array(mask_s, bool).copy()
    if prob < 0.99:
        thresh = int(1000.0 - prob * 1000.0 + 0.5)
        for i in range(n):
            if dr.rand() % 1000 < thresh:
                sub[i] = False
    return sub, dr


def replay_picks(dr: "DetRand", idx_s_valid, idx_m_valid,
                 trials: int, size_control: int):
    """Phase 2: pickControlSet over the post-PCA scene indices
    (RandomMatching.cpp:52-75), the intercepted no-op srand, then one
    erase-without-replacement draw per trial over the post-PCA model
    indices (RandomNormalMatching.cpp:221-238).  Returns
    (ctrl_idx list, trial_idx list)."""
    c = min(size_control, len(idx_s_valid))
    tmp = list(idx_s_valid)
    ctrl = []
    for _ in range(c):
        r = dr.rand() % len(tmp)
        ctrl.append(tmp.pop(r))

    # srand(time(NULL)) in the reference is det_srand = no-op

    t = min(trials, len(idx_m_valid))
    tmp = list(idx_m_valid)
    tidx = []
    for _ in range(t):
        r = dr.rand() % len(tmp)
        tidx.append(tmp.pop(r))
    return ctrl, tidx


def load_score3d(path: str) -> np.ndarray:
    """score3D.dat rows: trial idxM idxS score (Trace.cpp:289-300)."""
    rows = []
    with open(path) as f:
        for line in f:
            p = line.split()
            if len(p) == 4:
                rows.append((int(p[0]), int(p[1]), int(p[2]),
                             float(p[3])))
    return np.array(rows, dtype=np.float64)


def replay_twin(seed: int, idx_s_valid, n_m_valid: int, trials: int,
                size_control: int, min_d: int, max_d: int):
    """TwinPointMatching's rand() stream (TwinPointMatching.cpp:144-191):
    pickControlSet over the raw-valid scene indices, the intercepted
    no-op srand, then per trial (randIdx, second-sample) draw pairs over
    the valid-model RANKS.  Returns (ctrl_idx, rank1, rank2)."""
    dr = DetRand(seed)
    tmp = list(idx_s_valid)
    ctrl = []
    for _ in range(min(size_control, len(tmp))):
        r = dr.rand() % len(tmp)
        ctrl.append(tmp.pop(r))
    # srand(time(NULL)) in pickControlSet is det_srand = no-op
    r1s, r2s = [], []
    for _ in range(trials):
        r1 = dr.rand() % ((n_m_valid - 1) - min_d)
        remaining = min(n_m_valid - r1 - 1, max_d)
        r2 = r1 + (dr.rand() % (remaining - min_d)) + min_d
        r1s.append(r1)
        r2s.append(r2)
    return ctrl, r1s, r2s
