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
