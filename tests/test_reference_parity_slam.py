"""FULL-LOOP behavioral parity against the COMPILED C++ REFERENCE
(SURVEY §4 plan item 5; VERDICT r2 missing #3).

golden/slam_harness.cpp replays a 25-scan simulated trajectory through
the reference's complete localization+mapping cycle (raycast → ICP →
error gate → pose update → significance-gated push,
ThreadLocalize.cpp:310-409) built from the unmodified reference sources.
This test replays the SAME scan sequence through SlamNode.process_scan
(mode ICP) and diffs the pose trace and the gate decisions.
"""

import math
import os

import numpy as np
import jax.numpy as jnp
import pytest

from ohm_tsd_slam_tpu.config import (
    FootprintConfig,
    GridConfig,
    IcpConfig,
    RegistrationConfig,
    RobotConfig,
    SensorConfig,
    SlamConfig,
)
from ohm_tsd_slam_tpu.slam import LaserScan, SlamNode

from golden_io import GOLDEN_DIR, load_golden

SLAM_BIN = os.path.join(GOLDEN_DIR, "data", "slam.bin")
SLAM_NPZ = os.path.join(GOLDEN_DIR, "data", "slam_inputs.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SLAM_BIN),
    reason="golden slam-loop data not generated (make -C golden)")


def test_full_loop_trajectory_parity():
    golden = load_golden(SLAM_BIN)
    inp = np.load(SLAM_NPZ)
    scans = inp["scans"]
    (cellsize, layout_grid, max_trunc, size, ang_res, phi_min, max_range,
     min_range, low_refl, icp_iters, dist_max, dist_min, trns_max,
     rot_max, trns_min, rot_min) = inp["params"]
    fp_w, fp_h = inp["footprint"]

    cfg = SlamConfig(
        grid=GridConfig(map_size=int(layout_grid), cellsize=float(cellsize),
                        truncation_radius=float(max_trunc / cellsize)),
        robots=[RobotConfig(
            local_offset_yaw=0.2,
            sensor=SensorConfig(max_range=float(max_range),
                                min_range=float(min_range),
                                low_reflectivity_range=float(low_refl),
                                laser_min_range=0.0),
            footprint=FootprintConfig(width=float(fp_w),
                                      height=float(fp_h), x_offset=0.0),
            registration=RegistrationConfig(
                trns_thresh=float(trns_max), rot_thresh=float(rot_max),
                trns_min=float(trns_min), rot_min=float(rot_min),
                icp=IcpConfig(iterations=int(icp_iters),
                              dist_filter_max=float(dist_max),
                              dist_filter_min=float(dist_min))),
        )],
    )
    node = SlamNode(cfg, dtype=jnp.float64)

    ref_poses = np.asarray(golden["pose_trace"]).reshape(-1, 3, 3)
    ref_flags = np.asarray(golden["flags"])

    got_poses = []
    got_sig = []
    for k in range(len(scans)):
        ranges = np.where(scans[k] >= 1e29, np.inf, scans[k])
        msg = LaserScan(ranges=ranges, angle_min=float(phi_min),
                        angle_increment=float(ang_res),
                        range_max=float(max_range), stamp=float(k))
        out = node.process_scan(0, msg)
        loc = node.localizers[0]
        got_poses.append(np.asarray(loc.pose))
        if k == 0:
            assert out is None
            got_sig.append(1)                       # init push
        else:
            assert out is not None and not math.isnan(out.x)
            got_sig.append(1 if np.allclose(np.asarray(loc.last_pose),
                                            np.asarray(loc.pose)) else 0)

    got_poses = np.asarray(got_poses)
    # gate decisions must match scan for scan (the discrete behavior)
    np.testing.assert_array_equal(np.asarray(got_sig), ref_flags[:, 1],
                                  err_msg="significance gates")
    assert ref_flags[:, 0].sum() == 0                # no reg errors either side

    # pose traces must agree to well below a cell (exact-arithmetic
    # differences only: compacted vs masked pairing order, fast-raycast
    # knife-edge beams)
    dpos = np.abs(got_poses[:, :2, 2] - ref_poses[:, :2, 2])
    drot = np.abs(got_poses[:, 0, 0] - ref_poses[:, 0, 0])
    assert dpos.max() < 1e-4, dpos.max()
    assert drot.max() < 1e-4, drot.max()
