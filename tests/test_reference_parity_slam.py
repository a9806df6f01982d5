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


SLAM_TSD_BIN = os.path.join(GOLDEN_DIR, "data", "slam_tsd.bin")
SLAM_TSD_NPZ = os.path.join(GOLDEN_DIR, "data", "slam_tsd_inputs.npz")


@pytest.mark.skipif(not os.path.exists(SLAM_TSD_BIN),
                    reason="golden slam_tsd data not generated")
def test_full_loop_trajectory_parity_tsd():
    """Full-loop parity in the reference's SHIPPED DEFAULT registration
    mode (TSD_PDFMatching seed + ICP refinement, registration_mode: 3,
    config/single-laser.yaml:22; dispatch ThreadLocalize.cpp:558-580) —
    VERDICT r4 missing #3.  The harness resets the deterministic rand
    stream to seed+k per scan; the same draws are replayed here
    (golden_io.DetRand) and injected into match_tsd, so both sides
    score the SAME candidate set against the SAME evolving grid."""
    import math as _math

    import jax

    from ohm_tsd_slam_tpu.config import IcpConfig as _IcpConfig
    from ohm_tsd_slam_tpu.config import (
        RegistrationConfig as _RegistrationConfig,
    )
    from ohm_tsd_slam_tpu.core import se2
    from ohm_tsd_slam_tpu.grid import create, push
    from ohm_tsd_slam_tpu.grid.raycast_fast import raycast_fast
    from ohm_tsd_slam_tpu.grid.state import free_footprint
    from ohm_tsd_slam_tpu.registration.ransac import (
        RansacInject,
        RansacParams,
        match_tsd,
        pca_normals,
    )
    from ohm_tsd_slam_tpu.sensor.polar2d import (
        SensorPolar2D,
        data_to_cartesian,
        standard_mask,
    )
    from ohm_tsd_slam_tpu.slam.localize import (
        LocalizeParams,
        localize_step,
    )

    from golden_io import replay_picks, replay_subsample

    golden = load_golden(SLAM_TSD_BIN)
    inp = np.load(SLAM_TSD_NPZ)
    scans = inp["scans"]
    (cellsize, layout_grid, max_trunc, size, ang_res, phi_min, max_range,
     min_range, low_refl, icp_iters, dist_max, dist_min, trns_max,
     rot_max, trns_min, rot_min) = inp["params"]
    fp_w, fp_h = inp["footprint"]
    (r_trials, r_eps, r_ctl, r_phi_deg, r_zrand, r_seed) = inp["ransac"]
    gt = inp["gt"]

    geom = SensorPolar2D(size=int(size), angular_res=float(ang_res),
                         phi_min=float(phi_min),
                         max_range=float(max_range),
                         min_range=float(min_range),
                         low_reflectivity_range=float(low_refl))
    from ohm_tsd_slam_tpu.config import GridConfig as _GridConfig

    gcfg = _GridConfig(map_size=int(layout_grid), cellsize=float(cellsize),
                       truncation_radius=float(max_trunc / cellsize))
    gw = gcfg.size_meters
    rparams = RansacParams(
        trials=int(r_trials), eps_thresh=float(r_eps),
        size_control_set=int(r_ctl),
        phi_max=math.radians(float(r_phi_deg)),
        resolution=float(ang_res), zrand_tsd=float(r_zrand))
    lparams = LocalizeParams(
        geom=geom,
        icp=__import__("ohm_tsd_slam_tpu.registration.icp",
                       fromlist=["IcpParams"]).IcpParams.from_config(
            _IcpConfig(iterations=int(icp_iters),
                       dist_filter_max=float(dist_max),
                       dist_filter_min=float(dist_min)),
            bounds=(0.0, gw, 0.0, gw)),
        trns_max=float(trns_max), rot_max=float(rot_max),
        trns_min=float(trns_min), rot_min=float(rot_min))

    grid = create(gcfg, dtype=jnp.float64)
    pose = jnp.asarray(np.array([[np.cos(gt[0][2]), -np.sin(gt[0][2]),
                                  gt[0][0]],
                                 [np.sin(gt[0][2]), np.cos(gt[0][2]),
                                  gt[0][1]],
                                 [0.0, 0.0, 1.0]]))
    grid = free_footprint(grid, (float(gt[0][0]), float(gt[0][1])),
                          float(fp_w), float(fp_h))
    last_pose = pose

    rr = rparams.pca_search_range // 2
    N = int(size)
    key0 = jax.random.PRNGKey(0)

    # jit once (static matcher/localize params): the 24-scan loop would
    # otherwise retrace the matcher + ICP every scan (~7 min of compile)
    from ohm_tsd_slam_tpu.grid.raycast_fast import (
        raycast_fast as _rf_fast,
    )

    raycast_j = jax.jit(lambda g, p: _rf_fast(g, geom, p))
    match_j = jax.jit(
        lambda k, g, p, mc, mm, sc, sm, inj: match_tsd(
            k, g, p, mc, mm, sc, sm, rparams, inject=inj))
    loc_j = jax.jit(
        lambda g, p, lp, d, m, tp: localize_step(
            g, p, lp, d, m, lparams, T_prereg=tp))
    push_j = jax.jit(lambda g, p, d, m: push(g, geom, p, d, m))
    pca_j = jax.jit(lambda pts, m: pca_normals(pts, m, rr))

    got_poses, got_err, got_sig = [], [], []
    for k in range(len(scans)):
        ranges = np.where(scans[k] >= 1e29, np.inf, scans[k])
        data, mask = standard_mask(geom, jnp.asarray(ranges))
        if k == 0:
            grid = push_j(grid, pose, data, mask)
            got_poses.append(np.asarray(pose))
            got_err.append(0)
            got_sig.append(1)
            continue

        model = raycast_j(grid, pose)
        scene, smask = data_to_cartesian(geom, data, mask)

        # replay the harness's det_reset(seed + k) rand stream
        _, mask_mp = pca_j(model.coords, model.mask)
        sub, dr = replay_subsample(int(r_seed) + k, np.asarray(smask))
        _, mask_sp_full = pca_j(scene, smask)
        mask_sp = np.asarray(mask_sp_full) & sub
        mask_mp_np = np.asarray(mask_mp)
        idx_s_valid = [i for i in range(rr, N - rr) if mask_sp[i]]
        idx_m_valid = [i for i in range(rr, N - rr) if mask_mp_np[i]]
        ctrl, tidx = replay_picks(dr, idx_s_valid, idx_m_valid,
                                  rparams.trials,
                                  rparams.size_control_set)
        C = rparams.size_control_set
        T = rparams.trials
        ctrl_idx = np.zeros(C, np.int32)
        ctrl_idx[:len(ctrl)] = ctrl
        trial_idx = np.zeros(T, np.int32)
        trial_idx[:len(tidx)] = tidx
        inject = RansacInject(
            sub_mask=jnp.asarray(sub),
            ctrl_idx=jnp.asarray(ctrl_idx),
            ctrl_valid=jnp.asarray(np.arange(C) < len(ctrl)),
            trial_idx=jnp.asarray(trial_idx),
            trial_valid=jnp.asarray(np.arange(T) < len(tidx)))

        T_pre = match_j(key0, grid, pose, model.coords, model.mask,
                        scene, smask, inject)
        res = loc_j(grid, pose, last_pose, data, mask, T_pre)
        pose = res.pose
        if bool(res.significant):
            grid = push_j(grid, pose, data, mask)
            last_pose = pose
        got_poses.append(np.asarray(pose))
        got_err.append(int(bool(res.reg_error)))
        got_sig.append(int(bool(res.significant)))

    ref_poses = np.asarray(golden["pose_trace"]).reshape(-1, 3, 3)
    ref_flags = np.asarray(golden["flags"])
    got_poses = np.asarray(got_poses)

    np.testing.assert_array_equal(np.asarray(got_err), ref_flags[:, 0],
                                  err_msg="registration-error gates")
    np.testing.assert_array_equal(np.asarray(got_sig), ref_flags[:, 1],
                                  err_msg="significance gates")
    dpos = np.abs(got_poses[:, :2, 2] - ref_poses[:, :2, 2])
    drot = np.abs(got_poses[:, 0, 0] - ref_poses[:, 0, 0])
    assert dpos.max() < 1e-4, dpos.max()
    assert drot.max() < 1e-4, drot.max()
