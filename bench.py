"""Benchmark: raycast throughput (rays/s/chip) on the reference's default
workload — 1024^2-cell TSD grid at 0.025 m (SlamNode.cpp:53-54,77), a
1081-beam Hokuyo-class scan (ThreadLocalize.h:297-299).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline derivation: the reference publishes no numbers (BASELINE.md).
Its implicit budget is real-time localization of a 1081-beam scan at
lidar rate on a robot CPU; the 40 Hz upper bound of the cited scan rate
(SURVEY.md §6) gives 1081 * 40 = 43,240 rays/s. vs_baseline is measured
rays/s divided by that.

Extra diagnostics (push/s, scan-match steps/s) go to stderr.
"""

import json
import math
import sys
import time

import numpy as np

BASELINE_RAYS_PER_S = 1081 * 40.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log("devices:", jax.devices())

    from ohm_tsd_slam_tpu.config import GridConfig
    from ohm_tsd_slam_tpu.core import se2
    from ohm_tsd_slam_tpu.grid import create, push
    from ohm_tsd_slam_tpu.grid.raycast import raycast
    from ohm_tsd_slam_tpu.grid.raycast_fast import raycast_fast
    from ohm_tsd_slam_tpu.registration.icp import IcpParams
    from ohm_tsd_slam_tpu.sensor.polar2d import SensorPolar2D, standard_mask
    from ohm_tsd_slam_tpu.slam.localize import LocalizeParams, localize_step
    from ohm_tsd_slam_tpu.utils.testing import rect_walls, simulate_scan

    cfg = GridConfig(map_size=10, cellsize=0.025)   # 1024^2, 25.6 m
    gw = cfg.size_meters
    B = 1081
    geom = SensorPolar2D(size=B, angular_res=math.radians(270.0 / B),
                         phi_min=math.radians(-135.0), max_range=25.0,
                         min_range=0.01, low_reflectivity_range=2.0)

    pose_np = np.array(se2.make(gw / 2, gw / 2, 0.1, dtype=np.float64))
    walls = rect_walls(2.0, 2.0, gw - 2.0, gw - 2.0)
    ranges = simulate_scan(pose_np, B, geom.angular_res, geom.phi_min,
                           geom.max_range, segments=walls,
                           circles=[((gw / 2 + 4, gw / 2 + 4), 0.5)])

    pose = jnp.asarray(pose_np, jnp.float32)
    data, mask = standard_mask(geom, jnp.asarray(ranges, jnp.float32))
    grid = create(cfg, dtype=jnp.float32)
    t0 = time.time()
    grid = push(grid, geom, pose, data, mask)
    jax.block_until_ready(grid.tsd)
    log(f"push compile+run: {time.time()-t0:.2f}s")

    # ---- chained raycast benchmark (amortizes dispatch latency) -------
    N_CHAIN = 20

    @jax.jit
    def ray_chain(grid, pose):
        import dataclasses as _dc

        def body(i, carry):
            acc, tsd = carry
            d = (i.astype(jnp.float32) - N_CHAIN / 2) * 1e-4
            p = pose @ se2.make(d, -d, d, dtype=pose.dtype)
            # touch the grid each iteration so per-scan work (crossing
            # extraction) cannot be CSE-hoisted out of the loop — the
            # SLAM loop interleaves push and raycast, so the honest
            # per-scan cost includes it
            tsd = tsd.at[0, 0].add(d * 1e-30)
            r = raycast_fast(_dc.replace(grid, tsd=tsd), geom, p)
            return acc + jnp.sum(r.ranges), tsd
        acc, _ = jax.lax.fori_loop(0, N_CHAIN, body, (0.0, grid.tsd))
        return acc

    t0 = time.time()
    ray_chain(grid, pose).block_until_ready()
    log(f"raycast compile: {time.time()-t0:.2f}s")

    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.time()
        ray_chain(grid, pose).block_until_ready()
        times.append(time.time() - t0)
    t_ray = min(times) / N_CHAIN
    rays_per_s = B / t_ray
    log(f"raycast: {t_ray*1e3:.3f} ms/scan -> {rays_per_s:,.0f} rays/s")

    # ---- on-chip correctness: Pallas kernels vs jnp reference ----------
    # (interpret-mode tests run on CPU; Mosaic-compiled semantics are
    # asserted here on the real chip — VERDICT r1 weak #3/#6)
    import ohm_tsd_slam_tpu.grid.raycast_fast as rf_mod
    from ohm_tsd_slam_tpu.grid.dispatch import best_push
    from ohm_tsd_slam_tpu.ops.push_pallas import (
        push_pallas,
        supports_pallas_push,
    )

    if jax.default_backend() not in ("cpu", "gpu"):
        if supports_pallas_push(grid):
            g_ref = jax.jit(lambda g: push(g, geom, pose, data, mask))(grid)
            g_pal = jax.jit(
                lambda g: push_pallas(g, geom, pose, data, mask))(grid)
            tr_ = np.asarray(g_ref.tsd)
            tp_ = np.asarray(g_pal.tsd)
            same_nan = np.array_equal(np.isnan(tr_), np.isnan(tp_))
            m_ = ~np.isnan(tr_)
            # the kernel's f32 atan polynomial can bin a cell sitting
            # within ~1e-4 bins of a beam boundary into the neighboring
            # beam (the C++ reference bins in f64; both f32 paths are
            # approximations there) — identical everywhere else
            ndiff = int((np.abs(np.where(m_, tr_ - tp_, 0.0)) > 1e-5).sum())
            frac = ndiff / max(int(m_.sum()), 1)
            dw = float(np.abs(np.asarray(g_ref.weight)
                              - np.asarray(g_pal.weight)).max())
            assert same_nan and frac < 5e-4 and dw < 1e-5, \
                (same_nan, ndiff, frac, dw)
            log(f"on-chip push_pallas == push: OK "
                f"({ndiff} beam-boundary cells differ, "
                f"{100*frac:.4f}% of written)")

        r_pal = jax.jit(lambda g, p: raycast_fast(g, geom, p))(grid, pose)
        rf_mod.USE_PALLAS = False
        try:
            r_jnp = jax.jit(
                lambda g, p: raycast_fast(g, geom, p))(grid, pose)
        finally:
            rf_mod.USE_PALLAS = True
        mp = np.asarray(r_pal.mask)
        mj = np.asarray(r_jnp.mask)
        # the kernel reconstructs cross(p0 - tr, e) from pose-independent
        # packed terms; f32 rounding there can flip a knife-edge grazing
        # beam that the jnp path resolves differently — tolerate a few
        n_mask_diff = int((mp != mj).sum())
        both = mp & mj
        dc = float(np.abs(np.asarray(r_pal.coords)[both]
                          - np.asarray(r_jnp.coords)[both]).max())
        assert n_mask_diff <= 3 and dc < 1e-4, (n_mask_diff, dc)
        log(f"on-chip raycast pallas == jnp: OK "
            f"({n_mask_diff} knife-edge beams differ, "
            f"max dcoord {dc:.2e})")

    # ---- diagnostics: push/s (jnp + Pallas) ----------------------------

    for name, push_fn in (("jnp", push), ("best", best_push(grid))):
        step_push = jax.jit(lambda g, f=push_fn: f(g, geom, pose, data, mask))
        step_push(grid).tsd.block_until_ready()
        t0 = time.time()
        for _ in range(20):
            g2 = step_push(grid)
        jax.block_until_ready(g2.tsd)
        dt = (time.time() - t0) / 20
        log(f"push[{name}]: {dt*1e3:.2f} ms -> {1/dt:,.1f} pushes/s")

    # ---- diagnostics: differentiable render fwd+bwd rays/s -------------
    from ohm_tsd_slam_tpu.grid.render import render_ranges

    import dataclasses as _dc

    def render_loss(tsd, p):
        g = _dc.replace(grid, tsd=tsd)
        r, _, _ = render_ranges(g, geom, p)
        return jnp.sum(r)

    grad_fn = jax.jit(jax.grad(render_loss, argnums=(0, 1)))
    dg, dp = grad_fn(grid.tsd, pose)
    jax.block_until_ready(dp)
    t0 = time.time()
    for _ in range(10):
        dg, dp = grad_fn(grid.tsd, pose)
    jax.block_until_ready(dp)
    dt = (time.time() - t0) / 10
    log(f"render fwd+bwd: {dt*1e3:.2f} ms -> {B/dt:,.0f} rays/s (fwd+bwd)")

    # ---- diagnostics: scan-match steps/s (ICP and direct GN) -----------
    params = LocalizeParams(
        geom=geom, icp=IcpParams(iterations=25, bounds=(0., gw, 0., gw)))
    step = jax.jit(lambda g, p, d, m: localize_step(g, p, p, d, m, params))
    out = step(grid, pose, data, mask)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = step(grid, pose, data, mask)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    log(f"localize_step[icp]: {dt*1e3:.2f} ms -> {1/dt:,.1f} scan-matches/s "
        f"({25/dt:,.0f} ICP iters/s)")

    from ohm_tsd_slam_tpu.config import RegMode
    from ohm_tsd_slam_tpu.registration.gauss_newton import GnParams

    params_gn = LocalizeParams(
        geom=geom, icp=params.icp, mode=int(RegMode.GN),
        gn=GnParams(iterations=30))
    step_gn = jax.jit(
        lambda g, p, d, m: localize_step(g, p, p, d, m, params_gn))
    out = step_gn(grid, pose, data, mask)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(20):
        out = step_gn(grid, pose, data, mask)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 20
    log(f"localize_step[gn]: {dt*1e3:.2f} ms -> {1/dt:,.1f} scan-matches/s "
        f"({30/dt:,.0f} GN iters/s)")

    # ---- chip-saturation: batched raycast over many poses --------------
    # single 1081-beam scans underutilize the chip; the AMCL/multi-robot
    # workload raycasts many poses against one grid — report that
    # saturation throughput too (VERDICT r1 #5)
    NPOSE = 128
    deltas = jnp.linspace(-0.05, 0.05, NPOSE, dtype=jnp.float32)

    @jax.jit
    def ray_batch(grid, pose):
        def one(d):
            p = pose @ se2.make(d, -d, d * 2.0, dtype=pose.dtype)
            return jnp.sum(raycast_fast(grid, geom, p).ranges)
        return jnp.sum(jax.vmap(one)(deltas))

    ray_batch(grid, pose).block_until_ready()
    t0 = time.time()
    for _ in range(5):
        out = ray_batch(grid, pose)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    sat_rays = B * NPOSE / dt
    log(f"raycast saturation ({NPOSE} poses): {dt*1e3:.2f} ms "
        f"-> {sat_rays:,.0f} rays/s/chip "
        f"({sat_rays/rays_per_s:.1f}x single-scan)")

    @jax.jit
    def render_batch(tsd, pose):
        import dataclasses as _dc
        g = _dc.replace(grid, tsd=tsd)

        def one(d):
            p = pose @ se2.make(d, -d, d * 2.0, dtype=pose.dtype)
            r, _, _ = render_ranges(g, geom, p)
            return jnp.sum(r)
        return jnp.sum(jax.vmap(one)(deltas))

    gbatch = jax.jit(jax.grad(render_batch, argnums=(0, 1)))
    dgb, dpb = gbatch(grid.tsd, pose)
    jax.block_until_ready(dpb)
    t0 = time.time()
    for _ in range(3):
        dgb, dpb = gbatch(grid.tsd, pose)
    jax.block_until_ready(dpb)
    dt = (time.time() - t0) / 3
    log(f"render fwd+bwd saturation ({NPOSE} poses): {dt*1e3:.2f} ms "
        f"-> {B*NPOSE/dt:,.0f} rays/s/chip (fwd+bwd)")

    print(json.dumps({
        "metric": "raycast_rays_per_sec_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
