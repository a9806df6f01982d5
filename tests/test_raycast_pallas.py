"""Pallas candidate-search kernel vs the jnp reference (interpret mode).

The on-chip (Mosaic-compiled) equivalence is asserted by bench.py, which
compares raycast_fast with USE_PALLAS on/off on the real TPU.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ohm_tsd_slam_tpu.config import GridConfig
from ohm_tsd_slam_tpu.core import se2
from ohm_tsd_slam_tpu.grid import create, push
import ohm_tsd_slam_tpu.grid.raycast_fast as rf
from ohm_tsd_slam_tpu.ops.raycast_pallas import (
    pad_beams,
    pack_segments,
    segment_min_pallas,
)
from ohm_tsd_slam_tpu.sensor import polar2d
from ohm_tsd_slam_tpu.utils.testing import rect_walls, simulate_scan

CFG = GridConfig(map_size=8, cellsize=0.04)
GEOM = dict(size=361, angular_res=math.radians(0.75),
            phi_min=math.radians(-135.0), max_range=9.0,
            min_range=0.01, low_reflectivity_range=1.0)


def _scene():
    geom = polar2d.SensorPolar2D(**GEOM)
    grid = create(CFG, dtype=jnp.float32)
    walls = rect_walls(1.5, 1.5, 8.5, 8.5)
    for pose_xyt in [(5.12, 5.12, 0.2), (5.3, 5.2, 0.5)]:
        pose = np.array(se2.make(*pose_xyt, dtype=jnp.float64))
        r = simulate_scan(pose, GEOM["size"], GEOM["angular_res"],
                          GEOM["phi_min"], GEOM["max_range"],
                          segments=walls,
                          circles=[((7.0, 7.2), 0.5), ((3.0, 7.5), 0.35)])
        data, mask = polar2d.standard_mask(geom, jnp.asarray(r, jnp.float32))
        grid = push(grid, geom, jnp.asarray(pose, jnp.float32), data, mask)
    return grid, geom


def _geometry(grid, geom, pose_xyt=(5.12, 5.12, 0.2)):
    dtype = jnp.float32
    pose = jnp.asarray(np.array(se2.make(*pose_xyt)), dtype)
    ray = se2.rotate_vectors(pose, geom.rays_local(dtype)) * grid.cell_size
    tr = se2.translation(pose)
    B = geom.size
    lo = jnp.zeros(B, dtype)
    hi = jnp.full(B, 400.0, dtype)
    return pose, ray, tr, lo, hi


def test_kernel_matches_jnp_candidates():
    grid, geom = _scene()
    pose, ray, tr, lo, hi = _geometry(grid, geom)
    dtype = jnp.float32
    B = geom.size

    p0, p1, sv, nd = rf._isocontour_segments(grid)
    assert int(nd) == 0

    for t_after_val in (0.0, 50.0):
        t_after = jnp.full(B, t_after_val, dtype)
        ref = rf._segment_candidates(p0, p1, sv, tr, ray, lo, hi, t_after)
        segpack, count = pack_segments(p0, p1, sv)
        assert int(count) == int(sv.sum())
        beams = pad_beams(ray, lo, hi, t_after, tr)
        got = segment_min_pallas(segpack, beams, count,
                                 interpret=True)[:B, 0]

        ref_n = np.array(ref)
        got_n = np.array(got)
        np.testing.assert_array_equal(np.isfinite(ref_n),
                                      np.isfinite(got_n))
        fin = np.isfinite(ref_n)
        np.testing.assert_allclose(got_n[fin], ref_n[fin], rtol=1e-4)


def test_kernel_levels_match_sequential_rounds():
    """The K-level output must equal the sequential per-round candidate
    searches of the replay loop (level k = earliest t >= level k-1 +
    cover)."""
    grid, geom = _scene()
    pose, ray, tr, lo, hi = _geometry(grid, geom)
    dtype = jnp.float32
    B = geom.size
    cover = 6.0

    p0, p1, sv, _ = rf._isocontour_segments(grid)
    segpack, count = pack_segments(p0, p1, sv)
    beams = pad_beams(ray, lo, hi, lo, tr)
    levels = segment_min_pallas(segpack, beams, count, levels=4,
                                cover=cover, interpret=True)[:B]

    bound = lo
    for k in range(4):
        ref = rf._segment_candidates(p0, p1, sv, tr, ray, lo, hi, bound)
        ref_n = np.array(ref)
        got_n = np.array(levels[:, k])
        np.testing.assert_array_equal(np.isfinite(ref_n),
                                      np.isfinite(got_n))
        fin = np.isfinite(ref_n)
        np.testing.assert_allclose(got_n[fin], ref_n[fin], rtol=1e-4)
        bound = jnp.where(jnp.isfinite(ref), ref + cover, jnp.inf)


def test_kernel_count_truncation_excludes_tail():
    """Segments past `count` must not contribute (the runtime chunk-count
    loop bound)."""
    grid, geom = _scene()
    pose, ray, tr, lo, hi = _geometry(grid, geom)

    p0, p1, sv, _ = rf._isocontour_segments(grid)
    segpack, count = pack_segments(p0, p1, sv)
    beams = pad_beams(ray, lo, hi, lo, tr)

    full = segment_min_pallas(segpack, beams, count, interpret=True)
    none = segment_min_pallas(segpack, beams, jnp.int32(0),
                              interpret=True)
    assert np.isfinite(np.array(full)).sum() > 0
    assert not np.isfinite(np.array(none)).any()


def test_kernel_custom_vmap_folds_pose_batch():
    """vmap over poses must fold into the beam axis (one shared segment
    pack, batch-size-independent VMEM) and match per-pose calls."""
    grid, geom = _scene()
    dtype = jnp.float32
    B = geom.size
    p0, p1, sv, _ = rf._isocontour_segments(grid)
    segpack, count = pack_segments(p0, p1, sv)

    def per_pose(dx):
        pose = se2.make(5.12 + dx, 5.12 - dx, 0.2 + dx, dtype=dtype)
        ray = se2.rotate_vectors(pose, geom.rays_local(dtype)) \
            * grid.cell_size
        tr = se2.translation(pose)
        lo = jnp.zeros(B, dtype)
        hi = jnp.full(B, 400.0, dtype)
        return pad_beams(ray, lo, hi, lo, tr)

    deltas = jnp.linspace(-0.05, 0.05, 4, dtype=dtype)
    beams_b = jax.vmap(per_pose)(deltas)           # tuple of [4, Bp]

    got = jax.vmap(
        lambda bm: segment_min_pallas(segpack, bm, count, interpret=True)
    )(beams_b)
    for i in range(4):
        one = segment_min_pallas(segpack,
                                 tuple(a[i] for a in beams_b), count,
                                 interpret=True)
        np.testing.assert_allclose(np.array(got[i]), np.array(one),
                                   rtol=1e-6)


def test_kernel_resolved_block_skips_work():
    """Beam attrs with every t_after = +inf must return inf candidates
    (the in-kernel early exit)."""
    grid, geom = _scene()
    dtype = jnp.float32
    B = geom.size
    pose, ray, tr, lo, hi = _geometry(grid, geom)

    p0, p1, sv, _ = rf._isocontour_segments(grid)
    segpack, count = pack_segments(p0, p1, sv)
    beams = pad_beams(ray, lo, hi, jnp.full(B, jnp.inf, dtype), tr)
    out = segment_min_pallas(segpack, beams, count, interpret=True)
    assert not np.isfinite(np.array(out)).any()


def test_raycast_fast_pallas_path_matches_jnp_on_cpu():
    """Force the Pallas candidate path in interpret mode end-to-end
    through raycast_fast and compare with the pure-jnp path."""
    grid, geom = _scene()
    pose = jnp.asarray(np.array(se2.make(5.12, 5.12, 0.2)), jnp.float32)

    r_jnp = rf.raycast_fast(grid, geom, pose)

    # build a cache with the pallas pack by hand (CPU => interpret)
    p0, p1, sv, nd = rf._isocontour_segments(grid)
    origin = rf._pack_origin(grid, jnp.float32)
    pack, count = pack_segments(p0 - origin, p1 - origin, sv)
    cache = rf.SegmentCache(p0, p1, sv, nd, pack, count, origin)

    import ohm_tsd_slam_tpu.ops.raycast_pallas as rp
    orig = rp.segment_min_pallas
    try:
        rp_interp = lambda *a, **k: orig(*a, **{**k, "interpret": True})
        rp.segment_min_pallas = rp_interp
        rf_mod_attr = rf.raycast_fast(grid, geom, pose, segments=cache)
    finally:
        rp.segment_min_pallas = orig

    np.testing.assert_array_equal(np.asarray(r_jnp.mask),
                                  np.asarray(rf_mod_attr.mask))
    m = np.asarray(r_jnp.mask)
    np.testing.assert_allclose(np.asarray(rf_mod_attr.coords)[m],
                               np.asarray(r_jnp.coords)[m], atol=1e-4)


def test_window_block_kernel_matches_jnp_replay():
    """ops/window_block_pallas.py vs _window_events + interpolate_normal
    (interpret mode): for beams that fit their block patch, events must
    agree exactly; positions/interp/normals to FMA-fusion tolerance (the
    kernel and the XLA gather path are separate compilations, so f32
    mul+add chains may contract differently by an ulp)."""
    from ohm_tsd_slam_tpu.grid.interpolate import interpolate_normal
    from ohm_tsd_slam_tpu.ops.window_block_pallas import (
        KG,
        block_patches,
        supports_block_kernel,
        window_block_pallas,
    )

    grid, geom = _scene()
    assert supports_block_kernel(grid)
    pose, ray, tr, lo, hi = _geometry(grid, geom)
    dtype = jnp.float32
    B = geom.size

    # candidates from the jnp reference path
    p0, p1, sv, _ = rf._isocontour_segments(grid)
    idx_min = jnp.full((B,), 2.0, dtype)
    idx_max = jnp.full((B,), 220.0, dtype)
    t_1 = rf._segment_candidates(p0, p1, sv, tr, ray, idx_min,
                                 jnp.full((B,), 230.0, dtype), idx_min)
    has = jnp.isfinite(t_1)
    k_1 = jnp.where(has, t_1, 0.0)

    ref_hit, ref_any, ref_pos, ref_int = rf._window_events(
        grid, tr, ray, idx_min, idx_max, k_1, has)
    ref_coords = ref_pos + ray * (ref_int[:, None] - 1.0)
    ref_n, ref_nok = interpolate_normal(grid, ref_coords)

    m_start = jnp.maximum(jnp.floor(k_1 - idx_min) - rf.BACKOFF, 0.0)
    t_w0 = idx_min + m_start
    pad = (-B) % KG
    pd = lambda x, f=0.0: jnp.pad(
        x, ((0, pad),) + ((0, 0),) * (x.ndim - 1), constant_values=f)
    tr_rows = jnp.broadcast_to(tr, (B + pad, 2))
    pr, pcs, fits = block_patches(grid, pd(t_w0), pd(ray), tr_rows,
                                  rf.WINDOW)
    hit, any_ev, pos_ev, interp, normals, n_ok = window_block_pallas(
        grid, pd(t_w0), pd(ray), pd(idx_max), pd(has), tr_rows, pr, pcs,
        rf.WINDOW, interpret=True)

    ok = np.asarray(fits[:B] & has)
    assert ok.sum() > 0.8 * int(np.asarray(has).sum())
    np.testing.assert_array_equal(np.asarray(any_ev[:B])[ok],
                                  np.asarray(ref_any)[ok])
    np.testing.assert_array_equal(np.asarray(hit[:B])[ok],
                                  np.asarray(ref_hit)[ok])
    m = ok & np.asarray(ref_hit)
    np.testing.assert_allclose(np.asarray(pos_ev[:B])[m],
                               np.asarray(ref_pos)[m], atol=1e-5)
    np.testing.assert_allclose(np.asarray(interp[:B])[m],
                               np.asarray(ref_int)[m], atol=2e-4)
    np.testing.assert_array_equal(np.asarray(n_ok[:B])[m],
                                  np.asarray(ref_nok)[m])
    nm = m & np.asarray(ref_nok)
    np.testing.assert_allclose(np.asarray(normals[:B])[nm],
                               np.asarray(ref_n)[nm], atol=1e-4)


def test_window_block_kernel_vmap_folds_pose_batch():
    """vmap over poses with a shared grid must fold into the beam axis
    and give the same results as per-pose calls."""
    from ohm_tsd_slam_tpu.ops.window_block_pallas import (
        KG,
        block_patches,
        window_block_pallas,
    )

    grid, geom = _scene()
    dtype = jnp.float32
    B = geom.size
    pad = (-B) % KG
    Bp = B + pad

    def run(pose_xyt):
        pose, ray, tr, lo, hi = _geometry(grid, geom, pose_xyt)
        t_w0 = jnp.full((B,), 150.0, dtype)
        idx_max = jnp.full((B,), 220.0, dtype)
        has = jnp.ones((B,), bool)
        pd = lambda x, f=0.0: jnp.pad(
            x, ((0, pad),) + ((0, 0),) * (x.ndim - 1), constant_values=f)
        tr_rows = jnp.broadcast_to(tr, (Bp, 2))
        pr, pcs, fits = block_patches(grid, pd(t_w0), pd(ray), tr_rows,
                                      rf.WINDOW)
        return pd(t_w0), pd(ray), pd(idx_max), pd(has), tr_rows, pr, pcs, fits

    poses = [(5.12, 5.12, 0.2), (5.2, 5.0, 0.4)]
    packed = [run(p) for p in poses]
    batched = [jnp.stack([pk[i] for pk in packed]) for i in range(7)]

    out_b = jax.vmap(
        lambda tw, ry, im, hs, trr, pr, pcs: window_block_pallas(
            grid, tw, ry, im, hs, trr, pr, pcs, rf.WINDOW,
            interpret=True))(*batched)
    for n, pk in enumerate(packed):
        out_1 = window_block_pallas(grid, *pk[:7], rf.WINDOW,
                                    interpret=True)
        fits = np.asarray(pk[7])
        for a, b in zip(out_b, out_1):
            # assert_array_equal treats NaNs in matching positions as equal
            np.testing.assert_array_equal(np.asarray(a[n])[fits],
                                          np.asarray(b)[fits])


def test_raycast_fast_block_kernel_path_matches_jnp_on_cpu():
    """Force the FULL TPU path (candidate kernel + block window kernel,
    interpret mode) end-to-end through raycast_fast and compare with the
    pure-jnp path."""
    grid, geom = _scene()
    pose = jnp.asarray(np.array(se2.make(5.12, 5.12, 0.2)), jnp.float32)

    r_jnp = rf.raycast_fast(grid, geom, pose)

    p0, p1, sv, nd = rf._isocontour_segments(grid)
    origin = rf._pack_origin(grid, jnp.float32)
    pack, count = pack_segments(p0 - origin, p1 - origin, sv)
    cache = rf.SegmentCache(p0, p1, sv, nd, pack, count, origin)

    import ohm_tsd_slam_tpu.ops.raycast_pallas as rp
    import ohm_tsd_slam_tpu.ops.window_block_pallas as wbp

    orig_min = rp.segment_min_pallas
    orig_win = wbp.window_block_pallas
    orig_single = wbp.window_single_pallas
    orig_tpu = rf._on_tpu
    try:
        rp.segment_min_pallas = (
            lambda *a, **k: orig_min(*a, **{**k, "interpret": True}))
        wbp.window_block_pallas = (
            lambda *a, **k: orig_win(*a, **{**k, "interpret": True}))
        wbp.window_single_pallas = (
            lambda *a, **k: orig_single(*a, **{**k, "interpret": True}))
        rf._on_tpu = lambda: True
        r_k = rf.raycast_fast(grid, geom, pose, segments=cache)
    finally:
        rp.segment_min_pallas = orig_min
        wbp.window_block_pallas = orig_win
        wbp.window_single_pallas = orig_single
        rf._on_tpu = orig_tpu

    np.testing.assert_array_equal(np.asarray(r_jnp.mask),
                                  np.asarray(r_k.mask))
    m = np.asarray(r_jnp.mask)
    np.testing.assert_allclose(np.asarray(r_k.coords)[m],
                               np.asarray(r_jnp.coords)[m], atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_k.normals)[m],
                               np.asarray(r_jnp.normals)[m], atol=1e-3)


def test_window_single_kernel_matches_jnp_replay():
    """ops/window_block_pallas.py::window_single_pallas (per-beam
    patches, interpret mode) vs _window_events + interpolate_normal on
    an arbitrary compacted beam subset — no fit condition at all."""
    from ohm_tsd_slam_tpu.grid.interpolate import interpolate_normal
    from ohm_tsd_slam_tpu.ops.window_block_pallas import (
        window_single_pallas,
    )

    grid, geom = _scene()
    pose, ray, tr, lo, hi = _geometry(grid, geom)
    dtype = jnp.float32
    B = geom.size

    p0, p1, sv, _ = rf._isocontour_segments(grid)
    idx_min = jnp.full((B,), 2.0, dtype)
    idx_max = jnp.full((B,), 220.0, dtype)
    t_1 = rf._segment_candidates(p0, p1, sv, tr, ray, idx_min,
                                 jnp.full((B,), 230.0, dtype), idx_min)
    has = jnp.isfinite(t_1)
    k_1 = jnp.where(has, t_1, 0.0)

    # scattered subset incl. some inactive pad slots
    CAP = 64
    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.sort(rng.choice(B, CAP, replace=False)))
    act = has[idx] & (jnp.arange(CAP) < CAP - 5)

    ref_hit, ref_any, ref_pos, ref_int = rf._window_events(
        grid, tr, ray[idx], idx_min[idx], idx_max[idx],
        jnp.where(act, k_1[idx], 0.0), act)
    ref_coords = ref_pos + ray[idx] * (ref_int[:, None] - 1.0)
    ref_n, ref_nok = interpolate_normal(grid, ref_coords)

    im = idx_min[idx]
    kk = jnp.where(act, k_1[idx], 0.0)
    ms = jnp.maximum(jnp.floor(kk - im) - rf.BACKOFF, 0.0)
    hit, any_ev, pos_ev, interp, normals, n_ok = window_single_pallas(
        grid, im + ms, ray[idx], idx_max[idx], act,
        jnp.broadcast_to(tr, (CAP, 2)), rf.WINDOW, interpret=True)

    am = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(any_ev)[am],
                                  np.asarray(ref_any)[am])
    np.testing.assert_array_equal(np.asarray(hit)[am],
                                  np.asarray(ref_hit)[am])
    m = am & np.asarray(ref_hit)
    np.testing.assert_allclose(np.asarray(pos_ev)[m],
                               np.asarray(ref_pos)[m], atol=1e-5)
    np.testing.assert_allclose(np.asarray(interp)[m],
                               np.asarray(ref_int)[m], atol=2e-4)
    np.testing.assert_array_equal(np.asarray(n_ok)[m],
                                  np.asarray(ref_nok)[m])
    nm = m & np.asarray(ref_nok)
    np.testing.assert_allclose(np.asarray(normals)[nm],
                               np.asarray(ref_n)[nm], atol=1e-4)


def test_segment_layers_kernel_matches_jnp():
    """ops/segment_layers_pallas.py (interpret) vs _segment_layers:
    masks and prefilter row counts exactly; endpoint channels for the
    selected nonzero rows via the lazy _channels_for_rows recompute."""
    from ohm_tsd_slam_tpu.grid.compact import compact_mask
    from ohm_tsd_slam_tpu.ops.segment_layers_pallas import (
        CHUNK as _CH,
        segment_layers_pallas,
        supports_segment_kernel,
    )

    grid, geom = _scene()
    assert supports_segment_kernel(grid)
    ref_mask, ref_chans = rf._segment_layers(grid)
    got_mask, got_cnt = segment_layers_pallas(grid.tsd, interpret=True)

    rm = np.asarray(ref_mask)
    gm = np.asarray(got_mask) > 0
    np.testing.assert_array_equal(rm, gm)
    np.testing.assert_array_equal(
        np.asarray(got_cnt), rm.reshape(-1, _CH).sum(1))

    # lazy endpoint channels on the selected rows == dense channels
    row_cap = 256
    sel, sel_ok = compact_mask(got_cnt > 0, row_cap)
    assert int(np.asarray(got_cnt > 0).sum()) <= row_cap
    got_chans = rf._channels_for_rows(grid, sel, sel_ok, chunk=_CH)
    mrows = rm.reshape(-1, _CH)[np.asarray(sel)]        # [cap, 128]
    mrows &= np.asarray(sel_ok)[:, None]
    for rc, gc in zip(ref_chans, got_chans):
        rrows = np.asarray(rc).reshape(-1, _CH)[np.asarray(sel)]
        np.testing.assert_allclose(np.asarray(gc)[mrows],
                                   rrows[mrows], atol=1e-6)
