"""Fast TPU raycast: marching-squares isocontour + MXU ray-segment
intersection + exact window replay.

Motivation: XLA lowers random 2D gathers to a slow serial path on TPU, so
the dense [beams x steps] march of grid/raycast.py spends most of its
time in gathers.  This caster reformulates the search so the heavy work
runs on dense element-wise ops and MXU matmuls, leaving only
O(beams x window) gathers:

  1. isocontour extraction: a vectorized marching-squares pass over the
     cell-center grid turns the TSD zero level set into line segments —
     sign patterns, edge-crossing interpolation and the saddle-point
     decider for the ambiguous (4-crossing) case are all dense
     element-wise ops over [H-1, W-1] quads.  Quads with a NaN corner
     emit nothing (bilinear interpolation there returns ISNAN, so the
     exact march can never produce an event inside them);
  2. butterfly compaction of the segments to a fixed-size list
     (scatter-free jnp.nonzero replacement; endpoint coordinates ride
     along as value channels);
  3. per-beam candidates from EXACT ray-segment intersection: with
     per-segment precomputations, `t = c0[s] / denom[s,b]` and
     `u = c1[s,b] / denom[s,b]` where denom and c1 are [S,2] @ [2,B]
     matmuls (MXU-native).  A beam gets a candidate only where it truly
     crosses the level set — grazing surfaces that approach the beam
     without crossing produce no candidates (the failure mode of
     angular-band / corridor splats);
  4. each candidate seeds a window where the EXACT march of
     RayCastPolar2D.cpp:237-270 (bilinear taps at idx_min + integer
     steps, +to- hit, -to+ back-face reject, NaN skip) is replayed; the
     first window's event decides, a second window at the next
     intersection covers double-crossings inside one step (the march
     sees no sign change there and must continue).

Model points agree with the exact march beam-for-beam on the golden
scenario (asserted against the compiled C++ reference in
tests/test_reference_parity.py); residual disagreement is confined to
knife-edge tangencies where the linearized isocontour and the sampled
march disagree about grazing contact.

Overflow: segments beyond MAX_SEGMENTS are dropped by the compaction;
the count is exposed as RaycastResult.n_dropped and `raycast_checked`
falls back to the exact march when it is nonzero (no silent caps).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ohm_tsd_slam_tpu.core import se2
from ohm_tsd_slam_tpu.grid.compact import compact_mask, compact_mask_values
from ohm_tsd_slam_tpu.grid.interpolate import (
    INTERPOLATE_SUCCESS,
    interpolate_bilinear,
    interpolate_normal,
)
from ohm_tsd_slam_tpu.grid.raycast import RaycastResult
from ohm_tsd_slam_tpu.grid.state import TsdGrid
from ohm_tsd_slam_tpu.sensor.polar2d import SensorPolar2D

# max isocontour segments kept; segments beyond this are dropped AND
# counted (n_dropped; a 1024^2 map of corridors has ~10-30k segments)
MAX_SEGMENTS = 32768
WINDOW = 8           # refine samples per candidate window
BACKOFF = 2.0        # window starts this many steps before the candidate
# backward-compat alias (overflow capacity)
MAX_CROSSINGS = MAX_SEGMENTS
# candidate/replay rounds (see raycast_fast docstring)
ROUNDS = 4
# set False to force the jnp candidate search on TPU (testing/debug)
USE_PALLAS = True


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def _isocontour_segments(grid: TsdGrid, max_segments: int = None):
    """Marching squares over cell-center quads -> compacted segments.

    Returns (p0 [S,2], p1 [S,2], valid [S], n_dropped) in world meters,
    S = max_segments (overflow is counted, never silent).

    The compaction runs in the Pallas kernel (ops/compact_pallas.py) on
    TPU f32 grids — the XLA butterfly+assembly costs ~5 ms on a 1024^2
    grid vs ~0.3 ms on-chip — and falls back to grid/compact.py
    elsewhere (identical results; asserted in tests).
    """
    if max_segments is None:
        max_segments = MAX_SEGMENTS   # resolved at call time (patchable)

    use_pallas = USE_PALLAS and grid.tsd.dtype == jnp.float32 and _on_tpu()
    mask = chans = row_cnt = None
    if use_pallas:
        from ohm_tsd_slam_tpu.ops.segment_layers_pallas import (
            segment_layers_pallas,
            supports_segment_kernel,
        )

        if supports_segment_kernel(grid):
            # fused marching squares: the XLA _segment_layers spends
            # ~2.4 ms materializing its ~20 intermediate [H, W] arrays;
            # the kernel writes only the layer MASK + row counts —
            # endpoint channels are recomputed below for the selected
            # rows only (_channels_for_rows)
            mask, row_cnt = segment_layers_pallas(grid.tsd)
    if mask is None:
        mask, chans = _segment_layers(grid)

    if use_pallas:
        from ohm_tsd_slam_tpu.grid.compact import pack_channels_rows
        from ohm_tsd_slam_tpu.ops.compact_pallas import (
            CHUNK as _CHUNK,
            R_BLK as _R_BLK,
            ROW_CAP,
        )

        if (mask.shape[0] % (_R_BLK * _CHUNK) == 0
                and mask.shape[0] // _CHUNK >= ROW_CAP):
            # row prefilter: only ~1-5% of 128-lane rows carry segments;
            # gather the nonzero rows so the sequential append kernel
            # (and the butterfly) touch ROW_CAP rows instead of all.
            # Row counts come from the segment kernel, or an MXU matvec
            # (XLA's lane-axis bool reduction costs ~1.3 ms on the
            # 131072-row layer stack).
            m2f = mask.reshape(-1, _CHUNK).astype(jnp.float32)
            if row_cnt is None:
                row_cnt = (m2f @ jnp.ones((_CHUNK,), jnp.float32)
                           ).astype(jnp.int32)
            total = jnp.sum(row_cnt)
            sel, sel_ok = compact_mask(row_cnt > 0, ROW_CAP)
            if chans is None:
                # lazy channels: endpoints for the <=ROW_CAP selected
                # rows only, straight from the TSD field
                m2s = jnp.where(sel_ok[:, None], m2f[sel], 0.0) > 0.0
                chans_s = _channels_for_rows(grid, sel, sel_ok)
            else:
                # dense channels (XLA fallback layers): mask + channels
                # ride one fused gather instead of five
                big = jnp.concatenate(
                    [m2f] + [c.reshape(-1, _CHUNK) for c in chans],
                    axis=1)
                bigs = jnp.where(sel_ok[:, None], big[sel], 0.0)
                m2s = bigs[:, :_CHUNK] > 0.0
                chans_s = tuple(
                    bigs[:, (k + 1) * _CHUNK:(k + 2) * _CHUNK]
                    for k in range(4))
            counted = jnp.sum(jnp.where(sel_ok, row_cnt[sel], 0))

            # order-preserving pack: block kernel (butterfly + staged
            # roll + one-hot matmul accumulation per 128-row block,
            # empty blocks skipped) — bit-identical to the XLA
            # pack_channels_rows, which streamed the full ROW_CAP
            # capacity through HBM (~0.38 ms/extraction, VERDICT r4 #5)
            from ohm_tsd_slam_tpu.ops.pack_rows_pallas import (
                pack_channels_rows_pallas,
            )

            packed, stored = pack_channels_rows_pallas(
                m2s.reshape(-1), tuple(c.reshape(-1) for c in chans_s),
                max_segments)
            p0 = jnp.stack([packed[0, :max_segments],
                            packed[1, :max_segments]], axis=-1)
            p1 = jnp.stack([packed[2, :max_segments],
                            packed[3, :max_segments]], axis=-1)
            svalid = packed[4, :max_segments] > 0.0
            # drops: rows beyond ROW_CAP plus capacity overflow
            n_dropped = (total - counted
                         + jnp.maximum(counted - max_segments, 0))
            return p0, p1, svalid, n_dropped

    if mask.dtype != bool:      # f32 0/1 from the segment kernel
        mask = mask > 0.0
    n_total = jnp.sum(mask, dtype=jnp.int32)
    n_dropped = jnp.maximum(n_total - max_segments, 0)
    _, vals, valid = compact_mask_values(mask, chans, max_segments)
    p0 = jnp.stack([vals[0], vals[1]], axis=-1)
    p1 = jnp.stack([vals[2], vals[3]], axis=-1)
    return p0, p1, valid, n_dropped


def _ms_crossing(a, b):
    """Marching-squares edge-crossing predicate (shared helper)."""
    return ((a > 0) & (b < 0)) | ((a < 0) & (b > 0))


def _ms_frac(a, b):
    return a / (a - b)


def _quad_segments(v00, v01, v11, v10, qx, qy, s):
    """Per-quad marching-squares endpoint formulas — the ONE copy of
    the crossing/interpolation/first-last/saddle geometry shared by the
    dense `_segment_layers` and the lazy `_channels_for_rows`
    (ADVICE r4 #3; the Pallas mask kernel replicates the MASK subset in
    kernel language, asserted equal in tests/test_raycast_pallas.py).

    Corners: v00=(y,x), v01=(y,x+1), v11=(y+1,x+1), v10=(y+1,x);
    qx/qy broadcastable quad indices (float).  Returns a dict with the
    per-layer endpoints + masks, bit-identical to the pre-refactor
    formulas (identical operation order).
    """
    quad_ok = ~(jnp.isnan(v00) | jnp.isnan(v01)
                | jnp.isnan(v11) | jnp.isnan(v10))

    # edges: bottom (v00-v01), right (v01-v11), top (v10-v11),
    # left (v00-v10); crossing points in world coords
    cb = _ms_crossing(v00, v01)
    cr = _ms_crossing(v01, v11)
    ct = _ms_crossing(v10, v11)
    cl = _ms_crossing(v00, v10)

    Bx = (qx + 0.5 + _ms_frac(v00, v01)) * s
    By = jnp.broadcast_to((qy + 0.5) * s, Bx.shape)
    Rx = jnp.broadcast_to((qx + 1.5) * s, Bx.shape)
    Ry = (qy + 0.5 + _ms_frac(v01, v11)) * s
    Tx = (qx + 0.5 + _ms_frac(v10, v11)) * s
    Ty = jnp.broadcast_to((qy + 1.5) * s, Bx.shape)
    Lx = jnp.broadcast_to((qx + 0.5) * s, Bx.shape)
    Ly = (qy + 0.5 + _ms_frac(v00, v10)) * s
    Px = [Bx, Rx, Tx, Lx]
    Py = [By, Ry, Ty, Ly]

    F = [cb & quad_ok, cr & quad_ok, ct & quad_ok, cl & quad_ok]
    n_crossed = sum(f.astype(jnp.int32) for f in F)

    # two-crossing quads: the segment joins the first and last crossed
    # edge in B,R,T,L order (unique for n == 2)
    first = jnp.where(F[0], 0, jnp.where(F[1], 1,
            jnp.where(F[2], 2, jnp.where(F[3], 3, 0))))
    last = jnp.where(F[3], 3, jnp.where(F[2], 2,
           jnp.where(F[1], 1, jnp.where(F[0], 0, 3))))

    def pick(P, idx):
        # dense 4-way select (take_along_axis lowers to a serial gather
        # on TPU: ~11 ms per pick on a 1024^2 grid)
        out = P[0]
        for k in (1, 2, 3):
            out = jnp.where(idx == k, P[k], out)
        return out

    two = quad_ok & (n_crossed == 2)
    four = quad_ok & (n_crossed == 4)

    # saddle decider for the ambiguous case: the bilinear saddle value
    # (v00*v11 - v01*v10)/(v00 + v11 - v01 - v10) decides connectivity —
    # exact topology of a bilinear field.  saddle sign == sign(v00):
    # the v01/v10 corners are isolated -> segments (B,R) and (T,L);
    # otherwise v00/v11 are isolated -> (B,L) and (T,R).
    den = v00 + v11 - v01 - v10
    saddle = jnp.where(jnp.abs(den) > 0, (v00 * v11 - v01 * v10)
                       / jnp.where(den == 0, 1.0, den), 0.0)
    same00 = (saddle > 0) == (v00 > 0)

    # segment 1: two-crossing join, or (B, R or L) for saddle quads
    s1_p0x = jnp.where(four, Px[0], pick(Px, first))
    s1_p0y = jnp.where(four, Py[0], pick(Py, first))
    s1_p1x = jnp.where(four, jnp.where(same00, Px[1], Px[3]),
                       pick(Px, last))
    s1_p1y = jnp.where(four, jnp.where(same00, Py[1], Py[3]),
                       pick(Py, last))

    # segment 2 only on saddle quads: (T, L or R)
    s2_p1x = jnp.where(same00, Px[3], Px[1])
    s2_p1y = jnp.where(same00, Py[3], Py[1])

    return dict(quad_ok=quad_ok, two=two, four=four, Px=Px, Py=Py,
                s1_p0x=s1_p0x, s1_p0y=s1_p0y, s1_p1x=s1_p1x,
                s1_p1y=s1_p1y, s2_p0x=Px[2], s2_p0y=Py[2],
                s2_p1x=s2_p1x, s2_p1y=s2_p1y)


def _segment_layers(grid: TsdGrid):
    """Dense marching-squares + virtual-segment layers.

    Returns (mask [4*H*W] bool, (p0x, p0y, p1x, p1y) flat channels).
    """
    s = grid.cell_size
    tsd = grid.tsd
    H, W = tsd.shape
    dtype = tsd.dtype

    v00 = tsd[:-1, :-1]          # corner (y,   x)
    v01 = tsd[:-1, 1:]           # corner (y,   x+1)
    v11 = tsd[1:, 1:]            # corner (y+1, x+1)
    v10 = tsd[1:, :-1]           # corner (y+1, x)

    qx = jnp.arange(W - 1, dtype=dtype)[None, :]
    qy = jnp.arange(H - 1, dtype=dtype)[:, None]
    q = _quad_segments(v00, v01, v11, v10, qx, qy, s)
    quad_ok = q["quad_ok"]

    def crossing(a, b):
        return _ms_crossing(a, b)

    def frac(a, b):
        return _ms_frac(a, b)

    s1_p0x, s1_p0y = q["s1_p0x"], q["s1_p0y"]
    s1_p1x, s1_p1y = q["s1_p1x"], q["s1_p1y"]
    s1_mask = q["two"] | q["four"]
    s2_p0x, s2_p0y = q["s2_p0x"], q["s2_p0y"]
    s2_p1x, s2_p1y = q["s2_p1x"], q["s2_p1y"]
    s2_mask = q["four"]

    # --- virtual segments for NaN-adjacent crossings ---------------------
    # A crossed edge both of whose adjacent quads have a NaN corner (the
    # thin unseen side of a wall) belongs to no marching-squares segment,
    # yet the exact march can still see a sign change across it (its
    # samples only need their OWN 4-tap stencils valid).  Emit a short
    # segment through the crossing point, transverse to the cell pair —
    # the level set crosses the edge, so locally it runs roughly
    # perpendicular to it; the exact window replay resolves the rest.
    clean = s1_mask                                       # [Hq, Wq]
    VIRT = 0.9 * s

    # h-edge (y, x): bottom edge of quad (y, x), top edge of quad (y-1, x)
    ev_h_full = crossing(tsd[:, :-1], tsd[:, 1:])          # [H, W-1]
    clean_h = jnp.pad(clean, ((0, 1), (0, 0)))             # quad (y, x)
    clean_h_up = jnp.pad(clean, ((1, 0), (0, 0)))          # quad (y-1, x)
    virt_h = ev_h_full & ~(clean_h | clean_h_up)
    fh = frac(tsd[:, :-1], tsd[:, 1:])
    hx = (jnp.arange(W - 1, dtype=dtype)[None, :] + 0.5 + fh) * s
    hy = jnp.broadcast_to(
        (jnp.arange(H, dtype=dtype)[:, None] + 0.5) * s, hx.shape)
    vh_p0x, vh_p0y = hx, hy - VIRT
    vh_p1x, vh_p1y = hx, hy + VIRT

    # v-edge (y, x): left edge of quad (y, x), right edge of quad (y, x-1)
    ev_v_full = crossing(tsd[:-1, :], tsd[1:, :])          # [H-1, W]
    clean_v = jnp.pad(clean, ((0, 0), (0, 1)))
    clean_v_left = jnp.pad(clean, ((0, 0), (1, 0)))
    virt_v = ev_v_full & ~(clean_v | clean_v_left)
    fv = frac(tsd[:-1, :], tsd[1:, :])
    vy = (jnp.arange(H - 1, dtype=dtype)[:, None] + 0.5 + fv) * s
    vx = jnp.broadcast_to(
        (jnp.arange(W, dtype=dtype)[None, :] + 0.5) * s, vy.shape)
    vv_p0x, vv_p0y = vx - VIRT, vy
    vv_p1x, vv_p1y = vx + VIRT, vy

    # pad all layers back to [H, W] so one compaction covers them
    def pad(a):
        return jnp.pad(a, ((0, H - a.shape[0]), (0, W - a.shape[1])))

    mask = jnp.stack([pad(s1_mask), pad(s2_mask),
                      pad(virt_h), pad(virt_v)]).reshape(-1)
    chans = tuple(
        jnp.stack([pad(a), pad(b), pad(c), pad(d)]).reshape(-1)
        for a, b, c, d in ((s1_p0x, s2_p0x, vh_p0x, vv_p0x),
                           (s1_p0y, s2_p0y, vh_p0y, vv_p0y),
                           (s1_p1x, s2_p1x, vh_p1x, vv_p1x),
                           (s1_p1y, s2_p1y, vh_p1y, vv_p1y)))
    return mask, chans


def _channels_for_rows(grid: TsdGrid, sel: jnp.ndarray,
                       sel_ok: jnp.ndarray, chunk: int = 128):
    """Endpoint channels (p0x, p0y, p1x, p1y) for SELECTED 128-lane
    rows of the flat layer stack, recomputed from the TSD field.

    The Pallas segment kernel (ops/segment_layers_pallas.py) emits only
    the mask + row counts; since ~0.1% of rows are nonzero, computing
    endpoints for the <=ROW_CAP selected rows here costs a [R, 129]
    gather + trivial VPU work instead of 4 dense [4*H, W] arrays
    written by the kernel and re-read by the compaction prefilter.

    sel: [R] flat chunk-row indices into [4*H*W/chunk] (layer-major,
    as produced by _segment_layers / the kernel); sel_ok masks padding.
    Returns 4 float arrays [R, chunk] that match _segment_layers'
    channels bit-for-bit on masked lanes (identical formulas and
    operation order).
    """
    s = grid.cell_size
    tsd = grid.tsd
    H, W = tsd.shape
    dtype = tsd.dtype
    rows_per_layer = (H * W) // chunk
    cpr = W // chunk

    lay = sel // rows_per_layer
    q = sel % rows_per_layer
    y = q // cpr
    c = q % cpr

    # chunk-aligned corner gathers: view the field as [H*cpr, chunk]
    # chunk-rows and fetch rows (y,c), (y,c+1), (y+1,c), (y+1,c+1) —
    # four MAJOR-dimension row gathers (the efficient kind on TPU; a
    # per-row dynamic_slice window costs ~3.6 ms in serial gather taps).
    # Out-of-range rows clamp; they only reach lanes the mask excludes
    # (x = W-1 quads, y = H-1 quads).
    A = tsd.reshape(H * cpr, chunk)
    r00 = y * cpr + c
    a00 = A[r00]                                     # rows y,   chunk c
    a0n = A[jnp.minimum(r00 + 1, H * cpr - 1)]       # rows y,   chunk c+1
    r10 = jnp.minimum(y + 1, H - 1) * cpr + c
    a10 = A[r10]                                     # rows y+1, chunk c
    a1n = A[jnp.minimum(r10 + 1, H * cpr - 1)]       # rows y+1, chunk c+1

    def shift1(a, nxt):
        return jnp.concatenate([a[:, 1:], nxt[:, :1]], axis=1)

    v00 = a00
    v01 = shift1(a00, a0n)
    v10 = a10
    v11 = shift1(a10, a1n)

    qx = (c[:, None] * chunk
          + jnp.arange(chunk, dtype=jnp.int32)[None, :]).astype(dtype)
    qy = y[:, None].astype(dtype)

    q = _quad_segments(v00, v01, v11, v10, qx, qy, s)
    Px, Py = q["Px"], q["Py"]
    # layer 0: segment 1 (two-crossing join / saddle B-R|B-L)
    s1_p0x, s1_p0y = q["s1_p0x"], q["s1_p0y"]
    s1_p1x, s1_p1y = q["s1_p1x"], q["s1_p1y"]
    # layer 1: segment 2 (saddle T-L|T-R)
    s2_p1x, s2_p1y = q["s2_p1x"], q["s2_p1y"]
    # layer 2: virtual h-edge; layer 3: virtual v-edge
    VIRT = 0.9 * s
    fh = _ms_frac(v00, v01)
    hx = (qx + 0.5 + fh) * s
    hy = jnp.broadcast_to((qy + 0.5) * s, hx.shape)
    fv = _ms_frac(v00, v10)
    vy = (qy + 0.5 + fv) * s
    vx = jnp.broadcast_to((qx + 0.5) * s, vy.shape)

    lay_b = lay[:, None]
    z = jnp.zeros_like(Px[0])

    def sel4(a0, a1, a2, a3):
        out = jnp.where(lay_b == 0, a0, a1)
        out = jnp.where(lay_b == 2, a2, out)
        out = jnp.where(lay_b == 3, a3, out)
        return jnp.where(sel_ok[:, None], out, z)

    p0x = sel4(s1_p0x, Px[2], hx, vx - VIRT)
    p0y = sel4(s1_p0y, Py[2], hy - VIRT, vy)
    p1x = sel4(s1_p1x, s2_p1x, hx, vx + VIRT)
    p1y = sel4(s1_p1y, s2_p1y, hy + VIRT, vy)
    return p0x, p0y, p1x, p1y


class SegmentCache(NamedTuple):
    """Pose-independent isocontour extraction of one grid version.

    The marching-squares pass + compaction + Pallas segment pack depend
    only on the TSD field, not the sensor pose — in the live SLAM loop
    the grid changes only when the mapper fuses a significantly-moved
    scan (ThreadLocalize.cpp:402,728-736), while the localizer raycasts
    EVERY scan (ThreadLocalize.cpp:353).  Extracting once per grid
    version and reusing the cache across scans moves ~2/3 of the
    raycast's per-scan cost into the (much rarer) map-update stage.

    Build with extract_segments(grid); pass to raycast_fast/
    raycast_checked/localize_step via their `segments` argument.  The
    cache is only valid for the exact grid it was extracted from —
    callers own the invalidation (slam.node rebuilds it after each
    mapper drain).
    """

    p0: jnp.ndarray          # [S, 2] world endpoints
    p1: jnp.ndarray          # [S, 2]
    valid: jnp.ndarray       # [S] bool
    n_dropped: jnp.ndarray   # i32 — segments lost to capacity limits
    # Pallas candidate-kernel pack ([S_pad, 8], origin-shifted
    # coordinates) + real count; None off-TPU (jnp candidate path)
    pack: Optional[jnp.ndarray]
    count: Optional[jnp.ndarray]
    # [2] world shift subtracted from pack coordinates (grid center —
    # bounds the magnitudes entering the kernel's f32 cross-product
    # reconstruction so cancellation error stays map-size-independent)
    origin: Optional[jnp.ndarray]
    # integer checksum of the source grid's tsd bits (ADVICE r4 #2):
    # raycast_fast compares it against the grid it is given and treats a
    # MISMATCH (stale cache — the grid changed since extraction) as a
    # full overflow, so raycast_checked falls back to the exact march
    # instead of silently marching against outdated segments.  Wraparound
    # integer summation is reduction-order-independent, so the compare is
    # exact across differently-compiled programs.
    fingerprint: Optional[jnp.ndarray] = None


def grid_fingerprint(tsd: jnp.ndarray) -> jnp.ndarray:
    """Order-independent integer checksum of the TSD bit pattern.

    Always reinterprets at 32-bit granularity (f64 bitcasts to an extra
    trailing [2] axis): the TPU X64-rewrite pass has no lowering for a
    same-width f64->s64 bitcast, and wraparound i32 summation is
    reduction-order-independent either way."""
    bits = jax.lax.bitcast_convert_type(tsd, jnp.int32)
    return jnp.sum(bits, dtype=jnp.int32)


def _pack_origin(grid: TsdGrid, dtype) -> jnp.ndarray:
    return jnp.array([grid.cells_x * grid.cell_size * 0.5,
                      grid.cells_y * grid.cell_size * 0.5], dtype)


def extract_segments(grid: TsdGrid,
                     max_segments: int = None) -> SegmentCache:
    """Run the pose-independent extraction stage once for this grid
    version (see SegmentCache)."""
    p0, p1, svalid, n_dropped = _isocontour_segments(grid, max_segments)
    if USE_PALLAS and grid.tsd.dtype == jnp.float32 and _on_tpu():
        from ohm_tsd_slam_tpu.ops.raycast_pallas import pack_segments

        origin = _pack_origin(grid, p0.dtype)
        pack, count = pack_segments(p0 - origin, p1 - origin, svalid)
    else:
        pack = count = origin = None
    return SegmentCache(p0, p1, svalid, n_dropped, pack, count, origin,
                        grid_fingerprint(grid.tsd))


extract_segments_jit = jax.jit(extract_segments,
                               static_argnames=("max_segments",))


def _segment_candidates(p0, p1, svalid, tr, ray, lo, hi, t_after):
    """Earliest ray-segment intersection per beam with t >= t_after.

    p0/p1: [S,2] segment endpoints (world m); ray: [B,2] step vector
    (unit direction * cell size); lo/hi/t_after: [B] clip range in steps.
    `tr` is the sensor translation — [2] (one pose; original numerics)
    or per-beam rows [B,2] (pose-batched flat core: the cross products
    with tr decompose per beam exactly as in the Pallas kernel).
    Returns t1 [B] in steps (inf = none).

    Intersection of tr + t*ray with p0 + u*(p1-p0):
      denom[s,b] = cross(ray[b], e[s])   (one [S,2] @ [2,B] matmul)
      c1[s,b]    = cross(ray[b], d0[s])  (one [S,2] @ [2,B] matmul)
      c0[s]      = cross(d0[s], e[s])    (per-segment scalar)
      t = c0 / denom,  u = -c1 / denom;  hit iff u in [0,1], t in [lo,hi].
    """
    dtype = p0.dtype
    e = p1 - p0                                           # [S, 2]
    # cross(a, b) = ax*by - ay*bx, as outer products over (s, b)
    rot = jnp.stack([-ray[:, 1], ray[:, 0]], axis=0)      # [2, B]
    denom = e @ rot                                       # cross(ray, e)
    if tr.ndim == 1:
        d0 = p0 - tr                                      # [S, 2]
        c1 = d0 @ rot                                     # cross(ray, d0)
        c0 = (d0[:, 0] * e[:, 1] - d0[:, 1] * e[:, 0])[:, None]
    else:
        # per-beam tr: cross(ray, p0 - tr) = cross(ray, p0)
        # - cross(ray, tr); cross(p0 - tr, e) = cross(p0, e)
        # - cross(tr, e)
        c1tr = ray[:, 0] * tr[:, 1] - ray[:, 1] * tr[:, 0]   # [B]
        c1 = p0 @ rot - c1tr[None, :]
        c0p = p0[:, 0] * e[:, 1] - p0[:, 1] * e[:, 0]        # [S]
        c0 = (c0p[:, None]
              - (tr[:, 0][None, :] * e[:, 1][:, None]
                 - tr[:, 1][None, :] * e[:, 0][:, None]))

    eps = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-6, dtype)
    ok_denom = jnp.abs(denom) > eps * jnp.maximum(
        jnp.linalg.norm(e, axis=1), 1e-30)[:, None]
    safe = jnp.where(ok_denom, denom, 1.0)
    t = c0 / safe
    # u = (d0 x ray)/(ray x e) = -c1/denom
    u = -c1 / safe
    ok = (svalid[:, None] & ok_denom & (u >= 0.0) & (u <= 1.0)
          & (t >= lo[None, :]) & (t <= hi[None, :])
          & (t >= t_after[None, :]))
    big = jnp.asarray(jnp.inf, dtype)
    return jnp.min(jnp.where(ok, t, big), axis=0)


def _window_events(grid, tr, ray, idx_min, idx_max, k_cand, has_cand):
    """Replay the exact march (RayCastPolar2D.cpp:237-270) over a
    WINDOW-step window starting BACKOFF steps before the candidate.

    `tr` is [2] (one pose) or per-beam rows [B,2] (flat pose batch).
    Returns (hit, any_ev, pos_ev [B,2], interp [B]).
    """
    dtype = ray.dtype
    m_start = jnp.maximum(jnp.floor(k_cand - idx_min) - BACKOFF, 0.0)
    j = jnp.arange(WINDOW, dtype=dtype)
    t_w = idx_min[:, None] + m_start[:, None] + j[None, :]   # [B, W]
    tr_b = tr if tr.ndim == 1 else tr[:, None, :]
    pos = tr_b + t_w[..., None] * ray[:, None, :]
    tsd_w, code_w = interpolate_bilinear(grid, pos)
    v = jnp.where(code_w == INTERPOLATE_SUCCESS, tsd_w, jnp.nan)

    # loop condition i <= idx_max with i = t - 1 (see raycast.py)
    sample_ok = (t_w[:, 1:] - 1.0) <= idx_max[:, None]
    v_prev = v[:, :-1]
    v_cur = v[:, 1:]
    ev_pos = (v_prev > 0) & (v_cur < 0) & sample_ok
    ev_neg = (v_prev < 0) & (v_cur > 0) & sample_ok
    ev = ev_pos | ev_neg
    any_ev = jnp.any(ev, axis=1) & has_cand
    k_ev = jnp.argmax(ev, axis=1)
    hit = any_ev & jnp.take_along_axis(ev_pos, k_ev[:, None], 1)[:, 0]

    vp = jnp.take_along_axis(v_prev, k_ev[:, None], 1)[:, 0]
    vc = jnp.take_along_axis(v_cur, k_ev[:, None], 1)[:, 0]
    interp = vp / (vp - vc)
    pos_ev = jnp.take_along_axis(pos[:, 1:, :], k_ev[:, None, None], 1)[:, 0]
    return hit, any_ev, pos_ev, interp


def beam_geometry(grid: TsdGrid, geom: SensorPolar2D, pose: jnp.ndarray):
    """World-frame beam step vectors + per-beam march clip range.

    Returns (ray [B,2], tr [2], idx_min [B], idx_max [B], feasible [B]);
    the clipping is identical to grid/raycast.py (slab clip to the grid
    AABB + min/max range, RayCastPolar2D.cpp:205-219)."""
    dtype = grid.tsd.dtype
    s = grid.cell_size
    rays_local = geom.rays_local(dtype)
    rays_world = se2.rotate_vectors(pose.astype(dtype), rays_local)
    ray = rays_world * s
    tr = se2.translation(pose).astype(dtype)

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
    return ray, tr, idx_min, idx_max, feasible


def raycast_fast(grid: TsdGrid, geom: SensorPolar2D,
                 pose: jnp.ndarray,
                 segments: Optional[SegmentCache] = None,
                 max_segments: int = None) -> RaycastResult:
    """Splat+refine raycast.  `segments` — an extract_segments() cache
    for THIS grid version — skips the per-scan isocontour extraction
    (the pose-independent 2/3 of the cost); without it the extraction
    runs inline (identical results either way, asserted in tests)."""
    ray, tr, idx_min, idx_max, feasible = beam_geometry(grid, geom, pose)
    coords_w, normals_w, hit, n_ok, n_dropped = _raycast_core(
        grid, segments, max_segments, ray, tr, idx_min, idx_max,
        feasible)
    mask = feasible & hit & n_ok
    dtype = grid.tsd.dtype
    Tinv = se2.invert(pose.astype(dtype))
    coords_s = se2.transform_points(Tinv, coords_w)
    normals_s = se2.rotate_vectors(Tinv, normals_w)
    zero = jnp.zeros_like(coords_s)
    coords_s = jnp.where(mask[:, None], coords_s, zero)
    normals_s = jnp.where(mask[:, None], normals_s, zero)
    ranges = jnp.linalg.norm(coords_s, axis=-1)
    return RaycastResult(coords_s, normals_s, mask, ranges, n_dropped)


def raycast_fast_batch(grid: TsdGrid, geom: SensorPolar2D,
                       poses: jnp.ndarray,
                       segments: Optional[SegmentCache] = None,
                       max_segments: int = None) -> RaycastResult:
    """Pose-batched splat raycast: P poses against ONE grid in a single
    pass, with the pose axis FOLDED into the flat beam axis of every
    kernel (P*B beams through the sweep, block-window and defer/rounds
    stages — one launch each).

    Compared with `jax.vmap(raycast_fast)`, the defer and rounds tail
    skips here are JOINT `lax.cond`s over the whole batch (a vmapped
    cond lowers to a select whose both branches execute per pose), and
    the per-scan fixed costs (fingerprint gate, segment reuse, glue ops)
    are paid once — this is the chip-saturation path (VERDICT r4
    weak #2).

    Returns a RaycastResult whose fields carry a leading [P] axis
    (n_dropped is a scalar total).
    """
    dtype = grid.tsd.dtype
    P = poses.shape[0]
    B = geom.size
    ray, tr, idx_min, idx_max, feasible = jax.vmap(
        lambda p: beam_geometry(grid, geom, p))(poses)
    N = P * B
    ray_f = ray.reshape(N, 2)
    tr_f = jnp.repeat(tr, B, axis=0)               # pose-major [N, 2]
    coords_w, normals_w, hit, n_ok, n_dropped = _raycast_core(
        grid, segments, max_segments, ray_f, tr_f,
        idx_min.reshape(N), idx_max.reshape(N), feasible.reshape(N))
    coords_w = coords_w.reshape(P, B, 2)
    normals_w = normals_w.reshape(P, B, 2)
    mask = feasible & hit.reshape(P, B) & n_ok.reshape(P, B)
    Tinv = jax.vmap(se2.invert)(poses.astype(dtype))
    coords_s = jax.vmap(se2.transform_points)(Tinv, coords_w)
    normals_s = jax.vmap(se2.rotate_vectors)(Tinv, normals_w)
    zero = jnp.zeros_like(coords_s)
    coords_s = jnp.where(mask[..., None], coords_s, zero)
    normals_s = jnp.where(mask[..., None], normals_s, zero)
    ranges = jnp.linalg.norm(coords_s, axis=-1)
    return RaycastResult(coords_s, normals_s, mask, ranges, n_dropped)


def _raycast_core(grid: TsdGrid, segments: Optional[SegmentCache],
                  max_segments: Optional[int], ray: jnp.ndarray,
                  tr: jnp.ndarray, idx_min: jnp.ndarray,
                  idx_max: jnp.ndarray, feasible: jnp.ndarray):
    """Flat raycast core over N beams (single pose, or P poses folded
    into N = P*B).  `tr` is [2] for one pose (preserves the original
    jnp-path numerics exactly) or per-beam rows [N, 2] for a folded
    batch.  Returns world-frame (coords_w [N,2], normals_w [N,2],
    hit [N], n_ok [N], n_dropped scalar)."""
    N = ray.shape[0]

    # ---- isocontour segments + intersection candidates ------------------
    # ROUNDS candidate/replay rounds: a double-crossing inside one march
    # step (thin sliver between two sample phases) is a genuine
    # intersection the sampled march steps over without a sign change —
    # the search continues at the next intersection beyond the window's
    # coverage.  Round 1 replays a window for every beam; later rounds
    # replay only the (rare) still-unresolved beams, compacted to
    # UNRESOLVED_CAP slots.  Beams needing more than ROUNDS slivers, or
    # overflowing the compaction, count into n_dropped (raycast_checked
    # then falls back to the exact march).
    # folded pose batches scale the per-round replay capacity with the
    # batch (~17 slots per 1081-beam scan — unresolved-after-defer beams
    # are ~2/scan); overflow counts into n_dropped, never silent
    UNRESOLVED_CAP = 256 if N <= 2048 else (-(-N // 64) // 128 + 1) * 128
    segments_given = segments is not None
    if segments is None:
        segments = extract_segments(grid, max_segments)
    p0, p1, svalid = segments.p0, segments.p1, segments.valid
    n_dropped = segments.n_dropped
    if segments_given and segments.fingerprint is not None:
        # stale-cache gate (ADVICE r4 #2): a cache extracted from a
        # DIFFERENT grid version would silently produce wrong model
        # points; count it as a full overflow so raycast_checked falls
        # back to the exact march.  One ~4 MB integer reduction per scan
        # (~5 us of HBM) — order-independent, so fresh caches never
        # false-positive.
        stale = segments.fingerprint != grid_fingerprint(grid.tsd)
        n_dropped = n_dropped + jnp.where(stale, N, 0)

    def _tr_at(idx, n):
        """Sensor-origin rows for a compacted beam subset."""
        if tr.ndim == 1:
            return jnp.broadcast_to(tr, (n, 2))
        return tr[idx]

    lo = jnp.maximum(jnp.floor(idx_min) - 1.0, 0.0)
    hi = jnp.ceil(idx_max) + 1.0
    cover = WINDOW - BACKOFF - 2.0

    # candidate search: fused Pallas kernel on TPU f32, jnp elsewhere.
    # Round-1 candidates come from a 1-level launch; the (rarely
    # needed) later levels are computed in a SECOND launch after the
    # replay, seeded with t_after = +inf for already-resolved beams —
    # the kernel's all-resolved block skip then makes it near-free in
    # the common case where every beam resolves in round 1.
    if segments.pack is not None:
        from ohm_tsd_slam_tpu.ops.raycast_pallas import (
            pad_beams,
            segment_min_pallas,
        )

        # the pack is pose-independent: under vmap over poses (AMCL /
        # saturation workloads) extraction + packing stay unbatched and
        # hoist out of the batch; segment_min_pallas's custom_vmap rule
        # folds the pose batch into the beam axis.  Beam translations
        # are shifted into the pack's grid-center frame.
        segpack, seg_count = segments.pack, segments.count
        tr_pack = tr - segments.origin
        lev1 = segment_min_pallas(
            segpack, pad_beams(ray, lo, hi, lo, tr_pack), seg_count,
            levels=1, cover=0.0)
        t_1 = lev1[:N, 0]
    else:
        t_1 = _segment_candidates(p0, p1, svalid, tr, ray, lo, hi, lo)

    has = jnp.isfinite(t_1) & feasible
    k_1 = jnp.where(has, t_1, 0.0)

    # round 1: all beams.  On TPU the replay + crossing normals run in
    # the block-batched Pallas kernel (the XLA tap gathers are serial,
    # ~33-144 ns/element); beams whose window does not fit their
    # block's patch are replayed on the jnp path below, and normals for
    # the rare beams that resolve in later rounds are recomputed per
    # round on the compacted set.
    use_kernel = False
    if segments.pack is not None:
        from ohm_tsd_slam_tpu.ops.window_block_pallas import (
            KG as _KG,
            block_patches,
            supports_block_kernel,
            window_block_pallas,
        )

        use_kernel = supports_block_kernel(grid) and _on_tpu()
    if use_kernel:
        m_start = jnp.maximum(jnp.floor(k_1 - idx_min) - BACKOFF, 0.0)
        t_w0 = idx_min + m_start
        padk = (-N) % _KG

        def _pd(x, fill=0.0):
            if padk == 0:
                return x
            return jnp.pad(x, ((0, padk),) + ((0, 0),) * (x.ndim - 1),
                           constant_values=fill)

        if tr.ndim == 2:
            tr_rows = _pd(tr)
        else:
            tr_rows = jnp.broadcast_to(tr, (N + padk, 2))
        pr_b, pcs_b, fits = block_patches(grid, _pd(t_w0), _pd(ray),
                                          tr_rows, WINDOW)
        hit, any_1, pos_ev, interp, normals_w, n_ok = window_block_pallas(
            grid, _pd(t_w0), _pd(ray), _pd(idx_max, -1.0), _pd(has),
            tr_rows, pr_b, pcs_b, WINDOW)
        hit = hit[:N]
        any_1 = any_1[:N]
        pos_ev = pos_ev[:N]
        interp = interp[:N]
        normals_w = normals_w[:N]
        n_ok = n_ok[:N]

        defer = has & ~fits[:N]
        n_defer = jnp.sum(defer, dtype=jnp.int32)

        def _defer_pass(carry):
            # deferred beams (window does not fit the block patch —
            # depth discontinuities inside a block): replay through the
            # per-beam-patch kernel (a per-beam window ALWAYS fits its
            # own 24x128 patch).
            #
            # Single scan (small N): FULL-WIDTH with `defer` as the
            # active mask — no compaction, no index scatter; the kernel
            # skips fully-inactive 8-beam programs, so the launch costs
            # ~program dispatch for the ~96% inactive beams — cheaper
            # than the butterfly compaction + gather/scatter it
            # replaced (r4 stage_tails 0.267 ms), with nothing to
            # overflow.
            #
            # Folded pose batch (large N): the full-width launch would
            # walk N/8 mostly-skipped programs (~17k at 128 poses);
            # compact the deferred beams instead — the butterfly +
            # scatter amortize across the batch, and overflow past the
            # capacity counts into n_dropped.
            from ohm_tsd_slam_tpu.ops.window_block_pallas import (
                window_single_pallas,
            )

            hit, any_1, pos_ev, interp, normals_w, n_ok, n_drop = carry
            if N <= 4096:
                hit_d, any_d, pos_d, int_d, nrm_d, nok_d = \
                    window_single_pallas(
                        grid, _pd(t_w0), _pd(ray), _pd(idx_max, -1.0),
                        _pd(defer), tr_rows, WINDOW)
                sel = defer
                selc = sel[:, None]
                return (jnp.where(sel, hit_d[:N], hit),
                        jnp.where(sel, any_d[:N], any_1),
                        jnp.where(selc, pos_d[:N], pos_ev),
                        jnp.where(sel, int_d[:N], interp),
                        jnp.where(selc, nrm_d[:N], normals_w),
                        jnp.where(sel, nok_d[:N], n_ok),
                        n_drop)
            cap = 8192
            n_drop = n_drop + jnp.maximum(n_defer - cap, 0)
            idx_d, dvalid = compact_mask(
                jnp.pad(defer, (0, (-N) % 128)), cap)
            idx_d = jnp.minimum(idx_d, N - 1)
            hit_d, any_d, pos_d, int_d, nrm_d, nok_d = \
                window_single_pallas(
                    grid, t_w0[idx_d], ray[idx_d], idx_max[idx_d],
                    dvalid, _tr_at(idx_d, cap), WINDOW)
            # fused scatter: one [N, 8] state row per deferred beam
            S = jnp.stack([hit.astype(jnp.float32),
                           any_1.astype(jnp.float32),
                           pos_ev[:, 0], pos_ev[:, 1], interp,
                           normals_w[:, 0], normals_w[:, 1],
                           n_ok.astype(jnp.float32)], axis=-1)
            rows = jnp.stack([hit_d.astype(jnp.float32),
                              any_d.astype(jnp.float32),
                              pos_d[:, 0], pos_d[:, 1], int_d,
                              nrm_d[:, 0], nrm_d[:, 1],
                              nok_d.astype(jnp.float32)], axis=-1)
            idx_w = jnp.where(dvalid, idx_d, N)
            S = S.at[idx_w].set(rows, mode="drop")
            return (S[:, 0] > 0.0, S[:, 1] > 0.0, S[:, 2:4], S[:, 4],
                    S[:, 5:7], S[:, 7] > 0.0, n_drop)
    else:
        hit, any_1, pos_ev, interp = _window_events(
            grid, tr, ray, idx_min, idx_max, k_1, has)
        normals_w = n_ok = None
        n_defer = jnp.asarray(0, jnp.int32)
        _defer_pass = None

    def _rounds(carry, lev_rest=None):
        """Rounds 2..ROUNDS.  Runs under lax.cond only when an
        unresolved beam actually HAS a next candidate (true double
        crossings inside one march window) — the common scan skips the
        per-round compactions/scatters/kernel launches here entirely.
        When the predicate is true but individual beams are fine, every
        update below is the identity, so outputs are bit-identical with
        or without the skip.  On the kernel path `lev_rest` (the
        precomputed candidate levels) is hoisted OUT of the cond by the
        caller: the sweep skips all-resolved blocks, and its level-1
        column decides whether this machinery runs at all — a beam that
        stays unresolved WITHOUT further candidates (grazing tangency)
        must not drag the whole replay tail in every scan (the r4
        stage_tails pathology: 2 such beams cost 0.16 ms/scan)."""
        hit, any_1, pos_ev, interp, normals_w, n_ok, n_dropped = carry
        resolved = any_1 | ~has
        t_search = jnp.maximum(lo, k_1 + cover)

        # rounds 2..ROUNDS: compacted unresolved beams only.
        # Candidate levels come from the hoisted second sweep (bound
        # chain identical to the rounds loop's t_search sequence:
        # level k = earliest intersection >= level k-1 + cover).
        if lev_rest is not None:
            def candidates(round_idx, t_after):
                return lev_rest[:N, round_idx - 1]
        else:
            def candidates(round_idx, t_after):
                return _segment_candidates(p0, p1, svalid, tr, ray,
                                           lo, hi, t_after)

        # fused per-beam state for the round scatters: one [B, 8]
        # (or [B, 5] without normals) array so each round does ONE
        # gather + ONE scatter instead of 5-7 (XLA per-op dispatch on
        # the ~256-slot updates dominated the rounds' cost)
        with_normals = normals_w is not None
        cols = ([hit.astype(jnp.float32), pos_ev[:, 0], pos_ev[:, 1],
                 interp, resolved.astype(jnp.float32)]
                + ([normals_w[:, 0], normals_w[:, 1],
                    n_ok.astype(jnp.float32)] if with_normals else []))
        S = jnp.stack(cols, axis=-1)

        for round_idx in range(1, ROUNDS):
            res_now = S[:, 4] > 0.0
            t_r = candidates(round_idx, jnp.where(res_now, jnp.inf,
                                                  t_search))
            need = jnp.isfinite(t_r) & ~res_now
            n_need = jnp.sum(need, dtype=jnp.int32)
            n_dropped = n_dropped + jnp.maximum(n_need - UNRESOLVED_CAP, 0)
            need_pad = jnp.pad(need, (0, (-N) % 128))
            idx_u, uvalid = compact_mask(need_pad, UNRESOLVED_CAP)
            idx_u = jnp.minimum(idx_u, N - 1)
            k_u = jnp.where(uvalid, t_r[idx_u], 0.0)
            if use_kernel:
                from ohm_tsd_slam_tpu.ops.window_block_pallas import (
                    window_single_pallas,
                )

                im_u = idx_min[idx_u]
                ms_u = jnp.maximum(jnp.floor(k_u - im_u) - BACKOFF, 0.0)
                hit_u, any_u, pos_u, int_u, n_u, nok_u = \
                    window_single_pallas(
                        grid, im_u + ms_u, ray[idx_u], idx_max[idx_u],
                        uvalid, _tr_at(idx_u, UNRESOLVED_CAP),
                        WINDOW)
            else:
                tr_u = tr if tr.ndim == 1 else tr[idx_u]
                hit_u, any_u, pos_u, int_u = _window_events(
                    grid, tr_u, ray[idx_u], idx_min[idx_u],
                    idx_max[idx_u], k_u, uvalid)
                n_u = nok_u = None
            take_u = any_u & uvalid
            S_u = S[idx_u]                           # one gather
            res_u = (S_u[:, 4] > 0.0) | take_u
            row_cols = [jnp.where(take_u, hit_u.astype(jnp.float32),
                                  S_u[:, 0]),
                        jnp.where(take_u, pos_u[:, 0], S_u[:, 1]),
                        jnp.where(take_u, pos_u[:, 1], S_u[:, 2]),
                        jnp.where(take_u, int_u, S_u[:, 3]),
                        res_u.astype(jnp.float32)]
            if with_normals:
                # round-1 normals came from the window kernel; refresh
                # them for the (rare, compacted) beams this round
                # resolved
                if n_u is None:
                    coords_u = pos_u + ray[idx_u] * (int_u[:, None] - 1.0)
                    n_u, nok_u = interpolate_normal(grid, coords_u)
                row_cols += [jnp.where(take_u, n_u[:, 0], S_u[:, 5]),
                             jnp.where(take_u, n_u[:, 1], S_u[:, 6]),
                             jnp.where(take_u,
                                       nok_u.astype(jnp.float32),
                                       S_u[:, 7])]
            rows = jnp.stack(row_cols, axis=-1)
            # scatter back; pad slots target out-of-range B and are
            # dropped (their idx 0 placeholder could collide with a
            # real beam-0 slot)
            idx_w = jnp.where(uvalid, idx_u, N)
            S = S.at[idx_w].set(rows, mode="drop")   # one scatter
            # `resolved |= ~need`: beams with no candidate this round
            # exit future rounds permanently (t_r only grows)
            S = S.at[:, 4].set(jnp.maximum(S[:, 4],
                                           (~need).astype(jnp.float32)))
            t_search = jnp.maximum(t_search, jnp.where(jnp.isfinite(t_r),
                                                       t_r + cover, t_search))

        hit = S[:, 0] > 0.0
        pos_ev = S[:, 1:3]
        interp = S[:, 3]
        if with_normals:
            normals_w = S[:, 5:7]
            n_ok = S[:, 7] > 0.0
        return (hit, any_1, pos_ev, interp, normals_w, n_ok, n_dropped)

    # two-stage tail skip (under vmap — saturation/AMCL batches — the
    # conds lower to selects and both branches run, which is exactly
    # the old behavior):
    #   1. the defer replay runs only when the block kernel actually
    #      deferred beams (~1-4% of beams on discontinuity scenes,
    #      none on smooth ones);
    #   2. the rounds run only when beams remain unresolved AFTER the
    #      defer replay — a deferred beam almost always resolves in
    #      its own per-beam window, so the expensive part (second
    #      sweep + per-round compaction/scatter/kernel) is skipped on
    #      typical scans.
    carry = (hit, any_1, pos_ev, interp, normals_w, n_ok, n_dropped)
    if _defer_pass is not None:
        carry = jax.lax.cond(n_defer > 0, _defer_pass, lambda c: c,
                             carry)
    any_1 = carry[1]
    resolved_now = any_1 | ~has
    if ROUNDS > 1 and segments.pack is not None:
        # hoisted second sweep: cheap (all-resolved beam blocks skip
        # their chunk loops), and its level-1 column gives the PRECISE
        # rounds trigger — "some unresolved beam has a next candidate"
        # — instead of ~all_res, which fires on candidate-less grazing
        # beams and ran the whole rounds tail every scan (r4 weak #1)
        t_after2 = jnp.where(resolved_now, jnp.inf,
                             jnp.maximum(lo, k_1 + cover))
        if N <= 2048:
            lev_rest = segment_min_pallas(
                segpack, pad_beams(ray, lo, hi, t_after2, tr_pack),
                seg_count, levels=ROUNDS - 1,
                cover=float(WINDOW - BACKOFF - 2.0))
        else:
            # folded pose batch: the full-width sweep's block skip is
            # all-or-nothing per 128-beam block, and each pose's ~2
            # unresolved beams keep ~a quarter of the blocks alive —
            # 6.2 ms of the 128-pose saturation workload went to this
            # launch.  Sweep only the COMPACTED unresolved beams and
            # scatter the levels back (+inf elsewhere); beams beyond
            # the capacity count into n_dropped.
            n_unres = jnp.sum(~resolved_now, dtype=jnp.int32)
            n_dropped = n_dropped + jnp.maximum(
                n_unres - UNRESOLVED_CAP, 0)
            idx_u2, uv2 = compact_mask(
                jnp.pad(~resolved_now, (0, (-N) % 128)), UNRESOLVED_CAP)
            idx_u2 = jnp.minimum(idx_u2, N - 1)
            tr_sub = (tr_pack if tr.ndim == 1 else tr_pack[idx_u2])
            lev_c = segment_min_pallas(
                segpack,
                pad_beams(ray[idx_u2], lo[idx_u2], hi[idx_u2],
                          jnp.where(uv2, t_after2[idx_u2], jnp.inf),
                          tr_sub),
                seg_count, levels=ROUNDS - 1,
                cover=float(WINDOW - BACKOFF - 2.0))
            lev_rest = jnp.full((N + 1, ROUNDS - 1), jnp.inf,
                                ray.dtype)
            lev_rest = lev_rest.at[
                jnp.where(uv2, idx_u2, N)].set(
                    lev_c[:UNRESOLVED_CAP], mode="drop")[:N]
        need_any = jnp.any(jnp.isfinite(lev_rest[:N, 0])
                           & ~resolved_now)
        carry = jax.lax.cond(need_any,
                             partial(_rounds, lev_rest=lev_rest),
                             lambda c: c, carry)
    else:
        all_res = jnp.all(resolved_now)
        carry = jax.lax.cond(all_res, lambda c: c, _rounds, carry)
    hit, any_1, pos_ev, interp, normals_w, n_ok, n_dropped = carry

    coords_w = pos_ev + ray * (interp[:, None] - 1.0)

    if normals_w is None:
        normals_w, n_ok = interpolate_normal(grid, coords_w)
    return coords_w, normals_w, hit, n_ok, n_dropped


def raycast_checked(grid: TsdGrid, geom: SensorPolar2D,
                    pose: jnp.ndarray,
                    segments: Optional[SegmentCache] = None
                    ) -> RaycastResult:
    """Guarded splat raycast: when the segment compaction overflows
    MAX_SEGMENTS (beams would silently lose hits), fall back to the
    exact dense march of grid/raycast.py.  Both branches are compiled;
    only one executes per call."""
    from ohm_tsd_slam_tpu.grid.raycast import raycast as raycast_exact

    fast = raycast_fast(grid, geom, pose, segments=segments)

    def exact(_):
        r = raycast_exact(grid, geom, pose)
        return r._replace(n_dropped=fast.n_dropped)

    def keep(_):
        return fast

    return jax.lax.cond(fast.n_dropped > 0, exact, keep, None)


raycast_fast_jit = jax.jit(raycast_fast, static_argnames=("geom",))
raycast_checked_jit = jax.jit(raycast_checked, static_argnames=("geom",))
