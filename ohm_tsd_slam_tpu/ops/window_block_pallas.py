"""Block-batched Pallas TPU kernel for the exact-march window replay +
crossing normals (v2 of the gather-bound tail of grid/raycast_fast.py).

The r3 kernel (ops/window_pallas.py, now deleted) was exact but SLOWER
than the XLA gathers it replaced (6.5 ms vs 2.6 ms): it extracted taps
one beam at a time — ~17k tiny one-hot matmuls per scan, bounded by
MXU/loop issue overhead, not FLOPs.  v2 amortizes both the patch loads
and the matmuls over BEAM BLOCKS:

  * consecutive beams sweep the surface smoothly, so a block of KG
    neighbouring beams almost always reads the same small neighbourhood
    of the grid.  Per block, ONE [PATCH_R, 2*PATCH_C] slab is loaded at
    a 128-aligned base and dynamically rotated so the block's first
    needed column sits at lane 0 — the one-hot contraction then runs
    over PATCH_C=128 columns instead of 256 (half the MXU passes);
  * all KG beams x WINDOW samples x 4 bilinear corners are extracted
    with ONE one-hot matmul (value and NaN-mask patch halves stacked on
    the LHS, left/right corner columns stacked on the RHS lanes)
    followed by cheap masked row-reductions — 2 matmuls per block
    instead of ~16 per beam;
  * the exact-march event scan (RayCastPolar2D.cpp:237-270 semantics:
    +to- hit, -to+ back-face reject, NaN-invalid samples) and the
    central-difference normals (TsdGrid.cpp:517-546) run vectorized over
    the block: beams on lane groups, per-beam reductions as masked
    lane-group min/sum.

Beams whose window does NOT fit the block's patch (depth discontinuities
inside a block) are flagged by the caller via block_patches() and
replayed on the XLA gather path instead — exactness is never traded.

Bilinear semantics replicate grid/interpolate.py::interpolate_bilinear
exactly, including summation order (v00*(1-wy)*(1-wx) + v10*wy*(1-wx)
+ v01*(1-wy)*wx + v11*wy*wx): out-of-bounds corner taps read NaN and a
sample is valid iff its base cell is in bounds and the blended value is
non-NaN.  The owning-tile initialization check of interpolate_bilinear
is provably redundant here and elided: cells of never-initialized tiles
are NaN in the dense array (grid/push.py accumulates
pre-materialization emptiness in tile_initw WITHOUT writing cells), so
an uninitialized base tile already yields a NaN blend.

The column rotation wraps when the patch base had to be clipped to the
grid edge; wrapped lanes can only correspond to out-of-grid cells,
whose taps are NaN'd by the absolute bounds check before use.

Built (and tested in interpret mode) against
grid/raycast_fast.py::_window_events + grid/interpolate.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KG = 16           # beams per block (out rows must align to 8 sublanes)
PATCH_R = 64      # patch rows.  Covers a block's row span (~13 rows per
                  # beam window + KG-beam lateral spread + 8-alignment)
                  # for hits out to ~14 m; near-vertical sweeps hitting
                  # beyond that can exceed it and DEFER to the per-beam
                  # patch kernel (always fits — correct, just slower).
                  # 96 covered the full 25 m envelope but paid ~33% more
                  # row-reduction + DMA on every block of every scan;
                  # indoor Hokuyo workloads hit well inside 14 m.
PATCH_C = 128     # rotated patch columns (block col span <= ~90)
LOAD_C = 2 * PATCH_C   # pre-rotation load width (128-aligned base)
NORM_P = 4        # normal sample positions (+x, -x, +y, -y)


def supports_block_kernel(grid) -> bool:
    H, W = grid.tsd.shape
    # the clip limits H-PATCH_R / W-LOAD_C must be align-able or a
    # patch near the top/right edge loses coverage after align-down
    return (grid.tsd.dtype == jnp.float32
            and H * W * 4 <= 8 * 1024 * 1024
            and H >= PATCH_R and W >= LOAD_C
            and (H - PATCH_R) % 8 == 0 and (W - LOAD_C) % 128 == 0)


def block_patches(grid, t_w0, ray, tr, window: int):
    """Per-block patch bases + per-beam fit mask (XLA side).

    Args:
      t_w0: [B] first window sample t (march steps; B % KG == 0).
      ray: [B, 2] step vectors (unit direction * cell size).
      tr: [B, 2] sensor origin per beam (rows, so the pose-batch fold
        keeps everything per-beam).
      window: number of replay samples.
    Returns:
      (pr [NB] i32 8-aligned row base, pcs [NB] i32 exact column start,
       fits [B] bool).

    A beam's taps live in cell rows [floor(min_v), floor(max_v)+1] for
    the window samples and one more cell on each side for the crossing
    normal stencil; block_patches budgets [m-2, M+3] and fits the block
    min under PATCH_R rows x PATCH_C rotated columns.  Out-of-grid taps
    need no coverage (they read NaN by the out-of-bounds rule), so the
    needs are clipped into the grid before fitting.
    """
    H, W = grid.tsd.shape
    s = grid.cell_size
    B = t_w0.shape[0]
    assert B % KG == 0, B

    u0 = (tr[:, 0] + t_w0 * ray[:, 0]) / s - 0.5
    u1 = (tr[:, 0] + (t_w0 + (window - 1)) * ray[:, 0]) / s - 0.5
    v0 = (tr[:, 1] + t_w0 * ray[:, 1]) / s - 0.5
    v1 = (tr[:, 1] + (t_w0 + (window - 1)) * ray[:, 1]) / s - 0.5

    def needs(a, b, n):
        lo = jnp.floor(jnp.minimum(a, b)).astype(jnp.int32) - 2
        hi = jnp.floor(jnp.maximum(a, b)).astype(jnp.int32) + 3
        return jnp.clip(lo, 0, n - 1), jnp.clip(hi, 0, n - 1)

    r_lo, r_hi = needs(v0, v1, H)
    c_lo, c_hi = needs(u0, u1, W)

    pr = jnp.min(r_lo.reshape(-1, KG), axis=1)
    pr = (jnp.clip(pr, 0, H - PATCH_R) // 8) * 8
    pcs = jnp.min(c_lo.reshape(-1, KG), axis=1)
    pr_b = jnp.repeat(pr, KG)
    pcs_b = jnp.repeat(pcs, KG)
    fits = ((r_lo >= pr_b) & (r_hi <= pr_b + PATCH_R - 1)
            & (c_hi <= pcs_b + PATCH_C - 1))
    return pr, pcs, fits


def _kernel(window: int, s: float, H: int, W: int,
            tw_ref, rx_ref, ry_ref, im_ref, has_ref, trx_ref, try_ref,
            pr_ref, pcs_ref, tsd_ref, out_ref, val_ref):
    """One program per KG-beam block.

    Attr refs: [1, B] f32 SMEM rows (whole-scan; per-beam scalar reads —
    a (1, KG) VMEM block would violate the (8, 128) block-divisibility
    rule).  pr/pcs: [1, NB] i32 SMEM rows.  tsd_ref: [H, W] VMEM (whole
    grid).  out_ref: [KG, 8] — columns hit, any_ev, pos_x, pos_y,
    interp, nx, ny, n_ok.  val_ref: [2*PATCH_R, PATCH_C] f32 scratch
    (NaN-sanitized, column-rotated values; NaN-ness mask in the lower
    half).
    """
    NW = window
    L = KG * NW                                     # window lanes
    LN = KG * NORM_P                                # normal lanes
    pr = pl.multiple_of(pr_ref[0, 0, 0], 8)
    pcs = pcs_ref[0, 0, 0]
    pc = pl.multiple_of((jnp.minimum(pcs, W - LOAD_C) // 128) * 128, 128)
    d = pcs - pc                                    # in [0, LOAD_C)
    raw = tsd_ref[pl.ds(pr, PATCH_R), pl.ds(pc, LOAD_C)]
    # rotate left by d so the block's first needed column is lane 0,
    # then keep PATCH_C lanes (halves every one-hot contraction)
    rolled = pltpu.roll(raw, (LOAD_C - d) % LOAD_C, 1)
    win = rolled[:, 0:PATCH_C]
    isn = jnp.isnan(win)
    val_ref[0:PATCH_R, :] = jnp.where(isn, 0.0, win)
    val_ref[PATCH_R:2 * PATCH_R, :] = jnp.where(isn, 1.0, 0.0)

    iosub = jax.lax.broadcasted_iota(jnp.int32, (KG, 1), 0)

    def col(ref):
        """[KG, 1] column from the program's KG SMEM scalars."""
        out = jnp.broadcast_to(ref[0, 0, 0], (KG, 1))
        for k in range(1, KG):
            out = jnp.where(iosub == k, ref[0, 0, k], out)
        return out

    tw0 = col(tw_ref)
    rx = col(rx_ref)
    ry = col(ry_ref)
    has = col(has_ref) > 0.0
    trx = col(trx_ref)
    try_ = col(try_ref)

    def taps(ixf, iyf, wxf, wyf, nlanes):
        """Bilinear blend for lane-packed samples.

        ixf/iyf/wxf/wyf: [1, nlanes] base cell + weights.  Returns
        [1, nlanes] values (NaN = invalid sample), replicating
        interpolate_bilinear including summation order.
        """
        r0 = iyf - pr
        c0 = ixf - pcs
        ios = jax.lax.broadcasted_iota(jnp.int32, (PATCH_C, nlanes), 0)
        csel_l = (ios == c0).astype(jnp.float32)
        csel_r = (ios == (c0 + 1)).astype(jnp.float32)
        csel = jnp.concatenate([csel_l, csel_r], axis=1)
        # value half: f32 (3-pass MXU decomposition); NaN-mask half:
        # bf16 — the operands are exactly-representable 0/1 and the
        # contraction selects one column, so bf16 is exact and runs in
        # ONE MXU pass (f32 accumulate) — 1/3 less matmul work
        Mv = jax.lax.dot(val_ref[0:PATCH_R, :], csel,
                         preferred_element_type=jnp.float32)
        Mn = jax.lax.dot(
            val_ref[PATCH_R:2 * PATCH_R, :].astype(jnp.bfloat16),
            csel.astype(jnp.bfloat16),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
        ior = jax.lax.broadcasted_iota(jnp.int32, (PATCH_R, nlanes), 0)

        def pick(Mh, rsel):
            return jnp.sum(jnp.where(ior == rsel, Mh, 0.0), axis=0,
                           keepdims=True)

        def corner(sl, dr, dc):
            rr = r0 + dr
            v = pick(Mv[:, sl], rr)
            nn = pick(Mn[:, sl], rr)
            iy = iyf + dr
            ix = ixf + dc
            oob = (ix < 0) | (ix >= W) | (iy < 0) | (iy >= H)
            # out-of-patch in-grid taps cannot happen for fitting beams
            # (block_patches); NaN defensively rather than reading 0
            outp = (rr < 0) | (rr >= PATCH_R) | ((c0 + dc) < 0) \
                | ((c0 + dc) >= PATCH_C)
            return jnp.where(oob | outp | (nn > 0.5), jnp.nan, v)

        sL = slice(0, nlanes)
        sR = slice(nlanes, 2 * nlanes)
        v00 = corner(sL, 0, 0)
        v10 = corner(sL, 1, 0)
        v01 = corner(sR, 0, 1)
        v11 = corner(sR, 1, 1)
        # exact ordering/weights of TsdGridPartition::interpolateBilinear
        val = (v00 * (1.0 - wyf) * (1.0 - wxf)
               + v10 * wyf * (1.0 - wxf)
               + v01 * (1.0 - wyf) * wxf
               + v11 * wyf * wxf)
        base_ok = (ixf >= 0) & (ixf < W) & (iyf >= 0) & (iyf < H)
        return jnp.where(base_ok, val, jnp.nan)

    # ---- window samples: computed directly in lane layout [1, L]
    # (lanes l = b*NW + j; Mosaic cannot shape-cast [KG, NW] -> [1, L])
    iol = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    jl = iol % NW
    grp = iol // NW

    def lane(ref):
        """[1, L] lane row: lane l takes beam l // NW's SMEM scalar."""
        out = jnp.broadcast_to(ref[0, 0, 0], (1, L))
        for k in range(1, KG):
            out = jnp.where(grp == k, ref[0, 0, k], out)
        return out

    twf = lane(tw_ref) + jl.astype(jnp.float32)     # t_w per lane
    rx_l = lane(rx_ref)
    ry_l = lane(ry_ref)
    px = lane(trx_ref) + twf * rx_l
    py = lane(try_ref) + twf * ry_l
    u = px / s - 0.5
    v_ = py / s - 0.5
    ixw = jnp.floor(u)
    iyw = jnp.floor(v_)
    wxw = u - ixw
    wyw = v_ - iyw
    v64 = taps(ixw.astype(jnp.int32), iyw.astype(jnp.int32),
               wxw, wyw, L)

    # ---- event scan ---------------------------------------------------
    v_cur = pltpu.roll(v64, L - 1, 1)      # left-shift by 1 (circular)
    # sample_ok: loop condition i <= idx_max with i = t_cur - 1, pair
    # exists for j < NW-1 (grid/raycast_fast.py::_window_events)
    imax_l = lane(im_ref)
    tw_cur = pltpu.roll(twf, L - 1, 1)
    sample_ok = ((tw_cur - 1.0) <= imax_l) & (jl < NW - 1)
    ev_pos = (v64 > 0) & (v_cur < 0) & sample_ok
    ev_neg = (v64 < 0) & (v_cur > 0) & sample_ok
    ev = ev_pos | ev_neg

    iob = jax.lax.broadcasted_iota(jnp.int32, (KG, L), 0)
    bsel = grp == iob                               # [KG, L] lane groups
    jf = jl.astype(jnp.float32)
    BIG = jnp.float32(NW + 1)
    k_ev = jnp.min(jnp.where(bsel & ev, jf, BIG), axis=1, keepdims=True)
    any_ev = (k_ev < BIG) & has
    k_ev = jnp.minimum(k_ev, jnp.float32(NW - 2))
    oh_k = bsel & (jf == k_ev)
    hit = any_ev & (jnp.sum(jnp.where(oh_k & ev_pos, 1.0, 0.0), axis=1,
                            keepdims=True) > 0)
    vp = jnp.sum(jnp.where(oh_k, jnp.where(jnp.isnan(v64), 0.0, v64),
                           0.0), axis=1, keepdims=True)
    vc = jnp.sum(jnp.where(oh_k, jnp.where(jnp.isnan(v_cur), 0.0, v_cur),
                           0.0), axis=1, keepdims=True)
    interp = vp / (vp - vc)
    t_ev = tw0 + (k_ev + 1.0)
    pos_x = trx + t_ev * rx
    pos_y = try_ + t_ev * ry

    # ---- crossing + central-difference normals ------------------------
    # per-beam crossing [KG, 1] -> lane layout [1, LN] via static row
    # slices (no shape casts)
    cx = pos_x + rx * (interp - 1.0)
    cy = pos_y + ry * (interp - 1.0)
    ion = jax.lax.broadcasted_iota(jnp.int32, (1, LN), 1)
    pn = ion % NORM_P
    grpn = ion // NORM_P

    def lane_n(colv):
        out = jnp.broadcast_to(jax.lax.slice(colv, (0, 0), (1, 1)),
                               (1, LN))
        for k in range(1, KG):
            out = jnp.where(grpn == k,
                            jax.lax.slice(colv, (k, 0), (k + 1, 1)), out)
        return out

    cx_l = lane_n(cx)
    cy_l = lane_n(cy)
    dxl = jnp.where(pn == 0, 1.0, jnp.where(pn == 1, -1.0, 0.0))
    dyl = jnp.where(pn == 2, 1.0, jnp.where(pn == 3, -1.0, 0.0))
    un = (cx_l + s * dxl) / s - 0.5
    vn = (cy_l + s * dyl) / s - 0.5
    ixn = jnp.floor(un)
    iyn = jnp.floor(vn)
    wxn = un - ixn
    wyn = vn - iyn
    nv = taps(ixn.astype(jnp.int32), iyn.astype(jnp.int32),
              wxn, wyn, LN)                         # [1, LN]

    iobn = jax.lax.broadcasted_iota(jnp.int32, (KG, LN), 0)
    bseln = grpn == iobn

    def npick(p):
        m = bseln & (pn == p)
        ok = jnp.sum(jnp.where(m & jnp.isnan(nv), 1.0, 0.0), axis=1,
                     keepdims=True) == 0
        val = jnp.sum(jnp.where(m, jnp.where(jnp.isnan(nv), 0.0, nv),
                                0.0), axis=1, keepdims=True)
        return val, ok

    xp, ok0 = npick(0)
    xm, ok1 = npick(1)
    yp, ok2 = npick(2)
    ym, ok3 = npick(3)
    n_ok = ok0 & ok1 & ok2 & ok3
    nx = xp - xm
    ny = yp - ym
    # exact normalization of grid/interpolate.py::interpolate_normal:
    # norm = sqrt(nx^2 + ny^2); n /= where(norm > 0, norm, 1); NaN if ~ok
    norm = jnp.sqrt(nx * nx + ny * ny)
    den = jnp.where(norm > 0, norm, 1.0)
    nxn = jnp.where(n_ok, nx / den, jnp.nan)
    nyn = jnp.where(n_ok, ny / den, jnp.nan)

    io8 = jax.lax.broadcasted_iota(jnp.int32, (KG, 8), 1)
    row = jnp.where(io8 == 0, jnp.where(hit, 1.0, 0.0),
          jnp.where(io8 == 1, jnp.where(any_ev, 1.0, 0.0),
          jnp.where(io8 == 2, pos_x,
          jnp.where(io8 == 3, pos_y,
          jnp.where(io8 == 4, interp,
          jnp.where(io8 == 5, nxn,
          jnp.where(io8 == 6, nyn,
                    jnp.where(n_ok, 1.0, 0.0))))))))
    out_ref[:, :] = row


def _raw_call(window: int, cell_size: float, interpret: bool, tsd,
              tw0, rayx, rayy, imax, has, trx, tryy, pr, pcs):
    B = tw0.shape[0]
    assert B % KG == 0, B
    NB = B // KG
    H, W = tsd.shape

    def rows(x):
        return x.astype(jnp.float32).reshape(NB, 1, KG)

    attrs = (rows(tw0), rows(rayx), rows(rayy), rows(imax), rows(has),
             rows(trx), rows(tryy))
    kern = partial(_kernel, window, cell_size, H, W)
    # SMEM attr windows are BLOCKED per program (KG scalars each, via a
    # leading block axis — the (8, 128)/equal-dims rule constrains the
    # LAST TWO dims only) so a folded pose batch never exceeds the
    # ~1 MB SMEM budget (full [1, N*B] rows OOM'd at the 128-pose
    # saturation workload)
    return pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, 1, KG), lambda g: (g, 0, 0),
                               memory_space=pltpu.SMEM)] * 7 + [
            pl.BlockSpec((1, 1, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((H, W), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KG, 8), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * PATCH_R, PATCH_C), jnp.float32)],
        interpret=interpret,
    )(*attrs, pr.reshape(NB, 1, 1), pcs.reshape(NB, 1, 1), tsd)


def _make_custom(window: int, cell_size: float, interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(tsd, tw0, rayx, rayy, imax, has, trx, tryy, pr, pcs):
        return _raw_call(window, cell_size, interpret, tsd, tw0, rayx,
                         rayy, imax, has, trx, tryy, pr, pcs)

    @f.def_vmap
    def _rule(axis_size, in_batched, tsd, *rest):
        if not in_batched[0] and all(in_batched[1:]):
            # pose batch with a shared grid: fold into the beam axis —
            # one launch, VMEM-resident grid shared; per-pose blocks
            # stay contiguous (B % KG == 0), so pr/pcs concatenate 1:1
            flat = [a.reshape(-1) for a in rest]
            out = f(tsd, *flat)
            return out.reshape(axis_size, -1, 8), True

        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                x, (axis_size,) + jnp.shape(x))

        args = [bcast(a, b)
                for a, b in zip((tsd,) + rest, in_batched)]
        out = jax.lax.map(lambda a: f(*a), tuple(args))
        return out, True

    return f


_CUSTOM = {}


def window_block_pallas(grid, t_w0, ray, idx_max, has_cand, tr,
                        pr, pcs, window: int, interpret: bool = False):
    """Fused block-batched window replay + normals.

    Args:
      grid: TsdGrid (f32; supports_block_kernel must hold).
      t_w0: [B] first window sample t (idx_min + m_start), B % KG == 0.
      ray: [B, 2]; idx_max: [B]; has_cand: [B] bool; tr: [B, 2] origin
        rows (per-beam so vmapped pose batches fold into the beam axis
        via the custom_vmap rule above).
      pr/pcs: [B // KG] i32 block patch bases from block_patches().
      window: replay samples per beam.
    Returns:
      (hit [B] bool, any_ev [B] bool, pos_ev [B, 2], interp [B],
       normals [B, 2], n_ok [B] bool).  Rows of beams that do not fit
       their block patch (block_patches fits == False) are garbage —
       the caller replays them on the XLA path.
    """
    key = (int(window), float(grid.cell_size), bool(interpret))
    if key not in _CUSTOM:
        _CUSTOM[key] = _make_custom(*key)
    out = _CUSTOM[key](grid.tsd, t_w0, ray[:, 0], ray[:, 1], idx_max,
                       has_cand, tr[:, 0], tr[:, 1], pr, pcs)
    hit = out[:, 0] > 0
    any_ev = out[:, 1] > 0
    pos_ev = out[:, 2:4]
    interp = out[:, 4]
    normals = out[:, 5:7]
    n_ok = out[:, 7] > 0
    return hit, any_ev, pos_ev, interp, normals, n_ok


# ---------------------------------------------------------------------------
# Per-beam-patch variant for small compacted beam sets (the deferred
# beams of the block kernel and the rounds-2+ unresolved beams of
# grid/raycast_fast.py).  Beams are unrelated, so each gets its OWN
# patch — 8 per program, stacked in one scratch so a single one-hot
# matmul still serves all of them — and a per-beam span always fits
# (window + normal stencil <= 14 rows/cols, patch = 24 x 128 rotated).
# Programs whose 8 slots are all inactive skip everything, so in the
# common case (every beam resolves in round 1, no deferrals) the launch
# costs only its program overhead.
# ---------------------------------------------------------------------------

KG1 = 8           # beams per program (out rows align to 8 sublanes)
PR1 = 24          # per-beam patch rows (span <= 14 + 7 align + slack)
NPR1 = KG1 * PR1  # stacked value rows per program


def single_patches(grid, t_w0, ray, tr, window: int):
    """Per-BEAM patch bases for the single-beam kernel (always fit)."""
    H, W = grid.tsd.shape
    s = grid.cell_size
    u0 = (tr[:, 0] + t_w0 * ray[:, 0]) / s - 0.5
    u1 = (tr[:, 0] + (t_w0 + (window - 1)) * ray[:, 0]) / s - 0.5
    v0 = (tr[:, 1] + t_w0 * ray[:, 1]) / s - 0.5
    v1 = (tr[:, 1] + (t_w0 + (window - 1)) * ray[:, 1]) / s - 0.5
    r_lo = jnp.clip(jnp.floor(jnp.minimum(v0, v1)).astype(jnp.int32) - 2,
                    0, H - 1)
    c_lo = jnp.clip(jnp.floor(jnp.minimum(u0, u1)).astype(jnp.int32) - 2,
                    0, W - 1)
    pr = (jnp.clip(r_lo, 0, H - PR1) // 8) * 8
    return pr, c_lo


def _kernel_single(window: int, s: float, H: int, W: int,
                   tw_ref, rx_ref, ry_ref, im_ref, act_ref, trx_ref,
                   try_ref, pr_ref, pcs_ref, tsd_ref, out_ref, val_ref):
    """8 unrelated beams per program, each with its own stacked patch.

    Same semantics as _kernel (see its docstring); val_ref:
    [2*NPR1, PATCH_C] f32 scratch — value rows 0..NPR1-1 (beam k at
    k*PR1), NaN-mask rows NPR1..2*NPR1-1.  Inactive slots leave stale
    patch rows; their outputs are garbage and masked by the caller.
    """
    NW = window
    L = KG1 * NW
    LN = KG1 * NORM_P

    anyact = act_ref[0, 0, 0]
    for k in range(1, KG1):
        anyact = jnp.maximum(anyact, act_ref[0, 0, k])

    @pl.when(anyact > 0.0)
    def _():
        for k in range(KG1):
            @pl.when(act_ref[0, 0, k] > 0.0)
            def _(k=k):
                pr_k = pl.multiple_of(pr_ref[0, 0, k], 8)
                pcs_k = pcs_ref[0, 0, k]
                pc_k = pl.multiple_of(
                    (jnp.minimum(pcs_k, W - LOAD_C) // 128) * 128, 128)
                d = pcs_k - pc_k
                raw = tsd_ref[pl.ds(pr_k, PR1), pl.ds(pc_k, LOAD_C)]
                rolled = pltpu.roll(raw, (LOAD_C - d) % LOAD_C, 1)
                win = rolled[:, 0:PATCH_C]
                isn = jnp.isnan(win)
                val_ref[k * PR1:(k + 1) * PR1, :] = jnp.where(
                    isn, 0.0, win)
                val_ref[NPR1 + k * PR1:NPR1 + (k + 1) * PR1, :] = \
                    jnp.where(isn, 1.0, 0.0)

        iosub = jax.lax.broadcasted_iota(jnp.int32, (KG1, 1), 0)

        def col(ref):
            out = jnp.broadcast_to(ref[0, 0, 0], (KG1, 1))
            for k in range(1, KG1):
                out = jnp.where(iosub == k, ref[0, 0, k], out)
            return out

        tw0 = col(tw_ref)
        rx = col(rx_ref)
        ry = col(ry_ref)
        act = col(act_ref) > 0.0
        trx = col(trx_ref)
        try_ = col(try_ref)

        def lane_sm(ref, nl, grp_l):
            out = jnp.broadcast_to(ref[0, 0, 0], (1, nl))
            for k in range(1, KG1):
                out = jnp.where(grp_l == k, ref[0, 0, k], out)
            return out

        def taps(ixf, iyf, wxf, wyf, nlanes, grp_l):
            pr_l = lane_sm(pr_ref, nlanes, grp_l)
            pcs_l = lane_sm(pcs_ref, nlanes, grp_l)
            rrel = iyf - pr_l                    # within-beam patch row
            r0 = rrel + grp_l * PR1              # stacked scratch row
            c0 = ixf - pcs_l
            ios = jax.lax.broadcasted_iota(jnp.int32,
                                           (PATCH_C, nlanes), 0)
            csel_l = (ios == c0).astype(jnp.float32)
            csel_r = (ios == (c0 + 1)).astype(jnp.float32)
            csel = jnp.concatenate([csel_l, csel_r], axis=1)
            # see _kernel: bf16 is exact for the 0/1 mask half
            Mv = jax.lax.dot(val_ref[0:NPR1, :], csel,
                             preferred_element_type=jnp.float32)
            Mn = jax.lax.dot(
                val_ref[NPR1:2 * NPR1, :].astype(jnp.bfloat16),
                csel.astype(jnp.bfloat16),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            ior = jax.lax.broadcasted_iota(jnp.int32, (NPR1, nlanes), 0)

            def pick(Mh, rsel):
                return jnp.sum(jnp.where(ior == rsel, Mh, 0.0), axis=0,
                               keepdims=True)

            def corner(sl, dr, dc):
                rr = r0 + dr
                v = pick(Mv[:, sl], rr)
                nn = pick(Mn[:, sl], rr)
                iy = iyf + dr
                ix = ixf + dc
                oob = (ix < 0) | (ix >= W) | (iy < 0) | (iy >= H)
                outp = ((rrel + dr) < 0) | ((rrel + dr) >= PR1) \
                    | ((c0 + dc) < 0) | ((c0 + dc) >= PATCH_C)
                return jnp.where(oob | outp | (nn > 0.5), jnp.nan, v)

            sL = slice(0, nlanes)
            sR = slice(nlanes, 2 * nlanes)
            v00 = corner(sL, 0, 0)
            v10 = corner(sL, 1, 0)
            v01 = corner(sR, 0, 1)
            v11 = corner(sR, 1, 1)
            val = (v00 * (1.0 - wyf) * (1.0 - wxf)
                   + v10 * wyf * (1.0 - wxf)
                   + v01 * (1.0 - wyf) * wxf
                   + v11 * wyf * wxf)
            base_ok = (ixf >= 0) & (ixf < W) & (iyf >= 0) & (iyf < H)
            return jnp.where(base_ok, val, jnp.nan)

        iol = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        jl = iol % NW
        grp = iol // NW
        twf = lane_sm(tw_ref, L, grp) + jl.astype(jnp.float32)
        px = lane_sm(trx_ref, L, grp) + twf * lane_sm(rx_ref, L, grp)
        py = lane_sm(try_ref, L, grp) + twf * lane_sm(ry_ref, L, grp)
        u = px / s - 0.5
        v_ = py / s - 0.5
        ixw = jnp.floor(u)
        iyw = jnp.floor(v_)
        wxw = u - ixw
        wyw = v_ - iyw
        v64 = taps(ixw.astype(jnp.int32), iyw.astype(jnp.int32),
                   wxw, wyw, L, grp)

        v_cur = pltpu.roll(v64, L - 1, 1)
        imax_l = lane_sm(im_ref, L, grp)
        tw_cur = pltpu.roll(twf, L - 1, 1)
        sample_ok = ((tw_cur - 1.0) <= imax_l) & (jl < NW - 1)
        ev_pos = (v64 > 0) & (v_cur < 0) & sample_ok
        ev_neg = (v64 < 0) & (v_cur > 0) & sample_ok
        ev = ev_pos | ev_neg

        iob = jax.lax.broadcasted_iota(jnp.int32, (KG1, L), 0)
        bsel = grp == iob
        jf = jl.astype(jnp.float32)
        BIG = jnp.float32(NW + 1)
        k_ev = jnp.min(jnp.where(bsel & ev, jf, BIG), axis=1,
                       keepdims=True)
        any_ev = (k_ev < BIG) & act
        k_ev = jnp.minimum(k_ev, jnp.float32(NW - 2))
        oh_k = bsel & (jf == k_ev)
        hit = any_ev & (jnp.sum(jnp.where(oh_k & ev_pos, 1.0, 0.0),
                                axis=1, keepdims=True) > 0)
        vp = jnp.sum(jnp.where(oh_k, jnp.where(jnp.isnan(v64), 0.0, v64),
                               0.0), axis=1, keepdims=True)
        vc = jnp.sum(jnp.where(oh_k,
                               jnp.where(jnp.isnan(v_cur), 0.0, v_cur),
                               0.0), axis=1, keepdims=True)
        interp = vp / (vp - vc)
        t_ev = tw0 + (k_ev + 1.0)
        pos_x = trx + t_ev * rx
        pos_y = try_ + t_ev * ry

        cx = pos_x + rx * (interp - 1.0)
        cy = pos_y + ry * (interp - 1.0)
        ion = jax.lax.broadcasted_iota(jnp.int32, (1, LN), 1)
        pn = ion % NORM_P
        grpn = ion // NORM_P

        def lane_n(colv):
            out = jnp.broadcast_to(jax.lax.slice(colv, (0, 0), (1, 1)),
                                   (1, LN))
            for k in range(1, KG1):
                out = jnp.where(grpn == k,
                                jax.lax.slice(colv, (k, 0), (k + 1, 1)),
                                out)
            return out

        cx_l = lane_n(cx)
        cy_l = lane_n(cy)
        dxl = jnp.where(pn == 0, 1.0, jnp.where(pn == 1, -1.0, 0.0))
        dyl = jnp.where(pn == 2, 1.0, jnp.where(pn == 3, -1.0, 0.0))
        un = (cx_l + s * dxl) / s - 0.5
        vn = (cy_l + s * dyl) / s - 0.5
        ixn = jnp.floor(un)
        iyn = jnp.floor(vn)
        wxn = un - ixn
        wyn = vn - iyn
        nv = taps(ixn.astype(jnp.int32), iyn.astype(jnp.int32),
                  wxn, wyn, LN, grpn)

        iobn = jax.lax.broadcasted_iota(jnp.int32, (KG1, LN), 0)
        bseln = grpn == iobn

        def npick(p):
            m = bseln & (pn == p)
            ok = jnp.sum(jnp.where(m & jnp.isnan(nv), 1.0, 0.0), axis=1,
                         keepdims=True) == 0
            val = jnp.sum(jnp.where(m, jnp.where(jnp.isnan(nv), 0.0, nv),
                                    0.0), axis=1, keepdims=True)
            return val, ok

        xp, ok0 = npick(0)
        xm, ok1 = npick(1)
        yp, ok2 = npick(2)
        ym, ok3 = npick(3)
        n_ok = ok0 & ok1 & ok2 & ok3
        nx = xp - xm
        ny = yp - ym
        norm = jnp.sqrt(nx * nx + ny * ny)
        den = jnp.where(norm > 0, norm, 1.0)
        nxn = jnp.where(n_ok, nx / den, jnp.nan)
        nyn = jnp.where(n_ok, ny / den, jnp.nan)

        io8 = jax.lax.broadcasted_iota(jnp.int32, (KG1, 8), 1)
        row = jnp.where(io8 == 0, jnp.where(hit, 1.0, 0.0),
              jnp.where(io8 == 1, jnp.where(any_ev, 1.0, 0.0),
              jnp.where(io8 == 2, pos_x,
              jnp.where(io8 == 3, pos_y,
              jnp.where(io8 == 4, interp,
              jnp.where(io8 == 5, nxn,
              jnp.where(io8 == 6, nyn,
                        jnp.where(n_ok, 1.0, 0.0))))))))
        out_ref[:, :] = row


def _raw_call_single(window: int, cell_size: float, interpret: bool,
                     tsd, tw0, rayx, rayy, imax, act, trx, tryy, pr,
                     pcs):
    B = tw0.shape[0]
    assert B % KG1 == 0, B
    NB = B // KG1
    H, W = tsd.shape

    def rows(x):
        return x.astype(jnp.float32).reshape(NB, 1, KG1)

    attrs = (rows(tw0), rows(rayx), rows(rayy), rows(imax), rows(act),
             rows(trx), rows(tryy))
    kern = partial(_kernel_single, window, cell_size, H, W)
    return pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, 1, KG1), lambda g: (g, 0, 0),
                               memory_space=pltpu.SMEM)] * 9 + [
            pl.BlockSpec((H, W), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KG1, 8), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * NPR1, PATCH_C), jnp.float32)],
        interpret=interpret,
    )(*attrs, pr.reshape(NB, 1, KG1).astype(jnp.int32),
      pcs.reshape(NB, 1, KG1).astype(jnp.int32), tsd)


def _make_custom_single(window: int, cell_size: float, interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(tsd, tw0, rayx, rayy, imax, act, trx, tryy, pr, pcs):
        return _raw_call_single(window, cell_size, interpret, tsd, tw0,
                                rayx, rayy, imax, act, trx, tryy, pr,
                                pcs)

    @f.def_vmap
    def _rule(axis_size, in_batched, tsd, *rest):
        if not in_batched[0] and all(in_batched[1:]):
            flat = [a.reshape(-1) for a in rest]
            out = f(tsd, *flat)
            return out.reshape(axis_size, -1, 8), True

        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                x, (axis_size,) + jnp.shape(x))

        args = [bcast(a, b)
                for a, b in zip((tsd,) + rest, in_batched)]
        out = jax.lax.map(lambda a: f(*a), tuple(args))
        return out, True

    return f


_CUSTOM_SINGLE = {}


def window_single_pallas(grid, t_w0, ray, idx_max, active, tr,
                         window: int, interpret: bool = False):
    """Per-beam-patch window replay + normals for compacted beam sets.

    Args:
      t_w0/ray/idx_max/active/tr: as window_block_pallas, B % 8 == 0
        (B = the compaction capacity).  `active` masks real slots;
        fully-inactive 8-slot programs skip all work.
    Returns the same tuple as window_block_pallas; inactive rows are
    garbage (mask with `active`).
    """
    pr, pcs = single_patches(grid, t_w0, ray, tr, window)
    key = (int(window), float(grid.cell_size), bool(interpret))
    if key not in _CUSTOM_SINGLE:
        _CUSTOM_SINGLE[key] = _make_custom_single(*key)
    out = _CUSTOM_SINGLE[key](grid.tsd, t_w0, ray[:, 0], ray[:, 1],
                              idx_max, active, tr[:, 0], tr[:, 1], pr,
                              pcs)
    hit = out[:, 0] > 0
    any_ev = out[:, 1] > 0
    pos_ev = out[:, 2:4]
    interp = out[:, 4]
    normals = out[:, 5:7]
    n_ok = out[:, 7] > 0
    return hit, any_ev, pos_ev, interp, normals, n_ok
