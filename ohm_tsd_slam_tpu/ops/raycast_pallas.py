"""Pallas TPU kernel for the raycast candidate search (the per-scan hot
reduction of grid/raycast_fast.py).

The isocontour caster's candidate search evaluates, for every
(segment, beam) pair, a ray-segment intersection and takes the earliest
hit per beam — and the replay loop then needs the next-earliest
candidates past a fixed cover distance for beams whose exact-march
window resolves nothing (double crossings inside one march step).  This
kernel fuses ALL of it into one launch: K "levels" of candidates per
beam, level k being the earliest intersection at least `cover` steps
beyond level k-1 — exactly the t_search sequence the replay rounds would
otherwise recompute with K separate launches
(grid/raycast_fast.py::raycast_fast rounds loop).

Input layout (chosen against two measured TPU pathologies):
  * seg pack [8, S] — segments on the LANE axis: a [S, 8] layout pads 8
    lanes to 128 and occupies 16x the VMEM (OOM at the 32768 cap);
  * beam attributes as SEVEN SEPARATE 1-D [B] arrays — interleaving them
    into one [B, 8] or [8, B] array costs ~0.8 ms of relayout per scan
    on v5e (measured), dwarfing the kernel itself.  Each program reads
    its [B_BLK] slices and transposes them to [B_BLK, 1] columns
    in-register (one tiny relayout per input per program).

All candidate arithmetic is VPU outer-product broadcasting
([B_BLK,1] x [1,S_BLK]); the 8-deep MXU contractions of the first design
wasted the 128x128 systolic array.

The segment pack is POSE-INDEPENDENT: the sensor translation rides in
the beam attributes and cross(p0 - tr, e) = cross(p0, e) - cross(tr, e)
is reconstructed in-kernel; the caller packs p0/tr relative to the grid
center so f32 cancellation stays bounded by the map half-extent.
Under `jax.vmap` over poses the segment pack is shared and the pose
batch folds into the beam axis (custom_vmap below) — VMEM footprint is
batch-size-independent.

For segment (p0, p1) and beam step vector ray (unit * cellsize):
  e = p1 - p0,
  denom = cross(ray, e),  c1 = cross(ray, p0 - tr),
  c0 = cross(p0 - tr, e) = c0p - (trx * ey - try * ex),
  t = c0 / denom, u = -c1 / denom,
  candidate iff |denom| > eps, u in [0, 1], t in [max(lo, bound), hi],
  level bounds: bound_0 = t_after, bound_k = level_{k-1} + cover.

A beam block whose every t_after is +inf (all beams resolved) skips the
chunk loops entirely.

Built (and tested in interpret mode) against the jnp reference
implementation in grid/raycast_fast.py::_segment_candidates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_BLK = 2048
B_BLK = 128


def on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def _col(ref):
    """[1, B_BLK] row block -> [B_BLK, 1] column (in-register
    relayout).  Attributes ride as [1, B] 2-D rows because Mosaic
    rejects 1-D f32 operands (XLA lays them out with a T(1024) tile)."""
    return ref[:].T


def _kernel(levels: int, cover: float, nc_ref, seg_ref,
            rayx_ref, rayy_ref, lo_ref, hi_ref, t_after_ref,
            trx_ref, try_ref, out_ref):
    # seg_ref [8, S] stays VMEM-resident (8*S*4 B = 1 MB at the 32768
    # cap); loop its chunks inside one program per beam block.  The loop
    # bound is the RUNTIME chunk count (compaction places all real
    # segments first): a scene with 4k segments does 2 chunks, not 16.
    n_s = nc_ref[0]
    rayx = _col(rayx_ref)                         # [B_BLK, 1]
    rayy = _col(rayy_ref)
    lo = _col(lo_ref)
    hi = _col(hi_ref)
    t_after = _col(t_after_ref)
    trx = _col(trx_ref)
    try_ = _col(try_ref)
    c1tr = rayx * try_ - rayy * trx               # cross(ray, tr) [B,1]

    def level_min(bound, n_eff):
        def body(j, acc):
            P = seg_ref[:, pl.ds(j * S_BLK, S_BLK)]   # [8, S_BLK]
            ex = P[0:1, :]                            # [1, S_BLK]
            ey = P[1:2, :]
            p0x = P[2:3, :]
            p0y = P[3:4, :]
            c0p = P[4:5, :]
            valid = P[5:6, :]
            eps = P[6:7, :]
            # outer products: [B_BLK,1] x [1,S_BLK] -> [B_BLK,S_BLK]
            denom = rayx * ey - rayy * ex             # cross(ray, e)
            c1 = (rayx * p0y - rayy * p0x) - c1tr     # cross(ray, p0-tr)
            c0 = c0p - (trx * ey - try_ * ex)         # cross(p0-tr, e)
            ok_denom = jnp.abs(denom) > eps
            safe = jnp.where(ok_denom, denom, 1.0)
            t = c0 / safe
            u = -c1 / safe
            ok = ((valid > 0.0) & ok_denom & (u >= 0.0) & (u <= 1.0)
                  & (t >= lo) & (t <= hi) & (t >= bound))
            tmin = jnp.min(jnp.where(ok, t, jnp.inf), axis=1,
                           keepdims=True)
            return jnp.minimum(acc, tmin)

        acc = jnp.full((B_BLK, 1), jnp.inf, jnp.float32)
        return jax.lax.fori_loop(0, n_eff, body, acc)

    # all-resolved blocks (every t_after = +inf) skip every chunk loop
    active = jnp.any(t_after < jnp.inf)
    n_eff = jnp.where(active, n_s, 0)

    bound = t_after
    for k in range(levels):
        lvl = level_min(bound, n_eff)
        out_ref[:, k:k + 1] = lvl
        if k + 1 < levels:
            bound = lvl + cover


def _raw_call(segpack, attrs, count, levels: int, cover: float,
              interpret: bool) -> jnp.ndarray:
    S = segpack.shape[1]
    B = attrs[0].shape[1]
    assert S % S_BLK == 0 and B % B_BLK == 0, (S, B)
    nb = B // B_BLK
    n_chunks = jnp.clip((count + S_BLK - 1) // S_BLK, 0, S // S_BLK)
    n_chunks = n_chunks.astype(jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, S), lambda b, nc: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, B_BLK), lambda b, nc: (0, b),
                          memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec((B_BLK, levels), lambda b, nc: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_kernel, levels, cover),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, levels), jnp.float32),
        interpret=interpret,
    )(n_chunks, segpack, *attrs)
    return out


def _make_custom(levels: int, cover: float, interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(segpack, rayx, rayy, lo, hi, t_after, trx, try_, count):
        return _raw_call(segpack,
                         (rayx, rayy, lo, hi, t_after, trx, try_),
                         count, levels, cover, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, segpack, *rest):
        attrs = rest[:7]
        count = rest[7]
        seg_b = in_batched[0]
        attr_b = in_batched[1:8]
        cnt_b = in_batched[8]
        if not seg_b and not cnt_b and all(attr_b):
            # fold the pose batch into the beam axis: one kernel launch,
            # VMEM footprint unchanged, segment pack shared; beam attrs
            # are [1, B] rows so the fold is a contiguous reshape
            N = axis_size
            B = attrs[0].shape[2]
            flat = [a.reshape(1, N * B) for a in attrs]
            out = f(segpack, *flat, count)
            return out.reshape(N, B, out.shape[-1]), True
        # general fallback (batched grid): sequential map over the batch
        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                x, (axis_size,) + jnp.shape(x))
        args = ([bcast(segpack, seg_b)]
                + [bcast(a, b) for a, b in zip(attrs, attr_b)]
                + [bcast(count, cnt_b)])
        out = jax.lax.map(lambda a: f(*a), tuple(args))
        return out, True

    return f


_CUSTOM = {}


def segment_min_pallas(segpack: jnp.ndarray, beams, count: jnp.ndarray,
                       levels: int = 1, cover: float = 0.0,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused K-level candidate min-reduction.

    Args:
      segpack: [8, S] f32 (see module docstring); S % S_BLK == 0 after
        padding by the caller (pad columns with valid = 0), real
        segments first.  Pose-independent — build once per grid version.
      beams: tuple of seven [1, B] f32 rows (rayx, rayy, lo, hi,
        t_after, trx, try), B % B_BLK == 0 (pad with lo > hi and
        t_after = +inf via pad_beams).
      count: scalar i32 — number of real segments.
      levels: number of candidate levels K (1 = plain earliest).
      cover: minimum spacing between levels, in march steps.
    Returns:
      [B, K] f32: level-k earliest t per beam (inf = none).
    """
    key = (levels, float(cover), bool(interpret))
    if key not in _CUSTOM:
        _CUSTOM[key] = _make_custom(levels, float(cover), bool(interpret))
    return _CUSTOM[key](segpack, *beams, count)


def pack_segments(p0, p1, svalid, dtype=jnp.float32):
    """Build the pose-independent [8, S] segment pack (padded to S_BLK)
    + real count.  Callers pass p0/p1 shifted to the grid-center origin
    (see grid/raycast_fast.py::extract_segments)."""
    e = (p1 - p0).astype(dtype)
    p0 = p0.astype(dtype)
    c0p = p0[:, 0] * e[:, 1] - p0[:, 1] * e[:, 0]     # cross(p0, e)
    eps_rel = 1e-6
    eps = eps_rel * jnp.maximum(jnp.linalg.norm(e, axis=1), 1e-30)
    S = p0.shape[0]
    pad = (-S) % S_BLK
    A = jnp.stack([e[:, 0], e[:, 1], p0[:, 0], p0[:, 1], c0p,
                   svalid.astype(dtype), eps, jnp.zeros_like(c0p)],
                  axis=0)                                  # [8, S]
    if pad:
        A = jnp.pad(A, ((0, 0), (0, pad)))
    return A, jnp.sum(svalid, dtype=jnp.int32)


def pad_beams(ray, lo, hi, t_after, tr, dtype=jnp.float32):
    """Build the per-beam attribute tuple (seven [1, B_pad] f32 rows) —
    no interleaving (a packed [B, 8]/[8, B] array costs ~0.8 ms of
    relayout per scan; separate rows are near-free).  Pads can never
    match (lo > hi) and never keep a block's chunk loop alive
    (t_after = +inf).  `tr` is the sensor translation, [2] (one pose)
    or per-beam rows [B, 2] (flat pose batch); grid-center-shifted to
    match the segment pack."""
    B = ray.shape[0]
    pad = (-B) % B_BLK

    def p(v, fill=0.0):
        v = v.astype(dtype)
        if pad:
            v = jnp.pad(v, (0, pad), constant_values=fill)
        return v.reshape(1, -1)

    B_out = B + pad
    if tr.ndim == 2:
        trx, tryy = p(tr[:, 0]), p(tr[:, 1])
    else:
        trx = jnp.broadcast_to(tr[0].astype(dtype), (1, B_out))
        tryy = jnp.broadcast_to(tr[1].astype(dtype), (1, B_out))
    return (p(ray[:, 0]), p(ray[:, 1]),
            p(lo, 1.0), p(hi, 0.0),
            p(t_after, jnp.inf),
            trx, tryy)
