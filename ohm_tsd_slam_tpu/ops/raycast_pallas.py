"""Pallas TPU kernel for the raycast candidate search (the per-scan hot
reduction of grid/raycast_fast.py).

The isocontour caster's candidate search evaluates, for every
(segment, beam) pair, a ray-segment intersection and takes the earliest
hit per beam.  In plain XLA the [S, B] intermediates (denom, u, t, masks
— S = 32768, B ~ 1088, ~140 MB each in f32) are materialized in HBM
between broadcasts and the reduction, which makes the search
bandwidth-bound.  This kernel fuses the whole thing: each beam-block
program streams the segment pack through VMEM in chunks and folds the
intersection test straight into a running per-beam minimum — nothing
bigger than a [B_BLK, S_BLK] tile ever exists.

Layout (chosen for TPU tiling, lane dim = 128):
  seg pack  [8, S]    rows: ex, ey, p0x, p0y, c0p = cross(p0, e),
                      valid, eps, 0 — segments on the LANE axis, so the
                      whole pack is 8*S*4 B of VMEM (a [S, 8] layout
                      would pad 8 lanes to 128 and blow the 16 MB scoped
                      VMEM budget 16x — the r3 OOM).
  beams     [B, 8]    cols: rayx, rayy, lo, hi, t_after, trx, try, 0 —
                      beams on the SUBLANE axis; per-beam scalars slice
                      as [B_BLK, 1] and broadcast against segment rows.
  out       [B, 1]    min t per beam (inf = none).

All arithmetic is VPU outer-product broadcasting ([B_BLK,1] x [1,S_BLK])
— the 8-deep contractions of the old layout wasted the 128x128 MXU.

The segment pack is POSE-INDEPENDENT: the sensor translation `tr` rides
in the beam pack and the pose-dependent cross products are reconstructed
in-kernel (cross(p0 - tr, e) = cross(p0, e) - cross(tr, e)); the caller
packs p0/tr relative to the grid center so the f32 cancellation stays
bounded by the map half-extent.  Consequences:
  * under `jax.vmap` over poses (AMCL / multi-particle / saturation
    workloads) the segment extraction + packing is unbatched and XLA
    hoists it out of the batch — one isocontour pass serves every pose;
  * a custom_vmap rule folds the pose batch into the beam axis
    ([N, B, 8] -> [N*B, 8]), so the kernel's VMEM footprint is
    batch-size-independent.

For segment (p0, p1) and beam step vector ray (unit * cellsize):
  e = p1 - p0,
  denom = cross(ray, e),  c1 = cross(ray, p0 - tr),
  c0 = cross(p0 - tr, e) = c0p - (trx * ey - try * ex),
  t = c0 / denom, u = -c1 / denom,
  candidate iff |denom| > eps, u in [0, 1], t in [max(lo, t_after), hi].

A beam block whose every t_after is +inf (all beams resolved — rounds
2+ of the replay loop on a clean scene) skips the chunk loop entirely.

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


def _kernel(nc_ref, seg_ref, beam_ref, out_ref):
    # seg_ref [8, S] stays VMEM-resident (8*S*4 B = 1 MB at the 32768
    # cap); loop its chunks inside one program per beam block so
    # per-program overhead is paid nb times, not nb*ns times.  The loop
    # bound is the RUNTIME chunk count (compaction places all real
    # segments first): a scene with 4k segments does 2 chunks, not 16.
    n_s = nc_ref[0]
    rayx = beam_ref[:, 0:1]                       # [B_BLK, 1]
    rayy = beam_ref[:, 1:2]
    lo = beam_ref[:, 2:3]
    hi = beam_ref[:, 3:4]
    t_after = beam_ref[:, 4:5]
    trx = beam_ref[:, 5:6]
    try_ = beam_ref[:, 6:7]
    c1tr = rayx * try_ - rayy * trx               # cross(ray, tr) [B,1]

    def body(j, acc):
        P = seg_ref[:, pl.ds(j * S_BLK, S_BLK)]   # [8, S_BLK]
        ex = P[0:1, :]                            # [1, S_BLK]
        ey = P[1:2, :]
        p0x = P[2:3, :]
        p0y = P[3:4, :]
        c0p = P[4:5, :]
        valid = P[5:6, :]
        eps = P[6:7, :]
        # outer-product broadcasts: [B_BLK,1] x [1,S_BLK] -> [B_BLK,S_BLK]
        denom = rayx * ey - rayy * ex             # cross(ray, e)
        c1 = (rayx * p0y - rayy * p0x) - c1tr     # cross(ray, p0 - tr)
        c0 = c0p - (trx * ey - try_ * ex)         # cross(p0 - tr, e)
        ok_denom = jnp.abs(denom) > eps
        safe = jnp.where(ok_denom, denom, 1.0)
        t = c0 / safe
        u = -c1 / safe
        ok = ((valid > 0.0) & ok_denom & (u >= 0.0) & (u <= 1.0)
              & (t >= lo) & (t <= hi) & (t >= t_after))
        tmin = jnp.min(jnp.where(ok, t, jnp.inf), axis=1, keepdims=True)
        return jnp.minimum(acc, tmin)

    # rounds 2+ of the replay loop mark resolved beams with
    # t_after = +inf; a fully-resolved block has no work
    active = jnp.any(t_after < jnp.inf)
    n_eff = jnp.where(active, n_s, 0)
    acc = jnp.full((out_ref.shape[0], 1), jnp.inf, jnp.float32)
    acc = jax.lax.fori_loop(0, n_eff, body, acc)
    out_ref[:] = acc


def _raw_call(segpack: jnp.ndarray, beams: jnp.ndarray,
              count: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    S = segpack.shape[1]
    B = beams.shape[0]
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
            pl.BlockSpec((B_BLK, 8), lambda b, nc: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_BLK, 1), lambda b, nc: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        interpret=interpret,
    )(n_chunks, segpack, beams)
    return out[:, 0]


def _make_custom(interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(segpack, beams, count):
        return _raw_call(segpack, beams, count, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, segpack, beams, count):
        seg_b, beam_b, cnt_b = in_batched
        if not seg_b and not cnt_b and beam_b:
            # fold the pose batch into the beam axis: one kernel launch,
            # VMEM footprint unchanged, segment pack shared
            N = axis_size
            B = beams.shape[1]
            flat = beams.reshape(N * B, 8)
            out = f(segpack, flat, count)
            return out.reshape(N, B), True
        # general fallback (batched grid): sequential map over the batch
        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                x, (axis_size,) + jnp.shape(x))
        segs = bcast(segpack, seg_b)
        bms = bcast(beams, beam_b)
        cnts = bcast(count, cnt_b)
        out = jax.lax.map(lambda a: f(*a), (segs, bms, cnts))
        return out, True

    return f


_CUSTOM = {False: _make_custom(False), True: _make_custom(True)}


@partial(jax.jit, static_argnames=("interpret",))
def segment_min_pallas(segpack: jnp.ndarray, beams: jnp.ndarray,
                       count: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused candidate min-reduction.

    Args:
      segpack: [8, S] f32 (see module docstring); S % S_BLK == 0 after
        padding by the caller (pad columns with valid = 0), real
        segments first.  Pose-independent — build once per grid version.
      beams: [B, 8] f32; B % B_BLK == 0 (pad rows with lo > hi).
      count: scalar i32 — number of real segments.
    Returns:
      [B] f32 min t per beam (inf = no candidate).
    """
    return _CUSTOM[bool(interpret)](segpack, beams, count)


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


def pack_beams(ray, lo, hi, t_after, tr, dtype=jnp.float32):
    """Build the [B, 8] beam pack (padded to B_BLK; pads can never match
    since their clip window is empty).  `tr` is the [2] sensor
    translation (grid-center-shifted to match the segment pack),
    broadcast to every beam row."""
    B = ray.shape[0]
    pad = (-B) % B_BLK
    trx = jnp.broadcast_to(tr[0].astype(dtype), (B,))
    try_ = jnp.broadcast_to(tr[1].astype(dtype), (B,))
    rows = jnp.stack([ray[:, 0].astype(dtype), ray[:, 1].astype(dtype),
                      lo.astype(dtype), hi.astype(dtype),
                      t_after.astype(dtype), trx, try_,
                      jnp.zeros((B,), dtype)], axis=1)      # [B, 8]
    if pad:
        padrow = jnp.zeros((pad, 8), dtype)
        padrow = padrow.at[:, 2].set(1.0)  # lo = 1 > hi = 0 -> empty
        # pads are "resolved" so they never keep a block's chunk loop
        # alive
        padrow = padrow.at[:, 4].set(jnp.inf)
        rows = jnp.concatenate([rows, padrow], axis=0)
    return rows
