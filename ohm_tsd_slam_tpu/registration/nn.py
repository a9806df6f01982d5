"""Batched nearest-neighbor assignment.

TPU-native replacement for the reference's kd-tree backends
(FlannPairAssignment — the default, src/obvision/registration/icp/assign/
FlannPairAssignment.cpp:94-144 — plus the Ann/Nabo alternatives).

kd-trees are pointer-chasing structures that map poorly to the MXU; at
SLAM scan sizes (~1081 points) an exact dense distance matrix is a single
small matmul-shaped computation that the MXU executes in microseconds, so
brute force *is* the fast path on TPU.  Invalid points are excluded with
+inf masking rather than compaction (static shapes for XLA).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def nearest_neighbors(model: jnp.ndarray, model_mask: jnp.ndarray,
                      scene: jnp.ndarray,
                      scene_mask: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact 1-NN from every (valid) scene point into the valid model set.

    Equivalent to FlannPairAssignment::determinePairs (1-NN kd-tree
    queries, L2) but as one dense [S, M] computation:
    d²(s,m) = |s|² + |m|² − 2·s·mᵀ.

    Args:
      model: (M, 2) model points; model_mask: (M,) validity.
      scene: (S, 2) scene points; scene_mask: (S,) validity.
    Returns:
      idx:   (S,) int32 index of the nearest valid model point
             (undefined-but-in-range where scene_mask is False or no
             valid model exists).
      dist2: (S,) squared distance (+inf where invalid).
    """
    dtype = scene.dtype
    s2 = jnp.sum(scene * scene, axis=1, keepdims=True)          # [S,1]
    m2 = jnp.sum(model * model, axis=1, keepdims=True).T        # [1,M]
    cross = scene @ model.T                                     # [S,M] (MXU)
    d2 = s2 + m2 - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)  # clamp fp cancellation
    d2 = jnp.where(model_mask[None, :], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(d2, idx[:, None].astype(jnp.int64), axis=1)[:, 0]
    best = jnp.where(scene_mask, best, jnp.inf)
    return idx, best
