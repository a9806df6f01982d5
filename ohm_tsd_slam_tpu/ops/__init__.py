"""Pallas TPU kernels for the hot ops.

The jnp implementations in grid/ are the semantic reference (and remain
the CPU/interpret path); these kernels are drop-in accelerated variants.
"""

from ohm_tsd_slam_tpu.ops.push_pallas import push_pallas, supports_pallas_push

__all__ = ["push_pallas", "supports_pallas_push"]
