"""ohm_tsd_slam_tpu — a TPU-native 2D TSD-grid SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
autonohm/ohm_tsd_slam (reference: /root/reference): online 2D SLAM for laser
scanners on a truncated-signed-distance (TSD) grid, with

  * a functional TSD grid state (dense tiles instead of lazily allocated
    partitions; cf. reference src/obvision/reconstruct/grid/TsdGrid.h),
  * a vectorized scan-fusion ("push") kernel (cf. TsdGrid.cpp:217-284),
  * a batched polar ray-marcher rendering model scans from the grid
    (cf. RayCastPolar2D.cpp:194-281) with analytic pose/cell gradients
    (absent in the reference),
  * registration: brute-force-NN ICP with closed-form 2D estimation
    (cf. Icp.cpp, ClosedFormEstimator2D.cpp) plus RANSAC-style global
    matchers (cf. ransacMatching/*),
  * a host-side SLAM runtime replicating the reference's three-thread
    architecture (ThreadLocalize / ThreadMapping / ThreadGrid), and
  * multi-chip scale-out via jax.sharding over rays and grid tiles.
"""

from ohm_tsd_slam_tpu.version import __version__

__all__ = ["__version__"]
