from ohm_tsd_slam_tpu.core import se2

__all__ = ["se2"]
