"""ROS-free message structs.

Lightweight stand-ins for the ROS 2 message types the reference consumes/
produces (sensor_msgs/LaserScan, geometry_msgs/PoseStamped,
nav_msgs/OccupancyGrid, sensor_msgs/Image); an optional ROS bridge can map
these 1:1.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class LaserScan:
    """sensor_msgs/LaserScan subset used by the reference
    (src/ThreadLocalize.cpp:248-276,487-497)."""

    ranges: np.ndarray
    angle_min: float
    angle_increment: float
    range_max: float
    stamp: float = 0.0
    frame_id: str = "laser"


@dataclass
class PoseStamped:
    x: float
    y: float
    theta: float
    stamp: float = 0.0
    frame_id: str = "map"

    @property
    def is_nan(self) -> bool:
        return bool(np.isnan(self.x) or np.isnan(self.y)
                    or np.isnan(self.theta))


@dataclass
class Transform2D:
    """tf equivalent: frame-to-frame SE(2) transform."""

    x: float
    y: float
    theta: float
    parent_frame: str = "map"
    child_frame: str = "odom"
    stamp: float = 0.0


@dataclass
class OccupancyGridMsg:
    """nav_msgs/OccupancyGrid subset (src/ThreadGrid.cpp:30-39)."""

    data: np.ndarray            # [H, W] int8: -1/0/100
    resolution: float
    origin_x: float
    origin_y: float
    stamp: float = 0.0
    frame_id: str = "map"

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def height(self) -> int:
        return self.data.shape[0]


@dataclass
class ImageMsg:
    """sensor_msgs/Image (RGB8) subset for the TSD color map."""

    data: np.ndarray            # [H, W, 3] uint8
    stamp: float = 0.0
    frame_id: str = "map"
