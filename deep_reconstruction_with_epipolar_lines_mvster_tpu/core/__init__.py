from .geometry import (
    compose_projection,
    extrinsics_inverse,
    grid_sample_2d,
    homo_warp,
    intrinsics_inverse,
    relative_projection,
    resize_align_corners,
    warp_coords,
)
from .hypothesis import (
    init_range,
    init_inverse_range,
    schedule_inverse_range,
    schedule_range,
)
from .sinkhorn import sinkhorn_loss

__all__ = [
    "compose_projection",
    "extrinsics_inverse",
    "grid_sample_2d",
    "homo_warp",
    "intrinsics_inverse",
    "relative_projection",
    "resize_align_corners",
    "warp_coords",
    "init_range",
    "init_inverse_range",
    "schedule_inverse_range",
    "schedule_range",
    "sinkhorn_loss",
]
