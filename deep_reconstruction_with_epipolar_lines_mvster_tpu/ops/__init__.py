from .warp_cor import correlate_view, epipolar_aggregate

__all__ = ["correlate_view", "epipolar_aggregate"]
