from .warp_kernel import warp_tiles_pallas

__all__ = ["warp_tiles_pallas"]
