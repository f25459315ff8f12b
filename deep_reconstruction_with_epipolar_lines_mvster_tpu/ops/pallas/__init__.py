from .sinkhorn_kernel import sinkhorn_loss_pallas

__all__ = ["sinkhorn_loss_pallas"]
