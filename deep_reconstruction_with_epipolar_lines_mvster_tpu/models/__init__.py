from .fpn import ASFF, FPN4, FPN4ConvNeXt, DeformConv2d
from .losses import blend_loss, mvs4net_loss
from .mono import MonoDepthDecoder
from .mvs4net import MVS4Net
from .reg import Reg2D, Reg3D
from .stagenet import run_stage

__all__ = [
    "ASFF",
    "FPN4",
    "FPN4ConvNeXt",
    "DeformConv2d",
    "MonoDepthDecoder",
    "MVS4Net",
    "Reg2D",
    "Reg3D",
    "blend_loss",
    "mvs4net_loss",
    "run_stage",
]
