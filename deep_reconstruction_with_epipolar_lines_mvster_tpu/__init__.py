"""TPU-native multi-view-stereo framework (MVSTER family).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
olivier-2018/Deep_reconstruction_with_epipolar_lines_MVSTER:
cascaded 4-stage MVS depth estimation with epipolar-transformer cost
aggregation, trained with a Sinkhorn optimal-transport loss, plus
geometric-consistency depth fusion into 3D point clouds.

Layout
------
core/      pure-jnp geometry, depth-hypothesis scheduling, sinkhorn OT
ops/       sampling/warp compute kernels (XLA gather formulation + Pallas)
models/    flax modules: FPN4, StageNet, cost regularization, MVS4Net, losses
data/      dataset-agnostic sample spec + DTU / Blender / BlendedMVS / eval loaders
train/     jitted train/eval steps, LR schedules, metrics, checkpointing
parallel/  device-mesh + sharding setup (data / spatial axes)
eval/      depth-map generation, consistency filtering + fusion, PLY export
utils/     debug observability (numeric dumps) and misc helpers
"""

__version__ = "0.1.0"
