"""End-to-end convergence demo on TPU: train the DTU-config model on
synthetic plane scenes for 300 steps; report metric trajectory."""
import time, jax, jax.numpy as jnp, numpy as np
from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import ModelConfig, LossConfig
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import make_plane_scene, batch_samples
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train import TrainState, make_optimizer, make_train_step
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train.schedule import warmup_multistep

cfg = ModelConfig(group_cor=True, group_cor_dim=(8,8,4,4), inverse_depth=True, mono=True, dtype="bfloat16")
lcfg = LossConfig(inverse_depth=True, mono=True, l1_lw=0.003, ot_iter=3)
B, V, H, W = 4, 3, 128, 128
scenes = [make_plane_scene(V=V, H=H, W=W, seed=i, gx=0.1*(i%3), gy=-0.05*(i%2)) for i in range(8)]
for s in scenes:
    for k in ("view_depths","intrinsics","extrinsics"): s.pop(k)
model = MVS4Net(cfg)
b0 = batch_samples(scenes[:B]); b0 = jax.tree_util.tree_map(jnp.asarray, b0)
variables = model.init(jax.random.PRNGKey(0), b0["imgs"][:1], jax.tree_util.tree_map(lambda x: x[:1], b0["proj_matrices"]), b0["depth_values"][:1], train=True)
tx = make_optimizer(warmup_multistep(1e-3,[100000],0.5), 1e-4)
state = TrainState.create(variables, tx)
step = jax.jit(make_train_step(model, lcfg, tx), donate_argnums=0)
batches = [jax.tree_util.tree_map(jnp.asarray, batch_samples(scenes[i:i+B])) for i in (0,4)]
t0=time.time()
for i in range(300):
    state, sc = step(state, batches[i % 2])
    if i in (0, 10, 50, 100, 200, 299):
        sc = {k: float(v) for k, v in sc.items()}
        print(f"step {i}: loss={sc['loss']:.3f} abs_err={sc['abs_depth_error']:.2f} "
              f"thres8mm={sc['thres8mm_error']*100:.1f}%", flush=True)
print("total", round(time.time()-t0,1), "s", flush=True)
