import time, jax, jax.numpy as jnp
import numpy as np
from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import ModelConfig, LossConfig
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import make_plane_scene, batch_samples
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train import TrainState, make_optimizer, make_train_step
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train.schedule import warmup_multistep

cfg = ModelConfig(group_cor=True, group_cor_dim=(8,8,4,4), inverse_depth=True, mono=True)
lcfg = LossConfig(inverse_depth=True, mono=True, l1_lw=0.003, ot_iter=3)
B, V, H, W = 6, 5, 512, 640
t0=time.time()
batch = batch_samples([make_plane_scene(V=V, H=H, W=W, seed=i) for i in range(B)])
print("scene gen", round(time.time()-t0,1), flush=True)
for k in ("view_depths","intrinsics","extrinsics"): batch.pop(k)
batch = jax.tree_util.tree_map(jnp.asarray, batch)
model = MVS4Net(cfg)
t0=time.time()
variables = model.init(jax.random.PRNGKey(0), batch["imgs"][:1], jax.tree_util.tree_map(lambda x: x[:1], batch["proj_matrices"]), batch["depth_values"][:1], train=True)
print("init", round(time.time()-t0,1), flush=True)
tx = make_optimizer(warmup_multistep(1e-3,[100000],0.5), 1e-4)
state = TrainState.create(variables, tx)
step = jax.jit(make_train_step(model, lcfg, tx), donate_argnums=0)
t0=time.time(); state, sc = step(state, batch); jax.block_until_ready(sc); print("compile+first", round(time.time()-t0,1), flush=True)
for _ in range(5):
    t0=time.time(); state, sc = step(state, batch); jax.block_until_ready(sc); print("step", round((time.time()-t0)*1000,1), "ms  loss", float(sc["loss"]), flush=True)
