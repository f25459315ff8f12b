import time, sys, jax, jax.numpy as jnp
import numpy as np
from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import ModelConfig, LossConfig
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import make_plane_scene, batch_samples
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train import TrainState, make_optimizer, make_train_step
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train.schedule import warmup_multistep

dtype = sys.argv[1] if len(sys.argv)>1 else "bfloat16"
B = int(sys.argv[2]) if len(sys.argv)>2 else 6
cfg = ModelConfig(group_cor=True, group_cor_dim=(8,8,4,4), inverse_depth=True, mono=True, dtype=dtype, remat=True)
lcfg = LossConfig(inverse_depth=True, mono=True, l1_lw=0.003, ot_iter=3)
V, H, W = 5, 512, 640
batch = batch_samples([make_plane_scene(V=V, H=H, W=W, seed=i) for i in range(B)])
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
times=[]
for _ in range(6):
    t0=time.time(); state, sc = step(state, batch); jax.block_until_ready(sc); times.append(time.time()-t0)
print("steps ms:", [round(t*1000,1) for t in times], " loss", float(sc["loss"]), flush=True)
for d in jax.local_devices():
    try:
        st = d.memory_stats(); print("peak HBM GB:", round(st.get("peak_bytes_in_use",0)/2**30,2), flush=True)
    except Exception as e: print("memstats err", e)
