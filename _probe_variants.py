"""Where does the remaining 1s/step go? Compile 4 train-step variants."""
import time, dataclasses, jax, jax.numpy as jnp, numpy as np
import deep_reconstruction_with_epipolar_lines_mvster_tpu.models.losses as losses_mod
from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import ModelConfig, LossConfig
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import make_plane_scene, batch_samples
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train import TrainState, make_optimizer, make_train_step
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train.schedule import warmup_multistep

B, V, H, W = 6, 5, 512, 640
batch = batch_samples([make_plane_scene(V=V, H=H, W=W, seed=i) for i in range(B)])
for k in ("view_depths","intrinsics","extrinsics"): batch.pop(k)
batch = jax.tree_util.tree_map(jnp.asarray, batch)

def bench(tag, cfg, lcfg):
    model = MVS4Net(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch["imgs"][:1], jax.tree_util.tree_map(lambda x: x[:1], batch["proj_matrices"]), batch["depth_values"][:1], train=True)
    tx = make_optimizer(warmup_multistep(1e-3,[100000],0.5), 1e-4)
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, lcfg, tx), donate_argnums=0)
    t0=time.time(); state, sc = step(state, batch); jax.block_until_ready(sc)
    print(tag, "compile+first", round(time.time()-t0,1), flush=True)
    ts=[]
    for _ in range(4):
        t0=time.time(); state, sc = step(state, batch); jax.block_until_ready(sc); ts.append(time.time()-t0)
    print(tag, "ms:", [round(t*1000) for t in ts], flush=True)

base_cfg = ModelConfig(group_cor=True, group_cor_dim=(8,8,4,4), inverse_depth=True, mono=True, dtype="bfloat16", remat=True)
base_l = LossConfig(inverse_depth=True, mono=True, l1_lw=0.003, ot_iter=3)

bench("FULL", base_cfg, base_l)
bench("NO_REMAT", dataclasses.replace(base_cfg, remat=False), base_l)
bench("OT10", base_cfg, dataclasses.replace(base_l, ot_iter=10))
# stub out sinkhorn to isolate loss cost
orig = losses_mod.sinkhorn_loss
losses_mod.sinkhorn_loss = lambda gt,hypo,attn,mask,**kw: (attn.astype(jnp.float32).mean())
bench("NO_SINKHORN", base_cfg, base_l)
losses_mod.sinkhorn_loss = orig
