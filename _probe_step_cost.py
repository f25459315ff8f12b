"""Isolate the train-step cost: full step vs stop-grad-through-warp vs
forward-only vs sinkhorn-only."""
import time, jax, jax.numpy as jnp, numpy as np
import deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.warp_cor as wc
from deep_reconstruction_with_epipolar_lines_mvster_tpu.core import geometry
from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import ModelConfig, LossConfig
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import make_plane_scene, batch_samples
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train import TrainState, make_optimizer, make_train_step
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train.schedule import warmup_multistep
from deep_reconstruction_with_epipolar_lines_mvster_tpu.core.sinkhorn import sinkhorn_loss

def timeit(f, n=3):
    r = f(); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(n): r = f()
    jax.block_until_ready(r)
    return (time.time()-t0)/n

# 1. sinkhorn alone at stage4 size fwd+bwd
B,D,H,W = 6,4,512,640
rng = np.random.default_rng(0)
hypo = jnp.asarray(np.sort(rng.uniform(400,900,(B,D,H,W)).astype(np.float32),axis=1))
gt = jnp.asarray(rng.uniform(400,900,(B,H,W)).astype(np.float32))
attn = jax.nn.softmax(jnp.asarray(rng.standard_normal((B,D,H,W)).astype(np.float32)),axis=1)
mask = jnp.ones((B,H,W),bool)
f_sink = jax.jit(jax.grad(lambda a: sinkhorn_loss(gt,hypo,a,mask,iters=3)))
print("sinkhorn grad stage4:", round(timeit(lambda: f_sink(attn))*1000,1),"ms", flush=True)

# 2. warp+cor alone fwd+bwd at stage4
C = 8
src = jnp.asarray(rng.standard_normal((B,H,W,C)).astype(np.float32))
ref = jnp.asarray(rng.standard_normal((B,H,W,C)).astype(np.float32))
K = np.array([[576.,0,320],[0,576.,256],[0,0,1]],np.float32)
stack = np.zeros((B,2,4,4),np.float32); stack[:,0]=np.eye(4); stack[:,0,0,3]=10; stack[:,1,:3,:3]=K
stack_ref = np.zeros((B,2,4,4),np.float32); stack_ref[:,0]=np.eye(4); stack_ref[:,1,:3,:3]=K
rel = geometry.relative_projection(jnp.asarray(stack), jnp.asarray(stack_ref))
def cor_loss(s):
    c = wc.correlate_view(s, ref, rel, hypo, group_cor=True, group_dim=4)
    return c.sum()
f_cor = jax.jit(jax.grad(cor_loss))
print("warp+cor grad stage4 (1 view):", round(timeit(lambda: f_cor(src))*1000,1),"ms", flush=True)
f_cor_fwd = jax.jit(cor_loss)
print("warp+cor fwd stage4 (1 view):", round(timeit(lambda: f_cor_fwd(src))*1000,1),"ms", flush=True)
