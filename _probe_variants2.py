"""Isolate: mxu warp op alone, model without warp, model fwd only."""
import time, jax, jax.numpy as jnp, numpy as np
import deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.warp_cor as wc
import deep_reconstruction_with_epipolar_lines_mvster_tpu.models.stagenet as sn
from deep_reconstruction_with_epipolar_lines_mvster_tpu.core import geometry
from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.warp_mxu import homo_warp_mxu
from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import ModelConfig, LossConfig
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import make_plane_scene, batch_samples
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train import TrainState, make_optimizer, make_train_step
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train.schedule import warmup_multistep

def timeit(f, n=3):
    r=f(); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(n): r=f()
    jax.block_until_ready(r)
    return (time.time()-t0)/n*1000

B,D,H,W,C = 6,4,512,640,8
rng = np.random.default_rng(0)
planes = np.linspace(450,900,D,astype:=np.float32)
yy,xx = np.meshgrid(np.arange(H),np.arange(W),indexing="ij")
ramp = (1+0.0002*xx+0.0001*yy).astype(np.float32)
depth = jnp.asarray(np.broadcast_to((planes.astype(np.float32))[None,:,None,None]*ramp[None,None],(B,D,H,W)).copy())
src = jnp.asarray(rng.standard_normal((B,H,W,C)).astype(np.float32)).astype(jnp.bfloat16)
K = np.array([[576.,0,320],[0,576.,256],[0,0,1]],np.float32)
st_s = np.zeros((B,2,4,4),np.float32); st_s[:,0]=np.eye(4); st_s[:,0,0,3]=10; st_s[:,1,:3,:3]=K
st_r = np.zeros((B,2,4,4),np.float32); st_r[:,0]=np.eye(4); st_r[:,1,:3,:3]=K
rel = geometry.relative_projection(jnp.asarray(st_s), jnp.asarray(st_r))

f_fwd = jax.jit(lambda s: homo_warp_mxu(s, rel, depth).astype(jnp.float32).sum())
print("mxu warp fwd stage4 1view:", round(timeit(lambda: f_fwd(src)),1),"ms",flush=True)
f_bwd = jax.jit(jax.grad(lambda s: homo_warp_mxu(s, rel, depth).astype(jnp.float32).sum()))
print("mxu warp fwd+bwd stage4 1view:", round(timeit(lambda: f_bwd(src)),1),"ms",flush=True)

# model without warp: stub epipolar_aggregate to broadcast ref features
orig = sn.epipolar_aggregate
def stub(features, projs, hypo, **kw):
    ref = features[0]
    G = kw.get("group_dim",8) if kw.get("group_cor") else ref.shape[-1]
    Bv, h, w, c = ref.shape
    Dh = hypo.shape[1]
    base = ref[:, None, :, :, :G] if G<=c else ref[:,None]
    return jnp.broadcast_to(base, (Bv, Dh, h, w, G)) * (1e-6*hypo[...,None].astype(ref.dtype)+1.0)
sn.epipolar_aggregate = stub
batch = batch_samples([make_plane_scene(V=5,H=512,W=640,seed=i) for i in range(B)])
for k in ("view_depths","intrinsics","extrinsics"): batch.pop(k)
batch = jax.tree_util.tree_map(jnp.asarray, batch)
cfg = ModelConfig(group_cor=True, group_cor_dim=(8,8,4,4), inverse_depth=True, mono=True, dtype="bfloat16", remat=False)
lcfg = LossConfig(inverse_depth=True, mono=True, l1_lw=0.003, ot_iter=3)
model = MVS4Net(cfg)
variables = model.init(jax.random.PRNGKey(0), batch["imgs"][:1], jax.tree_util.tree_map(lambda x: x[:1], batch["proj_matrices"]), batch["depth_values"][:1], train=True)
tx = make_optimizer(warmup_multistep(1e-3,[100000],0.5), 1e-4)
state = TrainState.create(variables, tx)
step = jax.jit(make_train_step(model, lcfg, tx), donate_argnums=0)
state, sc = step(state, batch); jax.block_until_ready(sc)
ts=[]
for _ in range(4):
    t0=time.time(); state, sc = step(state, batch); jax.block_until_ready(sc); ts.append((time.time()-t0)*1000)
print("NO_WARP full step ms:", [round(t) for t in ts], flush=True)
sn.epipolar_aggregate = orig
