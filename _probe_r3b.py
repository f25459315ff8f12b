"""TPU probe: round-2b kernels — v3 warp fwd (full + chunked), fused
top-down level, and full-model combinations. bf16, bench config."""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge

CHAIN = 32
DT = jnp.bfloat16


def timed(fn, args, chain=CHAIN, reps=3, tag=""):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            return fn(*a, carry), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), length=chain)
        return c

    t0 = time.perf_counter()
    float(chained(*args))
    comp = time.perf_counter() - t0
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(*args))
        lat.append(time.perf_counter() - t0)
    lat.sort()
    per = lat[len(lat) // 2] / chain * 1e3
    print(f"[{tag}] {per:.2f} ms (compile {comp:.0f}s)", flush=True)
    return per


def main():
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.core.geometry import (
        relative_projection,
        resize_align_corners,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.pallas.topdown_fused import (
        topdown_fused_level,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.warp_mxu import (
        homo_warp_mxu,
    )

    B = 4
    rng = np.random.default_rng(0)

    # --- warp: scan vs v3 at s4/s3 ---------------------------------------
    for s, (H, W, D, C) in {4: (512, 640, 4, 8), 3: (256, 320, 4, 16)}.items():
        batch = ge._example_batch(B=B, V=2, H=H, W=W)
        src = jnp.asarray(rng.standard_normal((B, H, W, C)), DT)
        pr = batch["proj_matrices"]["stage4"]
        rel = relative_projection(pr[:, 1], pr[:, 0])
        hypo = jnp.asarray(
            np.linspace(425.0, 935.0, D)[None, :, None, None]
            * np.ones((B, D, H, W)),
            jnp.float32,
        )
        for tag, kw in (
            ("scan", {}),
            ("v3", dict(xband=192, tile_cols=128, v3=True)),
        ):
            def f(src, rel, hypo, carry, _kw=kw):
                out = homo_warp_mxu(
                    src + carry.astype(DT) * 1e-12, rel, hypo,
                    band=16, tile_rows=8, **_kw,
                )
                return out.astype(jnp.float32).mean()

            timed(f, (src, rel, hypo), tag=f"s{s} warp {tag}")
        a = homo_warp_mxu(src, rel, hypo, band=16, tile_rows=8)
        b = homo_warp_mxu(src, rel, hypo, band=16, tile_rows=8,
                          xband=192, tile_cols=128, v3=True)
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        print(f"  s{s} v3 max|diff| {d.max():.5f}", flush=True)

    # --- fused top-down level vs XLA chain --------------------------------
    N, Hh, Wh, Ci, Cs, Co = 16, 256, 320, 64, 8, 8
    H, W = 512, 640
    intra = jnp.asarray(rng.standard_normal((N, Hh, Wh, Ci)), DT)
    skip = jnp.asarray(rng.standard_normal((N, H, W, Cs)), DT)
    wi = jnp.asarray(rng.standard_normal((1, 1, Cs, Ci)) * 0.1, DT)
    bi = jnp.asarray(rng.standard_normal((Ci,)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05, DT)

    def unfused(intra, skip, wi, bi, wo, carry):
        up = resize_align_corners(intra + carry.astype(DT) * 1e-12, (H, W))
        i3 = jax.lax.conv_general_dilated(
            skip, wi, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bi.astype(DT)
        o = jax.lax.conv_general_dilated(
            up + i3, wo, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return o.astype(jnp.float32).mean()

    def fused(intra, skip, wi, bi, wo, carry):
        o = topdown_fused_level(
            intra + carry.astype(DT) * 1e-12, skip, wi, bi, wo
        )
        return o.astype(jnp.float32).mean()

    timed(unfused, (intra, skip, wi, bi, wo), tag="topdown L4 unfused")
    timed(fused, (intra, skip, wi, bi, wo), tag="topdown L4 fused")

    # --- full model combos -------------------------------------------------
    model = ge._dtu_model()  # pack_conv on
    batch = ge._example_batch(B=B, V=4, H=512, W=640)
    variables = ge._init_on_cpu(model, batch)
    imgs, projs, dv = batch["imgs"], batch["proj_matrices"], batch["depth_values"]

    combos = {
        "pack": {},
        "pack+v3": dict(warp_impl="mxu_v3"),
        "pack+fusedtd": dict(fused_topdown=True),
        "pack+v3+fusedtd": dict(warp_impl="mxu_v3", fused_topdown=True),
    }
    for tag, over in combos.items():
        m = MVS4Net(dataclasses.replace(model.cfg, **over))

        def full(variables, imgs, projs, dv, carry, _m=m):
            out = _m.apply(variables, imgs + carry * 1e-12, projs, dv,
                           train=False)
            return out["stage4"]["depth"].astype(jnp.float32).mean()

        timed(full, (variables, imgs, projs, dv), tag=f"full {tag}")

    # --- DTU-recipe train step: mxu_hybrid (current default) vs mxu_v3 ---
    import time as _t

    from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import (
        LossConfig,
        ModelConfig,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import (
        batch_samples,
        make_plane_scene,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.train import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.train.schedule import (
        warmup_multistep,
    )

    tb = batch_samples(
        [make_plane_scene(V=5, H=512, W=640, seed=i) for i in range(6)]
    )
    for k in ("view_depths", "intrinsics", "extrinsics"):
        tb.pop(k)
    tb = jax.tree_util.tree_map(jnp.asarray, tb)
    for impl in ("mxu_hybrid", "mxu_v3"):
        cfg = ModelConfig(
            group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True,
            mono=True, dtype="bfloat16", remat=False, pack_conv=True,
            warp_impl=impl,
        )
        m = MVS4Net(cfg)
        tv = ge._init_on_cpu(m, tb, train=True)
        tx = make_optimizer(warmup_multistep(1e-3, [100000], 0.5), 1e-4)
        st = TrainState.create(tv, tx)
        step = jax.jit(
            make_train_step(m, LossConfig(inverse_depth=True, mono=True,
                                          l1_lw=0.003, ot_iter=3), tx),
            donate_argnums=0,
        )
        t0 = _t.time()
        st, sc = step(st, tb)
        print(f"[train {impl}] compile+first {(_t.time()-t0):.0f}s "
              f"loss {float(sc['loss']):.3f}", flush=True)
        times = []
        for _ in range(5):
            t0 = _t.time()
            st, sc = step(st, tb)
            _ = float(sc["loss"])
            times.append(_t.time() - t0)
        times.sort()
        print(f"[train {impl}] {times[len(times)//2]*1e3:.0f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
