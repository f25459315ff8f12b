"""Training CLI — flag-compatible with the reference ``train_mvs4.py:18-100``.

The dense string encodings (``--ndepths "8,8,4,4"``, ``--lrepochs "2,3:1.2"``,
``--Nlights "3:7"``, ...) are parsed by ``config.parse_*`` into the typed
configs; the same shell recipes (scripts/train_dtu.sh etc.) work unchanged.

TPU notes vs the reference: distribution is a device mesh instead of NCCL
DDP — data parallelism engages automatically over all local devices (and all
hosts under ``jax.distributed``); ``--local_rank`` is accepted and ignored.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native MVSTER training")
    p.add_argument("--mode", default="train", choices=["train", "test", "profile"])
    p.add_argument("--device", default="tpu",
                   help="tpu (default backend order) or cpu (force CPU backend)")

    p.add_argument("--dataset", default="dtu_yao4")
    p.add_argument("--trainpath")
    p.add_argument("--testpath")
    p.add_argument("--trainlist")
    p.add_argument("--testlist")
    p.add_argument("--pair_fname", default="pair.txt")
    p.add_argument("--train_nviews", type=int, default=5)
    p.add_argument("--test_nviews", type=int, default=5)
    p.add_argument("--Nlights", type=str, default="1:1")

    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--lrepochs", type=str, default="6,8,9:2")
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--interval_scale", type=float, default=1.06)

    p.add_argument("--loadckpt", default=None)
    p.add_argument("--logdir", default="./outputs/debug")
    p.add_argument("--resume", action="store_true")

    p.add_argument("--summary_freq", type=int, default=50)
    p.add_argument("--save_freq", type=int, default=1)
    p.add_argument("--eval_freq", type=int, default=1)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--pin_m", action="store_true", help="parity; unused")
    p.add_argument("--dataloader_workers", type=int, default=4)
    p.add_argument("--local_rank", type=int, default=0, help="parity; unused")

    p.add_argument("--ndepths", type=str, default="8,8,4,4")
    p.add_argument("--depth_inter_r", type=str, default="0.5,0.5,0.5,1")
    p.add_argument("--dlossw", type=str, default="1,1,1,1")
    p.add_argument("--l1ce_lw", type=str, default="0,1")
    p.add_argument("--fpn_base_channel", type=int, default=8)
    p.add_argument("--reg_channel", type=int, default=8)
    p.add_argument("--reg_mode", type=str, default="reg2d")
    p.add_argument("--group_cor", action="store_true")
    p.add_argument("--group_cor_dim", type=str, default="8,8,4,4")
    p.add_argument("--inverse_depth", action="store_true")
    p.add_argument("--agg_type", type=str, default="ConvBnReLU3D")
    p.add_argument("--dcn", action="store_true")
    p.add_argument("--pos_enc", type=int, default=0)
    p.add_argument("--arch_mode", type=str, default="fpn")
    p.add_argument("--ot_continous", action="store_true")
    p.add_argument("--ot_iter", type=int, default=10)
    p.add_argument("--ot_eps", type=float, default=1)
    p.add_argument("--rt", action="store_true")
    p.add_argument("--max_h", type=int, default=864)
    p.add_argument("--max_w", type=int, default=1152)
    p.add_argument("--use_raw_train", action="store_true")
    p.add_argument("--mono", action="store_true")
    p.add_argument("--mono_stg_itrpl", type=str, default="nearest",
                   choices=["nearest", "bilinear"])
    p.add_argument("--lr_scheduler", type=str, default="MS")
    p.add_argument("--ASFF", action="store_true")
    p.add_argument("--attn_temp", type=float, default=2)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute dtype for the conv path")
    p.add_argument("--warp_impl", type=str, default=None,
                   choices=["mxu", "mxu_pallas", "mxu_hybrid", "mxu_v3", "gather"],
                   help="homography-warp implementation (ops/warp_mxu.py). "
                        "Default auto: mxu_hybrid for training (XLA scan "
                        "fwd + x-banded Pallas bwd — the Pallas-fwd v3's "
                        "custom_vjp boundary forces padded residual "
                        "layouts under grad), mxu_v3 for eval on TPU")
    p.add_argument("--warp_band", type=str, default="16",
                   help="source-row band for the mxu warp: one int, or a "
                        "per-stage comma list (e.g. 16,12,12,10 — validate "
                        "IN-CASCADE with ops.warp_mxu.band_coverage)")
    p.add_argument("--warp_bwd", default="auto",
                   choices=["auto", "v1", "v2", "v3", "v4", "v4_ik"],
                   help="x-banded Pallas warp-backward kernel variant "
                        "(ops/pallas/warp_xband_bwd.py). auto: v4 "
                        "(VMEM-resident dsrc accumulator, one HBM flush "
                        "per view; DTU train step 513 -> 433 ms, r5c) "
                        "when it fits VMEM, else v1. v4_ik: v4 with "
                        "in-kernel coordinates + window plan (no "
                        "coordinate-plane residuals)")
    p.add_argument("--warp_tile_rows", type=int, default=8)
    p.add_argument("--warp_xband", type=int, default=192)
    p.add_argument("--warp_tile_cols", type=int, default=128)
    p.add_argument("--pack_conv", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="width-packed (space-to-depth) execution of the "
                        "small-channel FPN/reg2d convs — math-identical, "
                        "~5x faster on TPU (ops/packed_conv.py). Default: "
                        "auto (on for TPU, off for CPU where the k-fold "
                        "FLOP inflation loses)")
    p.add_argument("--kernel_coords", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="compute warp coordinates + window plans inside "
                        "the Pallas kernels (fused eval warp+cor; the "
                        "flagship default — 53.1 -> 49.6 ms/iter r5e)")
    p.add_argument("--fuse_attn", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="one-pass Pallas attention accumulation (measured "
                        "NEGATIVE at the bench config, BENCH_NOTES r5; "
                        "opt-in)")
    p.add_argument("--d_pack_mids", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="depth-in-channels reg mid blocks (opt-in; see "
                        "config.ModelConfig.d_pack_mids)")
    p.add_argument("--fused_topdown", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="fused Pallas kernel for the FPN's full-res top-down "
                        "level (eval-mode forwards only; default auto: on "
                        "for TPU, off for CPU)")
    p.add_argument("--debug_model", type=int, default=0,
                   help="bitmask numeric debug dumps (see utils.debug)")
    p.add_argument("--dp_impl", type=str, default="gspmd",
                   choices=["gspmd", "shard_map"],
                   help="data-parallel implementation under a device mesh: "
                        "gspmd (XLA-inserted collectives, SyncBN-like global"
                        "-batch BN) or shard_map (explicit pmean, per-shard "
                        "BN = reference DDP semantics; required for Pallas "
                        "kernels to shard at scale)")
    p.add_argument("--no_remat", action="store_true",
                   help="disable backbone/reg rematerialization (8%% faster "
                        "step when the activations fit — they do at the DTU "
                        "recipe shape in bf16; keep remat for bigger "
                        "batches/resolutions)")
    return p


def make_model_config(args, mode="train"):
    from ..config import ModelConfig, parse_float_list, parse_int_list

    pack = getattr(args, "pack_conv", None)
    fused_td = getattr(args, "fused_topdown", None)
    warp_impl = getattr(args, "warp_impl", None)
    if pack is None or fused_td is None or warp_impl is None:
        # auto: packed/fused/Pallas execution wins on TPU (lane fill,
        # HBM-traffic fusion), loses on CPU (k-fold FLOP inflation;
        # interpret mode)
        import jax

        on_tpu = jax.default_backend() not in ("cpu",)
        pack = on_tpu if pack is None else pack
        fused_td = on_tpu if fused_td is None else fused_td
        if warp_impl is None:
            # mxu_v3 is the fastest measured EVAL warp, but under grad the
            # Pallas custom_vjp boundary forces autodiff residuals into
            # padded layouts ([...,C=8]-minor saved warps, [...,2] group
            # slices -> 16-64x HBM padding, OOM at the DTU recipe shape —
            # BENCH_NOTES round 3), so training keeps the hybrid scan
            # forward whose residuals XLA lays out unpadded.
            tpu_impl = "mxu_v3" if mode == "eval" else "mxu_hybrid"
            warp_impl = tpu_impl if on_tpu else "mxu_hybrid"

    return ModelConfig(
        arch_mode={"fpn": "fpn"}.get(args.arch_mode, args.arch_mode),
        reg_mode=args.reg_mode,
        fpn_base_channel=args.fpn_base_channel,
        reg_channel=args.reg_channel,
        ndepths=parse_int_list(args.ndepths),
        depth_inter_r=parse_float_list(args.depth_inter_r),
        group_cor=args.group_cor,
        group_cor_dim=parse_int_list(args.group_cor_dim),
        inverse_depth=args.inverse_depth,
        agg_type=args.agg_type,
        dcn=args.dcn,
        pos_enc=args.pos_enc,
        mono=args.mono,
        mono_stg_itrpl=args.mono_stg_itrpl,
        asff=args.ASFF,
        attn_temp=args.attn_temp,
        dtype="bfloat16" if args.bf16 else "float32",
        remat=not getattr(args, "no_remat", False),
        warp_impl=warp_impl,
        warp_band=(lambda b: b[0] if len(b) == 1 else b)(
            parse_int_list(args.warp_band)
        ),
        warp_tile_rows=args.warp_tile_rows,
        warp_xband=args.warp_xband,
        warp_tile_cols=args.warp_tile_cols,
        pack_conv=pack,
        fused_topdown=fused_td,
        kernel_coords=getattr(args, "kernel_coords", True),
        fuse_attn=getattr(args, "fuse_attn", False),
        d_pack_mids=getattr(args, "d_pack_mids", False),
    )


def apply_warp_bwd_flag(args) -> None:
    """Select the x-banded warp-backward kernel variant (process-global
    module state — ops/warp_mxu._BWD_KERNEL, captured at trace time).
    Deliberately NOT part of make_model_config: constructing a config must
    not mutate kernel selection (a config built for inspection would
    change behavior of already-constructed models traced afterwards)."""
    flag = getattr(args, "warp_bwd", None)
    if not flag:
        return
    from ..ops.warp_mxu import set_bwd_kernel

    if flag == "v4_ik":
        set_bwd_kernel("v4", ik=True)
    elif flag == "auto":
        set_bwd_kernel("auto", ik=True)
    else:  # explicit variant: run exactly that kernel, coords as planes
        set_bwd_kernel(flag, ik=False)


def make_loss_config(args):
    from ..config import LossConfig, parse_float_list

    l1_lw, ot_lw = parse_float_list(args.l1ce_lw)
    return LossConfig(
        stage_lw=parse_float_list(args.dlossw),
        l1_lw=l1_lw,
        ot_lw=ot_lw,
        ot_iter=args.ot_iter,
        ot_eps=args.ot_eps,
        ot_continuous=args.ot_continous,
        inverse_depth=args.inverse_depth,
        mono=args.mono,
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.resume:
        assert args.mode == "train"
        assert args.loadckpt is None
    if args.testpath is None:
        args.testpath = args.trainpath

    import jax

    if args.device == "cpu":
        # must be set programmatically after the jax import (a site hook may
        # pin the platform list before env vars are consulted) and before
        # backend initialization
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..config import TrainConfig, parse_lrepochs
    from ..data import DataLoader, find_dataset_def
    from ..models import MVS4Net
    from ..parallel import make_mesh
    from ..train import fit, load_weights

    milestones, divisor = parse_lrepochs(args.lrepochs)
    tcfg = TrainConfig(
        lr=args.lr, weight_decay=args.wd, epochs=args.epochs,
        batch_size=args.batch_size, lr_scheduler=args.lr_scheduler,
        lr_milestones=milestones, lr_gamma_divisor=divisor, seed=args.seed,
        summary_freq=args.summary_freq, save_freq=args.save_freq,
        eval_freq=args.eval_freq,
    )
    apply_warp_bwd_flag(args)
    mcfg = make_model_config(args)
    lcfg = make_loss_config(args)

    DS = find_dataset_def(args.dataset)
    common = dict(
        rt=args.rt, use_raw_train=args.use_raw_train,
        pair_fname=args.pair_fname, Nlights=args.Nlights, seed=args.seed,
    )
    if args.dataset.startswith("blendedmvs"):
        train_ds = DS(args.trainpath, args.trainlist, "train", args.train_nviews,
                      robust_train=args.rt, seed=args.seed)
        val_ds = DS(args.testpath, args.testlist, "val", args.test_nviews,
                    robust_train=False, seed=args.seed)
    else:
        train_ds = DS(args.trainpath, args.trainlist, "train", args.train_nviews,
                      args.interval_scale, **common)
        val_ds = DS(args.testpath, args.testlist, "val", args.test_nviews,
                    args.interval_scale, pair_fname=args.pair_fname,
                    Nlights=args.Nlights, seed=args.seed)

    n_hosts = jax.process_count()
    host_id = jax.process_index()
    train_loader = DataLoader(
        train_ds, args.batch_size, shuffle=True, drop_last=True,
        num_workers=args.dataloader_workers, num_hosts=n_hosts, host_id=host_id,
        seed=args.seed,
    )
    val_loader = DataLoader(
        val_ds, args.batch_size, num_workers=args.dataloader_workers,
        num_hosts=n_hosts, host_id=host_id,
    )

    model = MVS4Net(mcfg)
    sample = train_ds[0]
    from ..data.loader import collate

    init_batch = collate([sample])
    variables = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.asarray(init_batch["imgs"]),
        jax.tree_util.tree_map(jnp.asarray, init_batch["proj_matrices"]),
        jnp.asarray(init_batch["depth_values"]),
        train=True,
    )
    if args.loadckpt:
        print(f"warm-starting from {args.loadckpt}")
        variables = load_weights(args.loadckpt, dict(variables), model_cfg=mcfg)

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"Number of model parameters: {n_params}")

    if args.debug_model:
        # numeric replacement for the reference's cv2-window debug bits
        # (MVS4Net.py:85-191): dump the selected intermediates of one
        # train-mode forward as .npy under <logdir>/debug
        from ..utils.debug import debug_dump_forward

        written = debug_dump_forward(
            model, variables,
            jnp.asarray(init_batch["imgs"]),
            jax.tree_util.tree_map(jnp.asarray, init_batch["proj_matrices"]),
            jnp.asarray(init_batch["depth_values"]),
            bits=args.debug_model, outdir=args.logdir, train=True,
            tag="train_sample0",
        )
        print(f"debug_model={args.debug_model}: wrote {len(written)} arrays "
              f"under {args.logdir}/debug")

    devices = jax.devices()
    mesh = make_mesh(devices) if len(devices) > 1 else None
    to_dev = (lambda b: jax.tree_util.tree_map(jnp.asarray, b)) if mesh is None else None

    if args.mode == "train":
        fit(
            model, variables, train_loader, val_loader, tcfg, lcfg,
            logdir=args.logdir, resume=args.resume, mesh=mesh,
            dp_impl=args.dp_impl, is_host0=host_id == 0, to_device=to_dev,
        )
    elif args.mode == "test":
        # standalone validation sweep — the reference's --mode test crashes on
        # an out-of-scope optimizer (train_mvs4.py:271); implemented working.
        from ..train import DictAverageMeter, TrainState, make_eval_step, make_optimizer
        from ..train.schedule import warmup_multistep

        tx = make_optimizer(warmup_multistep(tcfg.lr, [1], 1.0))
        state = TrainState.create(variables, tx)
        eval_step = jax.jit(make_eval_step(model, lcfg))
        meter = DictAverageMeter()
        keys = ("imgs", "proj_matrices", "depth", "depth_values", "mask")
        for i, batch in enumerate(val_loader):
            batch = {k: batch[k] for k in keys if k in batch}
            scalars = eval_step(state, jax.tree_util.tree_map(jnp.asarray, batch))
            meter.update({k: float(v) for k, v in scalars.items()})
            if host_id == 0 and i % args.summary_freq == 0:
                print(f"Eval iter {i}/{len(val_loader)} "
                      f"loss={float(scalars['loss']):.3f}", flush=True)
        if host_id == 0:
            print("final", meter.mean())
    elif args.mode == "profile":
        # unimplemented upstream (train_mvs4.py:605-606 NotImplementedError);
        # here: jax.profiler trace of a handful of train steps + memory stats
        from ..train import TrainState, make_optimizer, make_train_step
        from ..train.profiler import device_memory_stats, profile_step_fn, profile_trace
        from ..train.schedule import warmup_multistep

        tx = make_optimizer(warmup_multistep(tcfg.lr, [10_000], 0.5))
        state = TrainState.create(variables, tx)
        step = jax.jit(make_train_step(model, lcfg, tx))
        keys = ("imgs", "proj_matrices", "depth", "depth_values", "mask")
        batch = next(iter(train_loader))
        batch = jax.tree_util.tree_map(
            jnp.asarray, {k: batch[k] for k in keys if k in batch}
        )

        holder = {"state": state}

        def one():
            holder["state"], sc = step(holder["state"], batch)
            return sc

        stats = profile_step_fn(one, iters=5)
        with profile_trace(args.logdir):
            jax.block_until_ready(one())
        print("step stats:", stats)
        print("memory:", device_memory_stats())
        print(f"trace written under {args.logdir} (view in TensorBoard)")


if __name__ == "__main__":
    main()
