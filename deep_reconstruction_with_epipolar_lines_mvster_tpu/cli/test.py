"""Eval / reconstruction CLI — flag-compatible with the reference
``test_mvs4.py:27-124``: ``--run_gendepth`` generates per-view depth,
confidence, camera and image artifacts; ``--run_filter`` runs the
geometric-consistency filter + fusion into a PLY per scene.

Differences vs the reference: the fusion stage runs vectorized on device
(no multiprocessing.Pool), and the cv2.imshow/Open3D interactive debug
windows are replaced by numeric dumps (``--debug_*`` bitmask flags write .npy
files under ``<outdir>/debug/`` — utils.debug)."""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Predict depth, filter, and fuse")
    p.add_argument("--model", default="mvsnet", help="parity; unused")
    p.add_argument("--dataset", default="dataloader_eval")
    p.add_argument("--dataset_name", default="blender",
                   choices=["dtu", "blender", "bin"])
    p.add_argument("--datapath")
    p.add_argument("--data_resolution", type=str, default="_512x640")
    p.add_argument("--testlist")
    p.add_argument("--loadckpt", default=None)
    p.add_argument("--outdir", default="./outputs")
    p.add_argument("--pair_fname", default="pair.txt")
    p.add_argument("--lighting", type=int, default=3)

    p.add_argument("--ndepths", type=str, default="8,8,4,4")
    p.add_argument("--depth_inter_r", type=str, default="0.5,0.5,0.5,1")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--interval_scale", type=float, required=True)
    p.add_argument("--max_h", type=int, default=512)
    p.add_argument("--max_w", type=int, default=640)
    p.add_argument("--fix_res", action="store_true")
    p.add_argument("--num_worker", type=int, default=1)
    p.add_argument("--eval_shape_bucket", type=str, default="max",
                   help="eval-shape compile bucketing: 'max' pads every "
                        "sample to (max_h, max_w) [one compile for the whole "
                        "list], an int N rounds shapes up to N-multiples, "
                        "'none'/0 disables (one compile per distinct shape)")
    p.add_argument("--save_freq", type=int, default=20)
    p.add_argument("--filter_method", type=str, default="normal",
                   choices=["gipuma", "normal"])
    p.add_argument("--save_ply", action="store_true")

    p.add_argument("--run_gendepth", action="store_true")
    p.add_argument("--NviewGen", type=int, default=5)
    p.add_argument("--depthgen_thres", type=float, default=0.8)

    p.add_argument("--run_filter", action="store_true")
    p.add_argument("--NviewFilter", type=int, default=10)
    p.add_argument("--photomask", type=float, default=0.8)
    p.add_argument("--geomask", type=int, default=3)
    p.add_argument("--condmask_pixel", type=float, default=1.0)
    p.add_argument("--condmask_depth", type=float, default=0.01)

    p.add_argument("--share_cr", action="store_true")
    p.add_argument("--fpn_base_channel", type=int, default=8)
    p.add_argument("--reg_channel", type=int, default=8)
    p.add_argument("--reg_mode", type=str, default="reg2d")
    p.add_argument("--dlossw", type=str, default="1,1,1,1")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--group_cor", action="store_true")
    p.add_argument("--group_cor_dim", type=str, default="8,8,4,4")
    p.add_argument("--inverse_depth", action="store_true")
    p.add_argument("--agg_type", type=str, default="ConvBnReLU3D")
    p.add_argument("--dcn", action="store_true")
    p.add_argument("--arch_mode", type=str, default="fpn")
    p.add_argument("--ot_continous", action="store_true")
    p.add_argument("--ot_eps", type=float, default=1)
    p.add_argument("--ot_iter", type=int, default=0)
    p.add_argument("--rt", action="store_true")
    p.add_argument("--use_raw_train", action="store_true")
    p.add_argument("--mono", action="store_true")
    p.add_argument("--mono_stg_itrpl", type=str, default="nearest",
                   choices=["nearest", "bilinear"])
    p.add_argument("--pos_enc", type=int, default=0)
    p.add_argument("--split", type=str, default="intermediate")
    p.add_argument("--save_jpg", action="store_true")
    p.add_argument("--ASFF", action="store_true")
    p.add_argument("--vis_ETA", action="store_true")
    p.add_argument("--vis_stg_features", type=int, default=0)
    p.add_argument("--attn_temp", type=float, default=2)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 eval compute (accuracy-neutral on trained "
                        "nets and ~21%% faster on TPU — BENCH_NOTES.md; "
                        "default f32 matches the reference)")
    p.add_argument("--warp_impl", type=str, default=None,
                   choices=["mxu", "mxu_pallas", "mxu_hybrid", "mxu_v3", "gather"],
                   help="default auto: mxu_v3 on TPU, mxu_hybrid on CPU")
    p.add_argument("--warp_band", type=str, default="16",
                   help="source-row band: one int, or a per-stage comma "
                        "list (validated per stage by the coverage check)")
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
    p.add_argument("--fused_topdown", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="fused Pallas kernel for the FPN's full-res top-down "
                        "level (default auto: on for TPU, off for CPU)")
    p.add_argument("--kernel_coords", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="in-kernel warp coordinates + window plans (the "
                        "flagship eval default — BENCH_NOTES r5)")
    p.add_argument("--fuse_attn", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="one-pass Pallas attention accumulation (opt-in; "
                        "measured negative at the bench config)")
    p.add_argument("--d_pack_mids", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="depth-in-channels reg mid blocks (opt-in)")
    p.add_argument("--debug_model", type=int, default=0)
    p.add_argument("--debug_depth_gen", type=int, default=0)
    p.add_argument("--debug_depth_filter", type=int, default=0)
    p.add_argument("--space", type=int, default=1,
                   help="row-shard the eval cost-volume pipeline over this "
                        "many devices (shard_map 'space' axis with halo "
                        "windows — parallel/mesh.py, models/mvs4net.py); "
                        "1 = single-device")
    p.add_argument("--space_halo", type=int, default=48,
                   help="halo rows per shard side (must cover the reg U-Net "
                        "receptive field; default is exactness-tested)")
    return p


def _check_warp_coverage(mcfg, sample):
    """One-time guard on the first sample's REAL geometry: undersized
    banded-warp windows fail SILENTLY (out-of-band taps get zero weight and
    depths degrade with no error), so when the user narrows the windows
    below the conservative defaults, validate them with
    ops.warp_mxu.band_coverage and warn loudly on violation. Uses
    constant-depth planes across the eval range (per-tile source-row span
    is geometry-driven; matches the validation used to pick the recipe's
    band=12/xband=144 — BENCH_NOTES round 4)."""
    import numpy as np

    import jax.numpy as jnp

    from ..core.geometry import relative_projection
    from ..ops.warp_mxu import band_coverage

    H0, W0 = sample["imgs"].shape[-3:-1]
    dv = np.asarray(sample["depth_values"], np.float32)
    worst = 0.0
    for s_i, scale in ((1, 8), (2, 4), (3, 2), (4, 1)):
        pm = jnp.asarray(np.asarray(sample["proj_matrices"][f"stage{s_i}"])[None])
        h, w = H0 // scale, W0 // scale
        if h % mcfg.warp_tile_rows:
            continue
        hypo = jnp.asarray(
            np.broadcast_to(
                np.linspace(dv[0], dv[-1], 8, dtype=np.float32)[
                    None, :, None, None
                ],
                (1, 8, h, w),
            ).copy()
        )
        band_s = (mcfg.warp_band if isinstance(mcfg.warp_band, int)
                  else mcfg.warp_band[s_i - 1])
        for v in range(1, pm.shape[1]):
            rel = relative_projection(pm[:, v], pm[:, 0])
            worst = max(worst, float(band_coverage(
                rel, hypo, h, band=band_s,
                tile_rows=mcfg.warp_tile_rows,
            )))
    if worst > 0:
        print(
            f"WARNING: --warp_band {mcfg.warp_band} leaves {worst:.3%} of "
            "bilinear taps OUTSIDE the source-row band on this scene's "
            "geometry — depths will silently degrade. Use the conservative "
            "default (16) or validate with ops.warp_mxu.band_coverage.",
            flush=True,
        )
    return worst


def main(argv=None):
    args = build_parser().parse_args(argv)
    assert args.batch_size == 1, "eval expects batch_size 1 (test_mvs4.py:947)"

    import jax
    import jax.numpy as jnp

    from ..data import find_dataset_def
    from ..data.io import read_scan_list
    from ..models import MVS4Net
    from ..train import load_weights
    from .train import make_model_config

    mcfg = make_model_config(args, mode="eval")
    model = MVS4Net(mcfg)

    testlist = read_scan_list(args.testlist) if args.testlist else [""]

    if args.run_gendepth:
        from ..eval import generate_depth_maps
        from ..eval.depthgen import make_eval_forward

        bucket = args.eval_shape_bucket
        if bucket in ("none", "0", ""):
            bucket = 0
        elif bucket != "max":
            bucket = int(bucket)

        DS = find_dataset_def(args.dataset)
        total_time, total_views = 0.0, 0
        all_shapes = set()
        variables = None
        # one jitted forward for ALL scenes: shapes sharing a bucket share
        # one (minutes-long, remote-tunnel) compile
        mesh = None
        if args.space > 1:
            from ..parallel import make_mesh

            mesh = make_mesh(jax.devices()[: args.space], space=args.space)
        forward = make_eval_forward(model, mesh, space_halo=args.space_halo)
        for scene in testlist:
            ds = DS(
                datapath=args.datapath, resolution=args.data_resolution,
                listfile=[scene], mode="test", nviews=args.NviewGen,
                interval_scale=args.interval_scale, max_h=args.max_h,
                max_w=args.max_w, pair_fname=args.pair_fname,
                lighting=args.lighting, dsname=args.dataset_name,
            )
            if variables is None:
                s0 = ds[0]
                variables = model.init(
                    jax.random.PRNGKey(0),
                    jnp.asarray(s0["imgs"][None]),
                    jax.tree_util.tree_map(
                        lambda x: jnp.asarray(x[None]), s0["proj_matrices"]
                    ),
                    jnp.asarray(s0["depth_values"][None]),
                    train=False,
                )
                if args.loadckpt:
                    print(f"=> loading model {args.loadckpt}")
                    variables = load_weights(args.loadckpt, dict(variables), model_cfg=mcfg)
                wb_min = (mcfg.warp_band if isinstance(mcfg.warp_band, int)
                          else min(mcfg.warp_band))
                if mcfg.warp_impl != "gather" and wb_min < 16:
                    _check_warp_coverage(mcfg, s0)
                # --vis_ETA: epipolar attention/warped-view figures
                # (mvs4net_utils.py:1041-1073) = debug bits 3|5|6;
                # --vis_stg_features: per-stage FPN features of the ref view
                # (MVS4Net.py:85-96, test_mvs4.py:94-95) = bit 0
                vis_bits = (0b1101000 if args.vis_ETA else 0) | (
                    1 if args.vis_stg_features else 0
                )
                if args.debug_model or args.debug_depth_gen or vis_bits:
                    # numeric stand-in for the reference's cv2 debug windows
                    # (MVS4Net.py:85-191, test_mvs4.py:447-517)
                    from ..utils.debug import debug_dump_forward

                    written = debug_dump_forward(
                        model, variables,
                        jnp.asarray(s0["imgs"][None]),
                        jax.tree_util.tree_map(
                            lambda x: jnp.asarray(x[None]), s0["proj_matrices"]
                        ),
                        jnp.asarray(s0["depth_values"][None]),
                        bits=(args.debug_model or args.debug_depth_gen)
                        | vis_bits,
                        outdir=args.outdir, train=False,
                        tag=f"eval_{scene or 'scene'}",
                    )
                    print(f"debug dump: {len(written)} arrays under "
                          f"{args.outdir}/debug")
            stats = generate_depth_maps(
                model, variables, ds, args.outdir,
                batch_size=args.batch_size,
                depthgen_thres=args.depthgen_thres,
                save_ply=args.save_ply, save_jpg=args.save_jpg,
                num_workers=args.num_worker,
                forward=forward, shape_bucket=bucket,
                max_hw=(args.max_h, args.max_w),
            )
            total_time += stats["total_time_s"]
            total_views += int(stats["views"])
            all_shapes.update(map(tuple, stats["shapes"]))
        print(f"total time: {total_time}")
        if total_views:
            print(f"avg time: {total_time / total_views}")
        print(f"forward shape buckets (= compiles): {len(all_shapes)}")
        # peak device memory (reference 'max gpu' report, test_mvs4.py:345-348)
        from ..eval.depthgen import device_peak_memory_gb

        peak = device_peak_memory_gb()
        print(
            f"max device mem: {peak:.3f} GiB" if peak is not None else
            "max device mem: unavailable (backend exposes no allocator "
            "stats; use train/profiler.py for a traced memory view)"
        )

    if args.run_filter:
        from ..eval import FusionConfig, filter_scene

        assert args.NviewFilter <= args.NviewGen or not args.run_gendepth
        cfg = FusionConfig(
            photomask=args.photomask, geomask=args.geomask,
            condmask_pixel=args.condmask_pixel,
            condmask_depth=args.condmask_depth,
        )
        if args.dataset_name == "bin":
            pair_file = os.path.join(args.datapath, "../..", args.pair_fname)
        else:
            pair_file = os.path.join(args.datapath, args.pair_fname)
        for scene in testlist:
            filter_scene(
                os.path.join(args.outdir, scene), pair_file,
                nview_filter=args.NviewFilter, cfg=cfg,
                save_ply=True, debug_bits=args.debug_depth_filter,
            )


if __name__ == "__main__":
    main()
