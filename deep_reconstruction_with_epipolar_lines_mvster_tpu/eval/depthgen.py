"""Depth-map generation: per-view forward pass + reference artifact layout.

Equivalent of the reference ``save_depth`` / ``save_scene_depth``
(``test_mvs4.py:332-602``). For each ref view of each scene it writes, under
``outdir/<scan>/``, the exact artifact layout the fusion stage (and the
reference's own filter) consumes:

  images/{view:08d}.jpg          reference image
  depth_est/{view:08d}.pfm/.png  stage4 depth (+ normalized png)
  confidence/{view:08d}.pfm/.png photometric confidence
  cams/{view:08d}_cam.txt        stage4 (extrinsics, intrinsics)
  ply_local/{view:08d}.ply       optional per-view cloud (--save_ply)
  combined.ply                   accumulated confidence-masked scene cloud

plus timing and device-memory reporting (test_mvs4.py:345-348,600).

The combined cloud is the reference's per-scene ``vertices`` accumulation
(``test_mvs4.py:519-529,568-594``): every ref view's depth map is
backprojected to world space, masked by ``conf > depthgen_thres``, and the
union is the scene cloud (the reference only *visualizes* it through Open3D
debug windows; here it is written to ``combined.ply`` so the artifact is
inspectable headlessly).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Sequence, Tuple

import numpy as np


def _normalize01(x: np.ndarray) -> np.ndarray:
    lo, hi = float(np.min(x)), float(np.max(x))
    return (x - lo) / (hi - lo + 1e-12)


def device_peak_memory_gb() -> float | None:
    """Peak device-memory use in GiB across local devices — the analog of the
    reference's ``torch.cuda.max_memory_allocated`` report
    (``test_mvs4.py:338,345-348``). Returns ``None`` where the backend does
    not expose allocator stats (the axon TPU tunnel's ``memory_stats()`` is
    ``None`` — use ``train/profiler.py``'s traced memory view there)."""
    import jax

    peak = None
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if not stats:
            continue
        v = stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
        if v is not None:
            peak = max(peak or 0, int(v))
    return None if peak is None else peak / 1024.0**3


def make_eval_forward(model, mesh=None, *, space_halo: int = 48):
    """Jitted eval forward for depth-map generation. Build this ONCE and pass
    it to every ``generate_depth_maps`` call of a run: jit's compile cache
    lives on the returned callable, so scenes sharing a shape share one
    compile (the remote-compile tunnel here costs minutes per program —
    SURVEY.md §7 recompile risk).

    ``mesh``: a ``(data, space)`` Mesh — batch shards over ``data`` and the
    cost-volume pipeline row-shards over ``space`` via the model's
    halo-windowed decomposition (models/mvs4net.py ``space_axis``; the
    spatial-parallel high-res eval path, SURVEY.md §5.7)."""
    import jax
    import jax.numpy as jnp

    n_space = int(mesh.shape["space"]) if mesh is not None else 1

    def forward(variables, imgs, projs, dv):
        kw = (
            dict(space_axis="space", space_shards=n_space, space_halo=space_halo)
            if n_space > 1
            else {}
        )
        out = model.apply(variables, imgs, projs, dv, train=False, **kw)
        res = {
            "depth": out["stage4"]["depth"],
            "confidence": out["stage4"]["photometric_confidence"],
            "stage_depths": [out[f"stage{s}"]["depth"] for s in (1, 2, 3, 4)],
        }
        # channel 4 of the per-stage ref features, saved by --save_jpg --mono
        # in the reference (test_mvs4.py:474-489); absent for row-sharded
        # stages (eval never consumes the features there)
        if all("mono_feat" in out.get(f"stage{s}", {}) for s in (2, 3, 4)):
            res["mono_feats"] = [
                out[f"stage{s}"]["mono_feat"][..., 4].astype(jnp.float32)
                for s in (2, 3, 4)
            ]
        return res

    if mesh is None:
        return jax.jit(forward)

    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        forward,
        mesh=mesh,
        in_specs=(
            P(),
            P("data"),
            {f"stage{i}": P("data") for i in range(1, 5)},
            P("data"),
        ),
        out_specs=P("data"),
        check_vma=False,
    )
    return jax.jit(fn)


def _bucket_hw(h: int, w: int, bucket, max_hw) -> Tuple[int, int]:
    """Target padded shape under the bucketing policy: ``0``/falsy = native,
    ``'max'`` = always (max_h, max_w), int N = round up to multiples of N."""
    if not bucket:
        return h, w
    if bucket == "max":
        if max_hw is None:
            return h, w
        return max(h, max_hw[0]), max(w, max_hw[1])
    n = int(bucket)
    up = lambda v: -(-v // n) * n
    return up(h), up(w)


def generate_depth_maps(
    model,
    variables,
    dataset,
    outdir: str,
    *,
    batch_size: int = 1,
    depthgen_thres: float = 0.3,
    save_ply: bool = False,
    save_jpg: bool = False,
    combined_ply: bool = True,
    num_workers: int = 4,
    verbose: bool = True,
    forward=None,
    shape_bucket=0,
    max_hw: Tuple[int, int] | None = None,
) -> Dict[str, float]:
    """Run eval forwards over ``dataset`` (an EvalDataset-like) and write the
    artifact tree. Returns timing stats (avg forward seconds / view).

    Shape bucketing (``shape_bucket``: 0 off, int N = round HxW up to
    N-multiples, ``'max'`` = pad every sample to ``max_hw``): eval shapes are
    data-dependent (the loader snaps each scene to 64-multiples,
    dataloader_eval.py:94-171), and every distinct shape is a separate XLA
    compile — minutes each through this environment's remote-compile tunnel.
    Padding is bottom/right with zeros, which the warp treats exactly like
    out-of-image samples (zeros padding), and outputs are cropped back to
    the native shape. NOT bit-exact for the valid region: the FPN top-down
    and the hypothesis-window upsampling use align-corners resizes whose
    coordinate mapping depends on the global extent, and the reg U-Net's
    receptive field crosses the pad boundary — evaluating a padded image is
    equivalent to evaluating a (zero-margined) larger image. The reference
    itself rescales/crops scenes per dataset, so eval shape is already a
    quality parameter rather than an exact contract; use
    ``shape_bucket=0`` when exact native-shape behaviour is required.
    """
    import jax

    from ..data.io import save_image_u8, save_pfm, write_cam_file
    from ..data.loader import DataLoader
    from .fusion import backproject_to_world
    from .ply import write_ply_ascii_colored

    if forward is None:
        forward = make_eval_forward(model)

    loader = DataLoader(dataset, batch_size, num_workers=num_workers)
    times: List[float] = []
    n_views = 0
    compiled_shapes = set()
    # per-scene accumulated conf-masked world cloud (test_mvs4.py:519-529)
    vertices: List[np.ndarray] = []
    vertex_colors: List[np.ndarray] = []
    scene_dir = None
    for batch in loader:
        imgs = batch["imgs"]
        projs = batch["proj_matrices"]
        dv = batch["depth_values"]
        Bv, Vv, H, W = imgs.shape[:4]
        Hb, Wb = _bucket_hw(H, W, shape_bucket, max_hw)
        if (Hb, Wb) != (H, W):
            padded = np.zeros((Bv, Vv, Hb, Wb, imgs.shape[-1]), np.asarray(imgs).dtype)
            padded[:, :, :H, :W] = imgs
        else:
            padded = imgs
        compiled_shapes.add((Hb, Wb, Vv, np.asarray(dv).shape[-1]))
        t0 = time.perf_counter()
        out = forward(variables, padded, projs, dv)
        out = jax.tree_util.tree_map(np.asarray, jax.block_until_ready(out))
        times.append(time.perf_counter() - t0)
        if (Hb, Wb) != (H, W):  # crop back to the native shape per stage
            out["depth"] = out["depth"][:, :H, :W]
            out["confidence"] = out["confidence"][:, :H, :W]
            out["stage_depths"] = [
                sd[:, : H * sd.shape[1] // Hb, : W * sd.shape[2] // Wb]
                for sd in out["stage_depths"]
            ]
            if "mono_feats" in out:
                out["mono_feats"] = [
                    mf[:, : H * mf.shape[1] // Hb, : W * mf.shape[2] // Wb]
                    for mf in out["mono_feats"]
                ]

        cams = np.asarray(projs["stage4"])
        for b, filename in enumerate(batch["filename"]):
            n_views += 1
            depth_est = out["depth"][b]
            conf = out["confidence"][b]
            ref_img = np.asarray(imgs[b, 0])

            def path(folder, suffix):
                p = os.path.join(outdir, filename.format(folder, suffix))
                os.makedirs(os.path.dirname(p), exist_ok=True)
                return p

            save_image_u8(path("images", ".jpg"), ref_img)
            save_pfm(path("depth_est", ".pfm"), depth_est.astype(np.float32))
            save_image_u8(path("depth_est", ".png"), _normalize01(depth_est))
            save_pfm(path("confidence", ".pfm"), conf.astype(np.float32))
            save_image_u8(path("confidence", ".png"), np.clip(conf, 0, 1))

            cam = cams[b, 0]
            write_cam_file(
                path("cams", "_cam.txt"), cam[0], cam[1][:3, :3],
                [float(dv[b][0]), float(dv[b][1] - dv[b][0]),
                 float(len(dv[b])), float(dv[b][-1])],
            )

            if save_jpg:
                for s, sd in enumerate(out["stage_depths"]):
                    save_image_u8(
                        path("depth_est", f"stage_{s + 1}.jpg"),
                        _normalize01(np.asarray(sd[b])),
                    )
                # mono-feature channel views (reference --save_jpg --mono,
                # test_mvs4.py:474-489: stages 2-4, channel 4)
                for s, mf in enumerate(out.get("mono_feats", [])):
                    save_image_u8(
                        path("depth_est", f"mono_{s + 2}.jpg"),
                        _normalize01(np.asarray(mf[b])),
                    )
            if save_ply or combined_ply:
                conf_mask = conf > depthgen_thres
                pts = np.asarray(
                    backproject_to_world(depth_est, cam[1][:3, :3], cam[0])
                )
                xyz = pts[conf_mask]
                rgb = (ref_img[conf_mask] * 255).astype(np.uint8)
                if save_ply:
                    write_ply_ascii_colored(path("ply_local", ".ply"), xyz, rgb)
                if combined_ply:
                    vertices.append(xyz)
                    vertex_colors.append(rgb)
                    scene_dir = os.path.dirname(
                        os.path.dirname(path("images", ".jpg"))
                    )

        if verbose:
            print(
                f"=== view {n_views}/{len(dataset)} fwd={times[-1]:.3f}s",
                flush=True,
            )

    if combined_ply and vertices and scene_dir is not None:
        write_ply_ascii_colored(
            os.path.join(scene_dir, "combined.ply"),
            np.concatenate(vertices, axis=0),
            np.concatenate(vertex_colors, axis=0),
        )
        if verbose:
            n_pts = sum(len(v) for v in vertices)
            print(f"combined scene cloud: {n_pts} points -> "
                  f"{scene_dir}/combined.ply", flush=True)

    stats = {
        "total_time_s": float(np.sum(times)),
        "avg_time_s": float(np.mean(times)) if times else 0.0,
        "views": float(n_views),
        "forward_shapes": float(len(compiled_shapes)),
    }
    stats["shapes"] = sorted(compiled_shapes)  # for cross-scene dedup
    if verbose:
        print(
            f"total time: {stats['total_time_s']:.2f}s  "
            f"avg: {stats['avg_time_s']:.3f}s/view",
            flush=True,
        )
    return stats
