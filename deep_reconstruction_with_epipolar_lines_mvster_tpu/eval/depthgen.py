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
from typing import Dict, List, Sequence

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
) -> Dict[str, float]:
    """Run eval forwards over ``dataset`` (an EvalDataset-like) and write the
    artifact tree. Returns timing stats (avg forward seconds / view)."""
    import jax

    from ..data.io import save_image_u8, save_pfm, write_cam_file
    from ..data.loader import DataLoader
    from .fusion import backproject_to_world
    from .ply import write_ply_ascii_colored

    @jax.jit
    def forward(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False)
        return {
            "depth": out["stage4"]["depth"],
            "confidence": out["stage4"]["photometric_confidence"],
            "stage_depths": [out[f"stage{s}"]["depth"] for s in (1, 2, 3, 4)],
        }

    loader = DataLoader(dataset, batch_size, num_workers=num_workers)
    times: List[float] = []
    n_views = 0
    # per-scene accumulated conf-masked world cloud (test_mvs4.py:519-529)
    vertices: List[np.ndarray] = []
    vertex_colors: List[np.ndarray] = []
    scene_dir = None
    for batch in loader:
        imgs = batch["imgs"]
        projs = batch["proj_matrices"]
        dv = batch["depth_values"]
        t0 = time.perf_counter()
        out = forward(variables, imgs, projs, dv)
        out = jax.tree_util.tree_map(np.asarray, jax.block_until_ready(out))
        times.append(time.perf_counter() - t0)

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
    }
    if verbose:
        print(
            f"total time: {stats['total_time_s']:.2f}s  "
            f"avg: {stats['avg_time_s']:.3f}s/view",
            flush=True,
        )
    return stats
