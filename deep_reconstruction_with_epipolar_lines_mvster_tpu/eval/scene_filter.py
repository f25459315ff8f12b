"""Scene-level filtering driver: consume the depth-gen artifact tree, run the
device-side consistency filter per ref view, write masks and the fused PLY.

Equivalent of the reference ``filter_depth`` (``test_mvs4.py:674-894``) minus
the interactive Open3D plotting (replaced by the numeric debug dumps in
``utils.debug``). Artifacts written under ``scene_folder``:

  mask/{view:08d}_photo.png / _geo.png / _final.png
  _fused_3Dpts.ply                       (when save_ply)
"""

from __future__ import annotations

import os
import time
from typing import Dict, List

import numpy as np

from ..data.io import read_image, read_pair_file, read_pfm
from .fusion import FusionConfig, filter_ref_view, fused_world_points
from .ply import write_ply


def _read_cam_txt(path: str):
    """Camera txt as written by depthgen/write_cam_file (and the reference
    write_cam, test_mvs4.py:187-204)."""
    from ..data.io import read_cam_file

    intr, extr, *_ = read_cam_file(path)
    return intr, extr


def filter_scene(
    scene_folder: str,
    pair_file: str,
    *,
    nview_filter: int = 4,
    cfg: FusionConfig = FusionConfig(),
    save_ply: bool = True,
    save_masks: bool = True,
    verbose: bool = True,
    debug_bits: int = 0,
) -> Dict[str, float]:
    """Filter + fuse every ref view of one scene. Returns coverage stats."""
    from PIL import Image

    pair_data = read_pair_file(pair_file)

    vertices: List[np.ndarray] = []
    colors: List[np.ndarray] = []
    stats = {"photo": [], "geo": [], "final": [], "time": []}

    # preload per-view data once (the reference re-reads per pair)
    cams, depths, confs, images = {}, {}, {}, {}

    def load(view: int):
        if view in depths:
            return
        cams[view] = _read_cam_txt(
            os.path.join(scene_folder, f"cams/{view:0>8}_cam.txt")
        )
        depths[view] = read_pfm(
            os.path.join(scene_folder, f"depth_est/{view:0>8}.pfm")
        )[0]
        conf_p = os.path.join(scene_folder, f"confidence/{view:0>8}.pfm")
        confs[view] = read_pfm(conf_p)[0] if os.path.exists(conf_p) else None
        img_p = os.path.join(scene_folder, f"images/{view:0>8}.jpg")
        images[view] = read_image(img_p) if os.path.exists(img_p) else None

    for ref_view, src_views in pair_data:
        t0 = time.perf_counter()
        src_views = src_views[: nview_filter - 1]
        load(ref_view)
        for s in src_views:
            load(s)

        intr_ref, extr_ref = cams[ref_view]
        out = filter_ref_view(
            depths[ref_view],
            confs[ref_view],
            intr_ref,
            extr_ref,
            [depths[s] for s in src_views],
            [cams[s][0] for s in src_views],
            [cams[s][1] for s in src_views],
            cfg,
        )
        dt = time.perf_counter() - t0
        stats["photo"].append(out["photo_mask"].mean())
        stats["geo"].append(out["geo_mask"].mean())
        stats["final"].append(out["final_mask"].mean())
        stats["time"].append(dt)

        if save_masks:
            os.makedirs(os.path.join(scene_folder, "mask"), exist_ok=True)
            for name in ("photo", "geo", "final"):
                Image.fromarray(
                    (out[f"{name}_mask"].astype(np.uint8) * 255)
                ).save(os.path.join(scene_folder, f"mask/{ref_view:0>8}_{name}.png"))

        if debug_bits:
            # --debug_depth_filter: numeric dumps replacing the reference's
            # interactive filter windows (test_mvs4.py:736-823): bit 0 =
            # masks, bit 1 = fused/input depth, bit 2 = reprojection extras
            dbg = os.path.join(scene_folder, "debug")
            os.makedirs(dbg, exist_ok=True)
            sel = {}
            if debug_bits & 1:
                sel.update({k: out[k] for k in ("photo_mask", "geo_mask", "final_mask")})
            if debug_bits & 2:
                sel.update({"fused_depth": out["fused_depth"],
                            "input_depth": depths[ref_view]})
            if debug_bits & 4:
                sel.update({
                    k: v for k, v in out.items()
                    if k not in ("photo_mask", "geo_mask", "final_mask", "fused_depth")
                })
            for k, v in sel.items():
                np.save(os.path.join(dbg, f"{ref_view:0>8}_{k}.npy"), np.asarray(v))

        xyz, rgb = fused_world_points(
            out["fused_depth"], out["final_mask"], intr_ref, extr_ref,
            images[ref_view],
        )
        vertices.append(xyz)
        if rgb is not None:
            colors.append(rgb)

        if verbose:
            print(
                f"ref-view{ref_view:0>2} photo/geo/final: "
                f"{out['photo_mask'].mean() * 100:.2f}/"
                f"{out['geo_mask'].mean() * 100:.2f}/"
                f"{out['final_mask'].mean() * 100:.2f}  time={dt:.3f}s",
                flush=True,
            )

    all_xyz = np.concatenate(vertices, axis=0) if vertices else np.zeros((0, 3))
    all_rgb = np.concatenate(colors, axis=0) if colors else None
    if save_ply:
        ply_path = os.path.join(scene_folder, "_fused_3Dpts.ply")
        write_ply(ply_path, all_xyz, all_rgb)
        if verbose:
            print(f"saved fused cloud ({len(all_xyz)} pts) to {ply_path}")

    return {
        "n_points": float(len(all_xyz)),
        "photo_coverage": float(np.mean(stats["photo"])) if stats["photo"] else 0.0,
        "geo_coverage": float(np.mean(stats["geo"])) if stats["geo"] else 0.0,
        "final_coverage": float(np.mean(stats["final"])) if stats["final"] else 0.0,
        "avg_filter_time_s": float(np.mean(stats["time"])) if stats["time"] else 0.0,
    }
