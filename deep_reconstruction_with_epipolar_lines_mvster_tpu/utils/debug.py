"""Numeric debug observability — the TPU replacement for the reference's
interactive cv2.imshow / Open3D debug subsystem (SURVEY.md §2.7).

The reference decodes three bitmask flags with ``get_powers`` and pops
windows per intermediate (``--debug_model`` bits 0-7, MVS4Net.py:85-191,
mvs4net_utils.py:1054-1124). A headless TPU job can't do that; instead
``debug_dump_forward`` re-runs the forward eagerly outside jit, captures the
same intermediates, and writes them as ``.npy`` files under
``<outdir>/debug/`` with names mirroring the reference's window titles, so
the observables are diffable/plottable offline.

Bit map (identical to the reference ``--debug_model``):
  0  input images + per-stage FPN features
  1  per-stage depth
  2  per-stage depth hypotheses
  3  per-stage (post-softmax) attention weights
  4  mono depths (stages 2..4, train mode)
  5  warped source views (recomputed per stage/src view)
  6  per-view correlation weights (softmax over hypotheses)
  7  pre-softmax regularized scores
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, List

import numpy as np


def get_powers(n: int) -> List[str]:
    """Set-bit indices of ``n`` as strings (reference get_powers,
    train_mvs4.py:112-113)."""
    return [str(p) for p, v in enumerate(bin(n)[:1:-1]) if int(v)]


def debug_dump_forward(
    model,
    variables,
    imgs,
    proj_matrices,
    depth_values,
    *,
    bits: int,
    outdir: str,
    train: bool = False,
    tag: str = "sample",
) -> Dict[str, str]:
    """Run one forward pass and dump the selected intermediates.

    Returns {observable_name: file_path}. Only batch element 0 is dumped
    (like the reference windows).
    """
    import jax
    import jax.numpy as jnp

    from ..core.geometry import relative_projection, warp_coords, grid_sample_2d
    from ..ops.warp_cor import correlate_view

    on = set(get_powers(bits))
    dump_dir = os.path.join(outdir, "debug")
    os.makedirs(dump_dir, exist_ok=True)
    written: Dict[str, str] = {}

    def dump(name: str, arr) -> None:
        path = os.path.join(dump_dir, f"{tag}_{name}.npy")
        np.save(path, np.asarray(arr))
        written[name] = path

    outputs, inter = model.apply(
        variables, imgs, proj_matrices, depth_values, train=train,
        capture_intermediates=True, mutable=["intermediates"] + (
            ["batch_stats"] if train else []
        ),
    )
    if isinstance(inter, tuple):  # (outputs, mutated) normalization
        outputs, inter = outputs, inter
    mutated = inter
    inter = mutated.get("intermediates", {}) if isinstance(mutated, dict) else {}

    stages = sorted(k for k in outputs if k.startswith("stage"))

    if "0" in on:
        dump("input_imgs", imgs[0])
        # FPN per-stage features of view 0: recompute from the backbone
        # intermediates captured under the model scope
        def find_pyramid(tree, prefix=""):
            hits = {}
            if isinstance(tree, dict):
                for k, v in tree.items():
                    hits.update(find_pyramid(v, prefix + "/" + k))
            elif isinstance(tree, tuple):
                for i, v in enumerate(tree):
                    if hasattr(v, "shape"):
                        hits[prefix + f"[{i}]"] = v
            return hits

        for name, v in find_pyramid(inter).items():
            if "__call__" in name and len(getattr(v, "shape", ())) == 4:
                safe = name.strip("/").replace("/", ".")
                dump(f"feat_{safe}", v[0])

    for si, key in enumerate(stages):
        st = outputs[key]
        if "1" in on:
            dump(f"{key}_depth", st["depth"][0])
        if "2" in on:
            dump(f"{key}_hypo_depth", st["hypo_depth"][0])
        if "3" in on:
            dump(f"{key}_attn_weight", st["attn_weight"][0])
        if "7" in on:
            # pre-softmax scores: reconstruct via log of softmax up to const
            dump(f"{key}_attn_logits", np.log(np.asarray(st["attn_weight"][0]) + 1e-12))
    if "4" in on:
        for key in stages:
            if "mono_depth" in outputs[key]:
                dump(f"{key}_mono_depth", outputs[key]["mono_depth"][0])

    if on & {"5", "6"}:
        # recompute warp / correlation weights per stage, per source view
        cfg = model.cfg
        B, V = imgs.shape[:2]
        from ..core.geometry import resize_align_corners

        for si, key in enumerate(stages):
            st = outputs[key]
            hypo = jnp.asarray(st["hypo_depth"])
            h, w = hypo.shape[-2:]
            projs = proj_matrices[key]
            # per-view FPN features are not retained; warp the (stage-res)
            # image instead — same geometry observable as the reference's
            # normalized feature windows.
            stage_imgs = resize_align_corners(jnp.asarray(imgs), (h, w))
            for v in range(1, V):
                rel = relative_projection(projs[:, v], projs[:, 0])
                coords = warp_coords(rel, hypo)
                warped = grid_sample_2d(stage_imgs[:, v], coords)
                if "5" in on:
                    dump(f"{key}_warped_src{v - 1}", warped[0])
                if "6" in on:
                    cor = correlate_view(
                        stage_imgs[:, v], stage_imgs[:, 0], rel,
                        hypo, group_cor=False, group_dim=1,
                    )
                    wgt = jax.nn.softmax(
                        cor.sum(-1) / cfg.attn_temp, axis=1
                    ) / math.sqrt(imgs.shape[-1])
                    dump(f"{key}_cor_weight_src{v - 1}", wgt[0])
    return written
