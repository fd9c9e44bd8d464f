"""Warp-panel debugging grids for consistency training.

Reference parity: the warped-image / rendered-mask panels the reference
writes during trainmeshwarp runs — the primary debugging instrument for the
renderer/warp path (SURVEY.md §4 "Visual QA").
"""

from __future__ import annotations

import jax
import numpy as np

from hocon.data.augment import IMAGENET_MEAN, IMAGENET_STD
from hocon.render.warp import render_warp
from hocon.visualize.samplevis import sample_vis


def _unnorm(img):
    img = np.asarray(img)
    if img.dtype == np.uint8:  # uint8_images loader path: raw RGB crops
        return img.astype(np.float32) / 255.0
    return np.clip(img * IMAGENET_STD + IMAGENET_MEAN, 0, 1)


def save_warp_panels(
    model, mano, state, pair_batch: dict, save_path: str,
    image_size: tuple[int, int], backend: str = "auto",
    consist_gt_refs: bool = True,
) -> str | None:
    """Render (mask, warped-ref, target) panels for the first samples of a
    frame-pair batch under the current parameters."""
    import jax.numpy as jnp

    from hocon.train.steps import _apply_model, _combined_mesh

    ref, tgt = pair_batch["ref"], pair_batch["tgt"]
    if hasattr(tgt["image"], "ndim") and tgt["image"].ndim == 5:
        tgt = jax.tree_util.tree_map(lambda x: x[:, 0], tgt)  # first clip tgt

    out_ref, _ = _apply_model(
        model, state.params, state.batch_stats, ref, mano, train=False
    )
    out_tgt, _ = _apply_model(
        model, state.params, state.batch_stats, tgt, mano, train=False
    )
    verts_tgt, faces = _combined_mesh(out_tgt, tgt, mano, use_gt_hand=False)
    verts_ref, _ = _combined_mesh(out_ref, ref, mano, use_gt_hand=consist_gt_refs)
    ref_img01 = jnp.asarray(_unnorm(ref["image"]), jnp.float32)
    warp_out = render_warp(
        verts_tgt, verts_ref, faces, tgt["camintr"], ref["camintr"],
        ref_img01, image_size=image_size, backend=backend,
    )
    warp = {
        "mask": np.asarray(warp_out.mask),
        "warped": np.asarray(warp_out.warped),
        "target": _unnorm(tgt["image"]),
    }
    preds = {"joints2d": np.asarray(out_tgt["joints2d"])}
    batch_np = {
        "image": np.asarray(tgt["image"]),
        "joints2d": np.asarray(tgt.get("joints2d")),
    }
    return sample_vis(batch_np, preds, save_path, warp=warp)
