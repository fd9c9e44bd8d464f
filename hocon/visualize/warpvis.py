"""Warp-panel debugging grids for consistency training.

Reference parity: the warped-image / rendered-mask panels the reference
writes during trainmeshwarp runs — the primary debugging instrument for the
renderer/warp path (SURVEY.md §4 "Visual QA").
"""

from __future__ import annotations

import jax
import numpy as np

from hocon.render.warp import render_warp
from hocon.visualize.samplevis import _unnormalize, sample_vis


def save_warp_panels(
    model, mano, state, pair_batch: dict, save_path: str,
    image_size: tuple[int, int], backend: str = "auto",
    consist_gt_refs: bool = True,
    sigma: float = 1.0, gamma: float = 1.0 / 40.0,
    backface_cull: bool = True,
    max_rows: int = 4,
) -> str | None:
    """Render (mask, warped-ref, target) panels for the first ``max_rows``
    samples of a frame-pair batch under the current parameters.

    ``sigma``/``gamma``/``backface_cull`` must mirror the training step's
    renderer configuration (callers thread the CLI flags through) — panels
    rendered with defaults would show masks from a DIFFERENT renderer than
    the one being debugged.
    """
    import jax.numpy as jnp

    from hocon.train.steps import _apply_model, _combined_mesh

    ref, tgt = pair_batch["ref"], pair_batch["tgt"]
    if hasattr(tgt["image"], "ndim") and tgt["image"].ndim == 5:
        tgt = jax.tree_util.tree_map(lambda x: x[:, 0], tgt)  # first clip tgt
    # Only max_rows rows are plotted; don't pay a full-batch model forward
    # + rasterize + warp (4x waste at batch 16) for unplotted samples.
    n = min(max_rows, int(np.asarray(ref["image"]).shape[0]))
    ref = jax.tree_util.tree_map(lambda x: x[:n], ref)
    tgt = jax.tree_util.tree_map(lambda x: x[:n], tgt)

    out_ref, _ = _apply_model(
        model, state.params, state.batch_stats, ref, mano, train=False
    )
    out_tgt, _ = _apply_model(
        model, state.params, state.batch_stats, tgt, mano, train=False
    )
    verts_tgt, faces = _combined_mesh(out_tgt, tgt, mano, use_gt_hand=False)
    verts_ref, _ = _combined_mesh(out_ref, ref, mano, use_gt_hand=consist_gt_refs)
    ref_img01 = jnp.asarray(_unnormalize(np.asarray(ref["image"])), jnp.float32)
    warp_out = render_warp(
        verts_tgt, verts_ref, faces, tgt["camintr"], ref["camintr"],
        ref_img01, image_size=image_size, backend=backend,
        sigma=sigma, gamma=gamma, backface_cull=backface_cull,
    )
    warp = {
        "mask": np.asarray(warp_out.mask),
        "warped": np.asarray(warp_out.warped),
        "target": _unnormalize(np.asarray(tgt["image"])),
    }
    preds = {"joints2d": np.asarray(out_tgt["joints2d"])}
    batch_np = {"image": np.asarray(tgt["image"])}
    joints2d_gt = tgt.get("joints2d")
    if joints2d_gt is not None:
        # None must stay ABSENT (np.asarray(None) is a 0-d object array
        # that defeats sample_vis's `"joints2d" in batch` guard).
        batch_np["joints2d"] = np.asarray(joints2d_gt)
    return sample_vis(batch_np, preds, save_path, max_rows=max_rows,
                      warp=warp)
