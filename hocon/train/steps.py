"""Jitted train/eval steps.

Reference parity: the per-batch body of ``meshreg/netscripts/epochpass.py``
(forward -> loss -> backward -> optimizer step) recast as pure jitted
functions over (TrainState, batch):

- ``make_train_step``      — supervised baseline (trainmeshreg.py body).
- ``make_warp_train_step`` — frame-pair photometric-consistency training
  (trainmeshwarp.py body): ONE trunk pass over [ref; tgt] concatenated
  (better MXU utilization than two passes), supervised losses masked by
  per-sample annotation flags, photometric warp loss through the
  (Pallas) rasterizer. ``consist_gt_refs`` anchors the warp on the GT ref
  mesh when the batch carries GT vertices (reference --consist_gt_refs).
- ``make_eval_step``       — forward + centered-mm predictions for EvalUtil.

All steps are shape-stable (one compilation each) and contain no host
syncs; under a data mesh, XLA inserts the gradient psum over ICI.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from hocon.data.augment import IMAGENET_MEAN, IMAGENET_STD
from hocon.geometry.project import persp_project
from hocon.models.losses import total_supervised_loss
from hocon.render.raster import soft_rasterize
from hocon.render.warp import WarpOutput, bilinear_sample, photometric_loss
from hocon.train.state import TrainState


def _gt_from_batch(batch: dict) -> dict:
    gt = {}
    if "joints3d" in batch:
        gt["joints_c_mm"] = batch["joints3d"]
    if "verts3d" in batch:
        gt["verts_c_mm"] = batch["verts3d"]
    if "joints2d" in batch:
        gt["joints2d"] = batch["joints2d"]
    if "objverts3d" in batch:
        gt["obj_verts_c_mm"] = batch["objverts3d"]
    if "obj_verts_mask" in batch:
        gt["obj_verts_mask"] = batch["obj_verts_mask"]
    return gt


def _device_images(img: jnp.ndarray) -> jnp.ndarray:
    """Accept uint8 crops (the loaders' device-side normalization path,
    ``HandDatasetConfig.uint8_images`` — 4x less host->device transfer) or
    already ImageNet-normalized float; returns normalized f32. The dtype
    test is static under jit (one branch is traced), and the convert +
    affine fuses into the consumer."""
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
        return (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return img


def _apply_model(model, params, batch_stats, batch, mano, train: bool):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    obj = batch.get("obj_verts_can")
    images = _device_images(batch["image"])
    if train and not model.freeze_batchnorm and batch_stats:
        out, new_state = model.apply(
            variables, images, batch["camintr"], mano, obj,
            train=True, mutable=["batch_stats"],
        )
        return out, new_state["batch_stats"]
    out = model.apply(
        variables, images, batch["camintr"], mano, obj, train=train
    )
    return out, batch_stats


def make_train_step(
    model,
    mano,
    optimizer: optax.GradientTransformation,
    hand_lambdas: Optional[dict] = None,
    obj_lambdas: Optional[dict] = None,
) -> Callable:
    """Supervised train step: (state, batch) -> (state, metrics)."""

    def loss_fn(params, batch_stats, batch):
        out, new_stats = _apply_model(model, params, batch_stats, batch, mano, True)
        loss, terms = total_supervised_loss(
            out, _gt_from_batch(batch), batch["sup_mask"],
            hand_lambdas=hand_lambdas, obj_lambdas=obj_lambdas,
        )
        return loss, (terms, new_stats)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: dict):
        (loss, (terms, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, batch_stats=new_stats, opt_state=opt_state,
            step=state.step + 1,
        )
        terms = dict(terms, grad_norm=optax.global_norm(grads))
        return new_state, terms

    return step


def _unnormalize(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(
        img * jnp.asarray(IMAGENET_STD) + jnp.asarray(IMAGENET_MEAN), 0.0, 1.0
    )


def _combined_mesh(out: dict, batch: dict, mano, use_gt_hand: bool):
    """Hand (+object) camera-space mesh for rendering one frame's view."""
    if use_gt_hand and "verts3d" in batch:
        hand = batch["verts3d"] / 1000.0 + batch["center3d"][:, None]
    else:
        hand = out["verts_cam"]
    faces = jnp.asarray(mano.faces)  # (F, 3)
    b = hand.shape[0]
    faces = jnp.broadcast_to(faces[None], (b,) + faces.shape)
    if "obj_verts_cam" in out and "obj_faces" in batch:
        verts = jnp.concatenate([hand, out["obj_verts_cam"]], axis=1)
        # Padded object faces are (0,0,0); offsetting keeps them degenerate
        # (all three indices equal), so the rasterizer culls them.
        ofaces = batch["obj_faces"].astype(jnp.int32) + hand.shape[1]
        faces = jnp.concatenate([faces, ofaces], axis=1)
        return verts, faces
    return hand, faces


def make_warp_train_step(
    model,
    mano,
    optimizer: optax.GradientTransformation,
    image_size: tuple[int, int],
    hand_lambdas: Optional[dict] = None,
    obj_lambdas: Optional[dict] = None,
    lambda_consist: float = 1.0,
    consist_gt_refs: bool = True,
    sigma: float = 1.0,
    gamma: float = 1.0 / 40.0,
    backend: str = "auto",
    photo_downscale: int = 1,
    backface_cull: bool = True,
) -> Callable:
    """Frame-pair photometric-consistency train step (the reference novelty).

    ``photo_downscale`` > 1 average-pools the rendered sampling coords /
    mask and the target image by that factor before warping, cutting the
    (gather-bound) warp cost ~quadratically. 1 = reference-faithful
    full-resolution photometric term.

    ``backface_cull`` (default ON) drops camera-averted faces from the
    warp render — MANO and the (orientation-fixed) object meshes are
    outward-wound, and every backface of a closed mesh is occluded, so the
    rendered coords/mask are near-identical while the rasterizer does
    roughly half the work. Disable for meshes with unknown winding.
    """

    def loss_fn(params, batch_stats, batch):
        ref, tgt = dict(batch["ref"]), dict(batch["tgt"])
        # Normalize once at entry so the trunk pass AND the photometric
        # target/_unnormalize math below see the same f32 images under
        # both loader paths (f32 or uint8 device-side normalization).
        ref["image"] = _device_images(ref["image"])
        tgt["image"] = _device_images(tgt["image"])
        b = ref["image"].shape[0]
        # k-frame clips: targets arrive stacked as (B, K-1, ...) — flatten
        # them into the batch dim (still pure DP, SURVEY.md §5.7).
        if tgt["image"].ndim == 5:
            k1 = tgt["image"].shape[1]
            tgt = jax.tree_util.tree_map(
                lambda x: x.reshape((b * k1,) + x.shape[2:]), tgt
            )
            tile = lambda x: jnp.repeat(x, k1, axis=0)
        else:
            k1 = 1
            tile = lambda x: x
        joint = {
            "image": jnp.concatenate([ref["image"], tgt["image"]]),
            "camintr": jnp.concatenate([ref["camintr"], tgt["camintr"]]),
        }
        if "obj_verts_can" in ref:
            joint["obj_verts_can"] = jnp.concatenate(
                [ref["obj_verts_can"], tgt["obj_verts_can"]]
            )
        out, new_stats = _apply_model(model, params, batch_stats, joint, mano, True)
        out_ref = jax.tree_util.tree_map(lambda x: x[:b], out)
        out_tgt = jax.tree_util.tree_map(lambda x: x[b:], out)

        sup_ref, terms_ref = total_supervised_loss(
            out_ref, _gt_from_batch(ref), ref["sup_mask"],
            hand_lambdas=hand_lambdas, obj_lambdas=obj_lambdas,
        )
        sup_tgt, _ = total_supervised_loss(
            out_tgt, _gt_from_batch(tgt), tgt["sup_mask"],
            hand_lambdas=hand_lambdas, obj_lambdas=obj_lambdas,
        )

        # Photometric consistency: render each TGT view carrying REF-frame
        # pixel coords, warp the ref image, compare to the tgt image.
        verts_tgt, faces = _combined_mesh(out_tgt, tgt, mano, use_gt_hand=False)
        verts_ref, _ = _combined_mesh(
            out_ref, ref, mano, use_gt_hand=consist_gt_refs
        )
        tgt_pix = persp_project(verts_tgt, tgt["camintr"])
        ref_pix = persp_project(tile(verts_ref), tile(ref["camintr"]))
        raster = soft_rasterize(
            tgt_pix, verts_tgt[..., 2], faces, attrs=ref_pix,
            image_size=image_size, sigma=sigma, gamma=gamma, backend=backend,
            backface_cull=backface_cull,
        )
        coords, mask = raster.attr, raster.sil * raster.vis
        tgt_img = _unnormalize(tgt["image"])
        if photo_downscale > 1:
            d = photo_downscale
            pool = lambda x: jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, d, d) + (1,) * (x.ndim - 3),
                (1, d, d) + (1,) * (x.ndim - 3), "VALID",
            ) / (d * d)
            coords, mask, tgt_img = pool(coords), pool(mask), pool(tgt_img)
        warped = bilinear_sample(tile(_unnormalize(ref["image"])), coords)
        photo, photo_terms = photometric_loss(warped, tgt_img, mask)
        warp_out = WarpOutput(warped=warped, mask=mask, raster=raster)

        total = sup_ref + sup_tgt + lambda_consist * photo
        terms = {f"ref_{k}": v for k, v in terms_ref.items()}
        terms.update(photo_terms)
        terms["loss_total"] = total
        terms["mask_area"] = jnp.mean(jnp.sum(warp_out.mask, axis=(1, 2)))
        return total, (terms, new_stats)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: dict):
        (loss, (terms, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, batch_stats=new_stats, opt_state=opt_state,
            step=state.step + 1,
        )
        terms = dict(terms, grad_norm=optax.global_norm(grads))
        return new_state, terms

    return step


def make_eval_step(model, mano) -> Callable:
    """Eval forward: (state, batch) -> predictions for host-side EvalUtil."""

    @jax.jit
    def step(state: TrainState, batch: dict):
        out, _ = _apply_model(
            model, state.params, state.batch_stats, batch, mano, False
        )
        preds = {
            "joints_c_mm": out["joints_c_mm"],
            "verts_c_mm": out["verts_c_mm"],
            "joints2d": out["joints2d"],
            "joints_cam": out["joints_cam"],
            "verts_cam": out["verts_cam"],
        }
        if "obj_verts_c_mm" in out:
            preds["obj_verts_c_mm"] = out["obj_verts_c_mm"]
            if "obj_corners_can" in batch:
                # Predicted corners: the predicted 6-DoF pose applied to the
                # canonical bbox corners (HO-3D corner-error metric).
                from hocon.geometry.project import transform_points

                corners_cam = transform_points(
                    batch["obj_corners_can"], out["obj_rot"], out["obj_trans"]
                )
                preds["obj_corners_c_mm"] = (
                    corners_cam - out["center_cam"]
                ) * 1000.0
        return preds

    return step
