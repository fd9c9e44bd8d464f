"""Supervised losses.

Reference parity: ``ManoLoss`` in meshreg/models/manobranch.py (lambda-
weighted vertex/joint 3D MSE + shape/pose regularizers) and the object
vertex / 2D reprojection losses in meshreg/models/meshregnet.py.

All losses take a per-sample ``sup_mask`` (B,) so sparse-supervision
training (reference ``--fraction``) masks unannotated frames out of the
supervised terms while the photometric-consistency term covers them.
Reductions are masked means, so the loss scale is independent of the
annotated fraction.
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_mean(per_sample: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of per-sample losses over samples with mask > 0."""
    return jnp.sum(per_sample * mask) / (jnp.sum(mask) + 1e-6)


def _mse(pred, gt, axis):
    return jnp.mean((pred - gt) ** 2, axis=axis)


def hand_losses(
    pred: dict,
    gt: dict,
    sup_mask: jnp.ndarray,
    lambda_verts3d: float = 0.167,
    lambda_joints3d: float = 0.167,
    # 2D reprojection is the ONLY supervised anchor for the absolute
    # branch (3D terms are root-centered); default ON or trans is
    # unsupervised in baseline training. (Reference weight: verify.)
    lambda_joints2d: float = 0.5,
    lambda_shape: float = 1e-6,
    lambda_pose: float = 1e-6,
) -> tuple[jnp.ndarray, dict]:
    """Hand supervision. 3D terms in centered mm, 2D in pixels.

    gt keys (present ones are used): 'verts_c_mm' (B,778,3),
    'joints_c_mm' (B,21,3), 'joints2d' (B,21,2).
    """
    terms = {}
    total = 0.0
    if "verts_c_mm" in gt:
        v = _masked_mean(_mse(pred["verts_c_mm"], gt["verts_c_mm"], (1, 2)), sup_mask)
        terms["loss_hand_verts3d"] = v
        total = total + lambda_verts3d * v
    if "joints_c_mm" in gt:
        j = _masked_mean(
            _mse(pred["joints_c_mm"], gt["joints_c_mm"], (1, 2)), sup_mask
        )
        terms["loss_hand_joints3d"] = j
        total = total + lambda_joints3d * j
    if lambda_joints2d > 0 and "joints2d" in gt:
        j2 = _masked_mean(_mse(pred["joints2d"], gt["joints2d"], (1, 2)), sup_mask)
        terms["loss_hand_joints2d"] = j2
        total = total + lambda_joints2d * j2
    # Regularizers apply to every sample (not just annotated ones).
    reg_b = jnp.mean(jnp.sum(pred["betas"] ** 2, axis=-1))
    reg_p = jnp.mean(jnp.sum(pred["pose_pca"] ** 2, axis=-1))
    terms["reg_shape"] = reg_b
    terms["reg_pose"] = reg_p
    total = total + lambda_shape * reg_b + lambda_pose * reg_p
    terms["loss_hand_total"] = total
    return total, terms


def object_losses(
    pred: dict,
    gt: dict,
    sup_mask: jnp.ndarray,
    lambda_obj_verts3d: float = 0.167,
    lambda_obj_verts2d: float = 0.0,
) -> tuple[jnp.ndarray, dict]:
    """Object supervision: posed canonical-mesh vertices, centered mm + px."""
    terms = {}
    total = 0.0
    if "obj_verts_c_mm" in gt and "obj_verts_c_mm" in pred:
        err = (pred["obj_verts_c_mm"] - gt["obj_verts_c_mm"]) ** 2  # (B,Vo,3)
        if "obj_verts_mask" in gt:  # padded vertices carry no signal
            vm = gt["obj_verts_mask"][..., None]
            per_sample = jnp.sum(err * vm, axis=(1, 2)) / (
                jnp.sum(vm, axis=(1, 2)) * 3.0 + 1e-6
            )
        else:
            per_sample = jnp.mean(err, axis=(1, 2))
        v = _masked_mean(per_sample, sup_mask)
        terms["loss_obj_verts3d"] = v
        total = total + lambda_obj_verts3d * v
    if lambda_obj_verts2d > 0 and "obj_verts2d" in gt and "obj_verts2d" in pred:
        v2 = _masked_mean(
            _mse(pred["obj_verts2d"], gt["obj_verts2d"], (1, 2)), sup_mask
        )
        terms["loss_obj_verts2d"] = v2
        total = total + lambda_obj_verts2d * v2
    terms["loss_obj_total"] = total
    return total, terms


def total_supervised_loss(
    pred: dict,
    gt: dict,
    sup_mask: jnp.ndarray,
    hand_lambdas: dict | None = None,
    obj_lambdas: dict | None = None,
) -> tuple[jnp.ndarray, dict]:
    h, ht = hand_losses(pred, gt, sup_mask, **(hand_lambdas or {}))
    total = h
    terms = dict(ht)
    if "obj_verts_c_mm" in pred:
        o, ot = object_losses(pred, gt, sup_mask, **(obj_lambdas or {}))
        total = total + o
        terms.update(ot)
    terms["loss_total"] = total
    return total, terms
