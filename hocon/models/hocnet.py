"""HOCNet — the flagship hand-object reconstruction network.

Reference parity: ``meshreg/models/meshregnet.py`` ``MeshRegNet`` — ResNet
trunk -> (ManoBranch, AbsoluteBranch, object 6-DoF branch), assembling hand
mesh/joints (via the MANO layer), posed object vertices, and pinhole 2D
reprojections. Losses live in ``hocon.models.losses`` so this module stays a
pure function of (params, batch) — the idiomatic JAX split.

Conventions (matching the reference's supervision frames):
- Camera-space outputs are in meters; ``*_c`` outputs are root-centered
  millimeters (centered at hand joint ``center_idx``, default 9 = middle
  MCP), which is the frame MPJPE and the 3D losses are computed in.
- The object canonical mesh is supplied per-sample (B, Vo, 3) in meters;
  its pose is applied as ``R @ v + t``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from hocon.geometry.mano import ManoModel, mano_forward
from hocon.geometry.project import persp_project, transform_points
from hocon.models.backbone import resnet18, resnet34, resnet50
from hocon.models.heads import AbsoluteHead, ManoHead, ObjPoseHead

_BACKBONES = {"resnet18": resnet18, "resnet34": resnet34, "resnet50": resnet50}


class HOCNet(nn.Module):
    ncomps: int = 15
    center_idx: int = 9
    with_object: bool = True
    block_rot: bool = False
    obj_rot_param: str = "6d"
    backbone: str = "resnet18"
    freeze_batchnorm: bool = True
    z_init: float = 0.6  # initial root/object depth for both trans heads
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, H, W, 3), normalized
        camintr: jnp.ndarray,  # (B, 3, 3)
        mano: ManoModel,
        obj_verts_can: Optional[jnp.ndarray] = None,  # (B, Vo, 3) meters
        train: bool = False,
    ) -> dict:
        trunk = _BACKBONES[self.backbone](
            dtype=self.dtype, freeze_batchnorm=self.freeze_batchnorm,
            name="trunk",
        )
        feats = trunk(images, train=train)

        pose_pca, betas, root_rot = ManoHead(ncomps=self.ncomps, name="mano_head")(
            feats
        )
        trans = AbsoluteHead(z_init=self.z_init, name="absolute_head")(feats)

        verts_m, joints_m = mano_forward(
            mano, pose_pca, betas, root_rot, scale_mm=False
        )  # meters, model frame
        verts_cam = verts_m + trans[:, None]
        joints_cam = joints_m + trans[:, None]

        center = joints_cam[:, self.center_idx : self.center_idx + 1]
        out = {
            "pose_pca": pose_pca,
            "betas": betas,
            "root_rot": root_rot,
            "trans": trans,
            "verts_cam": verts_cam,  # meters
            "joints_cam": joints_cam,
            "verts_c_mm": (verts_cam - center) * 1000.0,
            "joints_c_mm": (joints_cam - center) * 1000.0,
            "joints2d": persp_project(joints_cam, camintr),
            "verts2d": persp_project(verts_cam, camintr),
            "center_cam": center,
        }

        if self.with_object and obj_verts_can is not None:
            obj_rot, obj_trans = ObjPoseHead(
                rot_param=self.obj_rot_param, block_rot=self.block_rot,
                z_init=self.z_init, name="obj_head",
            )(feats)
            obj_cam = transform_points(obj_verts_can, obj_rot, obj_trans)
            out.update(
                obj_rot=obj_rot,
                obj_trans=obj_trans,
                obj_verts_cam=obj_cam,
                obj_verts_c_mm=(obj_cam - center) * 1000.0,
                obj_verts2d=persp_project(obj_cam, camintr),
            )
        return out
