"""Regression heads.

Reference parity:
- ``ManoHead``    <- meshreg/models/manobranch.py ``ManoBranch`` (2-layer MLP
  over trunk features -> MANO PCA pose coeffs + shape betas + root rotation).
- ``AbsoluteHead``<- meshreg/models/absolutebranch.py (root translation /
  scale-depth from features; weak-perspective -> absolute 3D).
- ``ObjPoseHead`` <- object 6-DoF branch inside meshreg/models/meshregnet.py
  (axis-angle rotation + translation of a known canonical mesh; rotation can
  be frozen with ``block_rot``). We default to the 6D rotation
  parameterization (Zhou et al.) — better conditioned for regression and
  pure matmul on TPU — with axis-angle available for strict parity.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from hocon.geometry.rot import rodrigues, rot6d_to_matrix


class MLP(nn.Module):
    hidden: Sequence[int]
    out_dim: int
    out_init_scale: float = 1e-3

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        # Near-zero init on the output layer: predictions start at the
        # parameterization's neutral point (mean pose / zero offset).
        return nn.Dense(
            self.out_dim,
            kernel_init=nn.initializers.normal(self.out_init_scale),
            bias_init=nn.initializers.zeros,
        )(x)


class ManoHead(nn.Module):
    """Features -> (pose PCA coeffs, shape betas, root axis-angle)."""

    ncomps: int = 15
    hidden: Sequence[int] = (512, 512)
    use_shape: bool = True

    @nn.compact
    def __call__(self, feats):
        out = MLP(self.hidden, self.ncomps + 3, name="pose_mlp")(feats)
        pose_pca = out[..., : self.ncomps]
        root_rot = out[..., self.ncomps :]
        if self.use_shape:
            betas = MLP(self.hidden, 10, name="shape_mlp")(feats)
        else:
            betas = jnp.zeros(feats.shape[:-1] + (10,), feats.dtype)
        return pose_pca, betas, root_rot


class AbsoluteHead(nn.Module):
    """Features -> absolute root translation (meters, camera frame).

    Predicts (dx, dy, dz) around an initial depth ``z_init`` so training
    starts with the mesh in front of the camera.
    """

    hidden: Sequence[int] = (512,)
    z_init: float = 0.6

    @nn.compact
    def __call__(self, feats):
        out = MLP(self.hidden, 3, name="trans_mlp")(feats)
        return out + jnp.asarray([0.0, 0.0, self.z_init], out.dtype)


class ObjPoseHead(nn.Module):
    """Features -> object 6-DoF pose (rotation matrix + translation, meters).

    ``block_rot=True`` freezes rotation at identity (reference --block_rot).
    """

    hidden: Sequence[int] = (512,)
    rot_param: str = "6d"  # '6d' | 'axisang'
    block_rot: bool = False
    z_init: float = 0.6

    @nn.compact
    def __call__(self, feats):
        trans = MLP(self.hidden, 3, name="objtrans_mlp")(feats)
        trans = trans + jnp.asarray([0.0, 0.0, self.z_init], trans.dtype)
        if self.block_rot:
            rot = jnp.broadcast_to(
                jnp.eye(3, dtype=feats.dtype), feats.shape[:-1] + (3, 3)
            )
            return rot, trans
        if self.rot_param == "6d":
            raw = MLP(self.hidden, 6, name="objrot_mlp")(feats)
            rot = rot6d_to_matrix(
                raw + jnp.asarray([1.0, 0, 0, 0, 1.0, 0], raw.dtype)
            )
        elif self.rot_param == "axisang":
            raw = MLP(self.hidden, 3, name="objrot_mlp")(feats)
            rot = rodrigues(raw)
        else:
            raise ValueError(f"unknown rot_param {self.rot_param!r}")
        return rot, trans
