"""Flax ResNet trunk.

Reference parity: ``meshreg/models/resnet.py`` — a torchvision ResNet-18
modified to return penultimate (pooled) features, ImageNet-pretrained.
This is a from-scratch Flax implementation (BasicBlock / Bottleneck), with:

- NHWC layout and optional bfloat16 compute (MXU-native) with f32 params;
- ``freeze_batchnorm``: evaluate BN with running stats and no updates —
  the reference trains with ``--freeze_batchnorm`` on ImageNet stats;
- a torchvision state_dict importer lives in ``hocon.utils.torch_import``
  for weight parity (no network in this sandbox, so init is random unless
  the user provides weights).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef

    @nn.compact
    def __call__(self, x):
        residual = x
        # Explicit (1,1) padding: torch semantics — flax 'SAME' pads (0,1)
        # for stride-2 3x3 convs, which breaks torchvision weight parity.
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides),
                      padding=[(1, 1), (1, 1)])(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)])(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters, (1, 1), (self.strides, self.strides),
                name="conv_proj",
            )(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class Bottleneck(nn.Module):
    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides),
                      padding=[(1, 1), (1, 1)])(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters * 4, (1, 1), (self.strides, self.strides),
                name="conv_proj",
            )(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    """ResNet returning pooled features (B, C_out) and spatial features.

    Attributes:
      stage_sizes: blocks per stage, e.g. (2, 2, 2, 2) for ResNet-18.
      block: BasicBlock or Bottleneck.
      dtype: compute dtype — bfloat16 recommended on TPU (params stay f32).
      freeze_batchnorm: run BN in inference mode (running stats, no update).
    """

    stage_sizes: Sequence[int]
    block: Callable
    num_filters: int = 64
    dtype: jnp.dtype = jnp.float32
    freeze_batchnorm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, return_spatial: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        use_ra = self.freeze_batchnorm or not train
        norm = partial(
            nn.BatchNorm,
            use_running_average=use_ra,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )

        x = x.astype(self.dtype)
        # A space-to-depth stem (2x2 s2d + exact-equivalent 4x4/1 conv, the
        # MLPerf-ResNet trick for the C_in=3 MXU-lane starvation) was built
        # and A/B'd on v5e-1 in round 4: no win at 256px (toy bench 500.6
        # vs 507.6 pairs/s, realistic 393.3 vs 393.9; trunk MFU 30.7% vs
        # 31.7%) — XLA already handles the small-C_in stem well here, so
        # the variant was removed. Don't re-add without a new measurement.
        x = conv(self.num_filters, (7, 7), (2, 2),
                 padding=[(3, 3), (3, 3)], name="conv_init")(x)
        x = norm(name="bn_init")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, block_size in enumerate(self.stage_sizes):
            for j in range(block_size):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block(
                    self.num_filters * 2**i, strides=strides, conv=conv, norm=norm
                )(x)
        spatial = x
        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if return_spatial:
            return pooled, spatial.astype(jnp.float32)
        return pooled


# Single source of truth for per-variant stage sizes (the torch importer
# walks torchvision's layer{1..4}.{b} names with these counts).
STAGE_SIZES = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
}


def resnet18(**kw) -> ResNet:
    return ResNet(stage_sizes=STAGE_SIZES["resnet18"], block=BasicBlock, **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(stage_sizes=STAGE_SIZES["resnet34"], block=BasicBlock, **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(stage_sizes=STAGE_SIZES["resnet50"], block=Bottleneck, **kw)
