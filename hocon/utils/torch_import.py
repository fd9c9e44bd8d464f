"""PyTorch -> Flax weight import.

Purpose (SURVEY.md §5.4 + BASELINE.json): load reference checkpoints /
torchvision-pretrained ResNet weights into the Flax trunk so (a) training
starts from ImageNet init like the reference and (b) reference checkpoints
can be evaluated for MPJPE parity. Works on a plain ``state_dict``-style
mapping of numpy arrays — no torch import required here (callers convert
tensors with ``.numpy()``).

Key layout handled: torchvision ResNet naming
  conv1.weight, bn1.{weight,bias,running_mean,running_var},
  layer{L}.{B}.conv{1,2}.weight, layer{L}.{B}.bn{1,2}.*,
  layer{L}.{B}.downsample.{0,1}.*
optionally under a prefix (the reference wraps its trunk, e.g.
``base_net.`` — pass ``prefix`` accordingly).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def import_resnet_trunk(
    state_dict: Mapping[str, np.ndarray],
    params: dict,
    batch_stats: dict,
    stage_sizes=(2, 2, 2, 2),
    prefix: str = "",
) -> tuple[dict, dict]:
    """Copy torchvision-ResNet weights into our trunk param/batch_stats trees.

    Args:
      state_dict: name -> numpy array (torch tensors already .numpy()'d).
      params / batch_stats: the 'trunk' subtree of a HOCNet (or bare ResNet)
        variables dict. Returned updated copies (inputs not mutated).

    Raises KeyError on missing source keys — importing silently-partial
    trunks would corrupt parity claims.
    """
    import copy

    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)

    def src(key):
        full = prefix + key
        if full not in state_dict:
            raise KeyError(f"missing torch key {full!r}")
        return np.asarray(state_dict[full])

    def set_bn(dst_p: dict, dst_s: dict, torch_name: str):
        dst_p["scale"] = src(f"{torch_name}.weight").astype(np.float32)
        dst_p["bias"] = src(f"{torch_name}.bias").astype(np.float32)
        dst_s["mean"] = src(f"{torch_name}.running_mean").astype(np.float32)
        dst_s["var"] = src(f"{torch_name}.running_var").astype(np.float32)

    params["conv_init"]["kernel"] = _conv_kernel(src("conv1.weight"))
    set_bn(params["bn_init"], batch_stats["bn_init"], "bn1")

    block_idx = 0
    for stage, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            name = f"BasicBlock_{block_idx}"
            tname = f"layer{stage + 1}.{b}"
            bp = params[name]
            bs = batch_stats[name]
            bp["Conv_0"]["kernel"] = _conv_kernel(src(f"{tname}.conv1.weight"))
            bp["Conv_1"]["kernel"] = _conv_kernel(src(f"{tname}.conv2.weight"))
            set_bn(bp["BatchNorm_0"], bs["BatchNorm_0"], f"{tname}.bn1")
            set_bn(bp["BatchNorm_1"], bs["BatchNorm_1"], f"{tname}.bn2")
            if "conv_proj" in bp:
                bp["conv_proj"]["kernel"] = _conv_kernel(
                    src(f"{tname}.downsample.0.weight")
                )
                set_bn(bp["norm_proj"], bs["norm_proj"], f"{tname}.downsample.1")
            block_idx += 1
    return params, batch_stats


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch .pth/.pt checkpoint to {name: numpy} (CPU, no grads)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, "numpy"):
            out[k.replace("module.", "")] = v.detach().numpy()
    return out


def import_trunk_into_hocnet(
    variables: dict, state_dict: Mapping[str, np.ndarray], prefix: str = "",
    stage_sizes=(2, 2, 2, 2),
) -> dict:
    """Return a new HOCNet variables dict with the trunk replaced."""
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    new_p, new_s = import_resnet_trunk(
        state_dict, params["trunk"], stats.get("trunk", {}),
        stage_sizes=stage_sizes, prefix=prefix,
    )
    params["trunk"] = new_p
    stats["trunk"] = new_s
    return {"params": params, "batch_stats": stats}
