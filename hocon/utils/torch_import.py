"""PyTorch -> Flax weight import.

Purpose (SURVEY.md §5.4 + BASELINE.json): load reference checkpoints /
torchvision-pretrained ResNet weights into the Flax trunk so (a) training
starts from ImageNet init like the reference and (b) reference checkpoints
can be evaluated for MPJPE parity. Works on a plain ``state_dict``-style
mapping of numpy arrays — no torch import required here (callers convert
tensors with ``.numpy()``).

Key layout handled: torchvision ResNet naming
  conv1.weight, bn1.{weight,bias,running_mean,running_var},
  layer{L}.{B}.conv{1,2[,3]}.weight, layer{L}.{B}.bn{1,2[,3]}.*,
  layer{L}.{B}.downsample.{0,1}.*
(2 convs/block for BasicBlock trunks — resnet18/34; 3 for Bottleneck —
resnet50; the block type is detected from the Flax param tree)
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

    # Flax auto-names block submodules after their class: BasicBlock_<i>
    # (resnet18/34, 2 convs) or Bottleneck_<i> (resnet50, 3 convs).
    bottleneck = any(k.startswith("Bottleneck_") for k in params)
    block_cls = "Bottleneck" if bottleneck else "BasicBlock"
    n_convs = 3 if bottleneck else 2
    block_idx = 0
    for stage, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            name = f"{block_cls}_{block_idx}"
            tname = f"layer{stage + 1}.{b}"
            bp = params[name]
            bs = batch_stats[name]
            for ci in range(n_convs):
                bp[f"Conv_{ci}"]["kernel"] = _conv_kernel(
                    src(f"{tname}.conv{ci + 1}.weight")
                )
                set_bn(
                    bp[f"BatchNorm_{ci}"], bs[f"BatchNorm_{ci}"],
                    f"{tname}.bn{ci + 1}",
                )
            if "conv_proj" in bp:
                bp["conv_proj"]["kernel"] = _conv_kernel(
                    src(f"{tname}.downsample.0.weight")
                )
                set_bn(bp["norm_proj"], bs["norm_proj"], f"{tname}.downsample.1")
            block_idx += 1
    return params, batch_stats


# --------------------------------------------------------------------------
# Full-model import (reference MeshRegNet checkpoint -> HOCNet variables).
#
# The reference's head layout ([pub:meshreg/models/manobranch.py] /
# absolutebranch.py / meshregnet.py): each branch is a shared base MLP
# (nn.Sequential of Linear+ReLU) followed by per-output Linear regressors.
# HOCNet uses SEPARATE per-output MLPs, so the shared base weights are
# DUPLICATED into each consumer MLP — functionally identical (the reference
# computes every regressor from the same base features).
#
# Exact torch key names are encoded as a declarative NAME TABLE below; they
# are best-effort reconstructions (the reference tree was empty — SURVEY.md
# provenance warning) and re-verifying them is a one-table change.
#
# ``bias_offset`` entries fold architectural deltas into the import: our
# Absolute/ObjPose heads add a constant z_init to the network output, so
# the imported final-layer bias is shifted by -z_init to keep the composed
# function identical to the reference's raw regression.
# --------------------------------------------------------------------------

def default_head_table(ncomps: int = 15, z_init: float = 0.6) -> list:
    """[(flax_path, torch_prefix, bias_offset|None), ...] for HOCNet heads.

    ``z_init`` MUST match the model's ``HOCNet.z_init`` (the constant depth
    the Absolute/ObjPose heads add to their raw output) — the offset is
    folded into the imported final-layer biases, and a mismatched value
    produces a silent functional z-shift with no shape error to catch it.
    ``import_hocnet`` threads the model's actual value when given ``model=``.
    """
    del ncomps  # shapes come from the arrays; kept for future variants
    zoff = np.array([0.0, 0.0, -z_init], np.float32)
    return [
        (("mano_head", "pose_mlp", "Dense_0"), "mano_branch.base_layer.0", None),
        (("mano_head", "pose_mlp", "Dense_1"), "mano_branch.base_layer.2", None),
        (("mano_head", "pose_mlp", "Dense_2"), "mano_branch.pose_reg", None),
        (("mano_head", "shape_mlp", "Dense_0"), "mano_branch.base_layer.0", None),
        (("mano_head", "shape_mlp", "Dense_1"), "mano_branch.base_layer.2", None),
        (("mano_head", "shape_mlp", "Dense_2"), "mano_branch.shape_reg", None),
        (("absolute_head", "trans_mlp", "Dense_0"),
         "absolute_branch.base_layer.0", None),
        (("absolute_head", "trans_mlp", "Dense_1"),
         "absolute_branch.final_layer", zoff),
        (("obj_head", "objtrans_mlp", "Dense_0"),
         "obj_branch.base_layer.0", None),
        (("obj_head", "objtrans_mlp", "Dense_1"), "obj_branch.trans_reg", zoff),
        (("obj_head", "objrot_mlp", "Dense_0"), "obj_branch.base_layer.0", None),
        (("obj_head", "objrot_mlp", "Dense_1"), "obj_branch.rot_reg", None),
    ]


def _set_linear(params: dict, path: tuple, w: np.ndarray, b: np.ndarray,
                bias_offset=None) -> None:
    node = params
    for key in path[:-1]:
        node = node[key]
    leaf = node[path[-1]]
    kernel = np.transpose(np.asarray(w)).astype(np.float32)  # (out,in)->(in,out)
    bias = np.asarray(b, np.float32)
    if bias_offset is not None:
        bias = bias + np.asarray(bias_offset, np.float32)
    if leaf["kernel"].shape != kernel.shape:
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: flax {leaf['kernel'].shape} "
            f"vs torch {kernel.shape}"
        )
    leaf["kernel"] = kernel
    leaf["bias"] = bias


def import_hocnet(
    variables: dict,
    state_dict: Mapping[str, np.ndarray],
    trunk_prefix: str = "base_net.",
    head_table: list | None = None,
    stage_sizes=(2, 2, 2, 2),
    strict_heads: bool = True,
    model=None,
) -> dict:
    """Import a full reference MeshRegNet checkpoint into HOCNet variables.

    Covers trunk + Mano/Absolute/object heads via :func:`default_head_table`
    (override ``head_table`` when the real key names differ — that is the
    only thing that should need changing). With ``strict_heads=False``,
    head entries whose torch keys are absent are skipped (e.g. a hand-only
    checkpoint into a hand+object model).

    Pass ``model`` (the target HOCNet) so the bias-offset fold uses ITS
    ``z_init`` — a hard-coded default would silently shift z for models
    built with a non-default value.

    Note: the object ROTATION import requires ``obj_rot_param='axisang'``
    (the reference regresses axis-angle; the default 6d head has a
    different output width and will raise a shape mismatch).
    """
    import copy

    variables = import_trunk_into_hocnet(
        variables, state_dict, prefix=trunk_prefix, stage_sizes=stage_sizes
    )
    params = copy.deepcopy(dict(variables["params"]))
    if head_table is not None:
        table = head_table
    else:
        z_init = getattr(model, "z_init", 0.6) if model is not None else 0.6
        table = default_head_table(z_init=z_init)
    for flax_path, torch_prefix, bias_offset in table:
        head = flax_path[0]
        if head not in params:
            continue  # model variant without this head (e.g. no object)
        wk, bk = torch_prefix + ".weight", torch_prefix + ".bias"
        if wk not in state_dict or bk not in state_dict:
            if strict_heads:
                raise KeyError(f"missing torch keys {wk!r}/{bk!r}")
            continue
        _set_linear(params, flax_path, state_dict[wk], state_dict[bk],
                    bias_offset)
    out = dict(variables)
    out["params"] = params
    return out


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
