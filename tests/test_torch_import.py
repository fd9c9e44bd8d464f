"""Torch->Flax trunk import parity.

Builds a from-scratch torch ResNet-18 with torchvision's exact module
naming, imports its weights into the Flax trunk, and checks the two
networks produce the same features — validating both the importer and the
trunk architecture (conv/BN/stride/padding layout) in one shot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hocon.models.backbone import resnet18  # noqa: E402
from hocon.utils.torch_import import import_resnet_trunk  # noqa: E402


class _TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(idt + y)


class _TorchResNet18(tnn.Module):
    """torchvision-named ResNet-18 feature extractor."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        for li, w in enumerate(widths):
            cin = 64 if li == 0 else widths[li - 1]
            stride = 1 if li == 0 else 2
            layer = tnn.Sequential(
                _TorchBasicBlock(cin, w, stride), _TorchBasicBlock(w, w, 1)
            )
            setattr(self, f"layer{li + 1}", layer)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        return x.mean(dim=(2, 3))


def test_trunk_matches_torch_reference():
    tmodel = _TorchResNet18().eval()
    # Randomize BN stats so the import is actually exercised.
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0, 0.05)

    state_dict = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    model = resnet18(freeze_batchnorm=True)
    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, stats = import_resnet_trunk(
        state_dict, variables["params"], variables["batch_stats"]
    )
    feats = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(np.asarray(feats), want, atol=2e-4)


class _TorchBottleneck(tnn.Module):
    def __init__(self, cin, width, stride):
        super().__init__()
        cout = width * 4
        self.conv1 = tnn.Conv2d(cin, width, 1, 1, 0, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, cout, 1, 1, 0, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(idt + y)


class _TorchResNet50(tnn.Module):
    """torchvision-named ResNet-50 feature extractor."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        sizes = [3, 4, 6, 3]
        cin = 64
        for li, (w, n) in enumerate(zip(widths, sizes)):
            stride = 1 if li == 0 else 2
            blocks = []
            for b in range(n):
                blocks.append(
                    _TorchBottleneck(cin, w, stride if b == 0 else 1)
                )
                cin = w * 4
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        return x.mean(dim=(2, 3))


def test_resnet50_trunk_matches_torch_reference():
    """Bottleneck (resnet50) import parity — block type auto-detected from
    the Flax param tree (torch_import.py)."""
    from hocon.models.backbone import resnet50

    tmodel = _TorchResNet50().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0, 0.05)
    state_dict = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    model = resnet50(freeze_batchnorm=True)
    x = np.random.default_rng(1).standard_normal((2, 64, 64, 3)).astype(
        np.float32
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, stats = import_resnet_trunk(
        state_dict, variables["params"], variables["batch_stats"],
        stage_sizes=(3, 4, 6, 3),
    )
    feats = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(np.asarray(feats), want, atol=5e-4)


def test_import_missing_key_raises():
    model = resnet18()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    with pytest.raises(KeyError):
        import_resnet_trunk({}, variables["params"], variables["batch_stats"])


def _rand_linear(rng, cin, cout):
    return (
        rng.standard_normal((cout, cin)).astype(np.float32) * 0.05,
        rng.standard_normal(cout).astype(np.float32) * 0.05,
    )


def test_full_hocnet_import_roundtrip(mano_model):
    """Synthetic reference-style state_dict (trunk + shared-base branch MLPs
    + per-output regressors) imports into HOCNet and reproduces the
    reference head math exactly — only the name table should change once
    the real checkpoint key names are verifiable."""
    from hocon.models.hocnet import HOCNet
    from hocon.utils.torch_import import import_hocnet

    tmodel = _TorchResNet18().eval()
    state_dict = {
        "base_net." + k: v.numpy() for k, v in tmodel.state_dict().items()
    }

    rng = np.random.default_rng(0)
    ncomps, feat = 15, 512
    # Reference branch layout: shared base MLP + per-output regressors.
    branches = {
        "mano_branch.base_layer.0": _rand_linear(rng, feat, 512),
        "mano_branch.base_layer.2": _rand_linear(rng, 512, 512),
        "mano_branch.pose_reg": _rand_linear(rng, 512, ncomps + 3),
        "mano_branch.shape_reg": _rand_linear(rng, 512, 10),
        "absolute_branch.base_layer.0": _rand_linear(rng, feat, 512),
        "absolute_branch.final_layer": _rand_linear(rng, 512, 3),
        "obj_branch.base_layer.0": _rand_linear(rng, feat, 512),
        "obj_branch.trans_reg": _rand_linear(rng, 512, 3),
        "obj_branch.rot_reg": _rand_linear(rng, 512, 3),  # axis-angle
    }
    for name, (w, b) in branches.items():
        state_dict[name + ".weight"] = w
        state_dict[name + ".bias"] = b

    model = HOCNet(
        ncomps=ncomps, with_object=True, obj_rot_param="axisang",
        freeze_batchnorm=True,
    )
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    k = np.tile(
        np.array([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1.0]], np.float32),
        (2, 1, 1),
    )
    obj = rng.uniform(-0.03, 0.03, (2, 8, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(k), mano_model,
        jnp.asarray(obj),
    )
    imported = import_hocnet(variables, state_dict)
    out = model.apply(
        imported, jnp.asarray(x), jnp.asarray(k), mano_model, jnp.asarray(obj)
    )

    # Reference math in numpy: feats -> shared base -> regressors.
    with torch.no_grad():
        feats = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    def lin(name, h):
        w, b = branches[name]
        return h @ w.T + b

    base = np.maximum(lin("mano_branch.base_layer.2",
                          np.maximum(lin("mano_branch.base_layer.0", feats), 0)), 0)
    pose_out = lin("mano_branch.pose_reg", base)
    np.testing.assert_allclose(
        np.asarray(out["pose_pca"]), pose_out[:, :ncomps], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["root_rot"]), pose_out[:, ncomps:], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["betas"]), lin("mano_branch.shape_reg", base), atol=2e-4
    )
    # Absolute branch: the z_init offset is folded into the imported bias,
    # so the composed function equals the raw reference regression.
    abase = np.maximum(lin("absolute_branch.base_layer.0", feats), 0)
    np.testing.assert_allclose(
        np.asarray(out["trans"]), lin("absolute_branch.final_layer", abase),
        atol=2e-4,
    )
    obase = np.maximum(lin("obj_branch.base_layer.0", feats), 0)
    np.testing.assert_allclose(
        np.asarray(out["obj_trans"]), lin("obj_branch.trans_reg", obase),
        atol=2e-4,
    )
    # Rotation: axis-angle through Rodrigues.
    from hocon.geometry.rot import rodrigues

    aa = lin("obj_branch.rot_reg", obase)
    np.testing.assert_allclose(
        np.asarray(out["obj_rot"]),
        np.asarray(rodrigues(jnp.asarray(aa))),
        atol=2e-4,
    )


def _reference_state_dict(rng, ncomps=15, with_obj=True):
    """torch-tensor state_dict shaped like a reference MeshRegNet ckpt."""
    tmodel = _TorchResNet18().eval()
    sd = {"base_net." + k: v.clone() for k, v in tmodel.state_dict().items()}
    dims = {
        "mano_branch.base_layer.0": (512, 512),
        "mano_branch.base_layer.2": (512, 512),
        "mano_branch.pose_reg": (512, ncomps + 3),
        "mano_branch.shape_reg": (512, 10),
        "absolute_branch.base_layer.0": (512, 512),
        "absolute_branch.final_layer": (512, 3),
    }
    if with_obj:
        dims.update({
            "obj_branch.base_layer.0": (512, 512),
            "obj_branch.trans_reg": (512, 3),
            "obj_branch.rot_reg": (512, 3),
        })
    for name, d in dims.items():
        w, b = _rand_linear(rng, *d)
        sd[name + ".weight"] = torch.from_numpy(w)
        sd[name + ".bias"] = torch.from_numpy(b)
    return sd


@pytest.mark.slow
def test_evaluate_cli_torch_ckpt(tmp_path, monkeypatch):
    """`python -m hocon.cli.evaluate --torch_ckpt x.pth` scores a reference
    checkpoint end-to-end (round-2 verdict #3: the importer existed but no
    CLI could invoke it)."""
    monkeypatch.chdir(tmp_path)
    sd = _reference_state_dict(np.random.default_rng(0))
    torch.save({"state_dict": sd, "epoch": 3}, tmp_path / "ref.pth")

    from hocon.cli.evaluate import main

    metrics = main([
        "--dataset", "synthetic", "--image_size", "64", "--batch_size", "4",
        "--synth_videos", "1", "--synth_frames", "4", "--use_objects",
        "--torch_ckpt", str(tmp_path / "ref.pth"), "--no_bf16",
    ])
    assert np.isfinite(metrics["mpjpe_mm"])
    assert np.isfinite(metrics["auc"])


@pytest.mark.slow
def test_train_cli_torch_trunk(tmp_path, monkeypatch):
    """`--torch_trunk r18.pth` seeds training from torchvision-style
    ImageNet weights (fc.* ignored); lr=0 lets us verify the imported trunk
    survives into the returned train state."""
    monkeypatch.chdir(tmp_path)
    sd = _TorchResNet18().state_dict()
    sd["fc.weight"] = torch.zeros(1000, 512)  # torchvision classifier head
    sd["fc.bias"] = torch.zeros(1000)
    torch.save(sd, tmp_path / "r18.pth")

    from hocon.cli.train import main
    from hocon.utils.torch_import import _conv_kernel

    state = main([
        "--dataset", "synthetic", "--image_size", "64", "--batch_size", "8",
        "--epochs", "1", "--synth_videos", "2", "--synth_frames", "4",
        "--exp_id", "timp", "--max_steps_per_epoch", "1", "--no_bf16",
        "--lr", "0", "--torch_trunk", str(tmp_path / "r18.pth"),
    ])
    got = jax.device_get(state.params["trunk"]["conv_init"]["kernel"])
    np.testing.assert_allclose(
        got, _conv_kernel(sd["conv1.weight"].numpy()), atol=1e-6
    )


def test_import_hocnet_threads_model_z_init(mano_model):
    """The bias-offset fold must use the MODEL's z_init, not a hard-coded
    0.6 (round-2 advisor, medium): a non-default z_init would otherwise
    produce a silent functional z-shift in the imported heads."""
    from hocon.models.hocnet import HOCNet
    from hocon.utils.torch_import import import_hocnet

    tmodel = _TorchResNet18().eval()
    state_dict = {
        "base_net." + k: v.numpy() for k, v in tmodel.state_dict().items()
    }
    rng = np.random.default_rng(2)
    for name, dims in {
        "mano_branch.base_layer.0": (512, 512),
        "mano_branch.base_layer.2": (512, 512),
        "mano_branch.pose_reg": (512, 18),
        "mano_branch.shape_reg": (512, 10),
        "absolute_branch.base_layer.0": (512, 512),
        "absolute_branch.final_layer": (512, 3),
        "obj_branch.base_layer.0": (512, 512),
        "obj_branch.trans_reg": (512, 3),
        "obj_branch.rot_reg": (512, 3),
    }.items():
        w, b = _rand_linear(rng, *dims)
        state_dict[name + ".weight"] = w
        state_dict[name + ".bias"] = b

    model = HOCNet(
        with_object=True, obj_rot_param="axisang", freeze_batchnorm=True,
        z_init=0.25,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.eye(3)[None],
        mano_model, jnp.zeros((1, 8, 3)),
    )
    imported = import_hocnet(variables, state_dict, model=model)
    got = np.asarray(
        imported["params"]["absolute_head"]["trans_mlp"]["Dense_1"]["bias"]
    )
    want = state_dict["absolute_branch.final_layer.bias"] - np.array(
        [0.0, 0.0, 0.25], np.float32
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
    got_obj = np.asarray(
        imported["params"]["obj_head"]["objtrans_mlp"]["Dense_1"]["bias"]
    )
    want_obj = state_dict["obj_branch.trans_reg.bias"] - np.array(
        [0.0, 0.0, 0.25], np.float32
    )
    np.testing.assert_allclose(got_obj, want_obj, atol=1e-6)


def test_import_hocnet_hand_only_nonstrict(mano_model):
    """strict_heads=False skips absent branches (hand-only checkpoints)."""
    from hocon.models.hocnet import HOCNet
    from hocon.utils.torch_import import import_hocnet

    tmodel = _TorchResNet18().eval()
    state_dict = {
        "base_net." + k: v.numpy() for k, v in tmodel.state_dict().items()
    }
    rng = np.random.default_rng(1)
    for name, dims in {
        "mano_branch.base_layer.0": (512, 512),
        "mano_branch.base_layer.2": (512, 512),
        "mano_branch.pose_reg": (512, 18),
        "mano_branch.shape_reg": (512, 10),
        "absolute_branch.base_layer.0": (512, 512),
        "absolute_branch.final_layer": (512, 3),
    }.items():
        w, b = _rand_linear(rng, *dims)
        state_dict[name + ".weight"] = w
        state_dict[name + ".bias"] = b

    model = HOCNet(with_object=False, freeze_batchnorm=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.eye(3)[None], mano_model, None,
    )
    imported = import_hocnet(variables, state_dict, strict_heads=False)
    assert "obj_head" not in imported["params"]
    # And strict mode raises on the same (incomplete) dict for an obj model.
    model_obj = HOCNet(
        with_object=True, obj_rot_param="axisang", freeze_batchnorm=True
    )
    vars_obj = model_obj.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.eye(3)[None], mano_model, jnp.zeros((1, 8, 3)),
    )
    with pytest.raises(KeyError):
        import_hocnet(vars_obj, state_dict, strict_heads=True)
