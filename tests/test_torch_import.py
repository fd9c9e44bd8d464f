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


def test_import_missing_key_raises():
    model = resnet18()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    with pytest.raises(KeyError):
        import_resnet_trunk({}, variables["params"], variables["batch_stats"])
