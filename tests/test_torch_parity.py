"""Cross-framework parity: our flax BNInception vs a torch build of the same
architecture with IDENTICAL weights.

This is the strongest checkpoint-parity evidence available without the actual
released checkpoints (zero-egress environment): if the torch twin and the
flax model agree to float tolerance on random inputs, converted reference
weights will produce the same per-frame scores (and hence the same mAP) here
as in the reference. Exercises the subtle bits: Caffe ceil-mode max pooling,
count_include_pad average pooling, BN eps/affine, concat ordering, and the
OIHW->HWIO conversion.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.models.backbones.bn_inception import _INCEPTION_CFG
from action_detection_tpu.models.convert import convert_torch_backbone_state


def build_torch_bninception(in_channels: int = 3):
    """BN-Inception in torch from the same architecture table, with the
    reference port's layer naming (flat attributes)."""
    import torch.nn as nn

    class TorchBNInception(nn.Module):
        def __init__(self):
            super().__init__()
            self._names = []

            def conv_bn(name, cin, cout, k, stride=1, pad=0):
                setattr(self, name, nn.Conv2d(cin, cout, k, stride, pad, bias=True))
                setattr(self, name + "_bn", nn.BatchNorm2d(cout, eps=1e-5))

            conv_bn("conv1_7x7_s2", in_channels, 64, 7, 2, 3)
            conv_bn("conv2_3x3_reduce", 64, 64, 1)
            conv_bn("conv2_3x3", 64, 192, 3, 1, 1)

            cin = 192
            for (name, c1, c3r, c3, cd3r, cd31, cd32, cproj, pool, stride) in _INCEPTION_CFG:
                if c1 is not None:
                    conv_bn(f"{name}_1x1", cin, c1, 1)
                conv_bn(f"{name}_3x3_reduce", cin, c3r, 1)
                conv_bn(f"{name}_3x3", c3r, c3, 3, stride, 1)
                conv_bn(f"{name}_double_3x3_reduce", cin, cd3r, 1)
                conv_bn(f"{name}_double_3x3_1", cd3r, cd31, 3, 1, 1)
                conv_bn(f"{name}_double_3x3_2", cd31, cd32, 3, stride, 1)
                if stride == 1:
                    conv_bn(f"{name}_pool_proj", cin, cproj, 1)
                    cout = c1 + c3 + cd32 + cproj
                else:
                    cout = c3 + cd32 + cin
                cin = cout

        def _cb(self, name, x):
            import torch.nn.functional as F

            return F.relu(getattr(self, name + "_bn")(getattr(self, name)(x)))

        def forward(self, x):
            import torch.nn.functional as F

            x = self._cb("conv1_7x7_s2", x)
            x = F.max_pool2d(x, 3, 2, ceil_mode=True)
            x = self._cb("conv2_3x3_reduce", x)
            x = self._cb("conv2_3x3", x)
            x = F.max_pool2d(x, 3, 2, ceil_mode=True)

            for (name, c1, *_rest, pool, stride) in [
                    (c[0],) + tuple(c[1:]) for c in _INCEPTION_CFG]:
                branches = []
                if c1 is not None:
                    branches.append(self._cb(f"{name}_1x1", x))
                b3 = self._cb(f"{name}_3x3_reduce", x)
                b3 = self._cb(f"{name}_3x3", b3)
                branches.append(b3)
                bd = self._cb(f"{name}_double_3x3_reduce", x)
                bd = self._cb(f"{name}_double_3x3_1", bd)
                bd = self._cb(f"{name}_double_3x3_2", bd)
                branches.append(bd)
                if stride == 1:
                    if pool == "avg":
                        bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=True)
                    else:
                        bp = F.max_pool2d(x, 3, 1, 1)
                    branches.append(self._cb(f"{name}_pool_proj", bp))
                else:
                    branches.append(F.max_pool2d(x, 3, 2, ceil_mode=True))
                x = torch.cat(branches, dim=1)
            return x.mean(dim=(2, 3))

    return TorchBNInception()


@pytest.mark.parametrize("hw", [64, 224])
def test_bninception_matches_torch_twin(hw):
    torch.manual_seed(0)
    tm = build_torch_bninception()
    tm.eval()
    # randomize BN stats so running-average semantics are actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.4)
                m.weight.normal_(1.0, 0.02)
                m.bias.normal_(0, 0.02)

    params, batch_stats = convert_torch_backbone_state(tm.state_dict(),
                                                       "BNInception")
    backbone, _, _ = get_backbone("BNInception", "RGB")

    rng = np.random.RandomState(0)
    x = rng.randn(2, hw, hw, 3).astype(np.float32)
    ours = np.asarray(backbone.apply({"params": params,
                                      "batch_stats": batch_stats},
                                     jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    assert ours.shape == theirs.shape == (2, 1024)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def build_torch_resnet18(in_channels: int = 3):
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self, cin, cout, stride, downsample):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if downsample:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            import torch.nn.functional as F

            identity = x if self.downsample is None else self.downsample(x)
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return F.relu(out + identity)

    class TorchResNet18(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            layers = []
            cin = 64
            for stage, n_blocks in enumerate((2, 2, 2, 2)):
                cout = 64 * (2 ** stage)
                blocks = []
                for b in range(n_blocks):
                    stride = 2 if (stage > 0 and b == 0) else 1
                    blocks.append(Block(cin, cout, stride,
                                        downsample=(b == 0 and stride != 1)))
                    cin = cout
                layers.append(nn.Sequential(*blocks))
            self.layer1, self.layer2, self.layer3, self.layer4 = layers

        def forward(self, x):
            import torch.nn.functional as F

            x = F.relu(self.bn1(self.conv1(x)))
            x = F.max_pool2d(x, 3, 2, 1)
            for l in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = l(x)
            return x.mean(dim=(2, 3))

    return TorchResNet18()


def test_resnet18_matches_torch_twin():
    torch.manual_seed(1)
    tm = build_torch_resnet18()
    tm.eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.4)
                m.weight.normal_(1.0, 0.02)
                m.bias.normal_(0, 0.02)

    params, batch_stats = convert_torch_backbone_state(tm.state_dict(),
                                                       "resnet18")
    backbone, _, _ = get_backbone("resnet18", "RGB")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    ours = np.asarray(backbone.apply({"params": params,
                                      "batch_stats": batch_stats},
                                     jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert ours.shape == theirs.shape == (2, 512)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
