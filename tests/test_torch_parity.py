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

# heavy tier: reference-oracle / e2e / real-backbone tests (see pytest.ini)
pytestmark = pytest.mark.slow

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


def build_torch_inception_v3(in_channels: int = 3):
    """Inception V3 twin with TF-slim module naming matching our converter."""
    import torch.nn as nn
    import torch.nn.functional as F

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, k, stride=1, pad=0):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, stride, pad, bias=False)
            self.bn = nn.BatchNorm2d(cout, eps=1e-3)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def avg3(x):
        return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)

    class MixedA(nn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 64, 1)
            self.branch5x5_1 = BasicConv2d(cin, 48, 1)
            self.branch5x5_2 = BasicConv2d(48, 64, 5, pad=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, 1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, 3, pad=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, 3, pad=1)
            self.branch_pool = BasicConv2d(cin, pool_features, 1)

        def forward(self, x):
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(avg3(x))], 1)

    class MixedB(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BasicConv2d(cin, 384, 3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, 1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, 3, pad=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, 3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, 2)], 1)

    class MixedC(nn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 192, 1)
            self.branch7x7_1 = BasicConv2d(cin, c7, 1)
            self.branch7x7_2 = BasicConv2d(c7, c7, (1, 7), pad=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, (7, 1), pad=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(cin, c7, 1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, (7, 1), pad=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, (1, 7), pad=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, (7, 1), pad=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, (1, 7), pad=(0, 3))
            self.branch_pool = BasicConv2d(cin, 192, 1)

        def forward(self, x):
            b1 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            b2 = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
            return torch.cat([self.branch1x1(x), b1, b2,
                              self.branch_pool(avg3(x))], 1)

    class MixedD(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(cin, 192, 1)
            self.branch3x3_2 = BasicConv2d(192, 320, 3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(cin, 192, 1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, (1, 7), pad=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, (7, 1), pad=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, 3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3_2(self.branch3x3_1(x)),
                self.branch7x7x3_4(self.branch7x7x3_3(
                    self.branch7x7x3_2(self.branch7x7x3_1(x)))),
                F.max_pool2d(x, 3, 2)], 1)

    class MixedE(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 320, 1)
            self.branch3x3_1 = BasicConv2d(cin, 384, 1)
            self.branch3x3_2a = BasicConv2d(384, 384, (1, 3), pad=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, (3, 1), pad=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(cin, 448, 1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, 3, pad=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, (1, 3), pad=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, (3, 1), pad=(1, 0))
            self.branch_pool = BasicConv2d(cin, 192, 1)

        def forward(self, x):
            b1 = self.branch3x3_1(x)
            b1 = torch.cat([self.branch3x3_2a(b1), self.branch3x3_2b(b1)], 1)
            b2 = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            b2 = torch.cat([self.branch3x3dbl_3a(b2), self.branch3x3dbl_3b(b2)], 1)
            return torch.cat([self.branch1x1(x), b1, b2,
                              self.branch_pool(avg3(x))], 1)

    class TorchIV3(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(in_channels, 32, 3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, 3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, 3, pad=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, 1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, 3)
            self.Mixed_5b = MixedA(192, 32)
            self.Mixed_5c = MixedA(256, 64)
            self.Mixed_5d = MixedA(288, 64)
            self.Mixed_6a = MixedB(288)
            self.Mixed_6b = MixedC(768, 128)
            self.Mixed_6c = MixedC(768, 160)
            self.Mixed_6d = MixedC(768, 160)
            self.Mixed_6e = MixedC(768, 192)
            self.Mixed_7a = MixedD(768)
            self.Mixed_7b = MixedE(1280)
            self.Mixed_7c = MixedE(2048)

        def forward(self, x):
            import torch.nn.functional as F

            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = F.max_pool2d(x, 3, 2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = F.max_pool2d(x, 3, 2)
            for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                      self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                      self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                      self.Mixed_7b, self.Mixed_7c):
                x = m(x)
            return x.mean(dim=(2, 3))

    return TorchIV3()


def test_inception_v3_matches_torch_twin():
    torch.manual_seed(2)
    tm = build_torch_inception_v3()
    tm.eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.4)
                m.weight.normal_(1.0, 0.02)
                m.bias.normal_(0, 0.02)

    params, batch_stats = convert_torch_backbone_state(tm.state_dict(),
                                                       "InceptionV3")
    backbone, _, _ = get_backbone("InceptionV3", "RGB")
    rng = np.random.RandomState(0)
    x = rng.randn(1, 75, 75, 3).astype(np.float32)
    ours = np.asarray(backbone.apply({"params": params,
                                      "batch_stats": batch_stats},
                                     jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert ours.shape == theirs.shape == (1, 2048)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def build_torch_vgg(arch: str, in_channels: int = 3):
    """Torchvision-layout VGG twin (features Sequential indices + classifier
    minus the final 1000-way layer)."""
    import torch.nn as nn

    from action_detection_tpu.models.backbones.vgg import _arch_cfg

    cfg, with_bn = _arch_cfg(arch)
    layers = []
    cin = in_channels
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            if with_bn:
                layers.append(nn.BatchNorm2d(v, eps=1e-5))
            layers.append(nn.ReLU())
            cin = v

    class TorchVGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)
            self.classifier = nn.Sequential(
                nn.Linear(512 * 7 * 7, 4096), nn.ReLU(), nn.Dropout(),
                nn.Linear(4096, 4096), nn.ReLU(), nn.Dropout())

        def forward(self, x):
            x = self.features(x)
            x = torch.flatten(x, 1)
            return self.classifier(x)

    return TorchVGG()


@pytest.mark.parametrize("arch", ["vgg16", "vgg16_bn"])
def test_vgg_matches_torch_twin(arch):
    torch.manual_seed(2)
    tm = build_torch_vgg(arch)
    tm.eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.4)
                m.weight.normal_(1.0, 0.02)
                m.bias.normal_(0, 0.02)

    params, batch_stats = convert_torch_backbone_state(tm.state_dict(), arch)
    backbone, feat_dim, spec = get_backbone(arch, "RGB")
    assert feat_dim == 4096 and spec.input_size == 224

    rng = np.random.RandomState(0)
    x = rng.randn(2, 224, 224, 3).astype(np.float32)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    ours = np.asarray(backbone.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert ours.shape == theirs.shape == (2, 4096)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
