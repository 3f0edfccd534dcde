"""ResNet-18 backbone torch-weight-import parity (SURVEY §2.4 item 20).

torchvision isn't installed, so the oracle is a hand-assembled torch
resnet18 feature extractor (nn.Conv2d/BatchNorm2d/MaxPool2d with the
exact torchvision topology and state-dict naming) with RANDOM weights;
`import_torch_backbone` must reproduce its per-stage features exactly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from nerf_fusion_tpu.models.img_encoder import (ResNetBackboneConfig,
                                                apply_resnet_backbone,
                                                import_torch_backbone,
                                                init_resnet_backbone)


def _make_torch_resnet18():
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self, c_in, c_out, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(c_out)
            self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(c_out)
            self.downsample = None
            if stride != 1 or c_in != c_out:
                self.downsample = nn.Sequential(
                    nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                    nn.BatchNorm2d(c_out))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idt)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(Block(64, 64, 1), Block(64, 64, 1))
            self.layer2 = nn.Sequential(Block(64, 128, 2), Block(128, 128, 1))
            self.layer3 = nn.Sequential(Block(128, 256, 2), Block(256, 256, 1))
            self.layer4 = nn.Sequential(Block(256, 512, 2), Block(512, 512, 1))

        def features(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            feats = [x]
            x = self.maxpool(x)
            x = self.layer1(x); feats.append(x)
            x = self.layer2(x); feats.append(x)
            x = self.layer3(x); feats.append(x)
            return feats

    net = Net()
    # non-trivial running stats so frozen-BN parity is non-vacuous
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)
    net.eval()
    return net


def test_import_torch_backbone_parity():
    net = _make_torch_resnet18()
    x = torch.randn(2, 3, 64, 80)
    with torch.no_grad():
        feats = net.features(x)
        h, w = feats[0].shape[2], feats[0].shape[3]
        import torch.nn.functional as F
        # align_corners=True is the reference SpatialEncoder's convention
        # (/root/reference/trainer/img_encoder.py:221,238,267-270)
        up = [feats[0]] + [F.interpolate(f, (h, w), mode="bilinear",
                                         align_corners=True)
                           for f in feats[1:]]
        ref = torch.cat(up, 1).numpy()

    params = import_torch_backbone(net.state_dict(), depth=18)
    cfg = ResNetBackboneConfig(depth=18, num_stages=4)
    out = np.asarray(apply_resnet_backbone(params, cfg, jnp.asarray(x.numpy())))
    assert out.shape == ref.shape
    # whole latent (conv stages AND the align_corners upsamples) matches
    # the torch oracle to fp tolerance
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_random_init_shapes_and_factory():
    import jax

    from nerf_fusion_tpu.models.img_encoder import make_encoder

    cfg, params, apply = make_encoder("resnet", key=jax.random.PRNGKey(0),
                                      depth=18, num_stages=4)
    out = apply(params, cfg, jnp.zeros((1, 3, 32, 32)))
    assert out.shape == (1, 64 + 64 + 128 + 256, 16, 16)

    p34 = init_resnet_backbone(jax.random.PRNGKey(1),
                               ResNetBackboneConfig(depth=34))
    assert "layer3.5" in p34          # 6 blocks in layer3 for resnet34
