"""A minimal ``torchvision.models`` stand-in for executing the reference code.

torchvision is not installed in this image (only torch-cpu is), but the
reference backbones construct their CNN trunks through it, e.g.
``models.resnet18(pretrained=True)`` (``model/backbone/resnet18_2fc.py:30``)
and then slice children: ``nn.Sequential(*list(resnet.children())[:-2])``.
This module provides torch re-implementations of the handful of torchvision
architectures the reference uses, with

- the exact torchvision **attribute/children order** (the ``children()``
  slice above depends on it), and
- the exact torchvision **state_dict key layout** (so checkpoints produced
  from reference-constructed models exercise our importers unchanged).

``pretrained=True`` yields torchvision's *random init* (kaiming convs, unit
BN) instead of downloading ImageNet weights — this box has zero egress and no
hub cache, and the golden tests only need both sides to share weights, not
ImageNet ones.

This is test apparatus (like torch_cpu_baseline.py), not framework code:
the architectures are public knowledge, written here from the torchvision
docs' layer tables, not copied from torchvision sources.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn


def _conv3x3(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)


def _conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = _conv3x3(cin, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = _conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = _conv1x1(cin, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = _conv3x3(planes, planes, stride)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = _conv1x1(planes, planes * 4)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    """torchvision-layout ResNet: children order conv1, bn1, relu, maxpool,
    layer1..4, avgpool, fc — the reference's ``children()[:-2]`` slice keeps
    everything through layer4."""

    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.constant_(m.weight, 1.0)
                nn.init.constant_(m.bias, 0.0)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                _conv1x1(self.inplanes, planes * block.expansion, stride),
                nn.BatchNorm2d(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet18(*args, **kwargs):
    return ResNet(BasicBlock, [2, 2, 2, 2])


def resnet34(*args, **kwargs):
    return ResNet(BasicBlock, [3, 4, 6, 3])


def resnet50(*args, **kwargs):
    return ResNet(Bottleneck, [3, 4, 6, 3])


# ---------------------------------------------------------------------------
# MobileNetV3 (torchvision layout: children = features, avgpool, classifier;
# the reference keeps children()[:-2] == features only).
# ---------------------------------------------------------------------------

class SqueezeExcitation(nn.Module):
    """torchvision.ops.SqueezeExcitation key layout: fc1/fc2 convs."""

    def __init__(self, channels, squeeze):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(channels, squeeze, 1)
        self.fc2 = nn.Conv2d(squeeze, channels, 1)
        self.activation = nn.ReLU()
        self.scale_activation = nn.Hardsigmoid()

    def forward(self, x):
        s = self.scale_activation(self.fc2(self.activation(
            self.fc1(self.avgpool(x)))))
        return x * s


class Conv2dNormActivation(nn.Sequential):
    def __init__(self, cin, cout, kernel, stride=1, groups=1,
                 activation=nn.ReLU):
        pad = (kernel - 1) // 2
        layers = [nn.Conv2d(cin, cout, kernel, stride, pad, groups=groups,
                            bias=False),
                  nn.BatchNorm2d(cout)]
        if activation is not None:
            layers.append(activation(inplace=True))
        super().__init__(*layers)


class InvertedResidual(nn.Module):
    """torchvision MobileNetV3 block: self.block = Sequential of
    [expand?][depthwise][SE?][project]."""

    def __init__(self, cin, expand, cout, kernel, stride, use_se, use_hs):
        super().__init__()
        act = nn.Hardswish if use_hs else nn.ReLU
        self.use_res_connect = stride == 1 and cin == cout
        layers = []
        if expand != cin:
            layers.append(Conv2dNormActivation(cin, expand, 1, activation=act))
        layers.append(Conv2dNormActivation(expand, expand, kernel, stride,
                                           groups=expand, activation=act))
        if use_se:
            squeeze = _make_divisible(expand // 4, 8)
            layers.append(SqueezeExcitation(expand, squeeze))
        layers.append(Conv2dNormActivation(expand, cout, 1, activation=None))
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        out = self.block(x)
        return x + out if self.use_res_connect else out


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# (cin, kernel, expand, cout, use_se, use_hs, stride) per torchvision's
# _mobilenet_v3_conf tables.
_V3_LARGE = [
    (16, 3, 16, 16, False, False, 1),
    (16, 3, 64, 24, False, False, 2),
    (24, 3, 72, 24, False, False, 1),
    (24, 5, 72, 40, True, False, 2),
    (40, 5, 120, 40, True, False, 1),
    (40, 5, 120, 40, True, False, 1),
    (40, 3, 240, 80, False, True, 2),
    (80, 3, 200, 80, False, True, 1),
    (80, 3, 184, 80, False, True, 1),
    (80, 3, 184, 80, False, True, 1),
    (80, 3, 480, 112, True, True, 1),
    (112, 3, 672, 112, True, True, 1),
    (112, 5, 672, 160, True, True, 2),
    (160, 5, 960, 160, True, True, 1),
    (160, 5, 960, 160, True, True, 1),
]
_V3_SMALL = [
    (16, 3, 16, 16, True, False, 2),
    (16, 3, 72, 24, False, False, 2),
    (24, 3, 88, 24, False, False, 1),
    (24, 5, 96, 40, True, True, 2),
    (40, 5, 240, 40, True, True, 1),
    (40, 5, 240, 40, True, True, 1),
    (40, 5, 120, 48, True, True, 1),
    (48, 5, 144, 48, True, True, 1),
    (48, 5, 288, 96, True, True, 2),
    (96, 5, 576, 96, True, True, 1),
    (96, 5, 576, 96, True, True, 1),
]


class MobileNetV3(nn.Module):
    def __init__(self, conf, last_channel):
        super().__init__()
        first = conf[0][0]
        features = [Conv2dNormActivation(3, first, 3, stride=2,
                                         activation=nn.Hardswish)]
        for cin, k, exp, cout, se, hs, stride in conf:
            features.append(InvertedResidual(cin, exp, cout, k, stride, se, hs))
        last_cin = conf[-1][3]
        last_conv = 6 * last_cin
        features.append(Conv2dNormActivation(last_cin, last_conv, 1,
                                             activation=nn.Hardswish))
        self.features = nn.Sequential(*features)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Sequential(
            nn.Linear(last_conv, last_channel),
            nn.Hardswish(inplace=True),
            nn.Dropout(p=0.2, inplace=True),
            nn.Linear(last_channel, 1000))
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out")
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.ones_(m.weight)
                nn.init.zeros_(m.bias)

    def forward(self, x):
        x = torch.flatten(self.avgpool(self.features(x)), 1)
        return self.classifier(x)


def mobilenet_v3_large(*args, **kwargs):
    return MobileNetV3(_V3_LARGE, 1280)


def mobilenet_v3_small(*args, **kwargs):
    return MobileNetV3(_V3_SMALL, 1024)


class ToTensor:
    """torchvision.transforms.ToTensor: PIL/HWC-uint8 → CHW float in [0,1]
    (``video_reader.py:68`` applies it to every decoded frame)."""

    def __call__(self, pic):
        if isinstance(pic, np.ndarray):
            arr = pic
        else:  # PIL image
            arr = np.array(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
        if t.dtype == torch.uint8:
            t = t.to(torch.float32).div(255.0)
        return t


def install() -> types.ModuleType:
    """Register ``torchvision`` (+ ``.models``/``.transforms``/``.datasets``)
    stub modules in sys.modules (idempotent; no-op if real torchvision is
    importable)."""
    if "torchvision" in sys.modules:
        return sys.modules["torchvision"]
    try:  # pragma: no cover - not present in this image
        import torchvision  # noqa: F401
        return sys.modules["torchvision"]
    except ImportError:
        pass
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.0-litemkd-stub"
    tv._litemkd_stub = True
    models = types.ModuleType("torchvision.models")
    for fn in (resnet18, resnet34, resnet50,
               mobilenet_v3_large, mobilenet_v3_small):
        setattr(models, fn.__name__, fn)
    models.ResNet = ResNet
    transforms = types.ModuleType("torchvision.transforms")
    transforms.ToTensor = ToTensor
    datasets = types.ModuleType("torchvision.datasets")
    tv.models, tv.transforms, tv.datasets = models, transforms, datasets
    for name, mod in (("models", models), ("transforms", transforms),
                      ("datasets", datasets)):
        sys.modules[f"torchvision.{name}"] = mod
    sys.modules["torchvision"] = tv
    return tv
