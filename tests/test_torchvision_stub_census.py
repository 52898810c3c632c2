"""Torchvision-stub census (VERDICT r3 missing #4).

``tools/torchvision_stub.py`` sits under every executing-reference CNN
golden; it and the Flax trunks share an author, so a shared architectural
misunderstanding would be invisible to the goldens alone. These tests anchor
the stub to INDEPENDENT public facts about torchvision's models — the
published total parameter counts (torchvision model docs), the canonical
layer shapes, and state_dict key structure — so any drift in the stub (and
hence in every golden built on it) fails here.

The parameter counts are the strongest anchor: every channel width, block
count, SE squeeze rule (``_make_divisible(expanded/4, 8)``) and classifier
dim feeds the total, so a single structural mistake shifts it.
"""
import numpy as np
import pytest
import torch

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import torchvision_stub  # noqa: E402


# published by torchvision's model documentation (and reproducible from
# torchvision.models.resnet18().parameters() etc. on any online machine)
PUBLISHED_PARAM_COUNTS = {
    "resnet18": 11_689_512,
    "resnet34": 21_797_672,
    "resnet50": 25_557_032,
    "mobilenet_v3_large": 5_483_032,
    "mobilenet_v3_small": 2_542_856,
}


def _model(name):
    torch.manual_seed(0)
    return getattr(torchvision_stub, name)(pretrained=True)


@pytest.mark.parametrize("name,count", sorted(PUBLISHED_PARAM_COUNTS.items()))
def test_published_parameter_counts(name, count):
    m = _model(name)
    assert sum(p.numel() for p in m.parameters()) == count, name


# (key, shape) spot anchors — the canonical torchvision state_dict entries a
# checkpoint consumer actually addresses. Shapes from the published
# architectures (ResNet He et al. 2015 as shipped by torchvision;
# MobileNetV3 Howard et al. 2019 Tables 1-2 + torchvision's key layout).
SPOT_KEYS = {
    "resnet18": [
        ("conv1.weight", (64, 3, 7, 7)),
        ("bn1.running_mean", (64,)),
        ("layer1.0.conv1.weight", (64, 64, 3, 3)),
        ("layer2.0.downsample.0.weight", (128, 64, 1, 1)),
        ("layer4.1.conv2.weight", (512, 512, 3, 3)),
        ("fc.weight", (1000, 512)),
    ],
    "resnet34": [
        ("layer1.2.conv2.weight", (64, 64, 3, 3)),
        ("layer3.5.conv1.weight", (256, 256, 3, 3)),
        ("layer4.2.conv2.weight", (512, 512, 3, 3)),
        ("fc.weight", (1000, 512)),
    ],
    "resnet50": [
        ("layer1.0.conv1.weight", (64, 64, 1, 1)),
        ("layer1.0.conv2.weight", (64, 64, 3, 3)),
        ("layer1.0.conv3.weight", (256, 64, 1, 1)),
        ("layer1.0.downsample.0.weight", (256, 64, 1, 1)),
        ("layer3.5.conv3.weight", (1024, 256, 1, 1)),
        ("layer4.2.conv3.weight", (2048, 512, 1, 1)),
        ("fc.weight", (1000, 2048)),
    ],
    "mobilenet_v3_large": [
        ("features.0.0.weight", (16, 3, 3, 3)),
        # block 1: expand==cin → NO expand conv; depthwise first
        ("features.1.block.0.0.weight", (16, 1, 3, 3)),
        # block 4 (cin 24 → exp 72, k5, SE): squeeze = divisible(72/4) = 24
        ("features.4.block.0.0.weight", (72, 24, 1, 1)),
        ("features.4.block.1.0.weight", (72, 1, 5, 5)),
        ("features.4.block.2.fc1.weight", (24, 72, 1, 1)),
        ("features.4.block.2.fc2.weight", (72, 24, 1, 1)),
        # block 11 (cin 80 → exp 480 → out 112, SE squeeze 120)
        ("features.11.block.2.fc1.weight", (120, 480, 1, 1)),
        # last conv 160 → 960, classifier 960 → 1280 → 1000
        ("features.16.0.weight", (960, 160, 1, 1)),
        ("classifier.0.weight", (1280, 960)),
        ("classifier.3.weight", (1000, 1280)),
    ],
    "mobilenet_v3_small": [
        ("features.0.0.weight", (16, 3, 3, 3)),
        # block 1 has SE at expanded=16 → squeeze 8
        ("features.1.block.1.fc1.weight", (8, 16, 1, 1)),
        # block 9 (cin 48 → exp 288 → out 96): squeeze 72
        ("features.9.block.2.fc1.weight", (72, 288, 1, 1)),
        ("features.12.0.weight", (576, 96, 1, 1)),
        ("classifier.0.weight", (1024, 576)),
        ("classifier.3.weight", (1000, 1024)),
    ],
}


@pytest.mark.parametrize("name", sorted(SPOT_KEYS))
def test_state_dict_spot_shapes(name):
    sd = _model(name).state_dict()
    for key, shape in SPOT_KEYS[name]:
        assert key in sd, f"{name}: missing {key}"
        assert tuple(sd[key].shape) == shape, (name, key, tuple(sd[key].shape))


@pytest.mark.parametrize("name,n_weight_keys", [
    # parameter-entry counts (state_dict minus BN buffers): an independent
    # structural checksum over the whole key tree
    ("resnet18", 62), ("resnet34", 110), ("resnet50", 161),
])
def test_resnet_param_key_counts(name, n_weight_keys):
    sd = _model(name).state_dict()
    params = [k for k in sd
              if not k.endswith(("running_mean", "running_var",
                                 "num_batches_tracked"))]
    assert len(params) == n_weight_keys, (name, len(params))


def test_bn_buffers_present_and_layout():
    """Importers consume running stats; every bn key quartet must exist."""
    sd = _model("resnet18").state_dict()
    for stem in ("bn1", "layer1.0.bn1", "layer4.1.bn2"):
        for leaf in ("weight", "bias", "running_mean", "running_var",
                     "num_batches_tracked"):
            assert f"{stem}.{leaf}" in sd, stem


def test_stub_forward_shapes():
    """End-to-end sanity at two input sizes (the goldens drive 112px)."""
    x = torch.zeros(2, 3, 112, 112)
    for name, feat in (("resnet18", 512), ("resnet50", 2048)):
        m = _model(name).eval()
        trunk = torch.nn.Sequential(*list(m.children())[:-2])
        with torch.no_grad():
            y = trunk(x)
        assert y.shape == (2, feat, 4, 4), name
    for name in ("mobilenet_v3_large", "mobilenet_v3_small"):
        m = _model(name).eval()
        with torch.no_grad():
            y = m(x)
        assert y.shape == (2, 1000), name
