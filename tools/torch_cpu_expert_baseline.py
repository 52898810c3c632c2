"""Torch-CPU baselines for the expert and pretrain stages (VERDICT r4 #3).

Same contract as torch_cpu_baseline.py: the REFERENCE's computation written
in plain torch, run the way its loop runs it (one episode / one batch at a
time on CPU), measured on an IDLE box, merged into BASELINE_LOCAL.json.

- ``--expert``  (default): the per-modality TRX expert step — resnet50 trunk
  (torchvision layout via tools/torchvision_stub, randomly initialized; the
  arithmetic is weight-independent) → AdaptiveMaxPool2d(4,4) → 16-patch mean
  → TCT, TRXLoss/tpb² (run.py:256-340), SGD accumulation. The reference's
  costliest compute: 1023.3 GFLOPs/episode forward (Readme.md:172-173).
  Geometry mirrors the expert_trx preset: 5-way 5-shot, 4 queries/class,
  8×224×224 frames → 360 images per episode.
- ``--pretrain``: the supervised stage (pretrain/pretrain.py) — batch-8
  clips through Action_Recognition_Resnet50 (convnet incl. avgpool → frame
  mean → fc), CE, dual-group SGD step.

Usage:  python tools/torch_cpu_expert_baseline.py [--expert|--pretrain] [N]
"""
from __future__ import annotations

import json
import os
import sys
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import torchvision_stub  # noqa: E402
from torch_cpu_baseline import TCT, _merge_baseline  # noqa: E402

torchvision_stub.install()
from torchvision import models  # noqa: E402

WAY, SHOT, QPC, T, IMG, D, DK = 5, 5, 4, 8, 224, 2048, 1152
S, Q = WAY * SHOT, WAY * QPC
TPB = 16


class ExpertNet(nn.Module):
    """run.py's TRX expert data path (model.py:551-676): trunk →
    adap_max(4,4) → 16-patch mean → per-frame 2048 features → TCT."""

    def __init__(self):
        super().__init__()
        resnet = models.resnet50(pretrained=True)   # stub: random init
        self.resnet = nn.Sequential(*list(resnet.children())[:-2])
        self.adap_max = nn.AdaptiveMaxPool2d((4, 4))
        self.tct = TCT(way=WAY, shot=SHOT, seq_len=T, dim=D, dk=DK)

    def features(self, x):                          # (N*T, 3, H, W)
        f = self.adap_max(self.resnet(x))           # (N*T, 2048, 4, 4)
        f = f.reshape(-1, D, 16).mean(-1)           # 16-patch mean
        return f.view(-1, T, D)

    def forward(self, ctx, labels, tgt):
        return self.tct(self.features(ctx), labels, self.features(tgt))


def trx_loss(logits, labels):
    """LossBuilder TRXLoss (sum-CE/tpb) + the run.py:312 second /tpb."""
    return F.cross_entropy(logits, labels, reduction="sum") / TPB / TPB


def main_expert(n_episodes: int = 2):
    torch.manual_seed(0)
    net = ExpertNet().train()    # train-mode BN, as run.py's loop runs it
    opt = torch.optim.SGD(net.parameters(), lr=1e-4)
    ctx = torch.rand(S * T, 3, IMG, IMG)
    tgt = torch.rand(Q * T, 3, IMG, IMG)
    labels = torch.arange(WAY).repeat_interleave(SHOT)
    qlabels = torch.arange(WAY).repeat_interleave(QPC)

    def episode():
        loss = trx_loss(net(ctx, labels, tgt), qlabels)
        loss.backward()
        return float(loss)

    episode()                                        # warmup
    opt.zero_grad()
    t0 = time.time()
    for i in range(n_episodes):
        episode()
        if (i + 1) % TPB == 0:
            opt.step()
            opt.zero_grad()
    dt = time.time() - t0
    # expert_-namespaced metadata: the shared BASELINE_LOCAL.json keys
    # n_episodes/config belong to the flagship baseline (the teacher/eval
    # baselines set the teacher_*/eval_* convention this follows)
    out = {"torch_cpu_expert_episodes_per_sec": n_episodes / dt,
           "expert_n_episodes": n_episodes,
           "expert_threads": torch.get_num_threads(),
           "expert_config": f"resnet50 expert + TRX + TRXLoss, {WAY}w{SHOT}s "
                            f"q{QPC}, {IMG}px"}
    print(json.dumps(out))
    _merge_baseline(out)


def main_pretrain(n_steps: int = 2, bs: int = 8, n_classes: int = 64):
    torch.manual_seed(0)
    resnet = models.resnet50(pretrained=True)
    convnet = nn.Sequential(*list(resnet.children())[:-1])
    fc = nn.Linear(D, n_classes)
    opt1 = torch.optim.SGD(convnet.parameters(), lr=1e-6, momentum=0.9)
    opt2 = torch.optim.SGD(fc.parameters(), lr=1e-2, momentum=0.9)
    video = torch.rand(bs, T, 3, IMG, IMG)
    labels = torch.arange(bs) % n_classes

    def step():
        x = video.reshape(bs * T, 3, IMG, IMG)
        feat = convnet(x).squeeze().view(bs, T, -1).mean(1)
        loss = F.cross_entropy(fc(feat), labels)
        opt1.zero_grad()
        opt2.zero_grad()
        loss.backward()
        opt1.step()
        opt2.step()
        return float(loss)

    step()                                           # warmup
    t0 = time.time()
    for _ in range(n_steps):
        step()
    dt = time.time() - t0
    out = {"torch_cpu_pretrain_clips_per_sec": n_steps * bs / dt,
           "pretrain_n_steps": n_steps,
           "pretrain_threads": torch.get_num_threads(),
           "pretrain_config": f"resnet50 pretrain, batch {bs}, {T}x{IMG}px"}
    print(json.dumps(out))
    _merge_baseline(out)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else None
    if "--pretrain" in sys.argv[1:]:
        main_pretrain(n if n is not None else 2)
    else:
        main_expert(n if n is not None else 2)
