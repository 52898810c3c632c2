"""PyTorch-CPU baseline for the driver's north-star throughput comparison.

Re-implements the flagship Lite-MKD training computation in plain torch
(written from the math spec — resnet18 trunk + 2fc head + shared TRX
cross-transformer + SupportDK + fc_2_sup_dist loss) and measures sequential
per-episode forward+backward episodes/sec on CPU, mirroring the reference's
one-episode-at-a-time loop with gradient accumulation
(``trainwandb.py:111-287``).

Usage: python tools/torch_cpu_baseline.py [n_episodes] → writes
BASELINE_LOCAL.json at the repo root.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time
from itertools import combinations

import torch
import torch.nn as nn
import torch.nn.functional as F

WAY, SHOT, QPC, T, IMG, DIM, DK = 5, 5, 5, 8, 224, 2048, 1152


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.c1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.b1 = nn.BatchNorm2d(cout)
        self.c2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.b2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                                      nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        y = F.relu(self.b1(self.c1(x)))
        y = self.b2(self.c2(y))
        return F.relu(y + idt)


class ResNet18Trunk(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(), nn.MaxPool2d(3, 2, 1))
        chans = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        layers = []
        for cin, cout, s in chans:
            layers += [BasicBlock(cin, cout, s), BasicBlock(cout, cout, 1)]
        self.layers = nn.Sequential(*layers)

    def forward(self, x):
        return self.layers(self.stem(x))


class StudentBackbone2FC(nn.Module):
    def __init__(self, dim=DIM, seq_len=T):
        super().__init__()
        self.dim, self.seq_len = dim, seq_len
        self.trunk = ResNet18Trunk()
        self.pool = nn.AdaptiveMaxPool2d((4, 4))
        self.fc1 = nn.Linear(512, dim)
        self.fc2 = nn.Linear(512, dim)

    def forward(self, x):  # (N*T, 3, H, W)
        f = self.pool(self.trunk(x)).flatten(2).mean(-1)  # (N*T, 512)
        return (self.fc1(f).view(-1, self.seq_len, self.dim),
                self.fc2(f).view(-1, self.seq_len, self.dim))


class TCT(nn.Module):
    def __init__(self, way=WAY, shot=SHOT, seq_len=T, dim=DIM, dk=DK):
        super().__init__()
        self.way, self.shot, self.dk = way, shot, dk
        pairs = list(combinations(range(seq_len), 2))
        self.register_buffer("idx", torch.tensor(pairs))
        self.k = nn.Linear(2 * dim, dk)
        self.v = nn.Linear(2 * dim, dk)
        self.ln = nn.LayerNorm(dk)
        pe = torch.zeros(seq_len, dim)
        pos = torch.arange(seq_len).unsqueeze(1).float()
        div = torch.exp(torch.arange(0, dim, 2).float() * -(math.log(1e4) / dim))
        pe[:, 0::2] = torch.sin(pos * div) * 0.1
        pe[:, 1::2] = torch.cos(pos * div) * 0.1
        self.register_buffer("pe", pe)

    def tuples(self, x):  # (N, T, D) -> (N, U, 2D)
        g = x[:, self.idx]  # (N, U, 2, D)
        return g.reshape(x.shape[0], len(self.idx), -1)

    def forward(self, support, labels, queries):
        support = support + self.pe
        queries = queries + self.pe
        s_t, q_t = self.tuples(support), self.tuples(queries)
        s_k, q_k = self.ln(self.k(s_t)), self.ln(self.k(q_t))
        s_v, q_v = self.v(s_t), self.v(q_t)
        U = s_t.shape[1]
        order = torch.argsort(labels, stable=True)
        ck = s_k[order].view(self.way, self.shot, U, self.dk)
        cv = s_v[order].view(self.way, self.shot, U, self.dk)
        scores = torch.einsum("qud,wsvd->qwusv", q_k, ck) / math.sqrt(self.dk)
        attn = scores.reshape(*scores.shape[:3], -1).softmax(-1)
        attn = attn.view_as(scores)
        proto = torch.einsum("qwusv,wsvd->qwud", attn, cv)
        diff = q_v.unsqueeze(1) - proto
        return -(diff ** 2).sum((-2, -1)) / U


def support_dk(support, labels):
    way = int(labels.max()) + 1
    shot = support.shape[0] // way
    t = support.shape[1]
    order = torch.argsort(labels, stable=True)
    proto = support[order].view(way, shot, t, support.shape[-1]).mean(1)
    d = -((proto.unsqueeze(1) - proto.unsqueeze(0)) ** 2).sum((-2, -1)) / t
    keep = ~torch.eye(way, dtype=torch.bool)
    return d[keep].view(way, way - 1)


def kd_loss(s, t, temp=4.0):
    lp = F.log_softmax(s / temp, 1)
    p = F.softmax(t / temp, 1)
    return F.kl_div(lp, p, reduction="none").sum(1).mean() * temp ** 2


def dist_loss(s, t):
    ys, yt = s.softmax(1), t.softmax(1)
    xc, yc = ys - ys.mean(1, keepdim=True), yt - yt.mean(1, keepdim=True)
    pear = (xc * yc).sum(1) / (xc.norm(dim=1) * yc.norm(dim=1) + 1e-8)
    return 1 - pear.mean()


def _merge_baseline(update: dict) -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "BASELINE_LOCAL.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    out.update(update)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


def main_eval(n_episodes: int = 4):
    """Forward-only eval-protocol baseline (the reference test.py loop:
    one episode at a time, eval-mode BN, query_per_class_test=1) — the
    denominator for ``BENCH_MODE=eval``'s vs_baseline."""
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count())
    backbone = StudentBackbone2FC().eval()
    tct = TCT().eval()
    S, Q = WAY * SHOT, WAY * 1
    ctx = torch.randn(S * T, 3, IMG, IMG)
    tgt = torch.randn(Q * T, 3, IMG, IMG)
    labels = torch.arange(WAY).repeat_interleave(SHOT)

    @torch.no_grad()
    def episode():
        c1, c2 = backbone(ctx)
        q1, q2 = backbone(tgt)
        return float((tct(c1, labels, q1) + tct(c2, labels, q2)).sum())

    episode()  # warmup
    t0 = time.time()
    for _ in range(n_episodes):
        episode()
    eps = n_episodes / (time.time() - t0)
    out = {"torch_cpu_eval_episodes_per_sec": eps,
           "eval_n_episodes": n_episodes,
           "eval_config": "resnet18_2fc + TRX_2fcsup eval fwd, 5w5s q1, 224px"}
    print(json.dumps({**out, "threads": torch.get_num_threads()}))
    _merge_baseline(out)


def main(n_episodes: int = 8):
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count())
    backbone = StudentBackbone2FC()
    tct = TCT()
    teacher_tct = TCT()
    params = list(backbone.parameters()) + list(tct.parameters())
    opt = torch.optim.SGD(params, lr=1e-4)

    S, Q = WAY * SHOT, WAY * QPC
    ctx = torch.randn(S * T, 3, IMG, IMG)
    tgt = torch.randn(Q * T, 3, IMG, IMG)
    labels = torch.arange(WAY).repeat_interleave(SHOT)
    qlabels = torch.arange(WAY).repeat_interleave(QPC)
    t_ctx = torch.randn(S, T, DIM)
    t_tgt = torch.randn(Q, T, DIM)

    def episode():
        c1, c2 = backbone(ctx)
        q1, q2 = backbone(tgt)
        kl = tct(c1, labels, q1)
        ce = tct(c2, labels, q2)
        sup = support_dk(c2, labels)
        with torch.no_grad():
            t_kl = teacher_tct(t_ctx, labels, t_tgt)
            t_sup = support_dk(t_ctx, labels)
        loss = (kd_loss(kl, t_kl) + 0.5 * dist_loss(sup, t_sup)
                + F.cross_entropy(ce, qlabels) / 16)
        loss.backward()
        return float(loss)

    episode()  # warmup
    opt.zero_grad()
    t0 = time.time()
    for i in range(n_episodes):
        episode()
        if (i + 1) % 16 == 0:
            opt.step()
            opt.zero_grad()
    dt = time.time() - t0
    eps = n_episodes / dt
    out = {"torch_cpu_episodes_per_sec": eps, "n_episodes": n_episodes,
           "threads": torch.get_num_threads(),
           "config": "resnet18_2fc + TRX_2fcsup + fc_2_sup_dist, 5w5s q5, 224px"}
    print(json.dumps(out))
    _merge_baseline(out)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--eval"]
    n = int(args[0]) if args else None
    if "--eval" in sys.argv[1:]:
        main_eval(n if n is not None else 4)
    else:
        main(n if n is not None else 8)
