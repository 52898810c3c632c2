"""PyTorch-CPU baseline for the MFM fusion-teacher training step.

The same computation as ``make_mfm_train_step`` (the reference's
``multi_fusion.py`` ThreeTRXShiftLoopTime loop: plain SGD — the released
--opt default, no script overrides it — per-episode backward with summed
CE / tasks_per_batch, optimizer step every 16 tasks) written in
torch and run one episode at a time on this host's CPU, at the full
production geometry (3 modalities, d=2048, depth-2 encoders, 5-way 5-shot,
T=8). Merges ``torch_cpu_teacher_episodes_per_sec`` into BASELINE_LOCAL.json
for bench.py's ``BENCH_MODE=teacher`` vs_baseline ratio.

    python tools/torch_cpu_teacher_baseline.py [n_episodes]
"""
import json
import os
import sys
import time

import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from torch_cpu_baseline import TCT, _merge_baseline  # noqa: E402

WAY, SHOT, QPC, T, D, DK = 5, 5, 5, 8, 2048, 1152
S, Q = WAY * SHOT, WAY * QPC
DEPTH, SHIRT = 2, 1
MODS = ("rgb", "depth", "flow")


class TrainablePE(torch.nn.Module):
    """Reference TrainablePositionalEncoding (model.py:1135-1153)."""

    def __init__(self):
        super().__init__()
        self.emb = torch.nn.Embedding(T, D)
        self.ln = torch.nn.LayerNorm(D)

    def forward(self, x):
        return self.ln(x + self.emb(torch.arange(T))[None])


class StreamFusion(torch.nn.Module):
    """Two/ThreeTransforFusion (model.py:1300-1393): per-stream PEs, torch
    TransformerEncoder over the channel concat, linear back to D."""

    def __init__(self, n):
        super().__init__()
        self.pes = torch.nn.ModuleList([TrainablePE() for _ in range(n)])
        layer = torch.nn.TransformerEncoderLayer(
            n * D, 3 if n == 3 else 2, batch_first=True)
        self.enc = torch.nn.TransformerEncoder(layer, DEPTH)
        self.f1 = torch.nn.Linear(n * D, D)

    def forward(self, *streams):
        x = torch.cat([pe(s) for pe, s in zip(self.pes, streams)], -1)
        return self.f1(self.enc(x))


class TorchMFM(torch.nn.Module):
    """ThreeTRXShiftLoopTime (model.py:1588-1638)."""

    def __init__(self):
        super().__init__()
        self.three_fusion = StreamFusion(3)
        self.fusion = StreamFusion(2)
        self.tct = TCT(way=WAY, shot=SHOT, seq_len=T, dim=D, dk=DK)

    def fuse(self, feats):
        s0, s1, s2 = (feats[m] for m in MODS)
        s1r = torch.cat([s1[:, SHIRT:], s1[:, :SHIRT]], dim=1)
        return (self.three_fusion(s0, s1, s2)
                + self.fusion(s0, s1r)
                + self.fusion(s0, s2))      # released identity third shift

    def forward(self, ctx, labels, tgt):
        return self.tct(self.fuse(ctx), labels, self.fuse(tgt))


def main(n_episodes: int = 2):
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count())
    model = TorchMFM()
    model.eval()    # dropout off, like the jax bench's deterministic step
    opt = torch.optim.SGD(model.parameters(), lr=5e-5)

    ctx = {m: torch.randn(S, T, D) for m in MODS}
    tgt = {m: torch.randn(Q, T, D) for m in MODS}
    labels = torch.arange(WAY).repeat_interleave(SHOT)
    qlabels = torch.arange(WAY).repeat_interleave(QPC)

    def episode():
        logits = model(ctx, labels, tgt)
        loss = F.cross_entropy(logits, qlabels, reduction="sum") / 16
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
    if n_episodes % 16:
        # the jax number being compared includes one optimizer update per 16
        # episodes; when the loop doesn't hit the cadence (short runs), time
        # one step separately and charge the pro-rated share per episode
        ts = time.time()
        opt.step()
        opt.zero_grad()
        dt += (time.time() - ts) * (n_episodes % 16) / 16
    eps = n_episodes / dt

    _merge_baseline({
        "torch_cpu_teacher_episodes_per_sec": eps,
        "teacher_n_episodes": n_episodes,
        "teacher_config": "ThreeTRXShiftLoopTime, 3 modalities, d=2048, "
                          "depth 2, 5w5s q5, T=8",
    })
    print(json.dumps({"torch_cpu_teacher_episodes_per_sec": eps,
                      "n_episodes": n_episodes,
                      "threads": torch.get_num_threads()}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
