"""Run the reference's full 6-stage workflow ON the real chip, timing each
stage (VERDICT r4 item 4b — the day-1 real-data rehearsal).

Same pipeline as tests/test_full_chain.py (pretrain → per-modality expert
extraction → MFM teacher → fused extraction → student KD → eval) through the
REAL CLI entry points over an on-disk three-modality fixture, at a
small-real geometry, under the default (TPU) env. Prints one JSON line with
per-stage wall times and appends a mode="chain" row to BENCH_HISTORY.jsonl.

Usage: python tools/chain_onchip.py [workdir]
(workdir defaults to a fresh temp dir; fixture ~300 small JPEGs)
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WAY, SHOT, QPC, T, IMG = 3, 1, 2, 4, 64
N_CLASSES, VIDS_PER_CLASS, N_TRAIN = 4, 6, 4
MODALITIES = ("rgb", "depth", "flow")
DIM = 512


def build_fixture(root):
    ann = os.path.join(root, "splits")
    os.makedirs(ann, exist_ok=True)
    rng = np.random.default_rng(7)
    means = rng.integers(40, 215, size=(N_CLASSES, len(MODALITIES), 3))
    train_lines, test_lines = [], []
    for c in range(N_CLASSES):
        cname = f"class{c:02d}"
        for v in range(VIDS_PER_CLASS):
            vname = f"vid_{c:02d}_{v:02d}"
            n_frames = T + (v % 2) * 2
            for mi, m in enumerate(MODALITIES):
                vdir = os.path.join(root, f"{m}_l8", cname, vname)
                os.makedirs(vdir, exist_ok=True)
                for fidx in range(n_frames):
                    arr = np.clip(means[c, mi] + rng.normal(
                        size=(72, 80, 3)) * 25, 0, 255).astype(np.uint8)
                    Image.fromarray(arr).save(
                        os.path.join(vdir, f"{fidx:05d}.jpg"))
            (train_lines if v < N_TRAIN else test_lines).append(
                f"{cname}/{vname}")
    with open(os.path.join(ann, "trainlist03.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(ann, "testlist03.txt"), "w") as f:
        f.write("\n".join(test_lines) + "\n")
    return ann


def main():
    from litemkd_tpu.cli import (extract as cli_extract,
                                 pretrain as cli_pretrain,
                                 test as cli_test, train as cli_train,
                                 train_teacher as cli_train_teacher)

    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="chain_onchip_")
    os.makedirs(work, exist_ok=True)
    ann = build_fixture(work)
    geo = ["--way", str(WAY), "--shot", str(SHOT),
           "--query_per_class", str(QPC), "--query_per_class_test", "1",
           "--seq_len", str(T), "--img_size", str(IMG),
           "--trans_linear_in_dim", str(DIM), "--trans_linear_out_dim", "32",
           "--dataset", "hmdb", "--split", "3",
           "--traintestlist", ann]
    times = {}

    def stage(name, fn):
        t0 = time.time()
        out = fn()
        times[name] = round(time.time() - t0, 1)
        print(f"[chain] {name}: {times[name]}s", file=sys.stderr)
        return out

    ck_pre = os.path.join(work, "ck_pretrain")
    stage("pretrain", lambda: cli_pretrain.main(geo + [
        "--rgb_path", os.path.join(work, "rgb_l8"), "--arch", "resnet18",
        "--epochs", "1", "--batch_size", "8", "-lr", "0.01",
        "-c", ck_pre, "--print_freq", "0"]))

    froot = os.path.join(work, "expert_features")

    def extract_experts():
        for m in MODALITIES:
            argv = geo + ["--mode_extract", "expert", "--arch", "resnet18",
                          "--rgb_path", os.path.join(work, f"{m}_l8"),
                          "--out", os.path.join(froot, m),
                          "--batch_size", "8"]
            if m == "rgb":
                argv += ["-m", ck_pre]
            cli_extract.main(argv)

    stage("expert_extract", extract_experts)

    ck_mfm = os.path.join(work, "ck_mfm")
    stage("mfm_train", lambda: cli_train_teacher.main(geo + [
        "--feature_root", froot, "--modalities", *MODALITIES,
        "--training_iterations", "8", "--tasks_per_batch", "2",
        "-lr", "5e-4", "-c", ck_mfm, "--print_freq", "0"]))

    teacher_tree = os.path.join(work, "multi_feature")
    stage("fused_extract", lambda: cli_extract.main(geo + [
        "--mode_extract", "mfm", "--feature_root", froot,
        "--modalities", *MODALITIES, "--out", teacher_tree,
        "-m", ck_mfm, "--batch_size", "8"]))

    ck_stu = os.path.join(work, "ck_student")
    stage("student_kd", lambda: cli_train.main(geo + [
        "--rgb_path", os.path.join(work, "rgb_l8"),
        "--teacher_path", teacher_tree,
        "--model_backbone", "resnet18_2fc",
        "--model_classifier", "TRX_2fcsup",
        "--distill_name", "fc_2_sup_dist",
        "--training_iterations", "8", "--tasks_per_batch", "2",
        "-lr", "1e-3", "-c", ck_stu, "--print_freq", "0"]))

    summary = stage("eval", lambda: cli_test.main(geo + [
        "--rgb_path", os.path.join(work, "rgb_l8"), "-m", ck_stu,
        "--num_test_tasks", "8"]))

    import jax
    line = {"metric": "chain_onchip_wall_seconds",
            "value": round(sum(times.values()), 1),
            "unit": f"6-stage chain @ {IMG}px (platform "
                    f"{jax.devices()[0].platform})",
            "stages": times,
            "eval_accuracy": summary["accuracy"],
            "eval_confidence": summary["confidence"]}
    print(json.dumps(line))
    record = {"ts": round(time.time(), 1), "mode": "chain", **line}
    history = (os.environ.get("BENCH_HISTORY_FILE")
               or os.path.join(ROOT, "BENCH_HISTORY.jsonl"))
    with open(history, "a") as f:
        f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
