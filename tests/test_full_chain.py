"""Full-workflow integration test: the reference's complete pipeline
(Readme.md:53-56 steps 3-8) driven through the real CLI entry points over a
tiny on-disk three-modality dataset:

    pretrain (pretrain/pretrain.py)
      → per-modality expert feature extraction (extract_feature.py)
      → MFM fusion-teacher training (multi_fusion.py)
      → fused-feature extraction (extract_multi_feature.py)
      → student KD training (trainwandb.py)
      → episodic evaluation (test.py)

Every arrow crosses a real on-disk artifact (orbax checkpoint dirs,
<class>/<video>/feature.npy trees), so this also locks the interchange
formats the reference's halves use to talk to each other.
"""
import numpy as np
import pytest
from PIL import Image

from litemkd_tpu.cli import (extract as cli_extract, pretrain as cli_pretrain,
                             test as cli_test, train as cli_train,
                             train_teacher as cli_train_teacher)

pytestmark = pytest.mark.slow

WAY, SHOT, QPC, T, IMG = 3, 1, 2, 4, 32
N_CLASSES, VIDS_PER_CLASS, N_TRAIN = 4, 6, 4
MODALITIES = ("rgb", "depth", "flow")
DIM = 512  # resnet18 trunk feature dim


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    """Three modality frame trees with class-structured pixels + split lists."""
    root = tmp_path_factory.mktemp("chainset")
    ann = root / "splits"
    ann.mkdir()
    rng = np.random.default_rng(7)
    # per (class, modality) mean color so the frames carry class signal
    means = rng.integers(40, 215, size=(N_CLASSES, len(MODALITIES), 3))
    train_lines, test_lines = [], []
    for c in range(N_CLASSES):
        cname = f"class{c:02d}"
        for v in range(VIDS_PER_CLASS):
            vname = f"vid_{c:02d}_{v:02d}"
            n_frames = T + (v % 2) * 2
            for mi, m in enumerate(MODALITIES):
                vdir = root / f"{m}_l8" / cname / vname
                vdir.mkdir(parents=True)
                for fidx in range(n_frames):
                    arr = np.clip(means[c, mi] + rng.normal(
                        size=(40, 48, 3)) * 25, 0, 255).astype(np.uint8)
                    Image.fromarray(arr).save(vdir / f"{fidx:05d}.jpg")
            (train_lines if v < N_TRAIN else test_lines).append(
                f"{cname}/{vname}")
    (ann / "trainlist03.txt").write_text("\n".join(train_lines) + "\n")
    (ann / "testlist03.txt").write_text("\n".join(test_lines) + "\n")
    return root, ann


GEO = ["--way", str(WAY), "--shot", str(SHOT),
       "--query_per_class", str(QPC), "--query_per_class_test", "1",
       "--seq_len", str(T), "--img_size", str(IMG),
       "--trans_linear_in_dim", str(DIM), "--trans_linear_out_dim", "32",
       "--dataset", "hmdb", "--split", "3"]


def test_full_reference_workflow(roots, tmp_path):
    root, ann = roots
    geo = GEO + ["--traintestlist", str(ann)]

    # ---- step 3: supervised per-modality pretraining (rgb expert) ----
    ck_pre = tmp_path / "ck_pretrain"
    cli_pretrain.main(geo + [
        "--rgb_path", str(root / "rgb_l8"), "--arch", "resnet18",
        "--epochs", "1", "--batch_size", "8", "-lr", "0.01",
        "-c", str(ck_pre), "--print_freq", "0"])
    assert any(ck_pre.iterdir()), "pretrain wrote no checkpoint"

    # ---- step 5: per-modality per-video expert features ----
    froot = tmp_path / "expert_features"
    for m in MODALITIES:
        argv = geo + ["--mode_extract", "expert", "--arch", "resnet18",
                      "--rgb_path", str(root / f"{m}_l8"),
                      "--out", str(froot / m), "--batch_size", "8"]
        if m == "rgb":  # pretrained trunk for rgb; fresh trunks for the rest
            argv += ["-m", str(ck_pre)]
        cli_extract.main(argv)
        sample = np.load(froot / m / "class00" / "vid_00_00" / "feature.npy")
        assert sample.shape == (T, DIM)

    # ---- step 6: MFM fusion-teacher training over the feature trees ----
    ck_mfm = tmp_path / "ck_mfm"
    cli_train_teacher.main(geo + [
        "--feature_root", str(froot), "--modalities", *MODALITIES,
        "--training_iterations", "4", "--tasks_per_batch", "2",
        "-lr", "5e-4", "-c", str(ck_mfm), "--print_freq", "0"])

    # ---- step 7: fused teacher features (the student's teacher_path tree) --
    teacher_tree = tmp_path / "multi_feature"
    cli_extract.main(geo + [
        "--mode_extract", "mfm", "--feature_root", str(froot),
        "--modalities", *MODALITIES, "--out", str(teacher_tree),
        "-m", str(ck_mfm), "--batch_size", "8"])
    fused = np.load(teacher_tree / "class00" / "vid_00_00" / "feature.npy")
    assert fused.shape == (T, DIM) and np.isfinite(fused).all()

    # ---- step 8: student KD training against the frozen fused teacher ----
    ck_stu = tmp_path / "ck_student"
    state = cli_train.main(geo + [
        "--rgb_path", str(root / "rgb_l8"),
        "--teacher_path", str(teacher_tree),
        "--model_backbone", "resnet18_2fc", "--model_classifier", "TRX_2fcsup",
        "--distill_name", "fc_2_sup_dist",
        "--training_iterations", "4", "--tasks_per_batch", "2",
        "-lr", "1e-3", "-c", str(ck_stu), "--print_freq", "0"])
    assert int(state.episodes_seen) == 4

    # ---- evaluation: episodic accuracy + CI from the saved checkpoint ----
    summary = cli_test.main(geo + [
        "--rgb_path", str(root / "rgb_l8"), "-m", str(ck_stu),
        "--num_test_tasks", "4"])
    assert summary["n_tasks"] == 4
    assert 0.0 <= summary["accuracy"] <= 100.0
    assert np.isfinite(summary["confidence"])
